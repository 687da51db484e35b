"""JAX-native image augmentations for the visual policy obs — behavioral
equivalents of the reference's torchvision pipeline
(visual/mdp_sensors/observations.py:75-87: crop top third, ColorJitter
(brightness 0.8, contrast 0.2, saturation 0.8, hue 0.5), GaussianBlur(5,
sigma 0.1-5.0), grayscale, normalize (x-0.5)/0.5, flatten).

Our renderer outputs grayscale directly (the world is black/white, so
saturation/hue jitter is a near-no-op in the reference too); brightness and
contrast jitter plus the 5-tap separable Gaussian blur are applied per-env
(stronger DR than the reference's per-batch factors)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

BLUR_TAPS = 5


def _gauss_kernel5(sigma: jax.Array) -> jax.Array:
    """(..., 5) normalized 1D Gaussian taps for per-env sigma."""
    x = jnp.arange(BLUR_TAPS, dtype=jnp.float32) - (BLUR_TAPS - 1) / 2.0
    k = jnp.exp(-0.5 * (x / sigma[..., None]) ** 2)
    return k / k.sum(-1, keepdims=True)


def _sep_blur(img: jax.Array, kernel: jax.Array) -> jax.Array:
    """Separable 5-tap blur of (H, W) with (5,) kernel, edge-padded."""
    pad = BLUR_TAPS // 2

    def conv_rows(im):
        padded = jnp.pad(im, ((pad, pad), (0, 0)), mode="edge")
        return sum(kernel[i] * padded[i:i + im.shape[0], :]
                   for i in range(BLUR_TAPS))

    def conv_cols(im):
        padded = jnp.pad(im, ((0, 0), (pad, pad)), mode="edge")
        return sum(kernel[i] * padded[:, i:i + im.shape[1]]
                   for i in range(BLUR_TAPS))

    return conv_cols(conv_rows(img))


def augment_images(images: jax.Array, key: jax.Array,
                   brightness: float = 0.8, contrast: float = 0.2,
                   sigma_range=(0.1, 5.0)) -> jax.Array:
    """images: (B, H, W) grayscale in [0, 1] -> augmented, same shape."""
    b = images.shape[0]
    k_b, k_c, k_s = jax.random.split(key, 3)
    bf = jax.random.uniform(k_b, (b,), minval=max(0.0, 1 - brightness),
                            maxval=1 + brightness)
    cf = jax.random.uniform(k_c, (b,), minval=max(0.0, 1 - contrast),
                            maxval=1 + contrast)
    sigma = jax.random.uniform(k_s, (b,), minval=sigma_range[0],
                               maxval=sigma_range[1])
    kernels = _gauss_kernel5(sigma)

    def one(img, bf_i, cf_i, kern):
        img = jnp.clip(img * bf_i, 0.0, 1.0)
        mean = img.mean()
        img = jnp.clip(mean + cf_i * (img - mean), 0.0, 1.0)
        return _sep_blur(img, kern)

    return jax.vmap(one)(images, bf, cf, kernels)


def crop_gray_normalize_flatten(images: jax.Array) -> jax.Array:
    """Top-third crop + (x - 0.5)/0.5 normalize + flatten: (B, H, W) ->
    (B, (H - H//3) * W)."""
    h = images.shape[1]
    cropped = images[:, h // 3:, :]
    normalized = (cropped - 0.5) / 0.5
    return normalized.reshape(images.shape[0], -1)
