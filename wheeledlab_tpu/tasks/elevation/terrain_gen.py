"""Procedural elevation terrain — replaces the reference's
`huge_compact.usd` heightfield (absent from the mirror,
reference .MISSING_LARGE_BLOBS; used at mushr_elevation_env_cfg.py:95-108).

Keyed, deterministic generation (SURVEY.md §3.3 design note: no import-time
side effects): a field of smooth Gaussian mounds/ramps on a flat base, with
slope capped so a MuSHR-class car can climb (the task rewards gaining
elevation, mushr_elevation_env_cfg.py:166-173)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...sim.terrain import Heightfield


def generate_elevation_terrain(
    key: jax.Array,
    extent: float = 44.0,        # meters per side (goals sampled over +-19)
    cell: float = 0.25,
    num_mounds: int = 60,
    height_range: tuple = (0.2, 0.9),
    radius_range: tuple = (1.5, 4.0),
    friction: float = 1.0,
) -> Heightfield:
    n = int(round(extent / cell)) + 1
    k_pos, k_h, k_r = jax.random.split(key, 3)
    centers = jax.random.uniform(
        k_pos, (num_mounds, 2), minval=-extent / 2 * 0.9,
        maxval=extent / 2 * 0.9)
    heights = jax.random.uniform(
        k_h, (num_mounds,), minval=height_range[0], maxval=height_range[1])
    radii = jax.random.uniform(
        k_r, (num_mounds,), minval=radius_range[0], maxval=radius_range[1])
    # cap slope: max gradient of h*exp(-d^2/2r^2) is ~0.61 h/r; keep < 0.35
    heights = jnp.minimum(heights, 0.55 * radii)

    axis = (jnp.arange(n, dtype=jnp.float32) - (n - 1) / 2.0) * cell
    gx, gy = jnp.meshgrid(axis, axis, indexing="ij")
    d2 = ((gx[None] - centers[:, 0, None, None]) ** 2
          + (gy[None] - centers[:, 1, None, None]) ** 2)
    mounds = heights[:, None, None] * jnp.exp(
        -d2 / (2.0 * radii[:, None, None] ** 2))
    height = jnp.max(mounds, axis=0)  # max-combine keeps mound shapes crisp
    # host leaves: the heightfield is captured by jitted closures and must
    # embed as an HLO literal, not a device buffer (see utils/host.py)
    import numpy as np
    return Heightfield(height=np.asarray(height, np.float32),
                       cell=np.float32(cell), friction=np.float32(friction))
