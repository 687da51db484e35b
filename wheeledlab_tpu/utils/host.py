"""Host-constant hygiene for build-time arrays.

Any array a task builder precomputes (asset params, track poses, terrain
textures, patch atlases, color maps) ends up CAPTURED BY CLOSURE in the jitted
step/reset functions. If those leaves are committed device arrays, every
compiled executable carries captured device buffers — and on some runtimes
(measured on the axon-tunneled TPU backend) the first execution of such a
program permanently downgrades dispatch for the whole process (~+4 ms per
execute call, process-wide, not recoverable by `jax.clear_caches`). Numpy
leaves instead embed as HLO literal constants: same compiled code, no captured
buffers, no downgrade — and they also keep task construction off-device
entirely (no eager transfers at import/build time).

Rule of thumb enforced here: **builders return numpy; jit traces convert.**
"""

from __future__ import annotations

import contextlib

import jax
import numpy as np


@contextlib.contextmanager
def host_build():
    """Pin build-time eager array math to the local CPU backend.

    Task builders run a few dozen small eager jnp/jax.random ops (track
    poses, terrain mounds, DR tables). On a remote-tunnel accelerator
    backend each eager op is a network round trip + tiny-program compile —
    measured up to ~300 s for one `make_env` on a congested link, vs
    milliseconds on the local CPU. Values are platform-invariant for the
    default threefry PRNG, and every builder output goes through
    `host_const` anyway, so where the math ran leaves no trace in the
    compiled step functions.
    """
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:          # no CPU backend registered: run as-is
        yield
        return
    with jax.default_device(cpu):
        yield


def host_build_fn(fn):
    """Decorator form of `host_build` for task-builder functions."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with host_build():
            return fn(*args, **kwargs)

    return wrapped


def host_const(tree):
    """Convert every array leaf of a pytree to a host `np.ndarray`.

    Use on any pytree a task builder precomputes and closes over (terrain,
    atlases, reference poses, asset params). No-op on numpy/scalar leaves.
    """
    def to_host(x):
        if isinstance(x, (jax.Array, np.ndarray)):
            return np.asarray(x)
        return x

    return jax.tree_util.tree_map(to_host, tree)
