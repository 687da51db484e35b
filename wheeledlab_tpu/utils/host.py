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

import jax
import numpy as np


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
