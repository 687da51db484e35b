"""PRNG implementation selection.

The env runtime draws ~15 per-step random vectors (action noise, DR pushes,
reset spawns, observation corruption). JAX's default threefry2x32 PRNG is
counter-based bit arithmetic — correct everywhere but expensive on the TPU
VPU. XLA:TPU has a hardware-accelerated RngBitGenerator path (`rbg`), which
keeps identical statistical quality for simulation purposes and measures
~20% faster end-to-end on the drift bench (16k envs, v5e).

`enable_fast_prng()` flips the *default* PRNG impl to `rbg` when running on
an accelerator, so plain `jax.random.PRNGKey(seed)` raw keys — which orbax
checkpoints as ordinary uint32 arrays — pick it up with no other code
changes. CPU (the hermetic test mesh, tests/conftest.py) keeps threefry so
golden-trajectory tests stay bit-stable.

No reference equivalent: the reference inherits torch's Philox generator and
never touches it (SURVEY.md §5 has no RNG subsystem row).
"""

from __future__ import annotations

import jax

_DONE = False


def enable_fast_prng(force: bool = False) -> bool:
    """Switch the default PRNG impl to TPU-accelerated `rbg`.

    Returns True iff the switch happened. No-op on cpu/gpu backends unless
    `force` (rbg draws differ across backends/XLA versions, so CPU tests and
    goldens keep the deterministic threefry default). Call this BEFORE
    creating any raw PRNGKey — raw keys are interpreted under the impl that
    is current when they are *used*, and threefry/rbg key shapes differ.
    """
    global _DONE
    if not force and jax.default_backend() in ("cpu", "gpu"):
        return False
    jax.config.update("jax_default_prng_impl", "rbg")
    _DONE = True
    return True
