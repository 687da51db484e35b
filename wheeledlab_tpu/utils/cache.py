"""Persistent XLA compilation cache.

The fused train iteration / env step are large XLA programs; cold-compiling
them dominates short-run wall clock (measured: ~190 s of a 253 s full
RSS_DRIFT run was compilation). The persistent cache makes every process
after the first load compiled executables from disk, the same way production
training jobs are launched with warm caches. The reference has no equivalent
concern — IsaacSim's multi-minute kit startup is its analogue.

Opt-in (``TrainCfg.compilation_cache`` / calling this directly) because the
right choice is backend-dependent: on a local TPU host the cache turns the
~190 s cold compile into a ~1 s disk load, but over a remote-tunnel backend
(device server on the far side of a network link) the serialized executables
(tens of MB per program) must cross the link on every load and the cache can
cost far more than it saves — measured 9.6 min for a 20-iteration run that
cold-compiles in ~3 min over the same tunnel.
"""

from __future__ import annotations

import os

_ENABLED = False


def resolve_cache_mode(mode) -> bool:
    """TrainCfg.compilation_cache -> bool. "auto" (the default) enables the
    cache except over the axon remote-tunnel backend, where loading the
    serialized executables across the link is a measured net loss (module
    docstring). CLI override strings ("on"/"off"/"true"/"false"/"auto") are
    accepted."""
    if isinstance(mode, str):
        m = mode.lower()
        if m == "auto":
            # remote-tunnel detection: the axon device server advertises
            # itself via this env var; a local TPU host never sets it
            return os.environ.get("PALLAS_AXON_POOL_IPS") is None
        return m in ("1", "true", "yes", "on")
    return bool(mode)


def enable_compilation_cache(path: str | None = None,
                             min_compile_secs: float = 1.0) -> str:
    """Idempotently point JAX at an on-disk compilation cache.

    Default location honors ``WHEELEDLAB_CACHE_DIR`` then falls back to
    ``~/.cache/wheeledlab_tpu/xla``. Only programs that took longer than
    `min_compile_secs` to compile are written, so unit-test-sized CPU
    programs don't churn the directory.
    """
    global _ENABLED
    import jax

    path = (path or os.environ.get("WHEELEDLAB_CACHE_DIR")
            or os.path.join(os.path.expanduser("~"), ".cache",
                            "wheeledlab_tpu", "xla"))
    if _ENABLED:
        return path
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    _ENABLED = True
    return path
