"""WheeledLab-TPU: TPU-native wheeled-robot RL (capabilities of
UWRobotLearning/WheeledLab, built from scratch on JAX/XLA/Pallas/pjit)."""

import os as _os

__version__ = "0.1.0"


def _enable_compilation_cache():
    """Persistent XLA compilation cache: repeated launches of the same
    train/bench programs skip recompilation (the remote-compile tunnel on
    this hardware makes cold compiles expensive)."""
    try:
        import jax

        cache_dir = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache",
                          "wheeledlab_tpu", "xla"))
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()
