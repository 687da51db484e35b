"""Multi-host launch — the distributed backend the reference never had
(SURVEY.md §5: single process, single cuda:0; new capability per the
BASELINE.json north star).

Usage on a TPU pod slice (one process per host):

    from wheeledlab_tpu.parallel import distributed
    distributed.initialize()               # jax.distributed under the hood
    mesh = distributed.global_mesh()       # data axis over ALL chips
    # env batch must be divisible by jax.device_count(); each host steps its
    # local shard — the physics has zero collectives (tests/test_sharding.py),
    # so multi-host stepping is communication-free; PPO grads psum over ICI.

Process-local code is identical to single-host: `shard_train_state` places
the global batch, jit + GSPMD handle the rest. Checkpointing via orbax is
multi-host-safe (each host writes its shards).
"""

from __future__ import annotations

from typing import Optional

import jax

from .mesh import make_mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with TPU auto-detection (on Cloud TPU all
    arguments are discovered from the metadata environment).

    With explicit arguments this is STRICT — a failure to reach the
    coordinator or rendezvous raises (a silently non-distributed process in
    a multi-host job corrupts the run). Only the zero-argument auto-detect
    form falls back to single-process (local runs, tests). Exercised for
    real by tests/test_distributed.py (2 CPU processes, 127.0.0.1
    coordinator, 4 virtual devices each)."""
    if jax.distributed.is_initialized():
        return  # already initialized
    # NOTE: do not touch jax.process_count()/jax.devices() here — they would
    # initialize the XLA backend, after which jax.distributed.initialize
    # refuses to run (and the job would silently be single-process).
    if coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return
    try:
        jax.distributed.initialize()
    except (ValueError, RuntimeError):
        # single-process fallback (local runs, tests)
        pass


def global_mesh(model_parallel: int = 1):
    """Mesh over every chip in the job (all hosts)."""
    return make_mesh(len(jax.devices()), model_parallel=model_parallel)


def is_main_process() -> bool:
    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> slice:
    """The slice of the global env batch owned by this host (for host-side
    IO like video rendering of local envs)."""
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
