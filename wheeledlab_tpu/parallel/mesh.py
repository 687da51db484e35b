"""Device mesh + sharding for pod-scale training (SURVEY.md §2c, §5
"distributed communication backend").

Design (scaling-book recipe): one mesh axis `data`; env-state pytrees are
sharded over it (envs are embarrassingly parallel — the physics step has ZERO
collectives), learner params are replicated, and GSPMD inserts the gradient
`psum` over ICI during the PPO update. A second optional `model` axis is
plumbed through for TP of large policies (off by default — the reference
policy is a [64,64] MLP; SURVEY.md §2c TP row).

The reference has no distributed story at all (single cuda:0,
reference configs/common_cfg.py:46); this module is the new capability the
BASELINE.json north star requires.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(num_devices: Optional[int] = None, model_parallel: int = 1) -> Mesh:
    devices = jax.devices()
    n = num_devices or len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model={model_parallel}")
    arr = np.asarray(devices[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (env batch) axis over `data`."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


_MAX_EVENT_ROWS = 8   # (n_push, B) event-timer stacks; tasks define at most
                      # a couple of push events — 8 leaves headroom


def _is_lane_major(shape, batch_size: int) -> bool:
    """Is `shape` one of the known lane-major (rows, B) row matrices —
    the packed vehicle state / params caches or a small per-event stack?"""
    from ..sim.soa import NUM_PARAM, NUM_STATE

    return (len(shape) == 2 and shape[-1] == batch_size
            and (shape[0] in (NUM_STATE, NUM_PARAM)
                 or shape[0] <= _MAX_EVENT_ROWS))


def shard_batched_pytree(tree, mesh: Mesh, batch_size: int):
    """Place every leaf whose leading dim == batch_size on the data axis;
    leaves whose TRAILING dim is the batch (lane-major row matrices like the
    packed (NUM_PARAM, B) params cache or (n_push, B) push timers) shard
    that axis instead; everything else (scalars, global counters) replicates.

    Trailing-dim sharding is opt-in by recognized leading-dim row count
    (`_is_lane_major`): a future non-batch 2D array whose last dim
    coincidentally equals num_envs must not be silently mis-sharded. The
    converse hazard — a NEW lane-major matrix silently replicating — fails
    loudly instead: any unrecognized (rows, B) shape raises a warning so
    the row-count table gets extended rather than quietly resharding every
    step."""
    data = batch_sharding(mesh)
    repl = replicated(mesh)

    def place(x):
        if not hasattr(x, "shape") or x.ndim < 1:
            return jax.device_put(x, repl)
        if x.shape[0] == batch_size:
            return jax.device_put(x, data)
        if _is_lane_major(x.shape, batch_size):
            return jax.device_put(
                x, NamedSharding(mesh, P(None, DATA_AXIS)))
        if x.ndim == 2 and x.shape[-1] == batch_size:
            import warnings

            warnings.warn(
                f"shard_batched_pytree: replicating ambiguous {x.shape} "
                "array whose trailing dim equals the env batch — if this "
                "is a lane-major per-env matrix, extend "
                "parallel/mesh.py::_is_lane_major")
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(place, tree)


def shard_train_state(train_state, mesh: Mesh, num_envs: int):
    """Canonical placement for a PPO TrainState: env batch over `data`,
    params/opt replicated. GSPMD then derives: rollout fully local per shard;
    minibatch gradients all-reduced over ICI.

    Every field other than params/opt_state goes through
    `shard_batched_pytree`, so ANY learner-specific per-env carry (the
    recurrent learner's `hidden` LSTM carries and `reset_prev` done flags,
    or future fields) lands on the data axis — in a real multi-process job a
    host-local array fed into a jit over the global mesh is non-addressable,
    so missing even one [B] field fails at dispatch (exercised by
    tests/_distributed_worker.py with the recurrent learner)."""
    repl = replicated(mesh)
    placed = {
        name: shard_batched_pytree(getattr(train_state, name), mesh, num_envs)
        for name in train_state.__dataclass_fields__
        if name not in ("params", "opt_state")
    }
    return train_state.replace(
        params=jax.device_put(train_state.params, repl),
        opt_state=jax.device_put(train_state.opt_state, repl),
        **placed,
    )


def shard_params_model_parallel(params, mesh: Mesh):
    """Tensor-parallel placement for policy params: Dense kernels shard their
    output dim over `model`, biases likewise; everything else replicates.
    Off by default (the reference policy is a [64, 64] MLP — SURVEY.md §2c),
    but large swapped-in policies (see rl/networks.py docstring) get TP by
    passing the placed params into the same jitted step: GSPMD inserts the
    activation collectives."""

    m = mesh.shape[MODEL_AXIS]

    def place(path, x):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if x.ndim == 2 and "kernel" in names and x.shape[1] % m == 0:
            return jax.device_put(x, NamedSharding(mesh, P(None, MODEL_AXIS)))
        if x.ndim == 1 and "bias" in names and x.shape[0] % m == 0:
            return jax.device_put(x, NamedSharding(mesh, P(MODEL_AXIS)))
        return jax.device_put(x, replicated(mesh))

    return jax.tree_util.tree_map_with_path(place, params)


def ambient_data_shards() -> int:
    """Size of the ambient `data` mesh axis (1 when no mesh context).

    A `pallas_call` has no GSPMD partitioning rule, so under a data mesh a
    kernel invocation must be explicitly shard-mapped — each device runs it
    on its local (rows, B/D) block (envs are independent, so the mapping is
    communication-free). Used by envs/env.py and tasks/drift/fused.py."""
    am = jax.sharding.get_abstract_mesh()
    try:
        return int(am.shape.get(DATA_AXIS, 1)) if am is not None else 1
    except Exception:
        return 1


def constrain_batch(x, mesh: Mesh):
    """with_sharding_constraint on the leading env axis — used inside jitted
    code to pin intermediate layouts."""
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(DATA_AXIS)))
