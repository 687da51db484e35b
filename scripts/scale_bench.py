#!/usr/bin/env python
"""Multi-chip / multi-host scaling benchmark for the drift env + PPO —
the BASELINE.json "linear host scaling" metric.

Weak scaling: envs-per-device held fixed, the env batch shards over the
`data` mesh axis (physics has zero collectives — each chip steps its local
shard independently); the PPO update all-reduces gradients over ICI.
Reports aggregate env-steps/s and per-chip rate.

Measurement methodology matches bench.py (dispatch-proof): auto-scaled
repeat count to a >= min-wall timed window, anchored by `jax.device_get`
of a scalar that data-depends on every iteration.

Single host / virtual mesh ladder (the committed docs/runs/scale_r03
artifact; conftest-style 8-device CPU mesh):
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scale_bench.py --devices 1  # then 2, 4, 8
Pod slice (one process per host, standard TPU launch):
    python scripts/scale_bench.py --distributed
"""

import argparse
import json
import math
import os
import sys
import time

# runnable as `python scripts/scale_bench.py` without installing the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

MAX_ITERS = 8192


def measure(fn, state, steps_per_iter: int, min_wall: float):
    """Anchored auto-scaling timing; returns (steps_per_s, wall, iters).
    Never accepts a window of fewer than MIN_ITERS calls (a 1-call window
    can publish a one-time recompile as the steady rate — bench.py)."""
    MIN_ITERS = 4
    iters = 1
    while True:
        t0 = time.perf_counter()
        s = state
        for _ in range(iters):
            s, r = fn(s)
        anchor = float(jax.device_get(r))  # forces execution to finish
        assert math.isfinite(anchor), "non-finite result in scaling bench"
        wall = time.perf_counter() - t0
        if (wall >= min_wall and iters >= MIN_ITERS) or iters >= MAX_ITERS:
            return steps_per_iter * iters / wall, wall, iters
        grow = max(2.0, min_wall * 1.25 / max(wall, 1e-9))
        iters = min(MAX_ITERS, max(MIN_ITERS, int(math.ceil(iters * grow))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="MushrDriftRL-v0",
                   help="registered task id (per-chip envelopes for the "
                        "other task families, e.g. MushrElevationRL-v0 / "
                        "MushrVisualRL-v0)")
    p.add_argument("--devices", type=int, default=None,
                   help="mesh size (default: every visible device)")
    p.add_argument("--envs-per-device", type=int, default=2048)
    p.add_argument("--rollout", type=int, default=32)
    p.add_argument("--min-wall", type=float, default=1.0)
    p.add_argument("--distributed", action="store_true")
    p.add_argument("--full-ppo", action="store_true",
                   help="benchmark the full train iteration, not just rollout")
    p.add_argument("--fuse-input-layer", action="store_true",
                   help="fused actor+critic first-layer matmul (the update-"
                        "efficiency lever for the pod envelope sweep)")
    p.add_argument("--out", default=None, help="also write the JSON line here")
    args = p.parse_args()
    if args.fuse_input_layer and not args.full_ppo:
        p.error("--fuse-input-layer only affects the PPO update; "
                "pass --full-ppo with it")

    from wheeledlab_tpu.parallel import distributed, shard_train_state
    from wheeledlab_tpu.parallel.mesh import make_mesh, shard_batched_pytree
    from wheeledlab_tpu.rl.ppo import PPOCfg, make_ppo
    from wheeledlab_tpu.tasks import make_env

    if args.distributed:
        distributed.initialize()
    n_dev = args.devices or len(jax.devices())
    mesh = make_mesh(n_dev)
    num_envs = n_dev * args.envs_per_device

    env = make_env(args.task, num_envs=num_envs)

    with jax.sharding.set_mesh(mesh):
        if args.full_ppo:
            cfg = PPOCfg(num_steps_per_env=args.rollout,
                         fuse_input_layer=args.fuse_input_layer)
            # mesh -> shard-local minibatch shuffle (no dataset all-to-all)
            init_fn, train_iter, _ = make_ppo(env, cfg, mesh=mesh)
            state = jax.jit(init_fn)(jax.random.PRNGKey(0))
            state = shard_train_state(state, mesh, num_envs)
            fn_jit = jax.jit(train_iter)

            def fn(s):
                s, m = fn_jit(s)
                return s, m["loss/total"]
        else:
            import jax.numpy as jnp

            state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
            state = shard_batched_pytree(state, mesh, num_envs)
            action = jax.device_put(
                jnp.zeros((num_envs, env.action_dim)),
                jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec("data")))

            def rollout(s):
                # keep the per-step output SHARDED (B,) — a scalar here would
                # force a cross-device all-reduce on every scan step; the
                # single reduction after the scan anchors the timing instead
                def body(x, _):
                    x, out = env.step(x, action)
                    return x, out.reward
                s, rews = jax.lax.scan(body, s, None, length=args.rollout)
                return s, rews.sum()

            fn = jax.jit(rollout)

        # compile + warmup (anchored). Two chained calls: the second sees
        # the GSPMD-derived output shardings as its inputs, which can differ
        # from the initial device_put placement and trigger one more compile
        # — that must not land in the timed window.
        s, r = fn(state)
        float(jax.device_get(r))
        s, r = fn(s)
        float(jax.device_get(r))
        steps_per_iter = num_envs * args.rollout
        rate, wall, iters = measure(fn, s, steps_per_iter, args.min_wall)

    if jax.process_index() == 0:
        row = {
            "task": args.task,
            "devices": n_dev,
            "hosts": jax.process_count(),
            "num_envs": num_envs,
            "envs_per_device": args.envs_per_device,
            "mode": "full_ppo" if args.full_ppo else "rollout",
            "rollout": args.rollout,
            "platform": jax.devices()[0].platform,
            "aggregate_env_steps_per_s": round(rate, 1),
            "per_chip_env_steps_per_s": round(rate / n_dev, 1),
            "wall_s": round(wall, 3),
            "timed_iters": iters,
        }
        line = json.dumps(row)
        print(line)
        if args.out:
            os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
            with open(args.out, "w") as f:
                f.write(line + "\n")


if __name__ == "__main__":
    main()
