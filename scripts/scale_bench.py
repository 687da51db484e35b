#!/usr/bin/env python
"""Multi-chip / multi-host scaling benchmark for the drift env + PPO.

Single host:      python scripts/scale_bench.py --num-envs 65536
Pod slice (one process per host, standard TPU launch):
                  python scripts/scale_bench.py --distributed

Envs shard over the `data` mesh axis (physics has zero collectives — each
chip steps its local shard independently); the PPO update all-reduces
gradients over ICI. Reports aggregate env-steps/s and per-chip rate, the
BASELINE.json linear-scaling metric.
"""

import argparse
import json
import os
import sys
import time

import jax

# runnable as `python scripts/scale_bench.py` without installing the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-envs", type=int, default=65536)
    p.add_argument("--rollout", type=int, default=128)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--distributed", action="store_true")
    p.add_argument("--full-ppo", action="store_true",
                   help="benchmark the full train iteration, not just rollout")
    args = p.parse_args()

    from wheeledlab_tpu.parallel import distributed, shard_train_state
    from wheeledlab_tpu.parallel.mesh import make_mesh, shard_batched_pytree
    from wheeledlab_tpu.rl.ppo import PPOCfg, make_ppo
    from wheeledlab_tpu.tasks import make_env

    if args.distributed:
        distributed.initialize()
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    num_envs = (args.num_envs // (n_dev * 128)) * n_dev * 128 or n_dev * 128

    env = make_env("MushrDriftRL-v0", num_envs=num_envs)

    if args.full_ppo:
        init_fn, train_iter, _ = make_ppo(env, PPOCfg())
        state = jax.jit(init_fn)(jax.random.PRNGKey(0))
        state = shard_train_state(state, mesh, num_envs)
        with jax.sharding.set_mesh(mesh):
            fn = jax.jit(train_iter, donate_argnums=(0,))
            state, m = fn(state)
            jax.block_until_ready(m["loss/total"])
            t0 = time.time()
            for _ in range(args.iters):
                state, m = fn(state)
            jax.block_until_ready(m["loss/total"])
        steps = num_envs * 128 * args.iters
    else:
        import jax.numpy as jnp

        state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
        state = shard_batched_pytree(state, mesh, num_envs)
        action = jax.device_put(
            jnp.zeros((num_envs, 2)),
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")))

        def rollout(s):
            def body(x, _):
                x, out = env.step(x, action)
                return x, out.reward.sum()
            return jax.lax.scan(body, s, None, length=args.rollout)

        with jax.sharding.set_mesh(mesh):
            fn = jax.jit(rollout, donate_argnums=(0,))
            state, r = fn(state)
            jax.block_until_ready(r)
            t0 = time.time()
            for _ in range(args.iters):
                state, r = fn(state)
            jax.block_until_ready(r)
        steps = num_envs * args.rollout * args.iters

    dt = time.time() - t0
    if jax.process_index() == 0:
        print(json.dumps({
            "devices": n_dev,
            "hosts": jax.process_count(),
            "num_envs": num_envs,
            "mode": "full_ppo" if args.full_ppo else "rollout",
            "aggregate_env_steps_per_s": round(steps / dt, 1),
            "per_chip_env_steps_per_s": round(steps / dt / n_dev, 1),
        }))


if __name__ == "__main__":
    main()
