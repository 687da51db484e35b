#!/usr/bin/env python
"""Headline benchmark: drift-task env throughput (env-steps/s per chip,
16k envs) — the BASELINE.json metric.

Baseline: the reference's implied single-GPU throughput is ~90k env-steps/s
(655M env-steps in "a couple hours", BASELINE.md). vs_baseline is the speedup
over that number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

`bench.py --train [...]` instead runs the train-to-return benchmark
(scripts/train_bench.py — wall-clock for RSS_DRIFT to reach a target return;
the BASELINE.json "<10 min" north star), forwarding remaining args.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    from wheeledlab_tpu.tasks import make_env
    from wheeledlab_tpu.utils.rng import enable_fast_prng

    enable_fast_prng()

    num_envs = 16384
    rollout_len = 128
    env = make_env("MushrDriftRL-v0", num_envs=num_envs)

    key = jax.random.PRNGKey(0)
    state, _ = jax.jit(env.reset)(key)

    @jax.jit
    def rollout(state, key):
        def body(carry, k):
            s = carry
            action = jax.random.uniform(k, (num_envs, 2), minval=-1.0, maxval=1.0)
            s, out = env.step(s, action)
            return s, out.reward.sum()

        keys = jax.random.split(key, rollout_len)
        state, rews = jax.lax.scan(body, state, keys)
        return state, rews.sum()

    # warmup/compile
    state, r = rollout(state, jax.random.PRNGKey(1))
    jax.block_until_ready(r)

    iters = 5
    t0 = time.time()
    for i in range(iters):
        state, r = rollout(state, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(r)
    dt = time.time() - t0

    steps_per_s = num_envs * rollout_len * iters / dt
    baseline = 90_000.0  # reference implied steps/s on one GPU (BASELINE.md)
    print(json.dumps({
        "metric": "drift_env_steps_per_s_per_chip",
        "value": round(steps_per_s, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_s / baseline, 2),
    }))


if __name__ == "__main__":
    if "--train" in sys.argv:
        import os

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "scripts"))
        import train_bench

        argv = [a for a in sys.argv[1:] if a != "--train"]
        train_bench.main(argv)
    else:
        main()
