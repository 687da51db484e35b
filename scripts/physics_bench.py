#!/usr/bin/env python
"""Physics micro-benchmark — the reproducible producer of the
docs/ARCHITECTURE.md "Measured" perf rows.

Benches three layers of the drift stack at 16k envs (the bench.py scale):

  raw_physics_xla   jit(dynamics.step) alone (decimation scan, flat ground)
  env_step_xla      full fused env step, use_pallas="off"
  env_step_pallas   full fused env step, use_pallas="on" (TPU only)

Prints one JSON line per row: {"metric", "value", "unit"}. Wall numbers
include the per-call dispatch round trip, so on a remote-tunnel backend the
absolute values move with link conditions — compare rows within one run.

    python scripts/physics_bench.py [--num-envs 16384] [--rollout 128]
"""

import argparse
import json
import os
import sys
import time

# runnable as `python scripts/physics_bench.py` without installing the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench(fn, state, key, iters=5):
    state2, r = fn(state, jax.random.PRNGKey(1))   # compile + warmup
    jax.block_until_ready(r)
    t0 = time.time()
    for i in range(iters):
        state2, r = fn(state2, jax.random.fold_in(key, i))
    jax.block_until_ready(r)
    return time.time() - t0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-envs", type=int, default=16384)
    p.add_argument("--rollout", type=int, default=128)
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    from wheeledlab_tpu.sim import dynamics
    from wheeledlab_tpu.tasks import make_env
    from wheeledlab_tpu.tasks.drift.task import DriftTaskCfg, make_drift_env
    from wheeledlab_tpu.utils.rng import enable_fast_prng

    enable_fast_prng()
    n, T = args.num_envs, args.rollout
    steps = n * T * args.iters
    on_tpu = jax.devices()[0].platform != "cpu"

    results = {}

    # --- raw physics: decimation-scanned dynamics.step, XLA path ----------
    env = make_env("MushrDriftRL-v0", num_envs=n)
    task = env.task
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    veh, params, terrain = state.vehicle, state.params, task.terrain
    dt, dec = task.cfg.sim_dt, task.cfg.decimation

    vstep = jax.vmap(dynamics.step,
                     in_axes=(0, 0, None, 0, 0, None, None))

    @jax.jit
    def physics_rollout(v, key):
        steer = jnp.zeros((n, 2))
        wheel = jnp.full((n, 4), 20.0)

        def body(s, _):
            s, aux = vstep(s, params, terrain, steer, wheel, dt, dec)
            return s, aux.normal_force.sum()

        v, fs = jax.lax.scan(body, v, None, length=T)
        return v, fs.sum()

    results["raw_physics_xla"] = steps / bench(physics_rollout, veh,
                                               jax.random.PRNGKey(2),
                                               args.iters)

    # --- full env step, both backends -------------------------------------
    def env_rollout(e):
        @jax.jit
        def roll(s, key):
            def body(carry, k):
                s = carry
                a = jax.random.uniform(k, (n, 2), minval=-1.0, maxval=1.0)
                s, out = e.step(s, a)
                return s, out.reward.sum()

            keys = jax.random.split(key, T)
            s, rews = jax.lax.scan(body, s, keys)
            return s, rews.sum()

        return roll

    for mode in (("off",) if not on_tpu else ("off", "on")):
        cfg = DriftTaskCfg(num_envs=n)
        e = make_drift_env(cfg)
        e._use_pallas = (mode == "on")
        s0, _ = jax.jit(e.reset)(jax.random.PRNGKey(0))
        key = f"env_step_{'pallas' if mode == 'on' else 'xla'}"
        results[key] = steps / bench(env_rollout(e), s0,
                                     jax.random.PRNGKey(3), args.iters)

    for k, v in results.items():
        print(json.dumps({"metric": k, "value": round(v, 1),
                          "unit": "env-steps/s"}))


if __name__ == "__main__":
    main()
