#!/usr/bin/env python
"""Physics micro-benchmark — the reproducible producer of the
docs/ARCHITECTURE.md "Measured" perf rows.

Benches three layers of the drift stack at 16k envs (the bench.py scale):

  raw_physics_xla   jit(dynamics.step) alone (decimation scan, flat ground)
  env_step_xla      full fused env step, use_pallas="off"
  env_step_pallas   full fused env step, use_pallas="on" (TPU only)

Prints one JSON line per row: {"metric", "value", "unit"}. Uses the same
dispatch-proof methodology as bench.py: auto-scaled repeat count until the
timed window is >= 1 s, anchored by `jax.device_get` of a scalar that
data-depends on every iteration — per-dispatch round trips are amortized and
the clock cannot stop before execution finishes.

    python scripts/physics_bench.py [--num-envs 16384] [--rollout 128]
"""

import argparse
import json
import math
import os
import sys
import time

# runnable as `python scripts/physics_bench.py` without installing the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

MIN_WALL = 1.0
MAX_ITERS = 8192


def bench(fn, state, key, min_wall=MIN_WALL):
    """Anchored auto-scaling timer; returns wall seconds PER ITERATION.

    Warms up TWICE (the second call with rollout-output layouts can trigger
    one relayout recompile) and never accepts a window of fewer than
    MIN_ITERS calls — a single-call window can publish a one-time cost as
    the steady rate (see bench.py::measure)."""
    MIN_ITERS = 4
    state2, r = fn(state, jax.random.PRNGKey(1))   # compile + warmup
    float(jax.device_get(r))
    state2, r = fn(state2, jax.random.PRNGKey(2))  # relayout-recompile warmup
    float(jax.device_get(r))
    iters = 1
    while True:
        t0 = time.perf_counter()
        s = state
        for i in range(iters):
            s, r = fn(s, jax.random.fold_in(key, i))
        float(jax.device_get(r))  # forces real execution to finish
        wall = time.perf_counter() - t0
        if (wall >= min_wall and iters >= MIN_ITERS) or iters >= MAX_ITERS:
            return wall / iters
        grow = max(2.0, min_wall * 1.25 / max(wall, 1e-9))
        iters = min(MAX_ITERS, max(MIN_ITERS, int(math.ceil(iters * grow))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-envs", type=int, default=16384)
    p.add_argument("--rollout", type=int, default=128)
    p.add_argument("--min-wall", type=float, default=MIN_WALL,
                   help="minimum timed-window seconds per measurement")
    args = p.parse_args()

    from wheeledlab_tpu.sim import dynamics
    from wheeledlab_tpu.tasks import make_env
    from wheeledlab_tpu.tasks.drift.task import DriftTaskCfg, make_drift_env
    from wheeledlab_tpu.utils.rng import enable_fast_prng

    enable_fast_prng()
    n, T = args.num_envs, args.rollout
    steps = n * T  # per timed iteration
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
                                               args.min_wall)

    # --- SoA physics: packed-row substep loop, XLA path (sim/soa.py) ------
    from wheeledlab_tpu.sim.soa import pack_params, pack_state, substep_soa

    packed0 = pack_state(veh)
    pp = pack_params(params, terrain.friction)

    @jax.jit
    def soa_rollout(m, key):
        steer = jnp.zeros((2, n))
        wheel = jnp.full((4, n), 20.0)

        def body(s, _):
            for _ in range(dec):
                s = substep_soa(s, pp, steer, wheel, dt)
            return s, s[7].sum()   # LINVEL x-row: forces execution

        m, fs = jax.lax.scan(body, m, None, length=T)
        return m, fs.sum()

    results["physics_soa_xla"] = steps / bench(soa_rollout, packed0,
                                               jax.random.PRNGKey(4),
                                               args.min_wall)

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

    # pallas mode mirrors the env's auto guard (envs/env.py): TPU only and
    # num_envs must be lane-aligned (% 128 == 0)
    pallas_ok = on_tpu and n % 128 == 0
    if on_tpu and not pallas_ok:
        print(f"# skipping env_step_pallas: num_envs={n} not a multiple "
              "of 128 (lane alignment)", file=sys.stderr)
    for mode in (("off", "on") if pallas_ok else ("off",)):
        cfg = DriftTaskCfg(num_envs=n)
        e = make_drift_env(cfg)
        e._use_pallas = (mode == "on")
        s0, _ = jax.jit(e.reset)(jax.random.PRNGKey(0))
        key = f"env_step_{'pallas' if mode == 'on' else 'xla'}"
        results[key] = steps / bench(env_rollout(e), s0,
                                     jax.random.PRNGKey(3), args.min_wall)

    for k, v in results.items():
        print(json.dumps({"metric": k, "value": round(v, 1),
                          "unit": "env-steps/s"}))


if __name__ == "__main__":
    main()
