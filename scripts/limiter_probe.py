#!/usr/bin/env python
"""Limiter probe for the fused drift kernel (VERDICT r4 #8): is the
315M env-steps/s headline bounded by VPU issue rate, by per-step dispatch,
or by the per-step HBM state round-trip?

Experiment: a K-STEP variant of the fused whole-step kernel — the control
step runs K times inside ONE `pallas_call` via `fori_loop`, slicing each
step's action/uniform/normal rows from stacked inputs, with the vehicle
state, params, timers and episode accumulators never leaving VMEM between
control steps. K=1 is the production kernel shape (sanity row). Per-step
observation rows are not written back for intermediate steps (they are
consumed by the policy between steps in real training, so K>1 is NOT a
drop-in training configuration — it is the measurement that separates
"cost of the physics/epilogue math" from "cost of being called once per
control step"). If the K=8 per-step time barely drops, the kernel is
VPU-issue-rate-bound and the headline number is near its speed of light
for this physics; if it drops a lot, per-step dispatch/HBM is the limiter
and a multi-step rollout layout is the next optimization.

Outputs one JSON line per K. Inputs are FIXED device arrays reused every
call (state chains through all calls, so execution is forced; RNG block
generation is excluded from all rows equally — methodology as bench.py).
"""

import functools
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from wheeledlab_tpu.tasks.drift.fused import (
    NUM_OUT, NUM_UNIFORM, OBS_ROWS, FusedDriftConsts, drift_step_rows,
)
from wheeledlab_tpu.sim.soa import NUM_PARAM, NUM_STATE

try:
    from jax.experimental.pallas import tpu as pltpu

    _VMEM, _SMEM = pltpu.VMEM, pltpu.SMEM
except Exception:  # pragma: no cover
    _VMEM = _SMEM = None


def _multi_kernel(weights_ref, poses_ref, state_ref, params_ref, act_ref,
                  uni_ref, nrm_ref, step_ref, timers_ref, epret_ref,
                  eplen_ref, state_out, step_out, timers_out, epret_out,
                  eplen_out, *, cfg, k):
    params = params_ref[:]

    def body(i, carry):
        s, sc, tm, er, el = carry
        a = act_ref[pl.ds(i * 2, 2)]
        uni = uni_ref[pl.ds(i * NUM_UNIFORM, NUM_UNIFORM)]
        nrm = nrm_ref[pl.ds(i * OBS_ROWS, OBS_ROWS)]
        nsr, _obs, _out, sc, tm, er, el = drift_step_rows(
            s, params, a[0], a[1], uni, nrm,
            lambda j: weights_ref[0, j],
            lambda r, c: poses_ref[r, c], sc, tm, er, el, cfg=cfg)
        return (nsr, sc, tm, er, el)

    carry = (state_ref[:], step_ref[0], timers_ref[:], epret_ref[0],
             eplen_ref[0])
    s, sc, tm, er, el = jax.lax.fori_loop(0, k, body, carry)
    state_out[:] = s
    step_out[0] = sc
    timers_out[:] = tm
    epret_out[0] = er
    eplen_out[0] = el


@functools.partial(jax.jit, static_argnames=("cfg", "n_push", "k"))
def multi_step_pallas(weights_pad, poses, state, params, actions, uniforms,
                      normals, step_count, timers, ep_return, ep_len,
                      cfg: FusedDriftConsts, n_push: int, k: int):
    b = state.shape[1]
    lanes = b // 128
    sub = next(s for s in (16, 8, 4, 2, 1) if lanes % s == 0)
    grid = (lanes // sub,)
    shape3 = lambda rows: (rows, lanes, 128)
    block = lambda rows: (rows, sub, 128)

    def spec(rows):
        return pl.BlockSpec(
            block(rows), lambda i: (0, i, 0),
            **({} if _VMEM is None else {"memory_space": _VMEM}))

    def smem_spec(shape):
        return pl.BlockSpec(
            shape, lambda i: (0,) * len(shape),
            **({} if _SMEM is None else {"memory_space": _SMEM}))

    view = lambda x: x.reshape((x.shape[0],) + shape3(0)[1:])
    sds = jax.ShapeDtypeStruct
    outs = (
        sds(shape3(NUM_STATE), jnp.float32),
        sds(shape3(1), jnp.int32),
        sds(shape3(n_push), jnp.int32),
        sds(shape3(1), jnp.float32),
        sds(shape3(1), jnp.int32),
    )
    res = pl.pallas_call(
        functools.partial(_multi_kernel, cfg=cfg, k=k),
        grid=grid,
        in_specs=[smem_spec(weights_pad.shape), smem_spec(poses.shape),
                  spec(NUM_STATE), spec(NUM_PARAM), spec(2 * k),
                  spec(NUM_UNIFORM * k), spec(OBS_ROWS * k), spec(1),
                  spec(n_push), spec(1), spec(1)],
        out_specs=tuple(spec(o.shape[0]) for o in outs),
        out_shape=outs,
    )(weights_pad, poses, view(state), view(params), view(actions),
      view(uniforms), view(normals), view(step_count), view(timers),
      view(ep_return), view(ep_len))
    return tuple(x.reshape(x.shape[0], b) for x in res)


def main():
    num_envs = int(os.environ.get("PROBE_ENVS", 16384))
    from wheeledlab_tpu.envs.env import EnvCfg
    from wheeledlab_tpu.tasks.drift.task import (
        DriftTaskCfg, make_drift_env, reference_track_poses,
    )
    from wheeledlab_tpu.utils.rng import enable_fast_prng

    enable_fast_prng()
    task_cfg = DriftTaskCfg(num_envs=num_envs)
    env = make_drift_env(task_cfg)
    env_cfg = env.cfg
    cfg = FusedDriftConsts(task_cfg, env_cfg)
    n_push = max(len(cfg.pushes), 1)
    poses = jnp.asarray(np.asarray(
        reference_track_poses(
            jax.random.fold_in(jax.random.PRNGKey(task_cfg.seed), 17),
            task_cfg), np.float32))

    key = jax.random.PRNGKey(0)
    state, _ = jax.jit(env.reset)(key)
    mem = state.vehicle_mem
    if not hasattr(mem, "shape"):
        from wheeledlab_tpu.sim.soa import pack_state

        mem = pack_state(state.vehicle_mem)
    weights_pad = jnp.concatenate(
        [state.reward_weights, jnp.zeros((1,), jnp.float32)])[None]

    rows = []
    for k in (1, 2, 4, 8):
        ku, kn, ka = jax.random.split(jax.random.fold_in(key, k), 3)
        uniforms = jax.random.uniform(ku, (NUM_UNIFORM * k, num_envs))
        normals = jax.random.normal(kn, (OBS_ROWS * k, num_envs))
        actions = jax.random.uniform(
            ka, (2 * k, num_envs), minval=-1.0, maxval=1.0)

        @jax.jit
        def run_chunk(carry, steps_over_k: int = 16):
            def body(c, _):
                m, sc, tm, er, el = c
                m, sc, tm, er, el = multi_step_pallas(
                    weights_pad, poses, m, state.packed_params, actions,
                    uniforms, normals, sc, tm, er, el,
                    cfg=cfg, n_push=n_push, k=k)
                return (m, sc, tm, er, el), None
            c, _ = jax.lax.scan(body, carry, None, length=steps_over_k)
            return c

        carry = (mem, state.step_count[None], state.push_timers,
                 state.ep_return[None], state.ep_len[None])
        c = run_chunk(carry)
        c = run_chunk(c)
        float(jax.device_get(c[0][7].sum()))      # anchor warmup
        steps_per_call = 16 * k
        iters = 1
        while True:
            t0 = time.perf_counter()
            cc = c
            for _ in range(iters):
                cc = run_chunk(cc)
            anchor = float(jax.device_get(cc[0][7].sum()))
            assert math.isfinite(anchor)
            wall = time.perf_counter() - t0
            if wall >= 2.0 and iters >= 4:
                break
            iters = max(4, int(math.ceil(
                iters * max(2.0, 2.5 / max(wall, 1e-9)))))
        rate = num_envs * steps_per_call * iters / wall
        us = wall / (steps_per_call * iters) * 1e6
        rows.append({"k": k, "env_steps_per_s": round(rate, 1),
                     "us_per_control_step": round(us, 2),
                     "num_envs": num_envs, "timed_iters": iters,
                     "wall_s": round(wall, 2)})
        print(json.dumps(rows[-1]))
    return rows


if __name__ == "__main__":
    main()
