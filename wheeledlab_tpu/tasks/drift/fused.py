"""Fused drift control step — the WHOLE env step as one Pallas TPU kernel.

Round-3's device trace (docs/ARCHITECTURE.md "where the drift step's time
goes") showed the Pallas physics at only 24% of the 120 us control step; the
rest was the XLA epilogue (rewards/terminations/reset/obs ~34 us), slice/
reduce fusions, per-step state packing, and RNG — all per-kernel overheads,
not compute. This module folds the ENTIRE control step into the physics
kernel's lane-major (rows, B) layout: action map -> decimated physics
(`sim.soa.substep_soa`, shared verbatim with the XLA path) -> velocity-push
events -> terminations -> the seven drift reward terms -> masked auto-reset
with in-kernel spawn sampling -> post-reset observations with Gaussian
noise. One `pallas_call` per control step; state touches HBM once in, once
out.

Semantics mirror `envs/env.py::WheeledEnv.step` (manager ordering per
SURVEY.md hard part (d)) and the reference term formulas cited in
`tasks/drift/task.py` (mushr_drift_env_cfg.py:160-362,
drifting/mdp/events.py:102-133). RNG differs from the XLA path only in
consumption pattern (one uniform block + one normal block per step instead
of per-purpose key splits), so cross-path parity is at the
trajectory-statistics level — except with events/noise disabled, where the
paths are deterministic and agree to float tolerance
(tests/test_fused_drift.py).

Mosaic has no atan2/asin lowering; the epilogue uses the shared
`sim.soa.atan2_approx`/`asin_approx` (max err ~0.0038 rad) in BOTH the
in-kernel and reference row implementations, keeping them bit-aligned.
"""

from __future__ import annotations

import functools
import math as pymath
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds; interpret mode needs none of it
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
    _SMEM = pltpu.SMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None
    _SMEM = None

from ...sim.soa import (
    NUM_PARAM, NUM_STATE, asin_approx, atan2_approx, substep_soa,
)

# Row indices into the packed (NUM_STATE, B) matrix (sim/soa.py layout)
_PX, _PY, _PZ = 0, 1, 2
_QW, _QX, _QY, _QZ = 3, 4, 5, 6
_VX, _VY, _VZ = 7, 8, 9
_WX, _WY, _WZ = 10, 11, 12
_SL, _SR = 17, 18  # steer_pos rows

# Uniform-block row allocation (see `fused_drift_step`): one (12, B) uniform
# draw per control step covers both push events and the spawn sampler.
U_PUSH = 0       # rows 0-5: push deltas (2 events x [lin_x, lin_y, yaw])
U_INTERVAL = 6   # rows 6-7: push interval resample
U_SPAWN = 8      # rows 8-11: spawn [idx, dx, dy, dyaw]
NUM_UNIFORM = 12

OBS_ROWS = 14    # BlindObs layout (tasks/common/observations.py)
# Gaussian noise stds per obs row (== _NOISE_STD there)
_OBS_STD = [0.1] * 6 + [0.5] * 3 + [0.4] * 3 + [0.0, 0.0]

# Output-block row map (kernel "out" output)
O_REWARD, O_DONE, O_TIMEOUT, O_EPRET, O_EPLEN = 0, 1, 2, 3, 4
O_TERMS = 5          # rows 5-11: the 7 weighted per-term rewards
O_OOB = 12           # done/out_of_bounds flag
O_SLIP_DEG = 13      # metrics/slip_deg
O_SPEED = 14         # metrics/speed
NUM_OUT = 15


def _action_targets_rows(a0, a1, acfg):
    """Policy [throttle, steer] rows -> (steer_targets (2, ...), wheel
    targets (4, ...)). Row re-expression of sim/actions.py (reference
    rc_car_actions.py:6-64); tan via sin/cos (no Mosaic tan lowering)."""
    s_throttle, s_steer = acfg.scale
    o_throttle, o_steer = acfg.offset
    if acfg.bounding_strategy == "clip":
        v = jnp.clip(a0, -1.0, 1.0) * s_throttle + o_throttle
        st = jnp.clip(a1, -1.0, 1.0) * s_steer + o_steer
    elif acfg.bounding_strategy == "tanh":
        v = jnp.tanh(a0) * s_throttle + o_throttle
        st = jnp.tanh(a1) * s_steer + o_steer
    else:
        v = a0 * s_throttle + o_throttle
        st = a1 * s_steer + o_steer
    if acfg.no_reverse:
        v = jnp.maximum(v, 0.0)

    tan_steering = jnp.sin(st) / jnp.cos(st)
    r = acfg.wheel_radius
    if acfg.drivetrain == "rwd":
        tgt = v / r
        zeros = jnp.zeros_like(tgt)
        steer_t = jnp.stack([tan_steering, tan_steering])
        wheel_t = jnp.stack([tgt, tgt, zeros, zeros])
    elif acfg.drivetrain == "4wd":
        L, W = acfg.base_length, acfg.base_width
        R = jnp.where(tan_steering == 0.0, 1e6, L / tan_steering)
        vbl = v * jnp.abs((R - W / 2) / (R * r))
        vbr = v * jnp.abs((R + W / 2) / (R * r))
        vfl = v * jnp.abs(jnp.sqrt((R - W / 2) ** 2 + L**2) / (R * r))
        vfr = v * jnp.abs(jnp.sqrt((R + W / 2) ** 2 + L**2) / (R * r))
        steer_t = jnp.stack([tan_steering, tan_steering])
        wheel_t = jnp.stack([vbl, vbr, vfl, vfr])
    else:  # pragma: no cover - drift tasks use rwd/4wd only
        raise NotImplementedError(acfg.drivetrain)
    return steer_t, wheel_t


def _body_vels(ns):
    """World->body rotation of lin/ang velocity rows: body_v = R^T v."""
    qw, qx, qy, qz = ns[_QW], ns[_QX], ns[_QY], ns[_QZ]
    r00 = 1 - 2 * (qy * qy + qz * qz)
    r01 = 2 * (qx * qy - qw * qz)
    r02 = 2 * (qx * qz + qw * qy)
    r10 = 2 * (qx * qy + qw * qz)
    r11 = 1 - 2 * (qx * qx + qz * qz)
    r12 = 2 * (qy * qz - qw * qx)
    r20 = 2 * (qx * qz - qw * qy)
    r21 = 2 * (qy * qz + qw * qx)
    r22 = 1 - 2 * (qx * qx + qy * qy)
    vx, vy, vz = ns[_VX], ns[_VY], ns[_VZ]
    wx, wy, wz = ns[_WX], ns[_WY], ns[_WZ]
    bv = (r00 * vx + r10 * vy + r20 * vz,
          r01 * vx + r11 * vy + r21 * vz,
          r02 * vx + r12 * vy + r22 * vz)
    bw = (r00 * wx + r10 * wy + r20 * wz,
          r01 * wx + r11 * wy + r21 * wz,
          r02 * wx + r12 * wy + r22 * wz)
    return bv, bw


def _oval_rows(px, py, straight):
    """Shared piecewise-oval comparison (reference
    mushr_drift_env_cfg.py:201-217): predicate on straights uses |px|,
    corners use distance to the corner center."""
    on_straights = jnp.abs(py) < straight
    cy = jnp.where(py > 0, py - straight, py + straight)
    corner_sq = cy * cy + px * px
    return on_straights, corner_sq


def drift_step_rows(state, params, a0, a1, uniforms, normals, weights,
                    poses_read, step_count, timers, ep_return, ep_len, *,
                    cfg):
    """One full drift control step on row blocks of ANY trailing shape —
    runs identically inside the Pallas kernel (blocks (rows, sub, 128)) and
    as a plain XLA function on (rows, B) (the parity-test path).

    `cfg` is a `FusedDriftConsts`; `weights` is a callable i -> scalar (the
    7 curriculum weights); `poses_read` a callable (i, j) -> scalar over the
    (num_reset_points, 4) reference pose table.

    Returns (new_state (21, ...), obs (OBS_ROWS, ...), out (NUM_OUT, ...),
    new_step_count i32, new_timers i32, new_ep_return, new_ep_len i32).
    """
    # 1. action manager
    steer_t, wheel_t = _action_targets_rows(a0, a1, cfg.action)

    # 2. physics decimation — the exact shared substep math
    def body(_, s):
        return substep_soa(s, params, steer_t, wheel_t, cfg.sim_dt)

    ns = jax.lax.fori_loop(0, cfg.decimation, body, state)

    # 3. interval events: velocity pushes (envs/env.py::_apply_pushes)
    new_timers = []
    if cfg.pushes:
        vx, vy, wz = ns[_VX], ns[_VY], ns[_WZ]
        for i, (lo_steps, hi_steps, ranges) in enumerate(cfg.pushes):
            timer = timers[i] - 1
            fire = timer <= 0
            firef = fire.astype(jnp.float32)
            (xlo, xhi), (ylo, yhi), (wlo, whi) = ranges
            if xhi != xlo or xlo != 0.0:
                vx = vx + firef * (xlo + uniforms[U_PUSH + 3 * i] * (xhi - xlo))
            if yhi != ylo or ylo != 0.0:
                vy = vy + firef * (ylo + uniforms[U_PUSH + 3 * i + 1] * (yhi - ylo))
            if whi != wlo or wlo != 0.0:
                wz = wz + firef * (wlo + uniforms[U_PUSH + 3 * i + 2] * (whi - wlo))
            resample = lo_steps + jnp.floor(
                uniforms[U_INTERVAL + i] * (hi_steps - lo_steps)
            ).astype(jnp.int32)
            new_timers.append(jnp.where(fire, resample, timer))
        ns = _set_rows(ns, {_VX: vx, _VY: vy, _WZ: wz})
        new_timers = jnp.stack(new_timers)
    else:
        new_timers = timers

    # 4. counters
    step_count = step_count + 1

    # 5. terminations (pre-reset state)
    px, py = ns[_PX], ns[_PY]
    on_straights, corner_sq = _oval_rows(px, py, cfg.straight)
    # logical composition instead of jnp.where-over-booleans: Mosaic has no
    # lowering for select with i1 branch operands (measured: HTTP-500s the
    # TPU compiler); (a & c) | (~a & d) is equivalent and lowers fine
    off_b = ((on_straights & (jnp.abs(px) > cfg.corner_out_radius))
             | (~on_straights & (corner_sq > cfg.corner_out_radius**2)))
    in_b = ((on_straights & (jnp.abs(px) < cfg.corner_in_radius))
            | (~on_straights & (corner_sq < cfg.corner_in_radius**2)))
    oob = off_b | in_b
    if not cfg.terminations_enabled:
        oob = jnp.zeros_like(oob)
    time_out = step_count >= cfg.max_episode_length
    done = oob | time_out

    # 6. rewards (pre-reset state; weight * value * step_dt)
    bv, bw = _body_vels(ns)
    bvx, bvy, bvz = bv
    slip = jnp.abs(atan2_approx(bvy, bvx))
    gated = jnp.where((jnp.abs(bvx) < 1.0) | (slip > cfg.slip_threshold),
                      0.0, slip)
    t_side_slip = jnp.where(gated < 0.25, 0.0, gated)

    ground_sq = bvx * bvx + bvy * bvy
    ground_speed = jnp.sqrt(ground_sq)
    t_vel = (ground_speed - cfg.max_speed) ** 2 - cfg.max_speed**2

    t_progress = ns[_WZ]                      # world yaw rate

    steer_mean = 0.5 * (ns[_SL] + ns[_SR])
    aw = jnp.clip(bw[2], -1.0, 1.0)
    t_tlgr = jnp.maximum(steer_mean * aw * -1.0, 0.0)

    t_energy = jnp.where(jnp.abs(py) > cfg.straight,
                         ground_sq + bvz * bvz, 0.0)

    line_d = jnp.where(on_straights,
                       jnp.where(px > 0, jnp.abs(px - cfg.track_radius),
                                 jnp.abs(px + cfg.track_radius)),
                       jnp.abs(jnp.sqrt(corner_sq) - cfg.track_radius))
    t_cross = line_d - 1.0

    t_pens = oob.astype(jnp.float32)

    terms = (t_side_slip, t_vel, t_progress, t_tlgr, t_energy, t_cross,
             t_pens)
    reward = jnp.zeros_like(px)
    weighted = []
    for i, t in enumerate(terms):
        r = weights(i) * t * cfg.step_dt
        weighted.append(r)
        reward = reward + r

    ep_return_pre = ep_return + reward
    ep_len_pre = ep_len + 1

    # metrics (metric_fns: slip_deg, speed — tasks/drift/task.py)
    m_slip_deg = jnp.where(jnp.abs(bvx) >= 1.0,
                           slip * (180.0 / pymath.pi), 0.0)
    m_speed = ground_speed

    # 7. auto-reset: in-kernel spawn sampling (reset_root_state_along_track,
    # drifting/mdp/events.py:102-133) + masked blend
    u_idx = uniforms[U_SPAWN]
    idx = jnp.minimum((u_idx * cfg.num_reset_points).astype(jnp.int32),
                      cfg.num_reset_points - 1)
    sp_x = jnp.zeros_like(px)
    sp_y = jnp.zeros_like(px)
    sp_yaw = jnp.zeros_like(px)
    for i in range(cfg.num_reset_points):
        m = idx == i
        sp_x = jnp.where(m, poses_read(i, 0), sp_x)
        sp_y = jnp.where(m, poses_read(i, 1), sp_y)
        sp_yaw = jnp.where(m, poses_read(i, 3), sp_yaw)
    sp_x = sp_x + (2.0 * uniforms[U_SPAWN + 1] - 1.0) * cfg.pos_noise
    sp_y = sp_y + (2.0 * uniforms[U_SPAWN + 2] - 1.0) * cfg.pos_noise
    sp_yaw = sp_yaw + (2.0 * uniforms[U_SPAWN + 3] - 1.0) * cfg.yaw_noise

    donef = done.astype(jnp.float32)
    keep = 1.0 - donef
    spawn_rows = {
        _PX: sp_x, _PY: sp_y,
        _PZ: jnp.full_like(px, cfg.spawn_z),
        _QW: jnp.cos(0.5 * sp_yaw), _QZ: jnp.sin(0.5 * sp_yaw),
    }
    blended = []
    for r in range(NUM_STATE):
        if r in spawn_rows:
            blended.append(donef * spawn_rows[r] + keep * ns[r])
        else:
            blended.append(keep * ns[r])   # spawn value is 0 for these rows
    nsr = jnp.stack(blended)
    step_count = jnp.where(done, 0, step_count)

    # 8. (curriculum runs outside — scalar closed form of the step counter)

    # 9. observations (post-reset state; BlindObs layout + Gaussian noise)
    qw, qx, qy, qz = nsr[_QW], nsr[_QX], nsr[_QY], nsr[_QZ]
    roll = atan2_approx(2 * (qw * qx + qy * qz), 1 - 2 * (qx * qx + qy * qy))
    pitch = asin_approx(2 * (qw * qy - qz * qx))
    yaw = atan2_approx(2 * (qw * qz + qx * qy), 1 - 2 * (qy * qy + qz * qz))
    bvr, bwr = _body_vels(nsr)
    la0 = jnp.clip(keep * a0, -1.0, 1.0)
    la1 = jnp.clip(keep * a1, -1.0, 1.0)
    obs_rows = [nsr[_PX], nsr[_PY], nsr[_PZ], roll, pitch, yaw,
                bvr[0], bvr[1], bvr[2], bwr[0], bwr[1], bwr[2], la0, la1]
    if cfg.enable_corruption:
        obs_rows = [o + normals[i] * _OBS_STD[i] if _OBS_STD[i] else o
                    for i, o in enumerate(obs_rows)]
    obs = jnp.stack(obs_rows)

    out = jnp.stack([
        reward, donef, time_out.astype(jnp.float32),
        ep_return_pre, ep_len_pre.astype(jnp.float32),
        *weighted, t_pens, m_slip_deg, m_speed,
    ])
    return (nsr, obs, out, step_count, new_timers,
            keep * ep_return_pre, jnp.where(done, 0, ep_len_pre))


def _set_rows(m, updates):
    """Functional row update on a stacked (rows, ...) array."""
    rows = [updates.get(i, m[i]) for i in range(m.shape[0])]
    return jnp.stack(rows)


class FusedDriftConsts:
    """Static constants baked into the kernel closure. Hash/eq are by VALUE
    (every field is a float/int/bool/tuple/frozen cfg): `fused_drift_pallas`
    takes this as a static jit arg, and identity hashing would recompile the
    whole fused step for every `make_drift_task` call in a process (sweeps,
    tests, repeated make_env)."""

    def __init__(self, task_cfg, env_cfg):
        self.action = env_cfg.action
        self.sim_dt = env_cfg.sim_dt
        self.decimation = env_cfg.decimation
        self.step_dt = env_cfg.step_dt
        self.max_episode_length = env_cfg.max_episode_length
        self.straight = task_cfg.track_straight_dist
        self.track_radius = task_cfg.track_radius
        self.corner_in_radius = 0.3     # CORNER_IN_RADIUS
        self.corner_out_radius = 2.0    # CORNER_OUT_RADIUS
        self.slip_threshold = 0.55      # SLIP_THRESHOLD
        self.max_speed = 3.0            # MAX_SPEED
        self.num_reset_points = task_cfg.num_reset_points
        self.pos_noise = task_cfg.pos_noise
        self.yaw_noise = task_cfg.yaw_noise
        self.spawn_z = 0.06             # SPAWN_Z
        self.enable_corruption = task_cfg.enable_corruption
        self.terminations_enabled = task_cfg.terminations_enabled
        # push events in control steps: ((lo, hi, ((xlo,xhi),(ylo,yhi),(wlo,whi))), ...)
        pushes = []
        if task_cfg.events_enabled:
            for p in ((0.1, 0.4, ((-0.1, 0.1), (-0.03, 0.03), (-0.3, 0.3))),
                      (0.8, 1.2, ((0.0, 0.0), (0.0, 0.0), (-0.6, 0.6)))):
                lo = max(int(round(p[0] / self.step_dt)), 1)
                hi = max(int(round(p[1] / self.step_dt)), lo + 1)
                pushes.append((lo, hi, p[2]))
        self.pushes = tuple(pushes)

    def _value_key(self):
        return tuple(sorted(self.__dict__.items()))

    def __eq__(self, other):
        return (type(other) is FusedDriftConsts
                and self._value_key() == other._value_key())

    def __hash__(self):
        return hash(self._value_key())


def _kernel(weights_ref, poses_ref, state_ref, params_ref, act_ref, uni_ref,
            nrm_ref, step_ref, timers_ref, epret_ref, eplen_ref,
            state_out, obs_out, out_out, step_out, timers_out, epret_out,
            eplen_out, *, cfg):
    _kernel_epilogue(
        weights_ref, poses_ref, state_ref, params_ref, act_ref, uni_ref[:],
        nrm_ref[:], step_ref, timers_ref, epret_ref, eplen_ref, state_out,
        obs_out, out_out, step_out, timers_out, epret_out, eplen_out,
        cfg=cfg)


def _kernel_epilogue(weights_ref, poses_ref, state_ref, params_ref, act_ref,
                     uni, nrm, step_ref, timers_ref, epret_ref, eplen_ref,
                     state_out, obs_out, out_out, step_out, timers_out,
                     epret_out, eplen_out, *, cfg):
    res = drift_step_rows(
        state_ref[:], params_ref[:], act_ref[0], act_ref[1], uni,
        nrm, lambda i: weights_ref[0, i],
        lambda i, j: poses_ref[i, j], step_ref[0], timers_ref[:],
        epret_ref[0], eplen_ref[0], cfg=cfg)
    nsr, obs, out, step_count, timers, epret, eplen = res
    state_out[:] = nsr
    obs_out[:] = obs
    out_out[:] = out
    step_out[0] = step_count
    timers_out[:] = timers
    epret_out[0] = epret
    eplen_out[0] = eplen


def _kernel_krng(weights_ref, poses_ref, state_ref, params_ref, act_ref,
                 seed_ref, step_ref, timers_ref, epret_ref, eplen_ref,
                 state_out, obs_out, out_out, step_out, timers_out,
                 epret_out, eplen_out, *, cfg):
    """`_kernel` with the per-step RNG blocks generated IN-KERNEL from the
    hardware PRNG instead of streamed from HBM (TPU only; r4's named +15%
    lever). Seeded per (step-seed, grid block) so tiles draw independent
    streams. Uniforms: top 24 bits of the raw stream -> [0, 1) with the
    sign masked BEFORE the float convert (prng_random_bits is s32 and
    Mosaic has no u32->f32 cast); normals: Box-Muller from two uniform
    blocks. Moments validated on-device: mean 0.5013 / std 0.2882 uniform,
    mean -0.010 / std 1.004 / kurtosis 2.97 normal, lag-1 corr 0.014 at
    24.5k samples."""
    from jax.experimental.pallas import tpu as pltpu

    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    want_noise = cfg.enable_corruption
    total = NUM_UNIFORM + (2 * OBS_ROWS if want_noise else 0)
    bits = pltpu.prng_random_bits((total,) + state_ref.shape[1:])
    u = ((bits >> 7) & jnp.int32(0x00FFFFFF)).astype(jnp.float32) * (
        1.0 / (1 << 24))
    uni = u[:NUM_UNIFORM]
    if want_noise:
        u1 = jnp.maximum(u[NUM_UNIFORM:NUM_UNIFORM + OBS_ROWS], 1e-7)
        u2 = u[NUM_UNIFORM + OBS_ROWS:]
        nrm = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)
    else:
        nrm = jnp.zeros((OBS_ROWS,) + u.shape[1:], jnp.float32)
    _kernel_epilogue(
        weights_ref, poses_ref, state_ref, params_ref, act_ref, uni, nrm,
        step_ref, timers_ref, epret_ref, eplen_ref, state_out, obs_out,
        out_out, step_out, timers_out, epret_out, eplen_out, cfg=cfg)


def _fused_call_plan(b: int, n_push: int):
    """Grid/BlockSpec/reshape scaffolding shared by the fused-step pallas
    callers (streamed-RNG and kernel-RNG variants): the env batch as the
    lane dim, viewed (rows, B/128, 128) so every row is a full (sub, 128)
    VPU tile. Returns (grid, spec, smem_spec, view, unview, outs) — ONE
    place to change if the fused step's tiling or output block layout
    moves."""
    if b % 128 == 0:
        lanes = b // 128
        sub = next(s for s in (16, 8, 4, 2, 1) if lanes % s == 0)
        grid = (lanes // sub,)
        shape3 = lambda rows: (rows, lanes, 128)
        block = lambda rows: (rows, sub, 128)
        index_map = lambda i: (0, i, 0)
    else:  # interpret/test path
        grid = (1,)
        shape3 = lambda rows: (rows, 1, b)
        block = lambda rows: (rows, 1, b)
        index_map = lambda i: (0, 0, 0)

    def spec(rows):
        return pl.BlockSpec(
            block(rows), index_map,
            **({} if _VMEM is None else {"memory_space": _VMEM}))

    def smem_spec(shape):
        return pl.BlockSpec(
            shape, lambda i: (0,) * len(shape),
            **({} if _SMEM is None else {"memory_space": _SMEM}))

    view = lambda x: x.reshape((x.shape[0],) + shape3(0)[1:])
    unview = lambda x: x.reshape(x.shape[0], b)
    sds = jax.ShapeDtypeStruct
    outs = (
        sds(shape3(NUM_STATE), jnp.float32),   # new state
        sds(shape3(OBS_ROWS), jnp.float32),    # obs
        sds(shape3(NUM_OUT), jnp.float32),     # reward/done/info block
        sds(shape3(1), jnp.int32),             # step_count
        sds(shape3(n_push), jnp.int32),        # push timers
        sds(shape3(1), jnp.float32),           # ep_return
        sds(shape3(1), jnp.int32),             # ep_len
    )
    return grid, spec, smem_spec, view, unview, outs


@functools.partial(jax.jit,
                   static_argnames=("cfg", "n_push", "interpret"))
def fused_drift_pallas(weights_pad, poses, state, params, action_rows,
                       uniforms, normals, step_count, timers, ep_return,
                       ep_len, cfg: FusedDriftConsts, n_push: int,
                       interpret: bool = False):
    """One fused control step: (NUM_STATE, B) in -> everything out."""
    b = state.shape[1]
    grid, spec, smem_spec, view, unview, outs = _fused_call_plan(b, n_push)
    res = pl.pallas_call(
        functools.partial(_kernel, cfg=cfg),
        grid=grid,
        in_specs=[smem_spec(weights_pad.shape), smem_spec(poses.shape),
                  spec(NUM_STATE), spec(NUM_PARAM), spec(2),
                  spec(NUM_UNIFORM), spec(OBS_ROWS), spec(1), spec(n_push),
                  spec(1), spec(1)],
        out_specs=tuple(spec(o.shape[0]) for o in outs),
        out_shape=outs,
        interpret=interpret,
    )(weights_pad, poses, view(state), view(params), view(action_rows),
      view(uniforms), view(normals), view(step_count), view(timers),
      view(ep_return), view(ep_len))
    return tuple(unview(x) for x in res)


@functools.partial(jax.jit, static_argnames=("cfg", "n_push"))
def fused_drift_pallas_krng(weights_pad, poses, state, params, action_rows,
                            seed, step_count, timers, ep_return, ep_len,
                            cfg: FusedDriftConsts, n_push: int):
    """`fused_drift_pallas` with IN-KERNEL hardware PRNG (`_kernel_krng`):
    the per-step uniform/normal blocks (26 rows x B of rbg output per step,
    ~18% of the fused step's wall time at 16k envs) never exist in HBM.
    TPU-only (no interpret path — the interpret/CPU parity tests pin the
    math through the streamed-RNG kernel, which shares `_kernel_epilogue`
    verbatim; the PRNG bit extraction + Box-Muller are validated on-device
    by scripts/check_kernel_rng.py); `seed` is a (1,) i32 drawn per
    control step. MEASURED NEGATIVE on v5e as the default (see
    make_fused_drift_step) — kept opt-in for hardware where the
    VPU/HBM balance differs."""
    b = state.shape[1]
    assert b % 128 == 0, "kernel-RNG path is TPU-only (lane-aligned batch)"
    grid, spec, smem_spec, view, unview, outs = _fused_call_plan(b, n_push)
    res = pl.pallas_call(
        functools.partial(_kernel_krng, cfg=cfg),
        grid=grid,
        in_specs=[smem_spec(weights_pad.shape), smem_spec(poses.shape),
                  spec(NUM_STATE), spec(NUM_PARAM), spec(2),
                  smem_spec((1,)), spec(1), spec(n_push), spec(1), spec(1)],
        out_specs=tuple(spec(o.shape[0]) for o in outs),
        out_shape=outs,
    )(weights_pad, poses, view(state), view(params), view(action_rows),
      seed, view(step_count), view(timers), view(ep_return), view(ep_len))
    return tuple(unview(x) for x in res)


def make_fused_drift_step(task_cfg, env_cfg, ref_poses_np):
    """Build the fused step closure stored on TaskModel.fused_step.

    Returns fused_step(env, state: EnvState, action) -> (EnvState,
    StepOutput) with semantics identical to WheeledEnv.step's generic path
    (info keys included)."""
    from ...envs.env import EnvState, StepOutput

    cfg = FusedDriftConsts(task_cfg, env_cfg)
    n_push = max(len(cfg.pushes), 1)
    poses = np.asarray(ref_poses_np, np.float32)   # (N, 4) trace literal
    reward_names = ("side_slip", "vel", "progress", "tlgr", "turn_energy",
                    "cross_track", "term_pens")

    def fused_step(env, state, action):
        n = env.num_envs
        key, k_u, k_n = jax.random.split(state.key, 3)

        from ...sim.soa import pack_state
        from ...sim.types import VehicleState

        mem = (state.vehicle_mem
               if not isinstance(state.vehicle_mem, VehicleState)
               else pack_state(state.vehicle_mem))
        weights_pad = jnp.concatenate(
            [state.reward_weights,
             jnp.zeros((1,), jnp.float32)])[None]   # (1, 8) SMEM
        interp = getattr(env, "_pallas_interpret", False)

        from ...parallel.mesh import ambient_data_shards

        shards = ambient_data_shards()
        # MEASURED NEGATIVE (round 5): drawing the per-step RNG blocks from
        # the hardware PRNG inside the kernel (fused_drift_pallas_krng, one
        # i32 seed instead of 26 rows x B through HBM) benched 300.5M vs
        # 315.9M env-steps/s at 16k envs — the kernel is VPU-ISSUE-RATE
        # bound (docs/runs/limiter_r05), so adding the PRNG + Box-Muller
        # transcendentals IN-kernel costs more than the streamed blocks
        # save: pallas_call's input DMA overlaps compute, making the
        # streamed rows nearly free. Kept behind an env var for future
        # hardware where the balance differs.
        use_krng = (not interp
                    and os.environ.get("WHEELEDLAB_KERNEL_RNG") == "1"
                    and jax.default_backend() not in ("cpu", "gpu"))
        if use_krng:
            seed = jax.random.randint(
                k_u, (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32)

            def call(w, po, mem_, pp, act, sd, sc, tm, er, el):
                return fused_drift_pallas_krng(
                    w, po, mem_, pp, act, sd, sc, tm, er, el,
                    cfg=cfg, n_push=n_push)

            if shards > 1:
                from jax.sharding import PartitionSpec as P
                from ...parallel.mesh import DATA_AXIS

                inner = call

                def sharded(w, po, mem_, pp, act, sd, sc, tm, er, el):
                    # distinct stream per data shard (i32 wrap is fine)
                    sd = sd + (jax.lax.axis_index(DATA_AXIS)
                               .astype(jnp.int32) * jnp.int32(0x3779B1))
                    return inner(w, po, mem_, pp, act, sd, sc, tm, er, el)

                row = P(None, DATA_AXIS)
                call = jax.shard_map(
                    sharded,
                    in_specs=(P(), P(), row, row, row, P(), row, row, row,
                              row),
                    out_specs=(row,) * 7, check_vma=False)
            res = call(
                weights_pad, jnp.asarray(poses), mem,
                state.packed_params, action.T, seed,
                state.step_count[None], state.push_timers,
                state.ep_return[None], state.ep_len[None])
        else:
            uniforms = jax.random.uniform(k_u, (NUM_UNIFORM, n))
            normals = (jax.random.normal(k_n, (OBS_ROWS, n))
                       if cfg.enable_corruption
                       else jnp.zeros((OBS_ROWS, n), jnp.float32))

            def call(w, po, *rows):
                return fused_drift_pallas(w, po, *rows, cfg=cfg,
                                          n_push=n_push, interpret=interp)

            if shards > 1:
                # data mesh active: shard-map the kernel so each device
                # runs it on its local env block (no GSPMD rule for
                # pallas_call; check_vma=False — the ShapeDtypeStructs
                # carry no varying-mesh-axes annotation)
                from jax.sharding import PartitionSpec as P
                from ...parallel.mesh import DATA_AXIS

                row = P(None, DATA_AXIS)
                call = jax.shard_map(call,
                                     in_specs=(P(), P()) + (row,) * 9,
                                     out_specs=(row,) * 7, check_vma=False)
            res = call(
                weights_pad, jnp.asarray(poses), mem,
                state.packed_params, action.T, uniforms, normals,
                state.step_count[None], state.push_timers,
                state.ep_return[None], state.ep_len[None])
        (packed, obs_rows, out, step_count, timers, ep_return, ep_len) = res

        obs = obs_rows.T
        reward = out[O_REWARD]
        done = out[O_DONE] > 0.5
        time_out = out[O_TIMEOUT] > 0.5
        common_step = state.common_step + 1
        info = {
            "episode_return": out[O_EPRET],
            "episode_length": out[O_EPLEN],
        }
        for i, name in enumerate(reward_names):
            info[f"rew/{name}"] = out[O_TERMS + i]
        info["done/out_of_bounds"] = out[O_OOB] > 0.5
        info["done/time_out"] = time_out
        info["metrics/slip_deg"] = out[O_SLIP_DEG]
        info["metrics/speed"] = out[O_SPEED]

        new_state = EnvState(
            vehicle_mem=packed,   # carry stays in the kernel's row layout
            params=state.params,
            packed_params=state.packed_params, key=key,
            step_count=step_count[0], common_step=common_step,
            reward_weights=env._curriculum_weights(state.reward_weights,
                                                   common_step),
            last_action=jnp.where(done[:, None], 0.0, action),
            command=state.command, command_timer=state.command_timer,
            push_timers=timers,
            ep_return=ep_return[0], ep_len=ep_len[0])
        return new_state, StepOutput(obs=obs, reward=reward, done=done,
                                     time_out=time_out, info=info)

    return fused_step
