"""Drift task — TPU recomposition of the reference MuSHR drift MDP
(source/wheeledlab_tasks/wheeledlab_tasks/drifting/mushr_drift_env_cfg.py).

Oval track: two straights at x = ±LINE_RADIUS (|y| <= STRAIGHT) joined by
semicircles of radius LINE_RADIUS centered at (0, ±STRAIGHT). All rewards,
terminations, events, and curriculum reproduce the reference term formulas
(file:line cited per function)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ...envs.env import (
    CurriculumTerm, EnvCfg, PushEvent, RewardTerm, StepCtx, TaskModel,
    WheeledEnv,
)
from ...sim.terrain import Heightfield
from ...assets import (
    F1TENTH_4WD_ACTION, F1TENTH_CFG, MUSHR_RWD_ACTION, MUSHR_SUS_2WD_CFG,
)
from ...sim.types import VehicleState, batch_params, with_mass
from ...utils import math as wmath
from ...utils.host import host_build_fn
from ...utils.config import configclass
from ..common.observations import BLIND_OBS_DIM, blind_obs

# Common constants (reference mushr_drift_env_cfg.py:27-32)
CORNER_IN_RADIUS = 0.3
CORNER_OUT_RADIUS = 2.0
LINE_RADIUS = 0.8
STRAIGHT = 0.8
SLIP_THRESHOLD = 0.55
MAX_SPEED = 3.0

SPAWN_Z = 0.06  # body-origin rest height (params.com_height)


@configclass
class DriftTaskCfg:
    """Parity: MushrDriftRLEnvCfg (mushr_drift_env_cfg.py:369-404)."""

    num_envs: int = 1024
    seed: int = 42
    robot: str = "mushr"             # "mushr" | "f1tenth"
    sim_dt: float = 0.005            # 200 Hz
    decimation: int = 4              # 50 Hz control
    episode_length_s: float = 5.0
    # reset event (DriftEventsCfg, :82-93)
    track_radius: float = LINE_RADIUS
    track_straight_dist: float = STRAIGHT
    num_reset_points: int = 20
    pos_noise: float = 0.5
    yaw_noise: float = 1.0
    # DR events (DriftEventsRandomCfg, :96-154)
    friction_range: Tuple[float, float] = (0.3, 0.5)
    friction_buckets: int = 20
    mass_delta_range: Tuple[float, float] = (0.3, 0.5)
    motor_damping_range: Tuple[float, float] = (10.0, 50.0)
    enable_corruption: bool = True
    events_enabled: bool = True
    terminations_enabled: bool = True  # Play variant strips terminations
                                       # (reference mushr_drift_env_cfg.py:425-427)
    rewards_enabled: bool = True       # Play strips rewards + curriculum too
                                       # (rewards/curriculum = None, :425-427)
    ground_friction: float = 1.0     # carpet dynamic friction (:45-50)


# ---------------------------------------------------------------------------
# Track geometry helpers
# ---------------------------------------------------------------------------


def reference_track_poses(key: jax.Array, cfg: DriftTaskCfg) -> jax.Array:
    """Pre-generate `num_reset_points` poses by arc-length parameterization of
    the oval — exact port of generate_reference_poses
    (drifting/mdp/events.py:33-100). Returns (N, 4): x, y, z, yaw_rad."""
    radius, straight = cfg.track_radius, cfg.track_straight_dist
    n = cfg.num_reset_points
    dist_track = 2.0 * jnp.pi * radius + 4.0 * straight
    dists = jax.random.uniform(key, (n,)) * dist_track

    # Case 1: right straight, heading +y (90 deg)
    c1_pos = jnp.stack([jnp.full((n,), radius), dists - straight], -1)
    c1_yaw = jnp.full((n,), 90.0)
    # Case 2: top semicircle
    a = (dists - 2 * straight) / radius
    c2_pos = jnp.stack([radius * jnp.cos(a), straight + radius * jnp.sin(a)], -1)
    c2_yaw = 90.0 + a * 180.0 / jnp.pi
    # Case 3: left straight, heading -y (270 deg)
    rem = dists - 2 * straight - jnp.pi * radius
    c3_pos = jnp.stack([jnp.full((n,), -radius), straight - rem], -1)
    c3_yaw = jnp.full((n,), 270.0)
    # Case 4: bottom semicircle
    a2 = (dists - 4 * straight - jnp.pi * radius) / radius
    c4_pos = jnp.stack([-radius * jnp.cos(a2), -straight - radius * jnp.sin(a2)], -1)
    c4_yaw = 270.0 + a2 * 180.0 / jnp.pi

    in1 = (dists < 2 * straight)[:, None]
    in2 = (dists < 2 * straight + jnp.pi * radius)[:, None]
    in3 = (dists < 4 * straight + jnp.pi * radius)[:, None]
    pos = jnp.where(in1, c1_pos, jnp.where(in2, c2_pos, jnp.where(in3, c3_pos, c4_pos)))
    yaw = jnp.where(in1[:, 0], c1_yaw, jnp.where(in2[:, 0], c2_yaw,
                    jnp.where(in3[:, 0], c3_yaw, c4_yaw)))
    return jnp.concatenate(
        [pos, jnp.full((n, 1), SPAWN_Z), jnp.deg2rad(yaw)[:, None]], -1)


def _cross_track_sq(pos: jax.Array, straight: float, radius: float) -> jax.Array:
    """Squared distance to the track line of given radius — piecewise oval
    metric (cross_track_dist, mushr_drift_env_cfg.py:173-193)."""
    x, y = pos[..., 0], pos[..., 1]
    on_straights = jnp.abs(y) < straight
    sq = jnp.where(
        on_straights,
        jnp.where(x > 0, (x - radius) ** 2, (x + radius) ** 2),
        jnp.where(
            y > 0,
            (jnp.sqrt((y - straight) ** 2 + x**2) - radius) ** 2,
            (jnp.sqrt((y + straight) ** 2 + x**2) - radius) ** 2,
        ),
    )
    return sq


def _in_range(pos, straight, corner_in_radius):
    """1 inside the infield (mushr_drift_env_cfg.py:201-208)."""
    x, y = pos[..., 0], pos[..., 1]
    return jnp.where(
        jnp.abs(y) < straight,
        jnp.abs(x) < corner_in_radius,
        jnp.where(
            y > 0,
            (y - straight) ** 2 + x**2 < corner_in_radius**2,
            (y + straight) ** 2 + x**2 < corner_in_radius**2,
        ),
    )


def _off_track(pos, straight, corner_out_radius):
    """1 outside the outer boundary (mushr_drift_env_cfg.py:210-217)."""
    x, y = pos[..., 0], pos[..., 1]
    return jnp.where(
        jnp.abs(y) < straight,
        jnp.abs(x) > corner_out_radius,
        jnp.where(
            y > 0,
            (y - straight) ** 2 + x**2 > corner_out_radius**2,
            (y + straight) ** 2 + x**2 > corner_out_radius**2,
        ),
    )


# ---------------------------------------------------------------------------
# Reward terms (DriftRewardsCfg, mushr_drift_env_cfg.py:242-299)
# ---------------------------------------------------------------------------


def track_progress_rate(ctx: StepCtx) -> jax.Array:
    """World-frame yaw angular velocity (:160-165)."""
    return ctx.vehicle.ang_vel[..., 2]


def vel_dist(ctx: StepCtx, speed_target: float = MAX_SPEED,
             offset: float = -MAX_SPEED**2) -> jax.Array:
    """(ground_speed - target)^2 + offset (:167-171)."""
    ground_speed = jnp.linalg.norm(ctx.body_lin_vel[..., :2], axis=-1)
    return (ground_speed - speed_target) ** 2 + offset


def cross_track_dist(ctx: StepCtx, straight: float = STRAIGHT,
                     track_radius: float = LINE_RADIUS,
                     offset: float = -1.0, p: float = 1.0) -> jax.Array:
    """sqrt(piecewise sq dist) + offset, to power p (:173-193)."""
    ctd = jnp.sqrt(_cross_track_sq(ctx.vehicle.pos, straight, track_radius)) + offset
    return jnp.sign(ctd) * jnp.abs(ctd) ** p if p != 1.0 else ctd


def energy_through_turn(ctx: StepCtx, straight: float = STRAIGHT) -> jax.Array:
    """speed^2 while in the corners (:195-199)."""
    speed = jnp.linalg.norm(ctx.body_lin_vel, axis=-1)
    return jnp.where(jnp.abs(ctx.vehicle.pos[..., 1]) > straight, speed**2, 0.0)


def side_slip(ctx: StepCtx, min_thresh: float = 0.25,
              max_thresh: float = SLIP_THRESHOLD,
              min_vel_x: float = 1.0) -> jax.Array:
    """|atan2(v_y, v_x)| gated by min forward vel and thresholds (:219-230)."""
    vel = ctx.body_lin_vel
    slip_angle = jnp.abs(jnp.arctan2(vel[..., 1], vel[..., 0]))
    valid = jnp.where(
        (jnp.abs(vel[..., 0]) < min_vel_x) | (slip_angle > max_thresh),
        0.0, slip_angle)
    return jnp.where(valid < min_thresh, 0.0, valid)


def turn_left_go_right(ctx: StepCtx, ang_vel_thresh: float = 1.0) -> jax.Array:
    """Counter-steer reward: -mean(steer) * clamp(yaw_rate), min 0 (:232-240)."""
    steer_mean = ctx.vehicle.steer_pos.mean(axis=-1)
    ang_vel = jnp.clip(ctx.body_ang_vel[..., 2], -ang_vel_thresh, ang_vel_thresh)
    return jnp.maximum(steer_mean * ang_vel * -1.0, 0.0)


def term_pens(ctx: StepCtx) -> jax.Array:
    """is_terminated_term on out_of_bounds (:295-299)."""
    return ctx.term_flags["out_of_bounds"].astype(jnp.float32)


# ---------------------------------------------------------------------------
# Terminations (DriftTerminationsCfg, :350-362)
# ---------------------------------------------------------------------------


def cart_off_track(ctx: StepCtx) -> jax.Array:
    pos = ctx.vehicle.pos
    return _off_track(pos, STRAIGHT, CORNER_OUT_RADIUS) | _in_range(
        pos, STRAIGHT, CORNER_IN_RADIUS)


# ---------------------------------------------------------------------------
# Task-success metrics (surfaced as metrics/* in training logs; the
# machine-checkable version of the reference's W&B-curve evidence)
# ---------------------------------------------------------------------------


def slip_deg(ctx: StepCtx, min_vel_x: float = 1.0) -> jax.Array:
    """Mean |slip angle| in degrees over envs that are actually moving
    (gated like the side_slip reward, mushr_drift_env_cfg.py:219-230). A
    policy that has learned to drift holds this in the 13-25 deg band."""
    vel = ctx.body_lin_vel
    slip = jnp.abs(jnp.arctan2(vel[..., 1], vel[..., 0]))
    return jnp.where(jnp.abs(vel[..., 0]) >= min_vel_x,
                     jnp.rad2deg(slip), 0.0)


def ground_speed(ctx: StepCtx) -> jax.Array:
    return jnp.linalg.norm(ctx.body_lin_vel[..., :2], axis=-1)


# ---------------------------------------------------------------------------
# Task assembly
# ---------------------------------------------------------------------------


@host_build_fn  # builder eager math on local CPU (utils/host.py)
def make_drift_task(cfg: DriftTaskCfg) -> TaskModel:
    n = cfg.num_envs
    base_key = jax.random.PRNGKey(cfg.seed)
    # host constant: captured by the jitted sample_spawn closure
    # (see utils/host.py for why this must not be a device array)
    from ...utils.host import host_const
    ref_poses = host_const(
        reference_track_poses(jax.random.fold_in(base_key, 17), cfg))

    # robot assets from the L1 layer (reference: MUSHR_SUS_2WD_CFG at
    # mushr_drift_env_cfg.py:59; F1TENTH_CFG at f1tenth_drift_env_cfg.py:44)
    if cfg.robot == "mushr":
        base_params = MUSHR_SUS_2WD_CFG
        action = MUSHR_RWD_ACTION
    elif cfg.robot == "f1tenth":
        base_params = F1TENTH_CFG
        action = F1TENTH_4WD_ACTION
    else:
        raise ValueError(cfg.robot)

    env_cfg = EnvCfg(
        num_envs=n, sim_dt=cfg.sim_dt, decimation=cfg.decimation,
        episode_length_s=cfg.episode_length_s, action=action,
        enable_corruption=cfg.enable_corruption,
        events_enabled=cfg.events_enabled)

    terrain = Heightfield.flat(friction=cfg.ground_friction)

    def init_params(key, num):
        """Startup DR (DriftEventsRandomCfg :96-154): per-wheel friction from
        buckets, motor damping uniform-abs, base mass add uniform."""
        params = batch_params(base_params, num)
        if not cfg.events_enabled:
            return params
        k_bucket, k_assign, k_damp, k_mass = jax.random.split(key, 4)
        buckets = jax.random.uniform(
            k_bucket, (cfg.friction_buckets,),
            minval=cfg.friction_range[0], maxval=cfg.friction_range[1])
        assign = jax.random.randint(k_assign, (num, 4), 0, cfg.friction_buckets)
        tire_mu = buckets[assign]
        damping = jax.random.uniform(
            k_damp, (num, 1), minval=cfg.motor_damping_range[0],
            maxval=cfg.motor_damping_range[1])
        motor_damping = jnp.broadcast_to(damping, (num, 4))
        dmass = jax.random.uniform(
            k_mass, (num,), minval=cfg.mass_delta_range[0],
            maxval=cfg.mass_delta_range[1])
        params = params.replace(tire_mu=tire_mu, motor_damping=motor_damping)
        return with_mass(params, params.mass + dmass)

    def sample_spawn(key, num):
        """Reset along track (reset_root_state_along_track,
        drifting/mdp/events.py:102-133)."""
        k_idx, k_xy, k_yaw = jax.random.split(key, 3)
        idx = jax.random.randint(k_idx, (num,), 0, cfg.num_reset_points)
        ref = jnp.asarray(ref_poses)[idx]  # (num, 4): x, y, z, yaw
        xy_noise = (jax.random.uniform(k_xy, (num, 2)) * 2 - 1) * cfg.pos_noise
        yaw_noise = (jax.random.uniform(k_yaw, (num,)) * 2 - 1) * cfg.yaw_noise
        pos = jnp.stack([ref[:, 0] + xy_noise[:, 0],
                         ref[:, 1] + xy_noise[:, 1],
                         ref[:, 2]], -1)
        quat = wmath.quat_from_yaw(ref[:, 3] + yaw_noise)
        state = VehicleState.zero((num,))
        return state.replace(pos=pos, quat=quat)

    termination_fns = (
        {"out_of_bounds": cart_off_track} if cfg.terminations_enabled else {})

    def term_pens_safe(ctx):
        if not cfg.terminations_enabled:
            return jnp.zeros(ctx.vehicle.pos.shape[0], jnp.float32)
        return term_pens(ctx)

    reward_terms = (
        RewardTerm("side_slip", 10.0, side_slip),
        RewardTerm("vel", -5.0, vel_dist),
        RewardTerm("progress", 40.0, track_progress_rate),
        RewardTerm("tlgr", 0.0, turn_left_go_right),
        RewardTerm("turn_energy", 20.0, energy_through_turn),
        RewardTerm("cross_track", -50.0, cross_track_dist),
        RewardTerm("term_pens", -5000.0, term_pens_safe),
    ) if cfg.rewards_enabled else ()

    curriculum = (
        CurriculumTerm("side_slip", 20.0, 20, 10),
        CurriculumTerm("tlgr", 10.0, 20, 5),
        CurriculumTerm("term_pens", -1000.0, 50, 5),
    ) if cfg.rewards_enabled else ()

    pushes = (
        PushEvent(interval_range_s=(0.1, 0.4), lin_x=(-0.1, 0.1),
                  lin_y=(-0.03, 0.03), yaw=(-0.3, 0.3)),
        PushEvent(interval_range_s=(0.8, 1.2), yaw=(-0.6, 0.6)),
    ) if cfg.events_enabled else ()

    def observe(ctx, key):
        return blind_obs(ctx, key, cfg.enable_corruption)

    fused_step = None
    if cfg.rewards_enabled:
        # whole-control-step Pallas kernel (physics + epilogue fused) for
        # the training variant; play variants (rewards stripped) use the
        # generic path
        import numpy as np

        from .fused import make_fused_drift_step

        fused_step = make_fused_drift_step(cfg, env_cfg,
                                           np.asarray(ref_poses))

    return TaskModel(
        cfg=env_cfg,
        terrain=terrain,
        obs_dim=BLIND_OBS_DIM,
        init_params=init_params,
        sample_spawn=sample_spawn,
        reward_terms=reward_terms,
        termination_fns=termination_fns,
        observe=observe,
        curriculum=curriculum,
        pushes=pushes,
        metric_fns={"slip_deg": slip_deg, "speed": ground_speed},
        fused_step=fused_step,
    )


def make_drift_env(cfg: DriftTaskCfg = DriftTaskCfg()) -> WheeledEnv:
    return WheeledEnv(make_drift_task(cfg))
