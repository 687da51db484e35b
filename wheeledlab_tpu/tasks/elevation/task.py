"""Elevation task — TPU recomposition of the reference rough-terrain MDP
(source/wheeledlab_tasks/wheeledlab_tasks/elevation/mushr_elevation_env_cfg.py).

Replaces the USD heightfield + RayCaster grid scanner with a procedural
heightfield + batched bilinear grid-scan kernel (SURVEY.md §2b rows 1, 3).
Goal commands, rewards, terminations, events and curriculum reproduce the
reference terms (file:line cited per function)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...envs.env import (
    CommandCfg, CurriculumTerm, EnvCfg, RewardTerm, StepCtx, TaskModel,
    WheeledEnv,
)
from ...assets import MUSHR_4WD_ACTION, MUSHR_SUS_CFG
from ...sim.types import VehicleState, batch_params, with_mass
from ...utils import math as wmath
from ...utils.host import host_build_fn
from ...utils.config import configclass
from .terrain_gen import generate_elevation_terrain

REST_H = 0.06          # body-origin rest height above local ground
SCAN_SIZE = 2.5        # GridPatternCfg(size=[2.5, 2.5]) (:139)
SCAN_RES = 0.1
SCAN_N = int(round(SCAN_SIZE / SCAN_RES)) + 1   # 26 x 26 grid
ELEV_OBS_DIM = 2 + 3 + 3 + 3 + 2 + SCAN_N * SCAN_N


@configclass
class ElevationTaskCfg:
    """Parity: MushrElevationRLEnvCfg (mushr_elevation_env_cfg.py:438-469)."""

    num_envs: int = 512
    seed: int = 42
    sim_dt: float = 0.01          # 100 Hz
    decimation: int = 10          # 10 Hz control
    episode_length_s: float = 20.0
    # terrain generation (replaces huge_compact.usd)
    terrain_extent: float = 44.0
    terrain_cell: float = 0.25
    num_mounds: int = 60
    # goal command (:425-435)
    goal_range: float = 19.0
    goal_resample_s: float = 10.0
    # spawn (set_goal event, :409-419)
    spawn_range: float = 19.0
    spawn_vel_range: Tuple[float, float] = (0.1, 0.2)
    # DR (:383-407)
    mass_delta_range: Tuple[float, float] = (0.2, 0.5)
    wheel_friction: float = 1.0   # dynamic friction fixed at 1.0 (:391-393)
    events_enabled: bool = True
    terminations_enabled: bool = True  # Play strips terminations (:472-475)
    rewards_enabled: bool = True       # Play strips rewards + curriculum
    enable_corruption: bool = False  # reference ConcatObs disables corruption
    # Reward weights. Defaults == the reference's ElevationRewardsCfg
    # (mushr_elevation_env_cfg.py:283-305), under which climbing (5000)
    # dominates goal progress (200) 25:1 and at_goal is a bare termination
    # with NO bonus — measured consequence: trained policies climb, and
    # episode-level goal reaching is statistically indistinguishable from a
    # random policy (docs/runs/rss_elev_tpu/goal_analysis.md). The knobs
    # exist so a goal-seeking variant (ELEV_GOAL_CONFIG) can actually pay
    # for goal contact — beyond-reference capability evidence.
    goal_weight: float = 200.0
    height_weight: float = 5000.0
    at_goal_bonus: float = 0.0   # weight on the at_goal termination flag
    # (scaled by step_dt like every term; 0 == reference parity)


# ---------------------------------------------------------------------------
# Reward terms (ElevationRewardsCfg, mushr_elevation_env_cfg.py:283-305)
# ---------------------------------------------------------------------------


def goal_progress_rate(ctx: StepCtx) -> jax.Array:
    """5 + projection of world velocity onto the goal direction (:239-249)."""
    pos = ctx.vehicle.pos[..., :2]
    vel = ctx.vehicle.lin_vel[..., :2]
    goal_vec = ctx.command[..., :2] - pos
    norm = jnp.maximum(jnp.linalg.norm(goal_vec, axis=-1), 1e-6)
    proj = jnp.sum(vel * goal_vec, axis=-1) / norm
    return 5.0 + proj


def higher_elevation(ctx: StepCtx) -> jax.Array:
    """clip(z_above_base where climbing, 0, 1) (:166-173). The reference's
    0.19 base offset is our rest height REST_H."""
    z = ctx.vehicle.pos[..., 2] - REST_H
    vx = ctx.body_lin_vel[..., 0]
    rew = jnp.where((z > 0.1) & (vx > 0.1), z, 0.0)
    return jnp.clip(rew, 0.0, 1.0)


def is_falling_penalty(ctx: StepCtx, max_body_z_vel: float = 0.10) -> jax.Array:
    """body z velocity above threshold (:251-254)."""
    return (ctx.body_lin_vel[..., 2] > max_body_z_vel).astype(jnp.float32)


def stuck_term_penalty(ctx: StepCtx) -> jax.Array:
    """is_terminated_term on 'stuck' (:301-305)."""
    if ctx.term_flags is None or "stuck" not in ctx.term_flags:
        return jnp.zeros(ctx.vehicle.pos.shape[0], jnp.float32)
    return ctx.term_flags["stuck"].astype(jnp.float32)


# ---------------------------------------------------------------------------
# Terminations (ElevationTerminationsCfg, :349-376)
# ---------------------------------------------------------------------------


def _forward_vel(ctx: StepCtx) -> jax.Array:
    return jnp.clip(ctx.body_lin_vel[..., 0], max=1.2)


def make_below_height(atlas):
    """root_height_below_minimum 0.15 with base 0.19 -> 4 cm below rest;
    measured relative to local terrain height (:356-359). Ground height
    comes from the contact atlas (one row gather + corner reductions) — the
    full-grid `terrain.lookup` element gather measured ~30 us/step at 1024
    envs on the hot path."""

    def below_height(ctx: StepCtx) -> jax.Array:
        ground = atlas.lookup(ctx.vehicle.pos[..., :2])
        return (ctx.vehicle.pos[..., 2] - ground) < (REST_H - 0.04)

    return below_height


def stuck(ctx: StepCtx, min_vel: float = 0.02,
          wheel_spin_thr: float = 5.0) -> jax.Array:
    """not moving + spinning wheels (:342-347)."""
    not_moving = _forward_vel(ctx) < min_vel
    spinning = jnp.sum(ctx.vehicle.wheel_omega, axis=-1) > wheel_spin_thr
    return not_moving & spinning


def rollover(ctx: StepCtx, thresh_deg: float = 60.0) -> jax.Array:
    """tilt angle beyond 60 deg (upright_bool, :339-340)."""
    cos_tilt = wmath.up_dot(ctx.vehicle.quat)
    return cos_tilt < jnp.cos(jnp.deg2rad(thresh_deg))


def at_goal(ctx: StepCtx, dist: float = 0.5) -> jax.Array:
    """close_to_goal (:268-273)."""
    d = jnp.linalg.norm(
        ctx.command[..., :2] - ctx.vehicle.pos[..., :2], axis=-1)
    return d < dist


# --------------------------------------------------------------------------
# Task-success metrics (training-log evidence; done/at_goal — the goal-reach
# rate among finished episodes — comes from the termination flag itself)
# --------------------------------------------------------------------------


def goal_distance(ctx: StepCtx) -> jax.Array:
    return jnp.linalg.norm(
        ctx.command[..., :2] - ctx.vehicle.pos[..., :2], axis=-1)


def make_elevation_gain(atlas):
    """Height of local ground under the robot — rises as policies climb.
    Atlas-based for the same hot-path reason as `make_below_height`."""

    def elevation_gain(ctx: StepCtx) -> jax.Array:
        return atlas.lookup(ctx.vehicle.pos[..., :2])

    return elevation_gain


# ---------------------------------------------------------------------------
# Observations (ElevationObsCfg, :57-88)
# ---------------------------------------------------------------------------


def make_elevation_obs(atlas):
    """Obs fn closure over the terrain PatchAtlas: per-env patch row gather +
    bilinear one-hot MXU scan (sim/terrain.py) — exact bilinear sampling on
    the native terrain grid with zero per-element gathers.

    Formulated as ONE batched einsum over all envs rather than a vmap of
    per-env (676, p) @ (p, p) matmuls: identical values (measured max diff
    0.0), but the batched (B, 676, p) @ (B, p, p) contraction lets XLA tile
    the whole batch onto the MXU in one op — 2689 -> 110 us at 1024 envs
    (the per-env vmap lowering dominated the elevation iteration's 11.4 ms
    obs phase, ARCHITECTURE.md round-4 profile)."""
    p = atlas.p
    nx, ny = atlas.grid_shape
    n = SCAN_N
    axis = (jnp.arange(n, dtype=jnp.float32) - (n - 1) / 2.0) * SCAN_RES
    ox, oy = jnp.meshgrid(axis, axis, indexing="ij")
    offs_x, offs_y = ox.ravel(), oy.ravel()            # (n*n,) static

    def elevation_obs(ctx: StepCtx, key: jax.Array) -> jax.Array:
        v = ctx.vehicle
        goal_rel = jnp.nan_to_num(ctx.command[..., :2] - v.pos[..., :2])
        euler = wmath.euler_xyz_from_quat(v.quat)
        yaw = euler[..., 2]
        pos2 = v.pos[..., :2]
        b = pos2.shape[0]
        # world-corrected height map: terrain height around the robot,
        # yaw-aligned grid scan == RayCaster GridPattern attach_yaw_only
        # (:132-142). Corrected by the robot's ACTUAL z like world_height_map
        # (:44-48, `height_scan + (root_z - 0.19)` with 0.19 = rest height):
        # suspension compression / airborne state stays visible in the obs —
        # the scan reads lower while the chassis rides higher.
        rows, org = atlas.extract_rows(pos2[:, 0], pos2[:, 1])
        patch = rows.T.reshape(b, p, p)
        c, s = jnp.cos(yaw)[:, None], jnp.sin(yaw)[:, None]
        qx = pos2[:, 0, None] + offs_x[None] * c - offs_y[None] * s
        qy = pos2[:, 1, None] + offs_x[None] * s + offs_y[None] * c
        u = jnp.clip(qx / atlas.cell + (nx - 1) / 2.0 - org[0][:, None],
                     0.0, p - 1.001)
        w = jnp.clip(qy / atlas.cell + (ny - 1) / 2.0 - org[1][:, None],
                     0.0, p - 1.001)
        x0 = jnp.floor(u)
        y0 = jnp.floor(w)
        fx, fy = u - x0, w - y0
        iota = jnp.arange(p, dtype=jnp.float32)
        row_w = ((iota[None, None] == x0[..., None]) * (1.0 - fx[..., None])
                 + (iota[None, None] == (x0 + 1)[..., None]) * fx[..., None])
        col_w = ((iota[None, None] == y0[..., None]) * (1.0 - fy[..., None])
                 + (iota[None, None] == (y0 + 1)[..., None]) * fy[..., None])
        # DEFAULT dot precision (bf16 operand rounding, +-2 mm on meter-scale
        # heights) is fine: the reference adds Unoise(+-0.02 m) to this obs
        scanned = jnp.einsum("bsp,bpq->bsq", row_w, patch)       # MXU
        scan = (scanned * col_w).sum(-1)                          # (B, n*n)
        rel_scan = scan - (v.pos[..., 2] - REST_H)[..., None]
        return _concat_obs(ctx, goal_rel, euler, rel_scan)

    return elevation_obs


def _concat_obs(ctx, goal_rel, euler, rel_scan):
    return jnp.concatenate([
        goal_rel,
        euler,
        jnp.clip(ctx.body_lin_vel, -10.0, 10.0),
        jnp.clip(ctx.body_ang_vel, -10.0, 10.0),
        jnp.clip(ctx.last_action, -1.0, 1.0),
        jnp.clip(rel_scan, -10.0, 10.0),
    ], axis=-1)


# ---------------------------------------------------------------------------
# Task assembly
# ---------------------------------------------------------------------------


@host_build_fn  # builder eager math on local CPU (utils/host.py)
def make_elevation_task(cfg: ElevationTaskCfg) -> TaskModel:
    n = cfg.num_envs
    base_key = jax.random.PRNGKey(cfg.seed)
    terrain = generate_elevation_terrain(
        jax.random.fold_in(base_key, 23), extent=cfg.terrain_extent,
        cell=cfg.terrain_cell, num_mounds=cfg.num_mounds,
        friction=cfg.wheel_friction)
    # Patch atlas shared by wheel contact (dynamics.step) and the height-scan
    # obs: p=24/stride=6 covers wheel reach + travel AND the 2.5 m scan.
    # host_const: atlas + terrain are captured by jitted closures
    # (utils/host.py — leaves must embed as HLO literals, not device buffers)
    from ...utils.host import host_const
    terrain = host_const(terrain)
    atlas = host_const(terrain.build_atlas(p=24, stride=6))
    # Separate SMALL atlas for wheel contact + step-path ground lookups:
    # contact only needs wheel reach (~0.2 m) + per-control-step travel
    # (<=0.3 m) inside the (p/2 - stride/2 - 1)*cell = 1.0 m slack, and the
    # fused kernel's corner-extraction cost scales with p^2 patch rows
    # (p=12 -> 4x cheaper than the 2.5 m-scan-sized p=24 patch).
    contact_atlas = host_const(terrain.build_atlas(p=12, stride=2))

    # MUSHR_SUS 4WD asset (reference mushr_elevation_env_cfg.py:130 +
    # Mushr4WDActionCfg)
    base_params = MUSHR_SUS_CFG
    action = MUSHR_4WD_ACTION

    env_cfg = EnvCfg(
        num_envs=n, sim_dt=cfg.sim_dt, decimation=cfg.decimation,
        episode_length_s=cfg.episode_length_s, action=action,
        enable_corruption=cfg.enable_corruption,
        events_enabled=cfg.events_enabled)

    def init_params(key, num):
        """Startup DR (:383-407): friction fixed 1.0, mass add U(0.2, 0.5)."""
        params = batch_params(base_params, num)
        if not cfg.events_enabled:
            return params
        k_mass, = jax.random.split(key, 1)
        dmass = jax.random.uniform(
            k_mass, (num,), minval=cfg.mass_delta_range[0],
            maxval=cfg.mass_delta_range[1])
        return with_mass(params, params.mass + dmass)

    def sample_spawn(key, num):
        """reset_root_state_uniform over +-19 m, yaw +-pi, small forward vel
        (:409-419); z snapped to local terrain height."""
        k_xy, k_yaw, k_vel = jax.random.split(key, 3)
        xy = jax.random.uniform(
            k_xy, (num, 2), minval=-cfg.spawn_range, maxval=cfg.spawn_range)
        yaw = jax.random.uniform(k_yaw, (num,), minval=-jnp.pi, maxval=jnp.pi)
        vel_xy = jax.random.uniform(
            k_vel, (num, 2), minval=cfg.spawn_vel_range[0],
            maxval=cfg.spawn_vel_range[1])
        ground = contact_atlas.lookup(xy)  # gather-free (runs every step
        # for auto-reset; full-grid lookup measured ~50 us at 1024 envs)
        pos = jnp.concatenate([xy, (ground + REST_H + 0.02)[:, None]], -1)
        state = VehicleState.zero((num,))
        lin_vel = jnp.concatenate([vel_xy, jnp.zeros((num, 1))], -1)
        return state.replace(pos=pos, quat=wmath.quat_from_yaw(yaw),
                             lin_vel=lin_vel)

    def at_goal_bonus_term(ctx: StepCtx) -> jax.Array:
        """is_terminated_term on 'at_goal' — the terminal goal bonus the
        reference MDP lacks (goal_analysis.md); active only in the
        goal-seeking variant (at_goal_bonus > 0)."""
        if ctx.term_flags is None or "at_goal" not in ctx.term_flags:
            return jnp.zeros(ctx.vehicle.pos.shape[0], jnp.float32)
        return ctx.term_flags["at_goal"].astype(jnp.float32)

    reward_terms = (
        RewardTerm("vel_towards_goal", cfg.goal_weight, goal_progress_rate),
        RewardTerm("height_z", cfg.height_weight, higher_elevation),
        RewardTerm("falling_penalty", 0.0, is_falling_penalty),
        RewardTerm("termination_penalty", -200.0, stuck_term_penalty),
    ) if cfg.rewards_enabled else ()
    if cfg.rewards_enabled and cfg.at_goal_bonus:
        reward_terms = reward_terms + (
            RewardTerm("at_goal_bonus", cfg.at_goal_bonus,
                       at_goal_bonus_term),)

    curriculum = (
        CurriculumTerm("vel_towards_goal", 5.0, 50, 5),
        CurriculumTerm("falling_penalty", 1.0, 50, 10),
    ) if cfg.rewards_enabled else ()

    command = CommandCfg(
        pos_x=(-cfg.goal_range, cfg.goal_range),
        pos_y=(-cfg.goal_range, cfg.goal_range),
        heading=(-3.14, 3.14),
        resampling_time_s=cfg.goal_resample_s)

    return TaskModel(
        cfg=env_cfg,
        terrain=terrain,
        obs_dim=ELEV_OBS_DIM,
        init_params=init_params,
        sample_spawn=sample_spawn,
        reward_terms=reward_terms,
        termination_fns=({
            "cart_out_of_bounds": make_below_height(contact_atlas),
            "stuck": stuck,
            "rollover": rollover,
            "at_goal": at_goal,
        } if cfg.terminations_enabled else {}),
        observe=make_elevation_obs(atlas),
        curriculum=curriculum,
        command=command,
        terrain_atlas=atlas,
        contact_atlas=contact_atlas,
        metric_fns={"goal_dist": goal_distance,
                    "ground_height": make_elevation_gain(contact_atlas)},
        render_grid=(np.asarray(terrain.height).T, float(terrain.cell)),
    )


def make_elevation_env(cfg: ElevationTaskCfg = ElevationTaskCfg()) -> WheeledEnv:
    return WheeledEnv(make_elevation_task(cfg))
