"""Drivetrain action maps: policy [throttle, steer] -> joint targets.

Behavioral parity with the reference action terms (formulas reproduced from
source/wheeledlab/wheeledlab/envs/mdp/actions/ackermann_actions.py:119-200 and
rc_car_actions.py:6-64), re-expressed as pure jnp functions over batched
arrays. Targets feed the actuator models in `dynamics.py`.

Wheel-target order: [back_left, back_right, front_left, front_right];
steer order [left, right]. Undriven wheels get target 0 and are masked by
`drive_mask` downstream.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.config import configclass


@configclass
class ActionMapCfg:
    """Parity with AckermannActionCfg (reference actions_cfg.py:14-67)."""

    drivetrain: str = "rwd"                 # "ackermann" | "rwd" | "4wd"
    scale: Tuple[float, float] = (3.0, 0.488)
    offset: Tuple[float, float] = (0.0, 0.0)
    bounding_strategy: Optional[str] = "clip"   # "clip" | "tanh" | None
    no_reverse: bool = True
    base_length: float = 0.325
    base_width: float = 0.2
    wheel_radius: float = 0.05


def process_actions(raw: jax.Array, cfg: ActionMapCfg) -> jax.Array:
    """Bound + scale + offset + no-reverse clamp.

    Parity: AckermannAction.process_actions (ackermann_actions.py:119-133)."""
    scale = jnp.asarray(cfg.scale, raw.dtype)
    offset = jnp.asarray(cfg.offset, raw.dtype)
    if cfg.bounding_strategy == "clip":
        out = jnp.clip(raw, -1.0, 1.0) * scale + offset
    elif cfg.bounding_strategy == "tanh":
        out = jnp.tanh(raw) * scale + offset
    else:
        out = raw * scale + offset
    if cfg.no_reverse:
        out = out.at[..., 0].set(jnp.maximum(out[..., 0], 0.0))
    return out


def _ackermann_geometry(v: jax.Array, steer: jax.Array, cfg: ActionMapCfg):
    """Shared turn-radius terms (ackermann_actions.py:179-196)."""
    L, W, r = cfg.base_length, cfg.base_width, cfg.wheel_radius
    tan_steering = jnp.tan(steer)
    R = jnp.where(tan_steering == 0.0, 1e6, L / tan_steering)
    r_rear_left = jnp.sqrt((R - W / 2) ** 2 + L**2)
    r_rear_right = jnp.sqrt((R + W / 2) ** 2 + L**2)
    v_front_left = v * jnp.abs(r_rear_left / (R * r))
    v_front_right = v * jnp.abs(r_rear_right / (R * r))
    v_back_left = v * jnp.abs((R - W / 2) / (R * r))
    v_back_right = v * jnp.abs((R + W / 2) / (R * r))
    return R, tan_steering, v_back_left, v_back_right, v_front_left, v_front_right


def ackermann_map(processed: jax.Array, cfg: ActionMapCfg):
    """Full Ackermann steering geometry (ackermann_actions.py:150-200):
    per-wheel steer angles delta_l/r = atan(L / (R ∓ W/2)) and IC-adjusted
    wheel angular velocity targets."""
    v, steer = processed[..., 0], processed[..., 1]
    L, W = cfg.base_length, cfg.base_width
    R, _, vbl, vbr, vfl, vfr = _ackermann_geometry(v, steer, cfg)
    delta_left = jnp.arctan(L / (R - W / 2))
    delta_right = jnp.arctan(L / (R + W / 2))
    steer_targets = jnp.stack([delta_left, delta_right], axis=-1)
    wheel_targets = jnp.stack([vbl, vbr, vfl, vfr], axis=-1)
    return steer_targets, wheel_targets


def rwd_map(processed: jax.Array, cfg: ActionMapCfg):
    """MuSHR RWD: tan steering + uniform rear throttle
    (rc_car_actions.py:12-29). Front wheels are passive (target 0)."""
    v, steer = processed[..., 0], processed[..., 1]
    tan_steering = jnp.tan(steer)
    target_ang_vel = v / cfg.wheel_radius
    steer_targets = jnp.stack([tan_steering, tan_steering], axis=-1)
    zeros = jnp.zeros_like(target_ang_vel)
    wheel_targets = jnp.stack([target_ang_vel, target_ang_vel, zeros, zeros], axis=-1)
    return steer_targets, wheel_targets


def four_wd_map(processed: jax.Array, cfg: ActionMapCfg):
    """4WD: tan steering + open-diff Ackermann-adjusted 4-wheel throttle
    (rc_car_actions.py:33-64)."""
    v, steer = processed[..., 0], processed[..., 1]
    _, tan_steering, vbl, vbr, vfl, vfr = _ackermann_geometry(v, steer, cfg)
    steer_targets = jnp.stack([tan_steering, tan_steering], axis=-1)
    wheel_targets = jnp.stack([vbl, vbr, vfl, vfr], axis=-1)
    return steer_targets, wheel_targets


_MAPS = {"ackermann": ackermann_map, "rwd": rwd_map, "4wd": four_wd_map}


def action_to_targets(raw: jax.Array, cfg: ActionMapCfg):
    """raw policy action (..., 2) -> (steer_targets (...,2), wheel_targets (...,4))."""
    processed = process_actions(raw, cfg)
    return _MAPS[cfg.drivetrain](processed, cfg)
