"""Shared observation terms — parity with the reference BlindObsCfg
(source/wheeledlab_tasks/wheeledlab_tasks/common/observations.py:19-56) and
root_euler_xyz (source/wheeledlab/wheeledlab/envs/mdp/observations.py:9-12).

Obs layout (14-D): root_pos_w(3) | root_euler_xyz(3) | base_lin_vel(3) |
base_ang_vel(3) | last_action(2). Gaussian noise stds match the reference;
corruption is gated by cfg.enable_corruption (on for RL, off for play)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...envs.env import StepCtx
from ...utils import math as wmath

BLIND_OBS_DIM = 14
# numpy on purpose: a module-level jnp constant is an eager device op at
# import time (a network round trip on remote backends); as numpy it embeds
# as a trace-time literal (utils/host.py rationale)
_NOISE_STD = np.concatenate([
    np.full((3,), 0.1, np.float32),   # root_pos_w       (Gnoise std 0.1)
    np.full((3,), 0.1, np.float32),   # root_euler_xyz   (Gnoise std 0.1)
    np.full((3,), 0.5, np.float32),   # base_lin_vel     (Gnoise std 0.5)
    np.full((3,), 0.4, np.float32),   # base_ang_vel     (Gnoise std 0.4)
    np.zeros((2,), np.float32),       # last_action      (clipped, no noise)
])


def blind_obs(ctx: StepCtx, key: jax.Array, enable_corruption: bool) -> jax.Array:
    v = ctx.vehicle
    euler = wmath.euler_xyz_from_quat(v.quat)
    obs = jnp.concatenate([
        v.pos,
        euler,
        ctx.body_lin_vel,
        ctx.body_ang_vel,
        jnp.clip(ctx.last_action, -1.0, 1.0),
    ], axis=-1)
    if enable_corruption:
        noise = jax.random.normal(key, obs.shape) * _NOISE_STD
        obs = obs + noise
    return obs
