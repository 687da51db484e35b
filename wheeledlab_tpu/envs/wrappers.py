"""Env wrappers — parity with the reference's wrapper stack
(ClipAction: wheeledlab_rl/utils/clip_action.py:5-26; RslRlVecEnvWrapper;
gymnasium registry adapter per SURVEY.md §2b).

The core env is already functional/batched, so ClipAction is a function
composition, and the gym adapter is a thin stateful shell for parity tests and
external tooling — NOT the hot path."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .env import StepOutput, WheeledEnv


class ClipActionEnv:
    """Clips incoming actions to [-1, 1] before the env sees them
    (reference clip_action.py clips to the action-space bounds)."""

    def __init__(self, env: WheeledEnv, low: float = -1.0, high: float = 1.0):
        self.env = env
        self.low, self.high = low, high
        self.num_envs = env.num_envs
        self.obs_dim = env.obs_dim
        self.action_dim = env.action_dim
        self.max_episode_length = env.max_episode_length

    def reset(self, key):
        return self.env.reset(key)

    def step(self, state, action) -> Tuple[object, StepOutput]:
        return self.env.step(state, jnp.clip(action, self.low, self.high))


class GymVecEnv:
    """Stateful gymnasium-style vector adapter over the functional env:
    `reset(seed) -> (obs, info)`, `step(actions) -> (obs, rew, terminated,
    truncated, info)`. Auto-reset semantics match the functional core (which
    matches IsaacLab: obs returned post-reset)."""

    def __init__(self, env: WheeledEnv, seed: int = 0):
        self.env = env
        self.num_envs = env.num_envs
        self._step = jax.jit(env.step)
        self._reset = jax.jit(env.reset)
        self._state = None
        self._seed = seed

    def reset(self, seed: Optional[int] = None):
        key = jax.random.PRNGKey(self._seed if seed is None else seed)
        self._state, obs = self._reset(key)
        return np.asarray(obs), {}

    def step(self, actions):
        self._state, out = self._step(self._state, jnp.asarray(actions))
        terminated = np.asarray(out.done) & ~np.asarray(out.time_out)
        return (np.asarray(out.obs), np.asarray(out.reward), terminated,
                np.asarray(out.time_out),
                {k: np.asarray(v) for k, v in out.info.items()})

    @property
    def single_action_space_shape(self):
        return (self.env.action_dim,)

    @property
    def single_observation_space_shape(self):
        return (self.env.obs_dim,)
