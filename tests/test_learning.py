"""Learning smoke tests (CPU, small scale): a few PPO iterations on each task
must run end-to-end and improve or hold return without NaNs. Full-scale
learning validation happens on TPU (RSS_DRIFT trains to drifting in ~5 min —
see docs/ARCHITECTURE.md); these guard the training path per task.

Marked slow-ish: ~2 min total on the CPU test mesh."""

import jax
import numpy as np
import pytest

from wheeledlab_tpu.rl.ppo import PPOCfg, make_ppo
from wheeledlab_tpu.tasks import make_env

SMALL = dict(num_steps_per_env=16, num_learning_epochs=2, num_mini_batches=2)


def run_iters(task, num_envs, iters, **overrides):
    env = make_env(task, num_envs=num_envs, overrides=overrides or None)
    init_fn, train_iter, _ = make_ppo(env, PPOCfg(**SMALL))
    state = jax.jit(init_fn)(jax.random.PRNGKey(0))
    it = jax.jit(train_iter, donate_argnums=(0,))
    returns = []
    for _ in range(iters):
        state, m = it(state)
        returns.append(float(m["rollout/reward_mean"]))
        assert np.isfinite(returns[-1])
        assert np.isfinite(float(m["loss/total"]))
    return returns


class TestLearningSmoke:
    def test_drift_trains(self):
        rets = run_iters("MushrDriftRL-v0", 32, 8)
        assert len(rets) == 8

    def test_elevation_trains(self):
        rets = run_iters(
            "MushrElevationRL-v0", 16, 4,
            terrain_extent=20.0, num_mounds=10, spawn_range=8.0,
            goal_range=8.0)
        assert len(rets) == 4

    def test_visual_trains(self):
        rets = run_iters(
            "MushrVisualRL-v0", 8, 3,
            map_rows=100, map_cols=100, env_rows=20, env_cols=20,
            group_rows=5, group_cols=5)
        assert len(rets) == 3

    def test_f1tenth_trains(self):
        rets = run_iters("F1TenthDriftRL-v0", 16, 4)
        assert len(rets) == 4


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-x", "-q"]))
