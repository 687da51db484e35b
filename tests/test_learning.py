"""Learning tests.

Two tiers (SURVEY.md §4; VERDICT r1 "prove the learning north star"):

1. `test_drift_improves` — CPU-scale PPO must actually IMPROVE: mean rollout
   reward of the last 5 iterations beats the first 5 by a margin that holds
   across seeds (measured: ratios 1.5-1.7x for seeds 0-3 at this scale). This
   would fail on a policy that learns nothing.
2. `TestAllTasksImprove` — the same improvement bar for every other task
   (f1tenth drift, elevation, visual) at CPU scale, so a learning
   regression in ANY task is caught before a TPU artifact regen
   (full-scale evidence lives in docs/runs/*, checked by
   test_run_artifacts.py).

~2.5 min total on the CPU test mesh.
"""

import jax
import numpy as np
import pytest

from wheeledlab_tpu.rl.ppo import PPOCfg, make_ppo
from wheeledlab_tpu.tasks import make_env

SMALL = dict(num_steps_per_env=16, num_learning_epochs=2, num_mini_batches=2)


def run_iters(task, num_envs, iters, ppo=None, collect=("rollout/reward_mean",),
              **overrides):
    env = make_env(task, num_envs=num_envs, overrides=overrides or None)
    init_fn, train_iter, _ = make_ppo(env, PPOCfg(**(ppo or SMALL)))
    state = jax.jit(init_fn)(jax.random.PRNGKey(0))
    it = jax.jit(train_iter, donate_argnums=(0,))
    out = {k: [] for k in collect}
    for _ in range(iters):
        state, m = it(state)
        for k in collect:
            out[k].append(float(m[k]))
        assert np.isfinite(out["rollout/reward_mean"][-1])
        assert np.isfinite(float(m["loss/total"]))
    return out if len(collect) > 1 else out[collect[0]]


class TestDriftImproves:
    """The machine-checkable core of the reference's headline claim (a policy
    that trains, reference README.md:68): PPO on the drift MDP must raise the
    rollout reward, not just produce finite numbers."""

    def test_drift_improves(self):
        out = run_iters(
            "MushrDriftRL-v0", 256, 40,
            ppo=dict(num_steps_per_env=32, num_learning_epochs=3,
                     num_mini_batches=4),
            collect=("rollout/reward_mean", "metrics/slip_deg"))
        rews = out["rollout/reward_mean"]
        first5, last5 = np.mean(rews[:5]), np.mean(rews[-5:])
        # measured seeds 0-3: first5 0.63-0.75, last5 0.97-1.21
        assert last5 > first5 + 0.2, (first5, last5)
        assert last5 > 1.2 * first5, (first5, last5)
        # the drift success metric is live and finite throughout
        assert np.isfinite(out["metrics/slip_deg"]).all()


class TestAllTasksImprove:
    """CPU-scale IMPROVEMENT assertions for every task (VERDICT r4 #3):
    each MDP's rollout reward must rise materially over a short budget, so a
    learning regression is caught before a TPU artifact regen. Bars are
    calibrated across seeds 0-3 (ratios measured: f1tenth 1.35-1.71x,
    elevation 1.13-1.63x, visual 1.18-2.41x; the fixed CI seed 0 sits well
    inside every bar). Full-scale learning evidence lives in docs/runs/*
    TPU artifacts, regression-checked by test_run_artifacts.py."""

    def test_f1tenth_improves(self):
        rews = run_iters(
            "F1TenthDriftRL-v0", 256, 40,
            ppo=dict(num_steps_per_env=32, num_learning_epochs=3,
                     num_mini_batches=4))
        first5, last5 = np.mean(rews[:5]), np.mean(rews[-5:])
        # measured seed 0: 0.70 -> 1.19
        assert last5 > first5 + 0.15, (first5, last5)
        assert last5 > 1.2 * first5, (first5, last5)

    def test_elevation_improves(self):
        rews = run_iters(
            "MushrElevationRL-v0", 128, 50,
            ppo=dict(num_steps_per_env=32, num_learning_epochs=3,
                     num_mini_batches=4),
            terrain_extent=20.0, num_mounds=10, spawn_range=8.0,
            goal_range=8.0)
        first5, last5 = np.mean(rews[:5]), np.mean(rews[-5:])
        # measured seed 0 on the CI 8-device mesh: 235.2 -> 304.4 (policy
        # gains goal velocity, stops triggering the stuck penalty)
        assert last5 > first5 + 30.0, (first5, last5)
        assert last5 > 1.1 * first5, (first5, last5)

    def test_visual_improves(self):
        rews = run_iters(
            "MushrVisualRL-v0", 64, 25,
            ppo=dict(num_steps_per_env=32, num_learning_epochs=3,
                     num_mini_batches=4),
            map_rows=100, map_cols=100, env_rows=20, env_cols=20,
            group_rows=5, group_cols=5)
        first5, last5 = np.mean(rews[:5]), np.mean(rews[-5:])
        # measured seed 0: 1.71 -> 4.12 (drives forward, stays on corridor)
        assert last5 > first5 + 0.8, (first5, last5)
        assert last5 > 1.3 * first5, (first5, last5)


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-x", "-q"]))
