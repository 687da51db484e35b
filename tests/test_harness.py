"""Harness tests: run-config registry, CLI plumbing, end-to-end train-
checkpoint-resume-play on CPU (reference scripts train_rl.py/play_policy.py
equivalents)."""

import json
import os

import numpy as np
import pytest

import wheeledlab_tpu.rl  # noqa: F401  registers run configs
from wheeledlab_tpu.utils.config import RUN_CONFIGS, override


class TestRunConfigs:
    def test_all_named_configs_registered(self):
        """Parity: RSS_DRIFT/RSS_ELEV/RSS_VISUAL/F1TENTH_DRIFT
        (reference rss_cfgs.py, f1tenth_cfgs.py)."""
        # per-task budgets: drift keeps the reference RLTrainConfig 5000;
        # elev/visual/f1tenth carry the agent-cfg budgets (4000/4000/1500,
        # rsl_rl_ppo_cfg.py:7) that produced the committed docs/runs artifacts
        budgets = {"RSS_DRIFT_CONFIG": 5000, "RSS_ELEV_CONFIG": 4000,
                   "RSS_VISUAL_CONFIG": 4000, "F1TENTH_DRIFT_CONFIG": 1500,
                   "RSS_DRIFT_RNN_CONFIG": 1500, "ELEV_GOAL_CONFIG": 1500,
                   "POD_DRIFT_CONFIG": 5000}
        for name, budget in budgets.items():
            cfg = RUN_CONFIGS.get(name)
            assert cfg.train.num_iterations == budget, name
            assert cfg.agent.num_steps_per_env == 128

    def test_reference_hyperparams(self):
        cfg = RUN_CONFIGS.get("RSS_DRIFT_CONFIG")
        a = cfg.agent
        assert a.learning_rate == 1e-3 and a.desired_kl == 0.01
        assert a.gamma == 0.99 and a.lam == 0.95 and a.clip_param == 0.2
        assert a.entropy_coef == 0.005 and a.max_grad_norm == 1.0
        assert a.num_learning_epochs == 5 and a.num_mini_batches == 4
        assert a.actor_hidden == (64, 64) and a.activation == "elu"
        assert RUN_CONFIGS.get("RSS_ELEV_CONFIG").agent.activation == "relu"


class TestTrainResumePlay:
    def test_end_to_end(self, tmp_path):
        """Short train -> checkpoint -> resume -> play-style rollout."""
        from wheeledlab_tpu.rl.runner import train

        cfg = RUN_CONFIGS.get("RSS_DRIFT_CONFIG")
        cfg = override(cfg, "num_envs", 16)
        cfg = override(cfg, "train.num_iterations", 4)
        cfg = override(cfg, "agent.num_steps_per_env", 8)
        cfg = override(cfg, "agent.num_learning_epochs", 2)
        cfg = override(cfg, "agent.num_mini_batches", 2)
        cfg = override(cfg, "train.log.logs_dir", str(tmp_path))
        cfg = override(cfg, "train.log.run_name", "t1")
        cfg = override(cfg, "train.log.log_every", 2)
        cfg = override(cfg, "train.log.checkpoint_every", 2)
        state, metrics = train(cfg, verbose=False)
        assert int(state.iteration) == 4
        run_dir = tmp_path / "t1"
        assert (run_dir / "metrics.jsonl").exists()
        assert (run_dir / "run_config.json").exists()
        ckpts = os.listdir(run_dir / "checkpoints")
        assert "2" in ckpts and "4" in ckpts

        # resume
        cfg2 = override(cfg, "train.load_run", "t1")
        cfg2 = override(cfg2, "train.log.run_name", "t2")
        cfg2 = override(cfg2, "train.num_iterations", 6)
        state2, _ = train(cfg2, verbose=False)
        assert int(state2.iteration) == 6

        # play-style deterministic rollout from checkpoint
        import jax

        from wheeledlab_tpu.rl.ppo import make_ppo
        from wheeledlab_tpu.rl.runner import (
            _checkpoint_manager, restore_checkpoint,
        )
        from wheeledlab_tpu.tasks import make_env

        env = make_env("MushrDriftRL-v0", num_envs=16, play=True)
        init_fn, _, policy_apply = make_ppo(env, cfg.agent)
        template = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
        mgr = _checkpoint_manager(str(run_dir))
        restored = restore_checkpoint(mgr, 0, template)
        env_state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
        mean, std, value = policy_apply(restored.params, obs)
        assert mean.shape == (16, 2)
        assert np.isfinite(np.asarray(mean)).all()

    def test_cli_parser(self):
        from wheeledlab_tpu.cli.train import build_parser

        p = build_parser()
        args, extra = p.parse_known_args(
            ["-r", "RSS_DRIFT_CONFIG", "--num-envs", "64",
             "agent.learning_rate=1e-4", "--headless"])
        assert args.run_config == "RSS_DRIFT_CONFIG"
        assert args.num_envs == 64
        assert "agent.learning_rate=1e-4" in extra


class TestGymAdapter:
    def test_gym_vec_env(self):
        from wheeledlab_tpu.envs.wrappers import GymVecEnv
        from wheeledlab_tpu.tasks import make_env

        env = GymVecEnv(make_env("MushrDriftRL-v0", num_envs=4))
        obs, info = env.reset(seed=0)
        assert obs.shape == (4, 14)
        obs, rew, term, trunc, info = env.step(np.zeros((4, 2)))
        assert rew.shape == (4,)
        assert term.dtype == bool


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-x", "-q"]))

class TestMppiDemo:
    def test_mppi_demo_smoke(self, tmp_path):
        """scripts/mppi_demo.py end-to-end at toy scale: the planning loop
        runs, MPPI beats the open-loop nominal on the env's own reward."""
        import json
        import subprocess
        import sys

        out = tmp_path / "mppi.json"
        r = subprocess.run(
            [sys.executable, "scripts/mppi_demo.py", "--samples", "64",
             "--horizon", "4", "--steps", "12", "--out", str(out)],
            capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]
        d = json.load(open(out))
        assert d["env_steps_per_control_step"] == 64 * 4
        import numpy as np
        assert np.isfinite(d["mppi/reward_mean"])
        assert np.isfinite(d["nominal_only/reward_mean"])

