"""Deployment export (cli/export.py): the orbax checkpoint converts to an
rsl_rl-compatible ``model_<it>.pt`` (reference RealLab sim2real consumption,
README.md:92-101; save layout modified_rsl_rl_runner.py:125-126) and a
framework-agnostic npz. The torch reconstruction must reproduce the JAX
policy's action means."""

import json
import os

import numpy as np
import pytest

TINY = [
    "num_envs=8", "train.num_iterations=3",
    "agent.num_steps_per_env=8", "agent.num_learning_epochs=2",
    "agent.num_mini_batches=2", "train.log.log_every=1",
    "train.log.checkpoint_every=1",
]


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    from wheeledlab_tpu.cli.train import main as train_main

    tmp = tmp_path_factory.mktemp("export")
    train_main(["-r", "RSS_DRIFT_CONFIG"] + TINY
               + [f"train.log.logs_dir={tmp}", "train.log.run_name=exp"])
    return tmp


class TestExport:
    def test_pt_matches_jax_policy(self, trained_run):
        """Rebuild the exported state dict as a torch rsl_rl-style
        ``ActorCritic`` (nn.Sequential actor/critic, ``std`` parameter) and
        check torch(obs) == jax(obs)."""
        import torch

        from wheeledlab_tpu.cli.export import main as export_main

        (pt_path, npz_path) = export_main(
            ["--run", "exp", "--logs-dir", str(trained_run)])
        blob = torch.load(pt_path, weights_only=True)
        assert set(blob) == {"model_state_dict", "optimizer_state_dict",
                             "iter", "infos"}
        assert blob["iter"] == 3
        sd = blob["model_state_dict"]
        assert set(sd) == {
            "std",
            *(f"{h}.{i}.{p}" for h in ("actor", "critic")
              for i in (0, 2, 4) for p in ("weight", "bias"))}

        # rsl_rl ActorCritic: MLP [64, 64] elu for drift
        # (drifting/config/agents/mushr/rsl_rl_ppo_cfg.py:13-18)
        def seq(out_dim):
            return torch.nn.Sequential(
                torch.nn.Linear(14, 64), torch.nn.ELU(),
                torch.nn.Linear(64, 64), torch.nn.ELU(),
                torch.nn.Linear(64, out_dim))

        actor, critic = seq(2), seq(1)
        actor.load_state_dict(
            {k.split(".", 1)[1]: v for k, v in sd.items()
             if k.startswith("actor.")})
        critic.load_state_dict(
            {k.split(".", 1)[1]: v for k, v in sd.items()
             if k.startswith("critic.")})

        # the same params via the JAX policy
        import jax

        from wheeledlab_tpu.rl.ppo import PPOCfg, make_learner
        from wheeledlab_tpu.rl.runner import (_checkpoint_manager,
                                              restore_checkpoint)
        from wheeledlab_tpu.tasks import make_env

        run_dir = os.path.join(trained_run, "exp")
        saved = json.load(open(os.path.join(run_dir, "run_config.json")))["run"]
        env = make_env(saved["task_name"], num_envs=saved["num_envs"])
        agent_cfg = PPOCfg(**{k: (tuple(v) if isinstance(v, list) else v)
                              for k, v in saved["agent"].items()})
        init_fn, _, policy_apply = make_learner(env, agent_cfg)
        state = restore_checkpoint(
            _checkpoint_manager(run_dir), 0,
            jax.eval_shape(init_fn, jax.random.PRNGKey(0)))

        obs = np.random.default_rng(0).normal(size=(32, 14)).astype(np.float32)
        mean_j, std_j, value_j = jax.jit(policy_apply)(state.params, obs)
        with torch.no_grad():
            mean_t = actor(torch.from_numpy(obs)).numpy()
            value_t = critic(torch.from_numpy(obs)).numpy()[:, 0]
        np.testing.assert_allclose(mean_t, np.asarray(mean_j),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(value_t, np.asarray(value_j),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(sd["std"].numpy(), np.asarray(std_j)[0],
                                   rtol=1e-5)

    def test_npz_metadata(self, trained_run):
        npz = np.load(os.path.join(
            trained_run, "exp", "export", "exp-policy.npz"))
        meta = json.loads(bytes(npz["__meta__"]).decode())
        assert meta["obs_dim"] == 14 and meta["action_dim"] == 2
        assert meta["activation"] == "elu"
        # action de-normalization for deployment (reference scale (3.0, .488))
        assert meta["action_scale"] == [3.0, 0.488]
        assert npz["actor.0.weight"].shape == (64, 14)


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-x", "-q"]))


class TestRecurrentExport:
    def test_recurrent_npz_export(self, tmp_path):
        """Recurrent runs export the full param pytree as npz (the .pt
        format targets rsl_rl's MLP ActorCritic only — cli/export.py:94-100
        falls back with a notice)."""
        from wheeledlab_tpu.cli.export import main as export_main
        from wheeledlab_tpu.cli.train import main as train_main

        train_main(["-r", "RSS_DRIFT_RNN_CONFIG"] + TINY
                   + ["agent.rnn_hidden_size=16",
                      f"train.log.logs_dir={tmp_path}",
                      "train.log.run_name=rexp"])
        export_main(["--run", "rexp", "--logs-dir", str(tmp_path)])
        exp_dir = tmp_path / "rexp" / "export"
        npzs = [f for f in os.listdir(exp_dir) if f.endswith(".npz")]
        assert npzs, os.listdir(exp_dir)
        data = np.load(exp_dir / npzs[0])
        # LSTM kernels present in the flattened pytree
        assert any("memory" in k for k in data.files), data.files[:10]
