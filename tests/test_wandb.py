"""W&B sink parity (reference logs metrics + uploads training videos to
wandb: train_rl.py:47-59, custom_video_recorder.py:49-75). wandb itself is
not installed here (zero egress), so a stub module is injected and the
runner's `MetricLogger` is driven through a real training run."""

import sys
import types

import numpy as np
import pytest


class _FakeRun:
    def __init__(self):
        self.logged = []
        self.finished = False

    def log(self, payload, step=None):
        self.logged.append((step, payload))

    def finish(self):
        self.finished = True


class _FakeVideo:
    def __init__(self, data, fps=None):
        assert data.ndim == 4 and data.shape[1] == 3  # (T, C, H, W)
        self.data = data
        self.fps = fps


@pytest.fixture
def fake_wandb(monkeypatch):
    mod = types.ModuleType("wandb")
    mod.run = _FakeRun()
    mod.init = lambda **kw: mod.run
    mod.Video = _FakeVideo
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return mod


class TestWandbSink:
    def test_metrics_and_video_uploaded(self, fake_wandb, tmp_path):
        from wheeledlab_tpu.cli.train import main

        main(["-r", "RSS_DRIFT_CONFIG", "num_envs=16",
              "train.num_iterations=4", "agent.num_steps_per_env=8",
              "agent.num_learning_epochs=2", "agent.num_mini_batches=2",
              "train.log.log_every=2", "train.log.no_checkpoints=True",
              "train.log.no_wandb=False", "--video",
              "train.log.video_interval=2",
              f"train.log.logs_dir={tmp_path}", "train.log.run_name=w1"])

        payloads = [p for _, p in fake_wandb.run.logged]
        # metric rows at the log_every cadence
        metric_steps = [s for s, p in fake_wandb.run.logged if "video" not in p]
        assert metric_steps == [2, 4]
        assert all("episode/return" in p and "loss/kl" in p
                   for p in payloads if "video" not in p)
        # training video uploaded at video_interval (reference
        # custom_video_recorder.py:49-75 wandb.Video upload)
        videos = [p["video"] for _, p in fake_wandb.run.logged if "video" in p]
        assert len(videos) == 2
        assert isinstance(videos[0], _FakeVideo)
        assert videos[0].data.dtype == np.uint8
        assert fake_wandb.run.finished

    def test_no_wandb_default_keeps_offline(self, fake_wandb, tmp_path):
        """no_wandb defaults True (deliberate inversion of the reference's
        opt-out default for a zero-egress environment — PARITY.md §2b)."""
        from wheeledlab_tpu.cli.train import main

        main(["-r", "RSS_DRIFT_CONFIG", "num_envs=16",
              "train.num_iterations=2", "agent.num_steps_per_env=8",
              "agent.num_learning_epochs=1", "agent.num_mini_batches=1",
              "train.log.log_every=1", "train.log.no_checkpoints=True",
              f"train.log.logs_dir={tmp_path}", "train.log.run_name=w2"])
        assert fake_wandb.run.logged == []


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
