"""End-to-end CLI surface tests (VERDICT r1 item 9): multirun sweeps, train
--video, play --video, and train.profile — each drives the real CLI `main()`
on tiny CPU configs and asserts on the files it leaves behind."""

import os

import numpy as np
import pytest

TINY = [
    "num_envs=16", "train.num_iterations=4",
    "agent.num_steps_per_env=8", "agent.num_learning_epochs=2",
    "agent.num_mini_batches=2", "train.log.log_every=2",
    "train.log.checkpoint_every=2",
]


def tiny_args(tmp_path, run_name, *extra):
    return (["-r", "RSS_DRIFT_CONFIG"] + TINY
            + [f"train.log.logs_dir={tmp_path}",
               f"train.log.run_name={run_name}"] + list(extra))


class TestTrainCLI:
    def test_multirun_sweep_writes_two_run_dirs(self, tmp_path):
        """Hydra-multirun parity (reference docs 'Starting a Run' multirun):
        a comma-separated override fans out into one run per value."""
        from wheeledlab_tpu.cli.train import main

        main(tiny_args(tmp_path, "sweep", "-m",
                       "agent.learning_rate=1e-3,5e-4",
                       "train.log.no_checkpoints=True"))
        import json
        for i, lr in enumerate((1e-3, 5e-4)):
            run_dir = tmp_path / f"sweep-{i}"
            assert (run_dir / "metrics.jsonl").exists()
            saved = json.load(open(run_dir / "run_config.json"))
            assert abs(saved["run"]["agent"]["learning_rate"] - lr) < 1e-12

    def test_env_override_reaches_built_env(self, tmp_path):
        """`env.*` dotted overrides (reference utils/hydra.py:103-167 grammar,
        e.g. `env.rewards.side_slip.weight=100.0`) must route into the task
        cfg that the env is actually built from, and be recorded in
        run_config.json for playback."""
        import json

        from wheeledlab_tpu.cli.train import main
        from wheeledlab_tpu.tasks import make_env

        main(tiny_args(tmp_path, "envovr", "env.track_radius=1.25",
                       "train.log.no_checkpoints=True"))
        saved = json.load(open(tmp_path / "envovr" / "run_config.json"))
        ovr = saved["run"]["env_overrides"]
        assert float(ovr["track_radius"]) == 1.25
        # the same override path make_env applies (what train() calls):
        env = make_env("MushrDriftRL-v0", num_envs=16, overrides=ovr)
        assert env.task_cfg.track_radius == 1.25

    def test_env_override_unknown_path_fails_loudly(self, tmp_path):
        """An override naming a nonexistent env cfg field must raise, not be
        silently dropped (reference Hydra errors on unknown keys)."""
        from wheeledlab_tpu.cli.train import main

        with pytest.raises(KeyError, match="no_such_field"):
            main(tiny_args(tmp_path, "envbad", "env.no_such_field=1",
                           "train.log.no_checkpoints=True"))

    def test_train_video_writes_frames(self, tmp_path):
        """--video records a top-down training clip every video_interval
        iterations (reference CustomRecordVideo + LogConfig.video,
        common_cfg.py:19-29)."""
        from wheeledlab_tpu.cli.train import main

        main(tiny_args(tmp_path, "vid", "--video",
                       "train.log.video_interval=2",
                       "train.log.no_checkpoints=True"))
        vid_dir = tmp_path / "vid" / "videos"
        stems = {f.rsplit(".", 1)[0] for f in os.listdir(vid_dir)}
        assert {"iter_2", "iter_4"} <= stems, stems
        assert all(f.stat().st_size > 0 for f in vid_dir.iterdir())

    def test_train_video_recurrent_policy(self, tmp_path):
        """--video must record for the recurrent policy class too (VERDICT r3
        weak #3: the recurrent rollout returned no traj/* captures, so video
        silently recorded nothing for RSS_DRIFT_RNN)."""
        from wheeledlab_tpu.cli.train import main

        main(["-r", "RSS_DRIFT_RNN_CONFIG"] + TINY
             + ["agent.rnn_hidden_size=16",
                f"train.log.logs_dir={tmp_path}",
                "train.log.run_name=vidrnn", "--video",
                "train.log.video_interval=2",
                "train.log.no_checkpoints=True"])
        vid_dir = tmp_path / "vidrnn" / "videos"
        stems = {f.rsplit(".", 1)[0] for f in os.listdir(vid_dir)}
        assert {"iter_2", "iter_4"} <= stems, stems
        assert all(f.stat().st_size > 0 for f in vid_dir.iterdir())

    def test_video_length_and_resolution_knobs(self, tmp_path):
        """video_length / video_resolution / video_crf parity (reference
        LogConfig, common_cfg.py:19-29; CustomRecordVideo
        custom_video_recorder.py:24-43): the clip is capped to video_length
        steps and resized to video_resolution (W, H)."""
        import cv2

        from wheeledlab_tpu.cli.train import main

        main(tiny_args(tmp_path, "vidknobs", "--video",
                       "train.log.video_interval=2",
                       "train.num_iterations=2",
                       "train.log.video_length=3",
                       "train.log.video_resolution=(64,48)",
                       "train.log.no_checkpoints=True"))
        vid_dir = tmp_path / "vidknobs" / "videos"
        (vid,) = list(vid_dir.iterdir())
        if vid.suffix == ".npy":
            frames = np.load(vid)
            assert frames.shape == (3, 48, 64, 3)
        else:
            cap = cv2.VideoCapture(str(vid))
            assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 64
            assert int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)) == 48
            assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 3
            cap.release()

    def test_profile_writes_trace(self, tmp_path):
        """train.profile captures a jax.profiler device trace of iterations
        10-12 (SURVEY.md §5 tracing/profiling)."""
        from wheeledlab_tpu.cli.train import main

        main(tiny_args(tmp_path, "prof", "train.profile=True",
                       "train.num_iterations=14",
                       "train.log.no_checkpoints=True"))
        trace_dir = tmp_path / "prof" / "trace"
        assert trace_dir.exists()
        # the profiler writes plugins/profile/<ts>/*.trace.json.gz (+ .pb)
        found = [f for _, _, fs in os.walk(trace_dir) for f in fs]
        assert found, "trace dir is empty"


class TestPlayCLI:
    def test_play_video_and_rollouts(self, tmp_path):
        """Train a few iterations, then play: rollout npz (parity:
        play_policy.py:160-165) + top-down video, rewards stripped in the
        play variant (reference mushr_drift_env_cfg.py:425-427)."""
        from wheeledlab_tpu.cli.play import main as play_main
        from wheeledlab_tpu.cli.train import main as train_main

        train_main(tiny_args(tmp_path, "p1"))
        play_main(["--run", "p1", "--logs-dir", str(tmp_path),
                   "--steps", "12", "--num-envs", "4", "--video"])
        play_dir = tmp_path / "p1" / "play"
        roll = np.load(play_dir / "p1-rollouts.npz")
        assert roll["observations"].shape == (12, 4, 14)
        assert roll["actions"].shape == (12, 4, 2)
        # play env strips rewards entirely
        assert float(np.abs(roll["rewards"]).sum()) == 0.0
        vids = [f for f in play_dir.iterdir()
                if f.name.startswith("p1.") and f.suffix != ".npz"]
        assert vids and all(f.stat().st_size > 0 for f in vids)
        # machine-checkable play metrics (speed/slip; goal metrics for
        # goal-conditioned tasks) land next to the rollouts
        import json
        pm = json.load(open(play_dir / "play_metrics.json"))
        assert np.isfinite(list(pm.values())).all(), pm
        assert "speed_mean" in pm

    def test_play_policy_view_video_visual_task(self, tmp_path):
        """Camera tasks additionally record a POLICY-VIEW clip — the scene
        the policy sees from env 0's onboard camera (VERDICT r4 missing #1;
        reference CustomRecordVideo over the TiledCamera,
        custom_video_recorder.py:12-75)."""
        from wheeledlab_tpu.cli.play import main as play_main
        from wheeledlab_tpu.cli.train import main as train_main

        small_map = ["env.map_rows=100", "env.map_cols=100",
                     "env.env_rows=20", "env.env_cols=20",
                     "env.group_rows=5", "env.group_cols=5"]
        train_main(["-r", "RSS_VISUAL_CONFIG", "num_envs=8",
                    "train.num_iterations=2", "agent.num_steps_per_env=8",
                    "agent.num_learning_epochs=1", "agent.num_mini_batches=2",
                    "train.log.log_every=2", "train.log.checkpoint_every=2",
                    f"train.log.logs_dir={tmp_path}",
                    "train.log.run_name=pv"] + small_map)
        play_main(["--run", "pv", "--logs-dir", str(tmp_path),
                   "--steps", "6", "--num-envs", "2", "--video"])
        play_dir = tmp_path / "pv" / "play"
        top = [f for f in play_dir.iterdir()
               if f.name.startswith("pv.") and f.suffix != ".npz"]
        fp = [f for f in play_dir.iterdir()
              if f.name.startswith("pv-policyview.")]
        assert top and all(f.stat().st_size > 0 for f in top)
        assert fp and all(f.stat().st_size > 0 for f in fp)

    def test_train_video_policy_view_visual_task(self, tmp_path):
        """Training `--video` on a camera task writes BOTH the top-down clip
        and the policy-view clip per capture (reference records the rendered
        sim viewport during training, custom_video_recorder.py:12-75 +
        LogConfig.video common_cfg.py:19-29)."""
        from wheeledlab_tpu.cli.train import main as train_main

        small_map = ["env.map_rows=100", "env.map_cols=100",
                     "env.env_rows=20", "env.env_cols=20",
                     "env.group_rows=5", "env.group_cols=5"]
        train_main(["-r", "RSS_VISUAL_CONFIG", "num_envs=8",
                    "train.num_iterations=2", "agent.num_steps_per_env=8",
                    "agent.num_learning_epochs=1", "agent.num_mini_batches=2",
                    "train.log.log_every=2", "--video",
                    "train.log.video_interval=2", "train.log.video_length=4",
                    "train.log.no_checkpoints=True",
                    f"train.log.logs_dir={tmp_path}",
                    "train.log.run_name=trainpv"] + small_map)
        vid_dir = tmp_path / "trainpv" / "videos"
        stems = {f.name.rsplit(".", 1)[0] for f in vid_dir.iterdir()}
        assert {"iter_2", "iter_2-policyview"} <= stems, stems
        assert all(f.stat().st_size > 0 for f in vid_dir.iterdir())


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-x", "-q"]))


class TestDistributedFlag:
    def test_distributed_flag_shards_any_config(self, tmp_path):
        """`--distributed` turns the data mesh on for ANY named config (the
        harness equivalent of POD_DRIFT_CONFIG's built-in switch)."""
        import json

        from wheeledlab_tpu.cli.train import main

        main(tiny_args(tmp_path, "dist", "--distributed",
                       "train.log.no_checkpoints=True"))
        saved = json.load(open(tmp_path / "dist" / "run_config.json"))
        assert saved["run"]["train"]["distributed"] == "on"
        assert (tmp_path / "dist" / "metrics.jsonl").exists()
