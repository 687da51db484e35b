"""Training runner — the L4/L5 harness (reference wheeledlab_rl: RunConfig
tree, modified OnPolicyRunner loop, checkpointing, logging; SURVEY.md §2a
rows 20-27) rebuilt around a single jitted train iteration.

The Python loop here only orchestrates: every iteration is one device-side
`train_iteration` call (rollout + PPO update fused); metrics come back to host
only every `log_every` iterations. Checkpoints are orbax snapshots of the FULL
TrainState pytree — params, optimizer state (incl. adaptive LR), env states,
RNG keys, curriculum weights — strictly stronger resume than the reference's
model-only `model_<it>.pt` (SURVEY.md §5 checkpoint/resume)."""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import configclass, to_dict
from .ppo import PPOCfg, TrainState, make_learner


@configclass
class LogCfg:
    """Parity: LogConfig (reference configs/common_cfg.py:12-39)."""

    logs_dir: str = "logs"
    no_log: bool = False
    log_every: int = 10
    no_checkpoints: bool = False
    checkpoint_every: int = 50       # reference save_interval=50
    video: bool = False              # record top-down training videos
    video_interval: int = 500        # iterations between recordings
    video_length: int = 0            # steps per clip; 0 = the full rollout
                                     # (reference video_length, common_cfg.py:20)
    video_resolution: tuple = ()     # (W, H); () = renderer-native size
                                     # (reference video_resolution, common_cfg.py:28)
    video_crf: int = 30              # H.264 CRF (reference video_crf,
                                     # common_cfg.py:29; PyAV path only)
    no_wandb: bool = True            # offline by default (no egress)
    wandb_project: str = "WheeledLab-TPU"
    test_mode: bool = False
    run_name: str = ""


@configclass
class TrainCfg:
    """Parity: RLTrainConfig (reference configs/rl_cfg.py:8-25)."""

    seed: int = 0
    num_iterations: int = 5000
    load_run: Optional[str] = None
    load_run_checkpoint: int = 0
    distributed: str = "auto"        # "auto" | "on" | "off": shard the env
                                     # batch over a data mesh of every chip in
                                     # the job (parallel/mesh.py). "auto" = on
                                     # iff launched as a multi-process
                                     # jax.distributed job; "on" also shards
                                     # single-process multi-device (pod-slice
                                     # or CPU-mesh runs). POD_DRIFT_CONFIG
                                     # sets "on" (reference parity target:
                                     # one CLI command runs any named config,
                                     # train_rl.py:33-116)
    profile: bool = False            # capture a jax.profiler device trace of
                                     # iterations 10-12 into <run_dir>/trace
    fast_prng: bool = True           # TPU-accelerated rbg PRNG (utils/rng.py);
                                     # no-op on cpu/gpu so goldens stay stable
    compilation_cache: str = "auto"  # persistent XLA cache (utils/cache.py):
                                     # "auto" = ON except over the axon
                                     # remote-tunnel backend (measured net
                                     # loss there — cache.py docstring);
                                     # "on"/"off" force it
    target_return: Optional[float] = None
    # ^ early stop once episode/return reaches this at a log point — the
    # train-to-return benchmark knob (BASELINE.json "RSS_DRIFT to reference
    # return <10 min"; scripts/train_bench.py)
    aot_warm_start: str = "auto"     # serialized-executable cache for the
                                     # train iteration (utils/aot.py):
                                     # "auto" = ON exactly where the XLA
                                     # disk cache is off (axon tunnel);
                                     # "on"/"off" force it
    log: LogCfg = LogCfg()


@configclass
class RunConfig:
    """Parity: RunConfig aggregation (reference configs/common_cfg.py:66-75)."""

    task_name: str = "MushrDriftRL-v0"
    num_envs: int = 1024
    train: TrainCfg = TrainCfg()
    agent: PPOCfg = PPOCfg()
    env_overrides: Any = None   # optional dict of env cfg field overrides


class MetricLogger:
    """JSONL + optional wandb metric sink (reference used wandb only)."""

    def __init__(self, log_cfg: LogCfg, run_dir: str, config_dict: Dict):
        self.cfg = log_cfg
        self.run_dir = run_dir
        self._wandb = None
        self._fh = None
        if log_cfg.no_log or log_cfg.test_mode:
            return
        os.makedirs(run_dir, exist_ok=True)
        with open(os.path.join(run_dir, "run_config.json"), "w") as f:
            json.dump(config_dict, f, indent=2, default=str)
        self._fh = open(os.path.join(run_dir, "metrics.jsonl"), "a")
        if not log_cfg.no_wandb:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=log_cfg.wandb_project,
                    name=log_cfg.run_name or None, config=config_dict)
            except Exception:
                self._wandb = None

    def log(self, it: int, metrics: Dict[str, float]):
        if self._fh is not None:
            self._fh.write(json.dumps({"iteration": it, **metrics}) + "\n")
            self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=it)

    def log_video(self, it: int, frames: np.ndarray, fps: int = 50):
        """Upload a (T, H, W, 3) uint8 clip to wandb (parity: the reference
        uploads training videos via the W&B writer,
        custom_video_recorder.py:49-75)."""
        if self._wandb is None:
            return
        try:
            import wandb

            self._wandb.log(
                {"video": wandb.Video(frames.transpose(0, 3, 1, 2), fps=fps)},
                step=it)
        except Exception:
            pass

    def close(self):
        if self._fh is not None:
            self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()


def _checkpoint_manager(run_dir: str):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(run_dir, "checkpoints"))
    os.makedirs(path, exist_ok=True)
    return ocp.CheckpointManager(path)


def save_checkpoint(mgr, step: int, state: TrainState):
    import orbax.checkpoint as ocp

    mgr.save(step, args=ocp.args.StandardSave(state))


def restore_checkpoint(mgr, step: int, target: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    if step <= 0:
        step = mgr.latest_step()
    return mgr.restore(step, args=ocp.args.StandardRestore(target))


def _resolve_mesh(run_cfg: RunConfig):
    """Build the global data mesh when distributed training is requested —
    the seam that makes `python -m wheeledlab_tpu.cli.train -r
    POD_DRIFT_CONFIG` just work (reference train_rl.py:33-116: one command
    runs any named config; the pod config is this framework's new-capability
    config, BASELINE.json configs[5])."""
    mode = run_cfg.train.distributed
    if mode not in ("auto", "on", "off"):
        raise ValueError(f"train.distributed must be auto|on|off, got {mode!r}")
    if mode == "off":
        return None
    from ..parallel import distributed

    if mode == "on":
        # no-op when already initialized or single-process
        distributed.initialize()
    elif jax.process_count() == 1:
        # "auto": shard only when launched as a multi-process job (the
        # launcher has already called distributed.initialize); single-process
        # single-chip runs stay mesh-free
        return None
    mesh = distributed.global_mesh()
    n_dev = mesh.devices.size
    if n_dev == 1:
        return None
    if run_cfg.num_envs % n_dev:
        raise ValueError(
            f"num_envs={run_cfg.num_envs} not divisible by the "
            f"{n_dev}-device data mesh")
    return mesh


def train(run_cfg: RunConfig, env=None, max_iterations: Optional[int] = None,
          verbose: bool = True):
    """Assemble env + learner and run the training loop
    (reference train_rl.py:34-124 equivalent). When
    `train.distributed` resolves to a multi-device mesh, the TrainState is
    sharded over it (env batch on `data`, params replicated — GSPMD inserts
    the gradient psum over ICI) and host-side IO runs on process 0 only."""
    from ..tasks import make_env  # late import to avoid cycles

    if run_cfg.train.fast_prng:
        from ..utils.rng import enable_fast_prng
        enable_fast_prng()  # must precede PRNGKey creation below
    from ..utils.cache import resolve_cache_mode

    if resolve_cache_mode(run_cfg.train.compilation_cache):
        from ..utils.cache import enable_compilation_cache
        enable_compilation_cache()

    mesh = _resolve_mesh(run_cfg)
    is_main = jax.process_index() == 0

    if env is None:
        env = make_env(run_cfg.task_name, num_envs=run_cfg.num_envs,
                       overrides=run_cfg.env_overrides)

    init_fn, train_iteration, policy_apply = make_learner(
        env, run_cfg.agent, mesh=mesh)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        repl = NamedSharding(mesh, PartitionSpec())
        base_iteration = train_iteration

        def train_iteration(state):
            state, metrics = base_iteration(state)
            # replicate every metric (incl. the small [T, 8, ...] traj/*
            # captures) so EVERY host can device_get them — scalars already
            # are, and without this the video captures can land sharded and
            # be non-addressable in a multi-process job
            metrics = jax.tree_util.tree_map(
                lambda x: jax.lax.with_sharding_constraint(x, repl), metrics)
            return state, metrics

    init_jit = jax.jit(init_fn)
    iter_jit = jax.jit(train_iteration, donate_argnums=(0,))

    log_cfg = run_cfg.train.log
    run_name = log_cfg.run_name or f"run-{int(time.time())}"
    if mesh is not None and jax.process_count() > 1 and not log_cfg.run_name:
        # all hosts must agree on the run dir (shared filesystem; ckpt saves
        # are coordinated) — broadcast process 0's timestamped name
        from jax.experimental import multihost_utils
        import jax.numpy as jnp

        t = int(multihost_utils.broadcast_one_to_all(
            jnp.int32(int(time.time()) % (2**31 - 1))))
        run_name = f"run-{t}"
    run_dir = os.path.join(log_cfg.logs_dir, run_name)
    # metrics/videos/stdout are process-0-only; checkpoint saves are
    # collective (every host writes its shards via orbax)
    logger_cfg = log_cfg if is_main else log_cfg.replace(no_log=True)
    logger = MetricLogger(logger_cfg, run_dir,
                          {"run": to_dict(run_cfg), "task": run_cfg.task_name})
    verbose = verbose and is_main
    ckpt_mgr = None
    if not (log_cfg.no_checkpoints or log_cfg.test_mode or log_cfg.no_log):
        ckpt_mgr = _checkpoint_manager(run_dir)

    state = init_jit(jax.random.PRNGKey(run_cfg.train.seed))
    if mesh is not None:
        from ..parallel.mesh import shard_train_state

        state = shard_train_state(state, mesh, run_cfg.num_envs)
    if run_cfg.train.load_run:
        prev_dir = os.path.join(log_cfg.logs_dir, run_cfg.train.load_run)
        prev_mgr = _checkpoint_manager(prev_dir)
        # restoring into the (possibly sharded) template keeps placements
        state = restore_checkpoint(prev_mgr, run_cfg.train.load_run_checkpoint,
                                   state)

    # warm-start: swap the jitted iteration for a cached serialized
    # executable where the XLA disk cache is off (utils/aot.py; measured
    # 0.4 s load vs 19-78 s remote compile on the axon tunnel)
    from ..utils.aot import maybe_aot_warm_start

    iter_jit = maybe_aot_warm_start(iter_jit, state, run_cfg, mesh,
                                    verbose=verbose)

    n_iter = max_iterations or run_cfg.train.num_iterations
    steps_per_iter = run_cfg.agent.num_steps_per_env * env.num_envs
    t0 = time.time()
    # wall-clock attribution per phase (reference tracked collection/learn
    # splits, modified_rsl_rl_runner.py:111-120; here rollout+update fuse
    # into one XLA program, so the split is iterate / video / checkpoint)
    from ..utils.profiling import PhaseTimer
    timer = PhaseTimer()
    import contextlib

    mesh_ctx = (jax.sharding.set_mesh(mesh) if mesh is not None
                else contextlib.nullcontext())
    with mesh_ctx:
        state, last_metrics = _train_loop(
            run_cfg, env, state, iter_jit, logger, ckpt_mgr, timer, n_iter,
            steps_per_iter, t0, run_dir, verbose)
    if ckpt_mgr is not None:
        final_step = int(jax.device_get(state.iteration))
        if ckpt_mgr.latest_step() != final_step:
            save_checkpoint(ckpt_mgr, final_step, state)
        ckpt_mgr.wait_until_finished()
    logger.close()
    return state, last_metrics


def _train_loop(run_cfg, env, state, iter_jit, logger, ckpt_mgr, timer,
                n_iter, steps_per_iter, t0, run_dir, verbose):
    """The per-iteration Python loop (dispatch + host-side IO), factored out
    of train() so the whole loop runs under the mesh context when sharded."""
    log_cfg = run_cfg.train.log
    last_metrics: Dict[str, float] = {}
    # jitted ONCE outside the loop: a fresh lambda per capture would miss
    # the jit cache and recompile the renderer at every video interval
    policy_view_jit = None
    if env.task.colormap is not None:
        from ..tasks.visual.camera import render_rgb

        policy_view_jit = jax.jit(
            lambda p, q: render_rgb(env.task.colormap, p, q))
    for it in range(int(state.iteration), n_iter):
        if run_cfg.train.profile and it == 10:
            jax.profiler.start_trace(os.path.join(run_dir, "trace"))
        if run_cfg.train.profile and it == 13:
            jax.profiler.stop_trace()
        with timer.phase("iterate"):
            state, metrics = iter_jit(state)
        traj_pos = metrics.pop("traj/pos", None)
        traj_yaw = metrics.pop("traj/yaw", None)
        traj_quat = metrics.pop("traj/quat", None)
        traj_cmd = metrics.pop("traj/cmd", None)
        if (log_cfg.video and not log_cfg.test_mode and not logger.cfg.no_log
                and traj_pos is not None
                and (it + 1) % log_cfg.video_interval == 0):
            # logger.cfg is the per-PROCESS cfg (train() sets no_log=True on
            # non-main hosts): videos render + write on process 0 only, like
            # every other IO — otherwise each host of a pod run would render
            # and race-write the same videos/iter_N.avi.
            from ..render.topdown import render_task_frames, save_video

            vid_dir = os.path.join(run_dir, "videos")
            os.makedirs(vid_dir, exist_ok=True)
            with timer.phase("video"):
                length = log_cfg.video_length or None  # 0 -> full rollout
                frames = render_task_frames(
                    env, run_cfg.task_name,
                    np.asarray(traj_pos)[:length, :, :2],
                    np.asarray(traj_yaw)[:length],
                    None if traj_cmd is None
                    else np.asarray(traj_cmd)[:length])
                save_video(frames, os.path.join(vid_dir, f"iter_{it + 1}.avi"),
                           resolution=log_cfg.video_resolution or None,
                           crf=log_cfg.video_crf)
                logger.log_video(it + 1, frames)
                if policy_view_jit is not None and traj_quat is not None:
                    # Camera tasks additionally record the POLICY-VIEW clip —
                    # env 0's onboard camera over the same rollout window, the
                    # scene the policy actually operates in (reference
                    # CustomRecordVideo over the sim viewport,
                    # custom_video_recorder.py:12-75; TiledCameraCfg
                    # mushr_visual_env_cfg.py:230-246). Exact full-frame RGB
                    # (render_rgb), matching the play-CLI clip.
                    fp = policy_view_jit(
                        jnp.asarray(np.asarray(traj_pos)[:length, 0]),
                        jnp.asarray(np.asarray(traj_quat)[:length, 0]))
                    fp_frames = np.clip(
                        np.asarray(fp) * 255.0, 0, 255).astype(np.uint8)
                    save_video(
                        fp_frames,
                        os.path.join(vid_dir, f"iter_{it + 1}-policyview.avi"),
                        fps=max(int(round(1.0 / env.cfg.step_dt)), 1),
                        resolution=(320, 240), crf=log_cfg.video_crf)
        if (it + 1) % log_cfg.log_every == 0 or it == n_iter - 1:
            # ONE batched device->host pull; per-item float(np.asarray(v))
            # pays a tunnel round-trip per metric (~10x slower, measured).
            # Iterations dispatch async, so queued device work is paid here:
            # time/iterate = host dispatch, time/device_sync = device backlog.
            with timer.phase("device_sync"):
                host = {k: float(v)
                        for k, v in jax.device_get(metrics).items()}
            if host.pop("nan/detected", 0.0) > 0.0:
                raise RuntimeError(
                    f"NaN detected in actions/losses at iteration {it + 1} "
                    "(parity: modified_rsl_rl_runner.py:74-75)")
            elapsed = time.time() - t0
            host["perf/env_steps_per_s"] = steps_per_iter * (it + 1) / elapsed
            host["perf/wall_s"] = elapsed
            host.update(timer.summary())
            logger.log(it + 1, host)
            last_metrics = host
            if verbose:
                print(f"it {it + 1:5d} | return {host.get('episode/return', 0.0):9.1f}"
                      f" | len {host.get('episode/length', 0.0):6.1f}"
                      f" | kl {host.get('loss/kl', 0.0):.4f}"
                      f" | {host['perf/env_steps_per_s']:.2e} steps/s",
                      flush=True)
            if (run_cfg.train.target_return is not None
                    and host.get("episode/return", float("-inf"))
                    >= run_cfg.train.target_return):
                if verbose:
                    print(f"target return {run_cfg.train.target_return} "
                          f"reached at iteration {it + 1}", flush=True)
                break
        if ckpt_mgr is not None and (it + 1) % log_cfg.checkpoint_every == 0:
            with timer.phase("checkpoint"):
                save_checkpoint(ckpt_mgr, it + 1, state)
    return state, last_metrics
