"""Play CLI — parity with the reference play_policy.py
(source/wheeledlab_rl/scripts/play_policy.py): load a trained run, roll the
deterministic policy in the task's Play env variant (no terminations/noise/DR,
reference mushr_drift_env_cfg.py:410-430), dump rollouts, render a top-down
video.

    python -m wheeledlab_tpu.cli.play --run <run_name> [--checkpoint N]
        [--steps 500] [--num-envs 16] [--video]

Outputs <run>/play/<name>-rollouts.npz with stacked observations/actions
(parity: play_policy.py:160-165 torch.save of the same dict).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="WheeledLab-TPU policy playback")
    p.add_argument("--run", required=True, help="run name under --logs-dir")
    p.add_argument("--logs-dir", default="logs")
    p.add_argument("--checkpoint", type=int, default=0, help="0 = latest")
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--num-envs", type=int, default=16)
    p.add_argument("--video", action="store_true")
    p.add_argument("--headless", action="store_true", help="compat no-op")
    args = p.parse_args(sys.argv[1:] if argv is None else argv)

    import jax
    import jax.numpy as jnp

    from ..rl.ppo import PPOCfg, make_learner
    from ..rl.runner import _checkpoint_manager, restore_checkpoint
    from ..tasks import make_env
    from ..utils import math as wmath

    run_dir = os.path.join(args.logs_dir, args.run)
    with open(os.path.join(run_dir, "run_config.json")) as f:
        saved = json.load(f)["run"]
    task_name = saved["task_name"]

    env_overrides = saved.get("env_overrides") or None

    # play env variant: terminations/noise/DR stripped; the run's env.*
    # overrides (if any) are re-applied so playback matches training
    env = make_env(task_name, num_envs=args.num_envs, play=True,
                   overrides=env_overrides)
    agent_cfg = PPOCfg(**{
        k: (tuple(v) if isinstance(v, list) else v)
        for k, v in saved["agent"].items()})

    # restore params from the full-TrainState checkpoint: build only an
    # abstract template (eval_shape — no device compute) and restore into it
    train_env = make_env(task_name, num_envs=saved["num_envs"],
                         overrides=env_overrides)
    init_fn, _, policy_apply = make_learner(train_env, agent_cfg)
    recurrent = agent_cfg.policy_class == "ActorCriticRecurrent"
    template = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    mgr = _checkpoint_manager(run_dir)
    state = restore_checkpoint(mgr, args.checkpoint, template)
    params = state.params

    env_state, obs = jax.jit(env.reset)(jax.random.PRNGKey(args.num_envs))

    if recurrent:
        from ..rl.recurrent import ActorCriticRecurrent

        hidden0 = ActorCriticRecurrent(
            action_dim=env.action_dim,
            rnn_hidden_size=agent_cfg.rnn_hidden_size,
            rnn_num_layers=agent_cfg.rnn_num_layers,
        ).initial_hidden(args.num_envs)

    @jax.jit
    def rollout(env_state, obs):
        def body(carry, _):
            s, o, hidden, reset_prev = carry
            if recurrent:
                mean, _, _, hidden = policy_apply(params, o, hidden,
                                                  reset_prev)
            else:
                mean, _, _ = policy_apply(params, o)   # deterministic policy
            s, out = env.step(s, mean)
            yaw = wmath.yaw_from_quat(s.vehicle.quat)
            carry = (s, out.obs, hidden, out.done.astype(jnp.float32))
            return carry, (o, mean, s.vehicle.pos, yaw, out.reward, s.command,
                           s.vehicle.quat, out.done)

        carry0 = (env_state, obs, hidden0 if recurrent else 0,
                  jnp.zeros((args.num_envs,)))
        _, traj = jax.lax.scan(body, carry0, None, length=args.steps)
        return traj

    obs_t, act_t, pos_t, yaw_t, rew_t, cmd_t, quat_t, done_t = [
        np.asarray(x) for x in rollout(env_state, obs)]
    play_dir = os.path.join(run_dir, "play")
    os.makedirs(play_dir, exist_ok=True)
    out_path = os.path.join(play_dir, f"{args.run}-rollouts.npz")
    np.savez_compressed(out_path, observations=obs_t, actions=act_t,
                        positions=pos_t, yaws=yaw_t, rewards=rew_t,
                        commands=cmd_t)
    print(f"saved rollouts to {out_path}  "
          f"(obs {obs_t.shape}, mean reward {rew_t.mean():.3f})")

    # Task-success metrics over the played episodes — machine-checkable
    # playback evidence (the reference validated play runs only by watching
    # the recorded videos). Written as <run>/play/play_metrics.json.
    step_dt = env.cfg.sim_dt * env.cfg.decimation
    vel = np.diff(pos_t[..., :2], axis=0) / step_dt            # (T-1, B, 2)
    speed = np.linalg.norm(vel, axis=-1)
    # positions are recorded POST-reset, so the t -> t+1 difference is a
    # respawn teleport whenever step t+1 ended an episode (play keeps
    # timeouts even with terminations stripped) — mask those rows or a
    # handful of cross-map jumps dominates the speed mean
    valid = ~done_t[1:].astype(bool)                           # (T-1, B)
    play_metrics = {"reward_mean": float(rew_t.mean()),
                    "speed_mean": float(speed[valid].mean())}
    moving = (speed > 0.5) & valid
    if moving.any():
        # body slip angle: motion direction vs heading (drift tasks)
        slip = np.arctan2(vel[..., 1], vel[..., 0]) - yaw_t[:-1]
        slip = np.degrees(np.abs((slip + np.pi) % (2 * np.pi) - np.pi))
        play_metrics["slip_deg_mean"] = float(slip[moving].mean())
    if env.task.command is not None:
        # goal-conditioned task (elevation): the task carries a CommandCfg,
        # whose fields are positional (pos_x/pos_y/heading) by construction —
        # keyed off the task, not inferred from command values, so a future
        # non-positional command can't silently emit bogus goal metrics.
        # Metric: fraction of envs that came within the at_goal radius
        # (tasks/elevation/task.py::at_goal, dist=0.5) at any point.
        d = np.linalg.norm(pos_t[..., :2] - cmd_t[..., :2], axis=-1)
        play_metrics["goal_reach_frac"] = float((d.min(axis=0) < 0.5).mean())
        play_metrics["goal_dist_final"] = float(d[-1].mean())
    with open(os.path.join(play_dir, "play_metrics.json"), "w") as f:
        json.dump(play_metrics, f, indent=2)
    print("play metrics:", json.dumps(play_metrics))

    if args.video:
        from ..render.topdown import render_task_frames, save_video

        frames = render_task_frames(env, task_name, pos_t[:, :, :2], yaw_t,
                                    goals=cmd_t[:, :, :2])
        vid = save_video(frames, os.path.join(play_dir, f"{args.run}.avi"))
        print(f"saved video to {vid}")
        if env.task.colormap is not None:
            # POLICY-VIEW clip for camera tasks: the rendered scene the
            # policy actually operates in, from env 0's onboard camera —
            # parity with the reference's sim-viewport play recordings
            # (custom_video_recorder.py:12-75 over the TiledCamera,
            # mushr_visual_env_cfg.py:230-246). Full-frame exact RGB render
            # (render_rgb — the parity surface, not the atlas fast path).
            from ..tasks.visual.camera import render_rgb

            fp = jax.jit(lambda p, q: render_rgb(env.task.colormap, p, q))(
                jnp.asarray(pos_t[:, 0]), jnp.asarray(quat_t[:, 0]))
            fp_frames = np.clip(
                np.asarray(fp) * 255.0, 0, 255).astype(np.uint8)
            vid_fp = save_video(
                fp_frames,
                os.path.join(play_dir, f"{args.run}-policyview.avi"),
                fps=max(int(round(1.0 / step_dt)), 1),
                resolution=(320, 240))
            print(f"saved policy-view video to {vid_fp}")


if __name__ == "__main__":
    main()
