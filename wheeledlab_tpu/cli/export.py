"""Export a trained policy for deployment — the sim2real hand-off.

The reference workflow deploys checkpoints to real cars via the RealLab stack,
which consumes rsl_rl `model_<it>.pt` files (reference README.md:92-101;
save format modified_rsl_rl_runner.py:125-126 -> rsl_rl OnPolicyRunner.save:
``{'model_state_dict', 'optimizer_state_dict', 'iter', 'infos'}``). This CLI
converts an orbax full-TrainState checkpoint into exactly that format, with
state-dict keys matching rsl_rl's ``ActorCritic`` module
(``actor.{0,2,4}.weight/bias``, ``critic.{0,2,4}.weight/bias``, ``std``), so a
user switching from the reference keeps their entire deployment pipeline.

    python -m wheeledlab_tpu.cli.export --run <run_name> [--checkpoint N]
        [--format pt|npz|both] [--out DIR]

Also writes a framework-agnostic ``<run>-policy.npz`` (numpy weights + a JSON
metadata record: obs/action dims, hidden sizes, activation, action
scale/offset) for deployment targets without torch.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def flatten_actor_critic(params, meta):
    """Flax ActorCritic variables -> flat {name: np.ndarray} with rsl_rl
    naming. Dense kernels are (in, out); torch Linear weights are (out, in),
    so kernels transpose. nn.Sequential interleaves activations, so linear
    layers sit at even indices 0, 2, 4, ...

    The reference's rsl_rl ActorCritic keeps a state-independent ``std``
    parameter; ours is ``log_std`` (networks.py:53-57) -> export
    ``std = exp(clip(log_std, -5, 2))``, the exact std the policy acts with.
    """
    p = params["params"]
    out = {}
    for head in ("actor", "critic"):
        dense_names = sorted(p[head].keys(),
                             key=lambda s: int(s.split("_")[1]))
        for i, name in enumerate(dense_names):
            out[f"{head}.{2 * i}.weight"] = (
                np.asarray(p[head][name]["kernel"]).T.copy())
            out[f"{head}.{2 * i}.bias"] = np.asarray(p[head][name]["bias"])
        meta[f"{head}_layers"] = len(dense_names)
    out["std"] = np.exp(np.clip(np.asarray(p["log_std"]), -5.0, 2.0))
    return out


def save_pt(flat, path, iteration):
    """rsl_rl OnPolicyRunner.save layout: RealLab / play_policy.py load this
    via ``torch.load(path)['model_state_dict']``."""
    import torch

    sd = {k: torch.from_numpy(np.array(v, dtype=np.float32))
          for k, v in flat.items()}
    torch.save({"model_state_dict": sd, "optimizer_state_dict": {},
                "iter": int(iteration), "infos": None}, path)
    return path


def save_npz(flat, path, meta):
    np.savez(path, __meta__=np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8), **flat)
    return path


def main(argv=None):
    p = argparse.ArgumentParser(description="WheeledLab-TPU policy export")
    p.add_argument("--run", required=True, help="run name under --logs-dir")
    p.add_argument("--logs-dir", default="logs")
    p.add_argument("--checkpoint", type=int, default=0, help="0 = latest")
    p.add_argument("--format", choices=("pt", "npz", "both"), default="both")
    p.add_argument("--out", default=None,
                   help="output dir (default <run_dir>/export)")
    args = p.parse_args(sys.argv[1:] if argv is None else argv)

    import jax

    from ..rl.ppo import PPOCfg, make_learner
    from ..rl.runner import _checkpoint_manager, restore_checkpoint
    from ..tasks import make_env

    run_dir = os.path.join(args.logs_dir, args.run)
    with open(os.path.join(run_dir, "run_config.json")) as f:
        saved = json.load(f)["run"]
    agent_cfg = PPOCfg(**{
        k: (tuple(v) if isinstance(v, list) else v)
        for k, v in saved["agent"].items()})
    if agent_cfg.policy_class == "ActorCriticRecurrent":
        # rsl_rl's recurrent module (memory_a/memory_c GRU) has no registered
        # reference deployment path; npz still carries the full pytree.
        if args.format != "npz":
            print("recurrent policy: .pt export targets rsl_rl ActorCritic "
                  "only; writing npz", file=sys.stderr)
            args.format = "npz"

    env = make_env(saved["task_name"], num_envs=saved["num_envs"])
    init_fn, _, _ = make_learner(env, agent_cfg)
    template = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    mgr = _checkpoint_manager(run_dir)
    state = restore_checkpoint(mgr, args.checkpoint, template)
    iteration = int(np.asarray(state.iteration))

    out_dir = args.out or os.path.join(run_dir, "export")
    os.makedirs(out_dir, exist_ok=True)
    meta = {
        "task": saved["task_name"], "iteration": iteration,
        "obs_dim": env.obs_dim, "action_dim": env.action_dim,
        "activation": agent_cfg.activation,
        "actor_hidden": list(agent_cfg.actor_hidden),
        "critic_hidden": list(agent_cfg.critic_hidden),
        # deployment needs the action de-normalization the env applied
        # (reference actions_cfg.py scale/offset; assets/robots.py)
        "action_scale": list(np.asarray(env.cfg.action.scale).ravel()),
        "action_offset": list(np.asarray(env.cfg.action.offset).ravel()),
        "policy_class": agent_cfg.policy_class,
    }

    if agent_cfg.policy_class == "ActorCriticRecurrent":
        # stable flat naming for the recurrent pytree
        from flax.traverse_util import flatten_dict
        flat = {".".join(k): np.asarray(v) for k, v in
                flatten_dict(state.params["params"]).items()}
    else:
        flat = flatten_actor_critic(state.params, meta)

    written = []
    if args.format in ("pt", "both"):
        written.append(save_pt(
            flat, os.path.join(out_dir, f"model_{iteration}.pt"), iteration))
    if args.format in ("npz", "both"):
        written.append(save_npz(
            flat, os.path.join(out_dir, f"{args.run}-policy.npz"), meta))
    for w in written:
        print(f"exported {w}")
    return written


if __name__ == "__main__":
    main()
