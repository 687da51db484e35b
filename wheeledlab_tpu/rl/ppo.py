"""PPO learner — on-device rollout + update, rsl_rl-semantics
(reference modified_rsl_rl_runner.py:67-118 + rsl_rl PPO algorithm as
configured by RslRlPpoAlgorithmCfg, drifting/.../rsl_rl_ppo_cfg.py:19-31).

Everything — 128-step rollout (`lax.scan` over env.step), timeout bootstrap,
GAE, advantage normalization, 5 epochs x 4 minibatches of clipped-surrogate
updates with adaptive-KL learning rate — compiles into ONE jitted
`train_iteration`. No host round-trips inside an iteration; the learning rate
is traced state (optax.inject_hyperparams), not a Python float.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import PartitionSpec as P

from ..envs.env import EnvState, WheeledEnv
from ..parallel.mesh import DATA_AXIS
from ..utils.config import configclass
from .networks import (
    ActorCritic, gaussian_entropy, gaussian_kl, gaussian_log_prob,
)


@configclass
class PPOCfg:
    """Parity: RslRlPpoAlgorithmCfg + runner fields (rsl_rl_ppo_cfg.py:5-32)."""

    num_steps_per_env: int = 128
    num_learning_epochs: int = 5
    num_mini_batches: int = 4
    clip_param: float = 0.2
    gamma: float = 0.99
    lam: float = 0.95
    value_loss_coef: float = 1.0
    use_clipped_value_loss: bool = True
    entropy_coef: float = 0.005
    learning_rate: float = 1.0e-3
    schedule: str = "adaptive"       # "adaptive" | "fixed"
    desired_kl: float = 0.01
    max_grad_norm: float = 1.0
    min_lr: float = 1.0e-5
    max_lr: float = 1.0e-2
    # policy (policy_class parity: rsl_rl RslRlPpoActorCriticCfg.class_name —
    # "ActorCritic" | "ActorCriticRecurrent")
    policy_class: str = "ActorCritic"
    actor_hidden: Tuple[int, ...] = (64, 64)
    critic_hidden: Tuple[int, ...] = (64, 64)
    activation: str = "elu"
    init_noise_std: float = 1.0
    rnn_hidden_size: int = 256       # recurrent policy only (rsl_rl default)
    rnn_num_layers: int = 1
    fuse_input_layer: bool = False
    # ^ run the actor+critic first layers as one concatenated matmul
    # (networks.fused_actor_critic_apply) — the MXU-tile fix for
    # wide-observation tasks; param tree unchanged
    compute_dtype: str = "float32"
    # ^ "bfloat16": policy matmuls in bf16 (f32 params/heads) AND the stored
    # rollout obs dataset in bf16. For wide-obs tasks the first-layer
    # contraction + the obs dataset's HBM traffic dominate the PPO update
    # (visual: 3208-wide obs, dataset 840 MB f32, update was 20.4 ms of the
    # 51.8 ms iteration — ARCHITECTURE.md round-4 profile). Exactness note:
    # flax Dense(dtype=bf16) rounds its INPUT operand, so the update's
    # recomputed action mean sees bit-identical matmul inputs whether obs
    # was stored f32 or bf16 — storage dtype does not perturb the PPO ratio.


# Widest obs that folds into the packed shuffle array (one permutation
# gather instead of two — see update_epochs). Tests monkeypatch this to
# force the unpacked path and assert bit-identity.
_PACK_OBS_MAX_WIDTH = 64


def init_info_acc(env: "WheeledEnv", env_state) -> Dict[str, jax.Array]:
    """Zeroed scalar accumulators for the env's per-step info channels.

    Info metrics are folded ONLINE in the rollout carry instead of stacking
    [T, B] arrays per channel and reducing afterwards: stacking ~15 channels
    costs one dynamic-update-slice per channel per step (~2.8 ms/iteration of
    pure bookkeeping at 1024 envs on TPU, ~30%% of rollout time). The channel
    set is discovered with `eval_shape` (abstract — no device compute)."""
    info = jax.eval_shape(
        lambda s: env.step(s, jnp.zeros((env.num_envs, 2)))[1].info, env_state)
    z = jnp.zeros(())
    acc = {"episode_return": z, "episode_length": z}
    acc.update({k: z for k in info
                if k.startswith(("rew/", "metrics/", "done/"))})
    return acc


def accumulate_info(acc: Dict[str, jax.Array], info: Dict[str, jax.Array],
                    done: jax.Array) -> Dict[str, jax.Array]:
    """One rollout step of metric folding. Sums match the former stacked
    reductions exactly: rew/*, metrics/* accumulate per-step batch means
    (later / num_steps); done/* accumulate counts (later / n_done);
    episode stats accumulate done-masked sums (later / n_done)."""
    dm = done.astype(jnp.float32)
    new = {
        "episode_return": acc["episode_return"]
        + (info["episode_return"] * dm).sum(),
        "episode_length": acc["episode_length"]
        + (info["episode_length"] * dm).sum(),
    }
    for k in acc:
        if k.startswith(("rew/", "metrics/")):
            new[k] = acc[k] + info[k].mean()
        elif k.startswith("done/"):
            new[k] = acc[k] + info[k].sum()
    return new


def finalize_info_acc(acc: Dict[str, jax.Array], num_steps: int,
                      n_done: jax.Array) -> Dict[str, jax.Array]:
    """Accumulators -> iteration metrics:

    - `rew/*` (per-term rewards) and `metrics/*` (task-success metrics, e.g.
      drift slip angle, visual traversable fraction): mean over the rollout.
    - `done/*` (termination flags incl. time_out): fraction of finished
      episodes that ended for that reason — e.g. `done/at_goal` is the
      elevation task's goal-reach rate (the reference surfaced these via the
      reward manager's `infos["episode"]` sums, modified_rsl_rl_runner.py:95-98).
    - `episode/return`, `episode/length`: means over finished episodes.
    """
    out: Dict[str, jax.Array] = {}
    for name, v in acc.items():
        if name.startswith(("rew/", "metrics/")):
            out[name] = v / num_steps
        elif name.startswith("done/"):
            out[name] = v / n_done
    out["episode/return"] = acc["episode_return"] / n_done
    out["episode/length"] = acc["episode_length"] / n_done
    return out


def traj_captures(env_state: EnvState) -> Dict[str, jax.Array]:
    """Per-step trajectory capture of the first few envs for video rendering
    (training-video parity with the reference's periodic recordings,
    common_cfg.py:19-29). Shared by the MLP and recurrent rollouts so
    `--video` works for both policy classes."""
    q = env_state.vehicle.quat
    return {
        "traj/pos": env_state.vehicle.pos[:8, :3],
        "traj/yaw": jnp.arctan2(
            2 * (q[:8, 0] * q[:8, 3] + q[:8, 1] * q[:8, 2]),
            1 - 2 * (q[:8, 2] ** 2 + q[:8, 3] ** 2)),
        "traj/quat": q[:8],
        "traj/cmd": env_state.command[:8, :2],
    }


class Transition(NamedTuple):
    obs: jax.Array
    action: jax.Array
    log_prob: jax.Array
    value: jax.Array
    reward: jax.Array
    done: jax.Array
    mean: jax.Array
    std: jax.Array


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    env_state: EnvState
    obs: jax.Array
    key: jax.Array
    iteration: jax.Array     # i32 scalar


def make_ppo(env: WheeledEnv, cfg: PPOCfg, _internals: dict | None = None,
             mesh=None):
    """Returns (init_fn, train_iteration_fn, policy_apply).

    init_fn(key) -> TrainState
    train_iteration(state) -> (state, metrics)  — fully jittable

    `_internals`: pass a dict to receive the phase closures (rollout,
    compute_gae, update_epochs) for profiling/tests.

    `mesh`: the data mesh when the TrainState will be sharded over it
    (runner/scale_bench pass theirs). With a mesh the epoch shuffle is
    SHARD-LOCAL (shard_map; zero collectives) instead of a global
    permutation, which under data sharding is a cross-shard all-to-all of
    the whole rollout dataset every epoch (~1 GB/epoch over ICI at 64k
    envs). Without a mesh the original single-device path runs unchanged
    (bit-identical goldens).
    """
    model = ActorCritic(
        action_dim=env.action_dim, actor_hidden=cfg.actor_hidden,
        critic_hidden=cfg.critic_hidden, activation=cfg.activation,
        init_noise_std=cfg.init_noise_std, compute_dtype=cfg.compute_dtype)
    # obs dataset storage dtype (see PPOCfg.compute_dtype)
    store_obs = ((lambda x: x.astype(jnp.bfloat16))
                 if cfg.compute_dtype == "bfloat16" else (lambda x: x))
    if (cfg.fuse_input_layer
            and cfg.actor_hidden[0] == cfg.critic_hidden[0]):
        from .networks import fused_actor_critic_apply

        apply_fn = lambda params, obs: fused_actor_critic_apply(
            model, params, obs)
    else:
        apply_fn = model.apply

    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.inject_hyperparams(optax.adam)(learning_rate=cfg.learning_rate),
    )

    def init_fn(key: jax.Array) -> TrainState:
        k_env, k_model, k_state = jax.random.split(key, 3)
        env_state, obs = env.reset(k_env)
        params = model.init(k_model, jnp.zeros((1, env.obs_dim)))
        opt_state = tx.init(params)
        return TrainState(params=params, opt_state=opt_state,
                          env_state=env_state, obs=obs, key=k_state,
                          iteration=jnp.zeros((), jnp.int32))

    def policy_apply(params, obs):
        return apply_fn(params, obs)

    # ------------------------------------------------------------- rollout

    def rollout(state: TrainState):
        def step(carry, key):
            env_state, obs, acc = carry
            k_act = key
            mean, std, value = apply_fn(state.params, obs)
            action = mean + std * jax.random.normal(k_act, mean.shape)
            log_prob = gaussian_log_prob(mean, std, action)
            env_state, out = env.step(env_state, action)
            # timeout bootstrap (rsl_rl process_env_step:
            # rewards += gamma * value * time_out)
            reward = out.reward + cfg.gamma * value * out.time_out
            tr = Transition(obs=store_obs(obs), action=action,
                            log_prob=log_prob, value=value, reward=reward,
                            done=out.done.astype(jnp.float32),
                            mean=mean, std=std)
            acc = accumulate_info(acc, out.info, out.done)
            return (env_state, out.obs, acc), (tr, traj_captures(env_state))

        keys = jax.random.split(state.key, cfg.num_steps_per_env + 1)
        acc0 = init_info_acc(env, state.env_state)
        (env_state, obs, acc), (traj, caps) = jax.lax.scan(
            step, (state.env_state, state.obs, acc0), keys[1:])
        return env_state, obs, traj, acc, caps, keys[0]

    # ----------------------------------------------------------------- GAE

    def compute_gae(traj: Transition, last_value: jax.Array):
        def back(carry, tr):
            adv_next, v_next = carry
            nonterminal = 1.0 - tr.done
            delta = tr.reward + cfg.gamma * v_next * nonterminal - tr.value
            adv = delta + cfg.gamma * cfg.lam * nonterminal * adv_next
            return (adv, tr.value), adv

        _, advantages = jax.lax.scan(
            back, (jnp.zeros_like(last_value), last_value), traj, reverse=True)
        returns = advantages + traj.value
        norm_adv = (advantages - advantages.mean()) / (advantages.std() + 1e-8)
        return advantages, returns, norm_adv

    # -------------------------------------------------------------- update

    def loss_fn(params, batch, clip_param):
        obs, action, old_log_prob, old_value, ret, adv, old_mean, old_std = batch
        mean, std, value = apply_fn(params, obs)
        log_prob = gaussian_log_prob(mean, std, action)
        ratio = jnp.exp(log_prob - old_log_prob)
        surr1 = ratio * adv
        surr2 = jnp.clip(ratio, 1.0 - clip_param, 1.0 + clip_param) * adv
        surrogate_loss = -jnp.minimum(surr1, surr2).mean()

        if cfg.use_clipped_value_loss:
            value_clipped = old_value + jnp.clip(
                value - old_value, -clip_param, clip_param)
            value_loss = jnp.maximum(
                (value - ret) ** 2, (value_clipped - ret) ** 2).mean()
        else:
            value_loss = ((value - ret) ** 2).mean()

        entropy = gaussian_entropy(std).mean()
        kl = gaussian_kl(old_mean, old_std, mean, std).mean()
        total = (surrogate_loss + cfg.value_loss_coef * value_loss
                 - cfg.entropy_coef * entropy)
        return total, (surrogate_loss, value_loss, entropy, kl)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def minibatch_update(carry, batch):
        params, opt_state = carry
        (loss, (surr, vloss, ent, kl)), grads = grad_fn(
            params, batch, cfg.clip_param)

        if cfg.schedule == "adaptive":
            # rsl_rl adaptive-KL LR (per minibatch)
            lr = opt_state[1].hyperparams["learning_rate"]
            lr = jnp.where(kl > cfg.desired_kl * 2.0,
                           jnp.maximum(lr / 1.5, cfg.min_lr), lr)
            lr = jnp.where((kl < cfg.desired_kl / 2.0) & (kl > 0.0),
                           jnp.minimum(lr * 1.5, cfg.max_lr), lr)
            opt_state[1].hyperparams["learning_rate"] = lr

        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = jnp.stack([loss, surr, vloss, ent, kl])
        return (params, opt_state), metrics

    def update_epochs(key, params, opt_state, dataset):
        """dataset: tuple of time-major [T, B, ...] rollout arrays (obs
        first). One permutation shared across epochs — exactly rsl_rl's
        mini_batch_generator (and one gather pass instead of num_epochs).

        The 7 non-obs columns pack into ONE [.., C] array before the shuffle,
        so the whole shuffle is 2 gathers (obs + packed) instead of 8 — TPU
        random-index gathers are latency-bound per gather, and this halves
        the update wall time (measured 9.6 -> 5.3 ms at 131k samples on v5e).
        NARROW obs (width <= 64, same dtype) folds into that same packed
        array, making the whole shuffle ONE gather — pure data movement
        (concat -> gather -> split), so outputs are bit-identical; the copy
        it adds is small at these widths. Wide obs (visual 3208, elevation
        ~700) stays separate: packing it would add a full extra copy of the
        largest array in the update.

        Sharded (mesh given): the permutation is per shard, computed inside
        `shard_map` with the key folded by the shard index — each device
        shuffles and minibatch-slices only its local [T, B/D] block, so the
        compiled update contains NO all-to-all/all-gather of the dataset
        (asserted on HLO in tests/test_sharding.py). Each global minibatch
        is then the concatenation of D equal local sub-blocks; with equal
        shard sizes the minibatch loss/grad means are exact, so semantics
        match rsl_rl's up to which samples share a minibatch. Unsharded
        path: the original global permutation, bit-identical to r3."""
        nb = cfg.num_mini_batches
        obs_tb = dataset[0]
        col3d = lambda x: x if x.ndim == 3 else x[..., None]
        small_tb = jnp.concatenate([col3d(x) for x in dataset[1:]], axis=-1)
        widths = [col3d(x).shape[-1] for x in dataset[1:]]
        obs_w = obs_tb.shape[-1]
        pack_obs = (obs_w <= _PACK_OBS_MAX_WIDTH
                    and obs_tb.dtype == small_tb.dtype)
        if pack_obs:
            blocks = (jnp.concatenate([col3d(obs_tb), small_tb], axis=-1),)
        else:
            blocks = (obs_tb, small_tb)

        def flat_shuffle(k, *blks):
            """[T, b, ...] blocks -> (nb, mb, ...) shuffled minibatches."""
            t, b = blks[0].shape[:2]
            n = t * b
            mb = n // nb
            perm = jax.random.permutation(k, n)
            out = []
            for x in blks:
                x = x.reshape(n, -1)[perm][: mb * nb]
                out.append(x.reshape(nb, mb, x.shape[-1]))
            return tuple(out)

        if mesh is None or mesh.shape.get(DATA_AXIS, 1) == 1:
            shuffled = flat_shuffle(key, *blocks)
        else:
            def local_shuffle(k, *blks):
                k = jax.random.fold_in(k, jax.lax.axis_index(DATA_AXIS))
                return flat_shuffle(k, *blks)

            shuffled = jax.shard_map(
                local_shuffle, mesh=mesh,
                in_specs=(P(),) + (P(None, DATA_AXIS),) * len(blocks),
                out_specs=(P(None, DATA_AXIS),) * len(blocks),
            )(key, *blocks)

        def unpack(ob, sm):
            cols, off = [ob], 0
            for x, w in zip(dataset[1:], widths):
                c = sm[:, off:off + w]
                cols.append(c[:, 0] if x.ndim == 2 else c)
                off += w
            return tuple(cols)

        def mb_update(carry, batch):
            if pack_obs:
                (pk,) = batch
                ob, sm = pk[:, :obs_w], pk[:, obs_w:]
            else:
                ob, sm = batch
            return minibatch_update(carry, unpack(ob, sm))

        def epoch(carry, _):
            carry, metrics = jax.lax.scan(mb_update, carry, shuffled)
            return carry, metrics

        (params, opt_state), metrics = jax.lax.scan(
            epoch, (params, opt_state), None, length=cfg.num_learning_epochs)
        return params, opt_state, metrics.reshape(-1, 5).mean(0)

    # ------------------------------------------------------ full iteration

    def train_iteration(state: TrainState):
        env_state, obs, traj, acc, caps, key = rollout(state)
        _, _, last_value = apply_fn(state.params, obs)
        _, returns, norm_adv = compute_gae(traj, last_value)

        # time-major [T, B, ...] columns; update_epochs flattens per shard
        # (a global [T*B] flatten of a B-sharded array can itself reshard)
        dataset = (
            traj.obs, traj.action, traj.log_prob,
            traj.value, returns, norm_adv,
            traj.mean, traj.std,
        )
        key, k_update = jax.random.split(key)
        params, opt_state, loss_metrics = update_epochs(
            k_update, state.params, state.opt_state, dataset)

        # episode stats: mean over transitions where an episode finished
        n_done = jnp.maximum(traj.done.sum(), 1.0)
        metrics = {
            "loss/total": loss_metrics[0],
            "loss/surrogate": loss_metrics[1],
            "loss/value": loss_metrics[2],
            "loss/entropy": loss_metrics[3],
            "loss/kl": loss_metrics[4],
            "lr": opt_state[1].hyperparams["learning_rate"],
            "episode/num_dones": traj.done.sum(),
            "rollout/reward_mean": traj.reward.mean(),
            # NaN guard (parity: modified_rsl_rl_runner.py:74-75 raises on
            # NaN actions mid-training); the runner raises when this fires
            "nan/detected": 1.0 - (jnp.isfinite(traj.action).all()
                                   & jnp.isfinite(loss_metrics).all()
                                   ).astype(jnp.float32),
        }
        metrics.update(finalize_info_acc(acc, cfg.num_steps_per_env, n_done))
        # [T, 8, ...] rollout trajectories for video rendering (host side
        # pops these before scalarizing)
        metrics.update(caps)

        new_state = TrainState(
            params=params, opt_state=opt_state, env_state=env_state,
            obs=obs, key=key, iteration=state.iteration + 1)
        return new_state, metrics

    if _internals is not None:
        _internals.update(rollout=rollout, compute_gae=compute_gae,
                          update_epochs=update_epochs, model=model)
    return init_fn, train_iteration, policy_apply


def make_learner(env: WheeledEnv, cfg: PPOCfg, _internals: dict | None = None,
                 mesh=None):
    """Policy-class dispatch (parity: rsl_rl resolves
    `RslRlPpoActorCriticCfg.class_name` to ActorCritic/ActorCriticRecurrent;
    the runner is agnostic to which)."""
    if cfg.policy_class == "ActorCritic":
        return make_ppo(env, cfg, _internals, mesh)
    if cfg.policy_class == "ActorCriticRecurrent":
        from .recurrent import make_ppo_recurrent

        return make_ppo_recurrent(env, cfg, _internals, mesh)
    raise ValueError(f"unknown policy_class {cfg.policy_class!r}")
