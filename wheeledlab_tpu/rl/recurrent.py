"""Recurrent actor-critic PPO — the `ActorCriticRecurrent` model family.

The reference's harness selects the policy class by name through rsl_rl's
`RslRlPpoActorCriticCfg.class_name` (the registered tasks all use the plain
MLP `ActorCritic`, reference drifting/config/agents/mushr/rsl_rl_ppo_cfg.py:12,
but the rsl_rl runner it wraps ships `ActorCriticRecurrent`: LSTM memory in
front of the actor and critic MLPs, hidden state reset on episode done).
This module is the TPU-native equivalent, selected via
`PPOCfg.policy_class = "ActorCriticRecurrent"`.

Design (idiomatic JAX, not a port of rsl_rl's padded-trajectory generator):

- Rollout: hidden state lives in the train-state pytree and is carried through
  the `lax.scan` rollout; it is zeroed for just-reset envs (rsl_rl
  `ActorCriticRecurrent.reset(dones)` semantics).
- Update: minibatches split the ENV axis (rsl_rl's recurrent generator splits
  by trajectory for the same reason — log-prob recomputation needs the hidden
  chain). Each minibatch re-runs the LSTM over the full rollout window from
  the stored window-start hidden with done-masked resets: full-window BPTT
  with no padding, compiled as one `nn.scan` over time on the MXU.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct
from jax.sharding import PartitionSpec as P

from ..envs.env import EnvState, WheeledEnv
from ..parallel.mesh import DATA_AXIS
from .ppo import (
    accumulate_info, finalize_info_acc, init_info_acc, traj_captures,
)
from .networks import (
    MLP, gaussian_entropy, gaussian_kl, gaussian_log_prob,
)


class _DualMemoryStep(nn.Module):
    """One time step of BOTH the actor and critic LSTM chains with
    done-masked carry reset (reset=1 zeroes the carry entering this step).

    BPTT-speed engineering (all measured on v5e, 1024 envs; r3 baseline
    132.5 ms/iteration, now 60 ms):

    - **One scan for both chains** instead of two T-length scans
      back-to-back: the recurrences are independent, so XLA schedules both
      cells' matmuls inside one loop iteration (112 ms).
    - **bf16 cell computation** (`dtype=bfloat16`, f32 params): the gate
      matmuls AND the sigmoid/tanh elementwise — which dominate the per-step
      cost at this size — run at 2x VPU/MXU rate (93 ms).
    - **remat on the scanned step** (round 5, the big one: 93.3 -> 60.3
      ms): without it the BPTT scan stashes every step's forward
      intermediates to HBM for the backward — ~(T, mb, gates+carries) per
      minibatch, re-read in reverse order. Recomputing the cheap gate math
      in the backward pass deletes that round-trip entirely; the update was
      HBM-stash-bound, not FLOPs-bound.
    - **unroll=8** on the time scan; pre-remat, higher unroll measured
      SLOWER (139/155 ms at 16/32 — bigger stashes); with remat unroll=16
      is a wash (60.6 ms) and 4 is worse (80.9 ms).
    - Measured NEGATIVE result: hoisting the x-side input projections out
      of the recurrence (the classic cuDNN LSTM split) ran 136 ms — with a
      14-wide obs the hoisted matmul saves nothing, and the materialized
      (T, B, 4H) pre-activations cost an HBM round-trip per pass.
    - Sharing the sequence forward across epochs is NOT possible: params
      update every minibatch, so every minibatch's hidden chain differs —
      there is nothing to reuse. The remaining gap to ~40 ms would need a
      hand-written Pallas LSTM kernel with a custom VJP (weights
      VMEM-resident across the whole window); the per-iteration floor is
      the 2 x T x epochs x minibatches sequential gate chain."""

    hidden_size: int
    num_layers: int

    @nn.compact
    def __call__(self, carry, inp):
        x, reset = inp
        mask = (1.0 - reset)[..., None]
        new_a, new_c = [], []
        ha = x
        hc = x
        for i in range(self.num_layers):
            ca = jax.tree.map(lambda t: t * mask, carry["actor"][i])
            ca, ha = nn.OptimizedLSTMCell(
                self.hidden_size, dtype=jnp.bfloat16,
                name=f"lstm_a{i}")(ca, ha)
            new_a.append(ca)
            cc = jax.tree.map(lambda t: t * mask, carry["critic"][i])
            cc, hc = nn.OptimizedLSTMCell(
                self.hidden_size, dtype=jnp.bfloat16,
                name=f"lstm_c{i}")(cc, hc)
            new_c.append(cc)
        return ({"actor": tuple(new_a), "critic": tuple(new_c)},
                (ha.astype(jnp.float32), hc.astype(jnp.float32)))


# Scan the step over the leading time axis; params broadcast across steps.
_Memory = nn.scan(
    nn.remat(_DualMemoryStep),
    variable_broadcast="params",
    split_rngs={"params": False},
    in_axes=0,
    out_axes=0,
    unroll=8,
)


class ActorCriticRecurrent(nn.Module):
    """LSTM memory (separate actor/critic chains, rsl_rl layout) feeding the
    same [64, 64] MLP heads + state-independent Gaussian std as `ActorCritic`.

    `__call__` is sequence-first: `(hidden, obs_seq [T, B, D], reset_seq
    [T, B]) -> (hidden, mean [T, B, A], std, value [T, B])`. Single-step use
    (rollout) is a T=1 sequence.
    """

    action_dim: int
    actor_hidden: Tuple[int, ...] = (64, 64)
    critic_hidden: Tuple[int, ...] = (64, 64)
    activation: str = "elu"
    init_noise_std: float = 1.0
    rnn_hidden_size: int = 256
    rnn_num_layers: int = 1

    @nn.compact
    def __call__(self, hidden, obs_seq, reset_seq):
        hidden, (xa, xc) = _Memory(
            self.rnn_hidden_size, self.rnn_num_layers,
            name="memory")(hidden, (obs_seq, reset_seq))
        ha, hc = hidden["actor"], hidden["critic"]
        mean = MLP(self.actor_hidden, self.action_dim, self.activation,
                   name="actor")(xa)
        value = MLP(self.critic_hidden, 1, self.activation,
                    name="critic")(xc)[..., 0]
        log_std = self.param(
            "log_std",
            lambda key, shape: jnp.full(shape, jnp.log(self.init_noise_std)),
            (self.action_dim,))
        std = jnp.exp(jnp.clip(log_std, -5.0, 2.0))
        std = jnp.broadcast_to(std, mean.shape)
        return {"actor": ha, "critic": hc}, mean, std, value

    def initial_hidden(self, batch: int) -> Dict[str, Tuple]:
        zeros = lambda: tuple(
            (jnp.zeros((batch, self.rnn_hidden_size)),
             jnp.zeros((batch, self.rnn_hidden_size)))
            for _ in range(self.rnn_num_layers))
        return {"actor": zeros(), "critic": zeros()}


class RecurrentTransition(NamedTuple):
    obs: jax.Array
    reset: jax.Array          # 1.0 where hidden was reset entering this step
    action: jax.Array
    log_prob: jax.Array
    value: jax.Array
    reward: jax.Array
    done: jax.Array
    mean: jax.Array
    std: jax.Array


class RecurrentTrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    env_state: EnvState
    obs: jax.Array
    hidden: Any               # LSTM carries, {actor, critic}
    reset_prev: jax.Array     # [B] done flags from the previous env step
    key: jax.Array
    iteration: jax.Array


def make_ppo_recurrent(env: WheeledEnv, cfg, _internals: dict | None = None,
                       mesh=None):
    """Recurrent counterpart of `ppo.make_ppo` — same (init_fn,
    train_iteration, policy_apply) contract, same PPO semantics (GAE, clipped
    surrogate, adaptive-KL LR, 5 epochs x 4 minibatches), but minibatches
    split the env axis and the update BPTTs through the rollout window.

    `mesh`: as in make_ppo — with a data mesh the env-axis minibatch
    permutation is shard-local (shard_map), so the sharded update gathers no
    rollout data across devices."""
    model = ActorCriticRecurrent(
        action_dim=env.action_dim, actor_hidden=cfg.actor_hidden,
        critic_hidden=cfg.critic_hidden, activation=cfg.activation,
        init_noise_std=cfg.init_noise_std,
        rnn_hidden_size=cfg.rnn_hidden_size,
        rnn_num_layers=cfg.rnn_num_layers)

    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.inject_hyperparams(optax.adam)(learning_rate=cfg.learning_rate),
    )

    def seq_apply(params, hidden, obs_seq, reset_seq):
        return model.apply(params, hidden, obs_seq, reset_seq)

    def step_apply(params, hidden, obs, reset_prev):
        hidden, mean, std, value = model.apply(
            params, hidden, obs[None], reset_prev[None])
        return hidden, mean[0], std[0], value[0]

    def init_fn(key: jax.Array) -> RecurrentTrainState:
        k_env, k_model, k_state = jax.random.split(key, 3)
        env_state, obs = env.reset(k_env)
        hidden = model.initial_hidden(env.num_envs)
        params = model.init(
            k_model, model.initial_hidden(1),
            jnp.zeros((1, 1, env.obs_dim)), jnp.zeros((1, 1)))
        opt_state = tx.init(params)
        return RecurrentTrainState(
            params=params, opt_state=opt_state, env_state=env_state, obs=obs,
            hidden=hidden, reset_prev=jnp.zeros((env.num_envs,)), key=k_state,
            iteration=jnp.zeros((), jnp.int32))

    def policy_apply(params, obs, hidden=None, reset_prev=None):
        """Inference hook: stateless MLP-style call is not possible for a
        recurrent policy; callers pass (hidden, reset_prev) and get the next
        hidden back (cli/play drives this)."""
        if hidden is None:
            hidden = model.initial_hidden(obs.shape[0])
        if reset_prev is None:
            reset_prev = jnp.zeros((obs.shape[0],))
        hidden, mean, std, value = step_apply(params, hidden, obs, reset_prev)
        return mean, std, value, hidden

    # ------------------------------------------------------------- rollout

    def rollout(state: RecurrentTrainState):
        h0 = state.hidden

        def step(carry, key):
            env_state, obs, hidden, reset_prev, acc = carry
            hidden, mean, std, value = step_apply(
                state.params, hidden, obs, reset_prev)
            action = mean + std * jax.random.normal(key, mean.shape)
            log_prob = gaussian_log_prob(mean, std, action)
            env_state, out = env.step(env_state, action)
            reward = out.reward + cfg.gamma * value * out.time_out
            tr = RecurrentTransition(
                obs=obs, reset=reset_prev, action=action, log_prob=log_prob,
                value=value, reward=reward, done=out.done.astype(jnp.float32),
                mean=mean, std=std)
            acc = accumulate_info(acc, out.info, out.done)
            carry = (env_state, out.obs, hidden,
                     out.done.astype(jnp.float32), acc)
            return carry, (tr, traj_captures(env_state))

        keys = jax.random.split(state.key, cfg.num_steps_per_env + 1)
        acc0 = init_info_acc(env, state.env_state)
        (env_state, obs, hidden, reset_prev, acc), (traj, caps) = jax.lax.scan(
            step, (state.env_state, state.obs, state.hidden,
                   state.reset_prev, acc0), keys[1:])
        return env_state, obs, hidden, reset_prev, h0, traj, acc, caps, keys[0]

    # ----------------------------------------------------------------- GAE

    def compute_gae(traj: RecurrentTransition, last_value: jax.Array):
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

    def loss_fn(params, mb, clip_param):
        """mb fields are [T, mb_envs, ...] time-major slices + h0 per env."""
        h0, traj, ret, adv = mb
        _, mean, std, value = seq_apply(params, h0, traj.obs, traj.reset)
        log_prob = gaussian_log_prob(mean, std, traj.action)
        ratio = jnp.exp(log_prob - traj.log_prob)
        surr1 = ratio * adv
        surr2 = jnp.clip(ratio, 1.0 - clip_param, 1.0 + clip_param) * adv
        surrogate_loss = -jnp.minimum(surr1, surr2).mean()

        if cfg.use_clipped_value_loss:
            value_clipped = traj.value + jnp.clip(
                value - traj.value, -clip_param, clip_param)
            value_loss = jnp.maximum(
                (value - ret) ** 2, (value_clipped - ret) ** 2).mean()
        else:
            value_loss = ((value - ret) ** 2).mean()

        entropy = gaussian_entropy(std).mean()
        kl = gaussian_kl(traj.mean, traj.std, mean, std).mean()
        total = (surrogate_loss + cfg.value_loss_coef * value_loss
                 - cfg.entropy_coef * entropy)
        return total, (surrogate_loss, value_loss, entropy, kl)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def minibatch_update(carry, mb):
        params, opt_state = carry
        (loss, (surr, vloss, ent, kl)), grads = grad_fn(
            params, mb, cfg.clip_param)
        if cfg.schedule == "adaptive":
            lr = opt_state[1].hyperparams["learning_rate"]
            lr = jnp.where(kl > cfg.desired_kl * 2.0,
                           jnp.maximum(lr / 1.5, cfg.min_lr), lr)
            lr = jnp.where((kl < cfg.desired_kl / 2.0) & (kl > 0.0),
                           jnp.minimum(lr * 1.5, cfg.max_lr), lr)
            opt_state[1].hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), jnp.stack([loss, surr, vloss, ent, kl])

    def update_epochs(key, params, opt_state, h0, traj, returns, norm_adv):
        nb = cfg.num_mini_batches

        def gather_minibatches(k, h0_, traj_, ret_, adv_):
            """Env-axis permutation + [num_mb, T, mb_envs, ...] gathers."""
            n_envs = ret_.shape[1]
            mb_envs = n_envs // nb
            perm = jax.random.permutation(k, n_envs)
            cols = perm[: mb_envs * nb].reshape(nb, mb_envs)
            take_env = lambda x: jnp.moveaxis(x[:, cols], 1, 0)
            return (jax.tree.map(lambda t: t[cols], h0_),
                    jax.tree.map(take_env, traj_),
                    take_env(ret_), take_env(adv_))

        if mesh is None or mesh.shape.get(DATA_AXIS, 1) == 1:
            batched = gather_minibatches(key, h0, traj, returns, norm_adv)
        else:
            # shard-local env permutation: each device gathers only its own
            # [T, B/D] block (no cross-shard movement of the rollout; each
            # global minibatch = D equal local sub-blocks, as in ppo.py)
            def local_gather(k, h0_, traj_, ret_, adv_):
                k = jax.random.fold_in(k, jax.lax.axis_index(DATA_AXIS))
                return gather_minibatches(k, h0_, traj_, ret_, adv_)

            env_axis = P(None, DATA_AXIS)   # [T, B, ...] / [nb, mb, H]
            batched = jax.shard_map(
                local_gather, mesh=mesh,
                in_specs=(P(), P(DATA_AXIS), env_axis, env_axis, env_axis),
                out_specs=(env_axis, P(None, None, DATA_AXIS),
                           P(None, None, DATA_AXIS), P(None, None, DATA_AXIS)),
            )(key, h0, traj, returns, norm_adv)

        def epoch(carry, _):
            carry, metrics = jax.lax.scan(minibatch_update, carry, batched)
            return carry, metrics

        (params, opt_state), metrics = jax.lax.scan(
            epoch, (params, opt_state), None, length=cfg.num_learning_epochs)
        return params, opt_state, metrics.reshape(-1, 5).mean(0)

    # ------------------------------------------------------ full iteration

    def train_iteration(state: RecurrentTrainState):
        (env_state, obs, hidden, reset_prev, h0, traj, acc, caps,
         key) = rollout(state)
        _, _, last_value, _ = policy_apply(
            state.params, obs, hidden, reset_prev)
        _, returns, norm_adv = compute_gae(traj, last_value)

        key, k_update = jax.random.split(key)
        params, opt_state, loss_metrics = update_epochs(
            k_update, state.params, state.opt_state, h0, traj, returns,
            norm_adv)

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
            "nan/detected": 1.0 - (jnp.isfinite(traj.action).all()
                                   & jnp.isfinite(loss_metrics).all()
                                   ).astype(jnp.float32),
        }
        metrics.update(finalize_info_acc(acc, cfg.num_steps_per_env, n_done))
        # [T, 8, ...] rollout trajectories so `--video` records for the
        # recurrent policy class too (runner pops traj/* before scalarizing)
        metrics.update(caps)

        new_state = RecurrentTrainState(
            params=params, opt_state=opt_state, env_state=env_state, obs=obs,
            hidden=hidden, reset_prev=reset_prev, key=key,
            iteration=state.iteration + 1)
        return new_state, metrics

    if _internals is not None:
        _internals.update(rollout=rollout, compute_gae=compute_gae,
                          update_epochs=update_epochs, model=model,
                          seq_apply=seq_apply, step_apply=step_apply)
    return init_fn, train_iteration, policy_apply
