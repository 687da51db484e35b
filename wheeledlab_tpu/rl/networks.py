"""Actor-critic policy — parity with rsl_rl's ActorCritic MLP as configured by
the reference (RslRlPpoActorCriticCfg: hidden [64, 64], elu/relu, Gaussian
with state-independent learned std, init_noise_std=1.0; reference
drifting/config/agents/mushr/rsl_rl_ppo_cfg.py:12-18).

The policy module is swappable (SURVEY.md §5 long-context note): anything with
`(params, obs) -> (mean, std, value)` works in the PPO learner. Compute dtype
is configurable: f32 by default (exact parity; at [64, 64] over narrow obs the
cost is negligible), opt-in bfloat16 for wide-observation tasks where the
first-layer matmul dominates the PPO update (PPOCfg.compute_dtype).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

_ACTS = {"elu": nn.elu, "relu": nn.relu, "tanh": jnp.tanh, "gelu": nn.gelu}


class MLP(nn.Module):
    hidden: Sequence[int]
    out_dim: int
    activation: str = "elu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = _ACTS[self.activation]
        for h in self.hidden:
            x = act(nn.Dense(h, dtype=self.dtype)(x))
        return nn.Dense(self.out_dim, dtype=self.dtype)(x)


class ActorCritic(nn.Module):
    action_dim: int
    actor_hidden: Sequence[int] = (64, 64)
    critic_hidden: Sequence[int] = (64, 64)
    activation: str = "elu"
    init_noise_std: float = 1.0
    compute_dtype: str = "float32"
    # ^ "bfloat16": matmuls run on the MXU at full bf16 rate with f32 params
    # (flax `dtype`, casts operands only). For WIDE observations (visual
    # 3208, elevation 689) the first-layer contraction dominates the PPO
    # update; f32 dots on TPU pay the multi-pass penalty. Heads are cast
    # back to f32 so downstream PPO math (ratios, KL, GAE) is exact.

    @nn.compact
    def __call__(self, obs) -> Tuple[jax.Array, jax.Array, jax.Array]:
        dt = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32
        mean = MLP(self.actor_hidden, self.action_dim, self.activation,
                   dtype=dt, name="actor")(obs).astype(jnp.float32)
        value = MLP(self.critic_hidden, 1, self.activation,
                    dtype=dt, name="critic")(obs)[..., 0].astype(jnp.float32)
        # log-std parameterization (rsl_rl stores std directly; log keeps it
        # positive under gradient steps — behaviorally equivalent). Clamped:
        # with clip-bounded actions the entropy bonus otherwise inflates std
        # without cost over long runs.
        log_std = self.param(
            "log_std",
            lambda key, shape: jnp.full(shape, jnp.log(self.init_noise_std)),
            (self.action_dim,))
        std = jnp.exp(jnp.clip(log_std, -5.0, 2.0))
        std = jnp.broadcast_to(std, mean.shape)
        return mean, std, value


def fused_actor_critic_apply(model: ActorCritic, params, obs):
    """`ActorCritic.apply` with the actor and critic FIRST layers run as ONE
    matmul over the horizontally-concatenated kernels.

    Why: with wide observations (visual 3208) the input-layer contraction
    dominates the PPO update, and hidden width 64 fills only half an MXU
    lane tile (128) — the visual trace shows four 16384x3208x64 update ops
    at ~46 TFLOP/s effective. One N=128 matmul (+ one fused dW in the
    backward) doubles the tile utilization. The PARAM TREE IS UNCHANGED
    (same actor/critic Dense_0 kernels — checkpoints, optimizer state and
    rsl_rl export are untouched); the concatenation is apply-time algebra,
    so results differ from `model.apply` only by matmul tiling order
    (asserted close in tests/test_ppo.py). Requires equal first hidden
    widths; `make_ppo` falls back to `model.apply` otherwise."""
    act = _ACTS[model.activation]
    dt = (jnp.bfloat16 if model.compute_dtype == "bfloat16"
          else jnp.float32)
    p = params["params"]
    a, c = p["actor"], p["critic"]
    h1 = model.actor_hidden[0]

    w = jnp.concatenate([a["Dense_0"]["kernel"], c["Dense_0"]["kernel"]], 1)
    b = jnp.concatenate([a["Dense_0"]["bias"], c["Dense_0"]["bias"]])
    # flax Dense(dtype=dt) semantics: inputs/kernel/bias promoted to dt
    hidden = act(obs.astype(dt) @ w.astype(dt) + b.astype(dt))
    ha, hc = hidden[..., :h1], hidden[..., h1:]

    def tail(tree, x, n_hidden):
        for i in range(1, n_hidden):
            d = tree[f"Dense_{i}"]
            x = act(x @ d["kernel"].astype(dt) + d["bias"].astype(dt))
        d = tree[f"Dense_{n_hidden}"]
        return x @ d["kernel"].astype(dt) + d["bias"].astype(dt)

    mean = tail(a, ha, len(model.actor_hidden)).astype(jnp.float32)
    value = tail(c, hc, len(model.critic_hidden))[..., 0].astype(jnp.float32)
    log_std = p["log_std"]
    std = jnp.exp(jnp.clip(log_std, -5.0, 2.0))
    return mean, jnp.broadcast_to(std, mean.shape), value


def gaussian_log_prob(mean, std, action):
    """Diagonal Gaussian log-prob summed over action dims."""
    var = std**2
    lp = -0.5 * ((action - mean) ** 2 / var + jnp.log(2 * jnp.pi * var))
    return lp.sum(-1)


def gaussian_entropy(std):
    return (0.5 * jnp.log(2 * jnp.pi * jnp.e) + jnp.log(std)).sum(-1)


def gaussian_kl(mean1, std1, mean2, std2):
    """KL(N1 || N2) summed over dims — the rsl_rl adaptive-lr KL estimate."""
    kl = (jnp.log(std2 / std1)
          + (std1**2 + (mean1 - mean2) ** 2) / (2.0 * std2**2) - 0.5)
    return kl.sum(-1)
