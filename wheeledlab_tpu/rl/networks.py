"""Actor-critic policy — parity with rsl_rl's ActorCritic MLP as configured by
the reference (RslRlPpoActorCriticCfg: hidden [64, 64], elu/relu, Gaussian
with state-independent learned std, init_noise_std=1.0; reference
drifting/config/agents/mushr/rsl_rl_ppo_cfg.py:12-18).

The policy module is swappable (SURVEY.md §5 long-context note): anything with
`(params, obs) -> (mean, std, value)` works in the PPO learner. The MLP is
bfloat16-friendly but kept f32 — at [64, 64] the cost is negligible and exact
parity matters more.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

_ACTS = {"elu": nn.elu, "relu": nn.relu, "tanh": jnp.tanh, "gelu": nn.gelu}


class MLP(nn.Module):
    hidden: Sequence[int]
    out_dim: int
    activation: str = "elu"

    @nn.compact
    def __call__(self, x):
        act = _ACTS[self.activation]
        for h in self.hidden:
            x = act(nn.Dense(h)(x))
        return nn.Dense(self.out_dim)(x)


class ActorCritic(nn.Module):
    action_dim: int
    actor_hidden: Sequence[int] = (64, 64)
    critic_hidden: Sequence[int] = (64, 64)
    activation: str = "elu"
    init_noise_std: float = 1.0

    @nn.compact
    def __call__(self, obs) -> Tuple[jax.Array, jax.Array, jax.Array]:
        mean = MLP(self.actor_hidden, self.action_dim, self.activation,
                   name="actor")(obs)
        value = MLP(self.critic_hidden, 1, self.activation,
                    name="critic")(obs)[..., 0]
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
