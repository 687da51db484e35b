"""Parity tests for the fused whole-step drift kernel
(tasks/drift/fused.py) against the generic XLA manager path — run in Pallas
interpreter mode on CPU (SURVEY.md §4 test strategy; same pattern as
tests/test_pallas.py for the physics-only kernel).

Determinism: with events + obs noise disabled the two paths consume no
step RNG until a reset fires, and the physics math is shared
(`sim.soa.substep_soa`), so short-horizon trajectories must agree to float
tolerance (the epilogue's atan2_approx introduces ~4e-3 rad worst case in
rewards/obs only). Full-randomization rollouts are compared at the
trajectory-statistics level (the fused path draws one uniform + one normal
block per step instead of per-purpose key splits)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wheeledlab_tpu.tasks.drift.task import DriftTaskCfg, make_drift_env


def make_pair(num_envs=32, **cfg_kw):
    cfg = DriftTaskCfg(num_envs=num_envs, **cfg_kw)
    env_x = make_drift_env(cfg)                 # generic XLA path (CPU)
    env_f = make_drift_env(cfg)
    env_f._use_pallas = True                    # fused kernel ...
    env_f._pallas_interpret = True              # ... in interpreter mode
    assert env_f.task.fused_step is not None
    return env_x, env_f


class TestFusedDeterministicParity:
    def test_short_horizon_states_match(self):
        env_x, env_f = make_pair(events_enabled=False,
                                 enable_corruption=False)
        sx, ox = jax.jit(env_x.reset)(jax.random.PRNGKey(0))
        sf, of = jax.jit(env_f.reset)(jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(ox), np.asarray(of), atol=1e-6)

        step_x = jax.jit(env_x.step)
        step_f = jax.jit(env_f.step)
        # envs that reset draw their spawn from different RNG streams by
        # design — deterministic comparison is over never-reset envs only
        alive = np.ones((32,), bool)
        for t in range(10):
            # deterministic, excitation-rich action sequence
            a = jnp.stack([jnp.full((32,), 0.6),
                           jnp.full((32,), 0.4 * np.sin(0.7 * t))], -1)
            sx, outx = step_x(sx, a)
            sf, outf = step_f(sf, a)
            np.testing.assert_array_equal(
                np.asarray(outx.done)[alive], np.asarray(outf.done)[alive])
            alive &= ~np.asarray(outx.done)
            assert alive.sum() >= 16, "too many resets for a parity check"
            np.testing.assert_allclose(
                np.asarray(sx.vehicle.pos)[alive],
                np.asarray(sf.vehicle.pos)[alive],
                atol=1e-3, err_msg=f"pos step {t}")
            np.testing.assert_allclose(
                np.asarray(sx.vehicle.lin_vel)[alive],
                np.asarray(sf.vehicle.lin_vel)[alive], atol=5e-3,
                err_msg=f"vel step {t}")
            # rewards: atan2_approx in side_slip + compounding float drift
            np.testing.assert_allclose(
                np.asarray(outx.reward)[alive],
                np.asarray(outf.reward)[alive],
                atol=3e-2, err_msg=f"reward step {t}")
            # post-reset obs (no noise): euler rows use the approx atan
            np.testing.assert_allclose(
                np.asarray(outx.obs)[alive], np.asarray(outf.obs)[alive],
                atol=1e-2, err_msg=f"obs step {t}")

    def test_info_keys_and_counters_match(self):
        env_x, env_f = make_pair(events_enabled=False,
                                 enable_corruption=False)
        sx, _ = jax.jit(env_x.reset)(jax.random.PRNGKey(3))
        sf, _ = jax.jit(env_f.reset)(jax.random.PRNGKey(3))
        a = jnp.zeros((32, 2))
        sx, outx = jax.jit(env_x.step)(sx, a)
        sf, outf = jax.jit(env_f.step)(sf, a)
        assert sorted(outx.info) == sorted(outf.info)
        np.testing.assert_array_equal(np.asarray(sx.step_count),
                                      np.asarray(sf.step_count))
        assert int(sx.common_step) == int(sf.common_step) == 1
        for k in outx.info:
            np.testing.assert_allclose(
                np.asarray(outx.info[k], np.float32),
                np.asarray(outf.info[k], np.float32), atol=3e-2,
                err_msg=k)


class TestFusedF1Tenth:
    def test_f1tenth_4wd_fused_matches_xla(self):
        """The fused kernel's in-row 4WD action map (open-diff Ackermann
        throttle, rc_car_actions.py:33-64) must match the generic path on
        the F1Tenth variant."""
        env_x, env_f = make_pair(robot="f1tenth", events_enabled=False,
                                 enable_corruption=False)
        sx, _ = jax.jit(env_x.reset)(jax.random.PRNGKey(2))
        sf, _ = jax.jit(env_f.reset)(jax.random.PRNGKey(2))
        step_x, step_f = jax.jit(env_x.step), jax.jit(env_f.step)
        alive = np.ones((32,), bool)
        for t in range(8):
            a = jnp.stack([jnp.full((32,), 0.7),
                           jnp.full((32,), 0.5 * np.sin(0.9 * t))], -1)
            sx, outx = step_x(sx, a)
            sf, outf = step_f(sf, a)
            alive &= ~np.asarray(outx.done)
            np.testing.assert_allclose(
                np.asarray(sx.vehicle.pos)[alive],
                np.asarray(sf.vehicle.pos)[alive], atol=1e-3,
                err_msg=f"pos step {t}")
            np.testing.assert_allclose(
                np.asarray(sx.vehicle.wheel_omega)[alive],
                np.asarray(sf.vehicle.wheel_omega)[alive], rtol=1e-2,
                atol=0.5, err_msg=f"wheel step {t}")


class TestFusedStatisticalParity:
    def test_random_rollout_statistics(self):
        """Full events + noise + resets: trajectory statistics must agree
        (golden-test-style bands; the RNG consumption patterns differ)."""
        env_x, env_f = make_pair(num_envs=64)

        def rollout(env, steps=150):
            state, _ = jax.jit(env.reset)(jax.random.PRNGKey(7))

            def body(s, k):
                a = jax.random.uniform(k, (64, 2), minval=-1.0, maxval=1.0)
                s, out = env.step(s, a)
                return s, (out.reward, s.vehicle.pos, s.vehicle.lin_vel,
                           out.done)

            keys = jax.random.split(jax.random.PRNGKey(11), steps)
            _, (rew, pos, vel, done) = jax.jit(
                lambda s: jax.lax.scan(body, s, keys))(state)
            speed = jnp.linalg.norm(vel[..., :2], axis=-1)
            return dict(reward_mean=float(rew.mean()),
                        speed_mean=float(speed.mean()),
                        xy_abs_mean=float(jnp.abs(pos[..., :2]).mean()),
                        z_mean=float(pos[..., 2].mean()),
                        done_frac=float(done.mean()))

        mx, mf = rollout(env_x), rollout(env_f)
        for k in mx:
            tol = 0.15 if k != "z_mean" else 0.05
            err = abs(mx[k] - mf[k]) / (abs(mx[k]) + 1e-6)
            assert err < tol, (k, mx[k], mf[k])

    def test_curriculum_weights_advance_identically(self):
        """The curriculum runs outside the kernel — weight schedules must
        match the generic path exactly as episodes accumulate."""
        env_x, env_f = make_pair(num_envs=8, episode_length_s=0.4)
        sx, _ = jax.jit(env_x.reset)(jax.random.PRNGKey(0))
        sf, _ = jax.jit(env_f.reset)(jax.random.PRNGKey(0))
        a = jnp.zeros((8, 2))
        step_x, step_f = jax.jit(env_x.step), jax.jit(env_f.step)
        for _ in range(45):   # > 2 episodes of 20 steps
            sx, _ = step_x(sx, a)
            sf, _ = step_f(sf, a)
        np.testing.assert_array_equal(np.asarray(sx.reward_weights),
                                      np.asarray(sf.reward_weights))


class TestFusedSharded:
    def test_fused_step_composes_with_data_mesh(self):
        """The fused whole-step kernel under a data mesh: `pallas_call` has
        no GSPMD partitioning rule, so the env shard-maps the kernel over
        local (rows, B/D) blocks when a mesh context is active (envs are
        independent — communication-free). Run a full PPO train step with
        the fused path (interpret mode) sharded over the 8-device mesh and
        check it matches the unsharded fused run."""
        import numpy as np

        from wheeledlab_tpu.parallel.mesh import make_mesh, shard_train_state
        from wheeledlab_tpu.rl.ppo import PPOCfg, make_ppo

        n = 64
        cfg = PPOCfg(num_steps_per_env=4, num_learning_epochs=1,
                     num_mini_batches=2)

        def build_env():
            env = make_drift_env(DriftTaskCfg(num_envs=n))
            env._use_pallas = True
            env._pallas_interpret = True
            return env

        env = build_env()
        init_fn, train_iter, _ = make_ppo(env, cfg)
        state0 = jax.jit(init_fn)(jax.random.PRNGKey(0))
        # packed representations landed in the carry
        assert not hasattr(state0.env_state.vehicle_mem, "pos")
        _, m_ref = jax.jit(train_iter)(state0)

        mesh = make_mesh(8)
        env_s = build_env()
        init_s, train_iter_s, _ = make_ppo(env_s, cfg, mesh=mesh)
        state_s = jax.jit(init_s)(jax.random.PRNGKey(0))
        sharded = shard_train_state(state_s, mesh, n)
        # the (21, B) packed carry shards on its TRAILING (env) axis
        shard_shapes = {s.data.shape for s in
                        sharded.env_state.vehicle_mem.addressable_shards}
        assert shard_shapes == {(21, n // 8)}, shard_shapes
        with jax.sharding.set_mesh(mesh):
            _, m = jax.jit(train_iter_s)(sharded)
        jax.block_until_ready(m["loss/total"])
        assert np.isfinite(float(m["loss/total"]))
        np.testing.assert_allclose(
            float(m["rollout/reward_mean"]),
            float(m_ref["rollout/reward_mean"]), rtol=2e-4)


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))
