"""Manager-runtime unit tests: event firing, obs corruption gating, reset
semantics, reward*dt scaling — the IsaacLab-manager behaviors the fused step
must reproduce (SURVEY.md hard part (d))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wheeledlab_tpu.tasks.drift.task import DriftTaskCfg, make_drift_env


class TestObsCorruption:
    def test_play_obs_deterministic_when_disabled(self):
        env = make_drift_env(DriftTaskCfg(num_envs=4, enable_corruption=False,
                                          events_enabled=False))
        s1, o1 = jax.jit(env.reset)(jax.random.PRNGKey(0))
        s2, o2 = jax.jit(env.reset)(jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    def test_noise_applied_when_enabled(self):
        """Same vehicle state, different obs keys -> different obs."""
        env = make_drift_env(DriftTaskCfg(num_envs=4))
        state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
        step = jax.jit(env.step)
        s_a, out_a = step(state, jnp.zeros((4, 2)))
        s_b, out_b = step(state.replace(key=jax.random.PRNGKey(99)),
                          jnp.zeros((4, 2)))
        # same physics (same action, same start), different noise
        np.testing.assert_allclose(np.asarray(s_a.vehicle.pos),
                                   np.asarray(s_b.vehicle.pos), atol=2e-2)
        assert not np.allclose(np.asarray(out_a.obs), np.asarray(out_b.obs))


class TestRewardScaling:
    def test_weight_times_dt(self):
        """RewardManager parity: contribution = weight * value * step_dt."""
        env = make_drift_env(DriftTaskCfg(num_envs=4, events_enabled=False,
                                          enable_corruption=False))
        state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
        # give every env a pure yaw rate of 1 rad/s -> progress term value 1
        vehicle = state.vehicle.replace(
            ang_vel=jnp.tile(jnp.array([0.0, 0.0, 1.0]), (4, 1)))
        state = state.with_vehicle(vehicle)
        new_state, out = jax.jit(env.step)(state, jnp.zeros((4, 2)))
        # contribution must equal weight * term_value(post-physics) * step_dt
        prog = np.asarray(out.info["rew/progress"])
        yaw_rate = np.asarray(new_state.vehicle.ang_vel[:, 2])
        np.testing.assert_allclose(prog, 40.0 * yaw_rate * 0.02,
                                   rtol=1e-4, atol=1e-5)


class TestResetSemantics:
    def test_done_envs_teleport_and_zero_stats(self):
        env = make_drift_env(DriftTaskCfg(num_envs=8, events_enabled=False,
                                          enable_corruption=False))
        state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
        # force half the envs far off track -> termination this step
        bad_pos = state.vehicle.pos.at[:4, 0].set(50.0)
        state = state.with_vehicle(state.vehicle.replace(pos=bad_pos))
        new_state, out = jax.jit(env.step)(state, jnp.zeros((8, 2)))
        done = np.asarray(out.done)
        assert done[:4].all() and not done[4:].any()
        # reset envs are back on the track band
        r = np.linalg.norm(np.asarray(new_state.vehicle.pos[:4, :2]), axis=-1)
        assert (r < 3.0).all()
        assert (np.asarray(new_state.step_count[:4]) == 0).all()
        assert (np.asarray(new_state.ep_return[:4]) == 0).all()
        # termination penalty applied to the done envs (pre-reset reward)
        pens = np.asarray(out.info["rew/term_pens"][:4])
        assert (pens <= -5000.0 * 0.02 + 1e-3).all()

    def test_time_out_not_terminated(self):
        env = make_drift_env(DriftTaskCfg(num_envs=4, events_enabled=False,
                                          enable_corruption=False))
        state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
        state = state.replace(
            step_count=jnp.full((4,), env.max_episode_length - 1, jnp.int32))
        _, out = jax.jit(env.step)(state, jnp.zeros((4, 2)))
        assert np.asarray(out.time_out).all()
        # timeout alone incurs no termination penalty
        np.testing.assert_allclose(
            np.asarray(out.info["rew/term_pens"]), 0.0, atol=1e-6)


class TestPushEvents:
    def test_pushes_change_velocity(self):
        """Interval pushes fire and perturb velocities (reference
        push_by_setting_velocity, mushr_drift_env_cfg.py:121-143)."""
        cfg = DriftTaskCfg(num_envs=32, enable_corruption=False)
        env = make_drift_env(cfg)
        assert len(env.task.pushes) == 2
        state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
        step = jax.jit(env.step)

        def body(s, _):
            s, out = step(s, jnp.zeros((32, 2)))
            return s, s.vehicle.ang_vel[:, 2]

        state, yaw_rates = jax.lax.scan(body, state, None, length=30)
        # cars at rest with zero action would have ~0 yaw rate; pushes
        # (yaw +-0.3 / +-0.6) must leave a visible signature
        assert float(jnp.abs(yaw_rates).max()) > 0.05

    def test_no_pushes_when_disabled(self):
        cfg = DriftTaskCfg(num_envs=8, events_enabled=False,
                           enable_corruption=False)
        env = make_drift_env(cfg)
        assert len(env.task.pushes) == 0


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-x", "-q"]))
