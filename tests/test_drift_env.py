"""Drift task end-to-end tests — covers the reference smoke test
(source/wheeledlab_tasks/test/create_and_step_env.py:27-40: 16 envs, random
actions, no crash) plus term-level unit tests the reference lacks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.flatten_util import ravel_pytree

from wheeledlab_tpu.tasks.drift.task import (
    CORNER_IN_RADIUS, CORNER_OUT_RADIUS, DriftTaskCfg, LINE_RADIUS, STRAIGHT,
    _cross_track_sq, _in_range, _off_track, make_drift_env,
    reference_track_poses,
)

CFG16 = DriftTaskCfg(num_envs=16)


@pytest.fixture(scope="module")
def env16():
    return make_drift_env(CFG16)


class TestSmoke:
    def test_create_and_step_random(self, env16):
        """Parity with reference smoke test: random actions don't crash and
        produce finite state."""
        env = env16
        key = jax.random.PRNGKey(0)
        state, obs = jax.jit(env.reset)(key)
        assert obs.shape == (16, env.obs_dim)

        step = jax.jit(env.step)

        def body(s, k):
            action = jax.random.uniform(k, (16, 2), minval=-1.0, maxval=1.0)
            s, out = step(s, action)
            return s, (out.reward, out.done, out.obs)

        keys = jax.random.split(jax.random.PRNGKey(1), 50)
        state, (rews, dones, obses) = jax.lax.scan(body, state, keys)
        assert jnp.all(jnp.isfinite(ravel_pytree(state.vehicle)[0]))
        assert jnp.all(jnp.isfinite(rews))
        assert obses.shape == (50, 16, env.obs_dim)

    def test_episode_truncates(self, env16):
        """time_out fires at max_episode_length (250 steps at 50 Hz x 5 s)."""
        env = env16
        assert env.max_episode_length == 250
        state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
        step = jax.jit(env.step)

        def body(s, _):
            s, out = step(s, jnp.zeros((16, 2)))
            return s, (out.time_out, out.done)

        state, (touts, dones) = jax.lax.scan(body, state, None, length=251)
        assert bool(jnp.any(touts))  # some envs survive to timeout and truncate


class TestF1Tenth:
    def test_f1tenth_variant_steps(self):
        """F1Tenth drift variant: 4WD map, F1Tenth geometry/actuators
        (reference f1tenth_drift_env_cfg.py)."""
        env = make_drift_env(DriftTaskCfg(robot="f1tenth", num_envs=8))
        assert env.cfg.action.drivetrain == "4wd"
        assert env.cfg.action.base_length == 0.365
        state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
        step = jax.jit(env.step)

        def body(s, k):
            a = jax.random.uniform(k, (8, 2), minval=-1, maxval=1)
            s, out = step(s, a)
            return s, out.reward

        keys = jax.random.split(jax.random.PRNGKey(1), 20)
        state, rews = jax.lax.scan(body, state, keys)
        assert jnp.all(jnp.isfinite(ravel_pytree(state.vehicle)[0]))
        assert jnp.all(jnp.isfinite(rews))
        # all four wheels driven
        assert float(state.params.drive_mask.sum()) == 8 * 4.0


class TestTrackGeometry:
    def test_reference_poses_on_track(self):
        poses = np.asarray(reference_track_poses(jax.random.PRNGKey(3), CFG16))
        # every pose is on the oval center line: cross-track distance ~ 0
        sq = np.asarray(_cross_track_sq(
            jnp.asarray(poses[:, :3]), STRAIGHT, LINE_RADIUS))
        np.testing.assert_allclose(np.sqrt(sq), 0.0, atol=1e-5)

    def test_pose_headings_tangent(self):
        """Yaw should be tangent to the track (CCW): right straight -> +y."""
        cfg = DriftTaskCfg(num_envs=16, num_reset_points=200)
        poses = np.asarray(reference_track_poses(jax.random.PRNGKey(5), cfg))
        x, y, yaw = poses[:, 0], poses[:, 1], poses[:, 3]
        on_right = (np.abs(y) < STRAIGHT) & (x > 0)
        # heading 90 deg = +y direction
        np.testing.assert_allclose(
            np.cos(yaw[on_right]), 0.0, atol=1e-5)
        assert (np.sin(yaw[on_right]) > 0.99).all()

    def test_cross_track_metric(self):
        # on the right line: dist 0; at center x=0,y=0: dist LINE_RADIUS
        p = jnp.array([[LINE_RADIUS, 0.0, 0.0], [0.0, 0.0, 0.0],
                       [0.0, STRAIGHT + LINE_RADIUS, 0.0]])
        d = np.sqrt(np.asarray(_cross_track_sq(p, STRAIGHT, LINE_RADIUS)))
        np.testing.assert_allclose(d, [0.0, LINE_RADIUS, 0.0], atol=1e-6)

    def test_bounds(self):
        inside = jnp.array([[0.1, 0.0, 0.0]])
        outside = jnp.array([[2.5, 0.0, 0.0]])
        ontrack = jnp.array([[1.0, 0.0, 0.0]])
        assert bool(_in_range(inside, STRAIGHT, CORNER_IN_RADIUS)[0])
        assert bool(_off_track(outside, STRAIGHT, CORNER_OUT_RADIUS)[0])
        assert not bool(_in_range(ontrack, STRAIGHT, CORNER_IN_RADIUS)[0])
        assert not bool(_off_track(ontrack, STRAIGHT, CORNER_OUT_RADIUS)[0])
        # corner region: radius measured from (0, +-STRAIGHT)
        corner_out = jnp.array([[0.0, STRAIGHT + 2.1, 0.0]])
        assert bool(_off_track(corner_out, STRAIGHT, CORNER_OUT_RADIUS)[0])


class TestCurriculum:
    def test_weight_schedule(self, env16):
        """side_slip: base 10, +20 every 20 episodes (cap 10 increases, the
        reference's off-by-one allows up to 11); episode = 250 steps."""
        env = env16
        w0 = jnp.array([t.weight for t in env.task.reward_terms])
        names = [t.name for t in env.task.reward_terms]
        i = names.index("side_slip")

        def w_at(step):
            return float(env._curriculum_weights(w0, jnp.asarray(step))[i])

        assert w_at(0) == 10.0
        assert w_at(250 * 18) == 10.0              # episode 18: no increase yet
        assert w_at(250 * 19) == 30.0              # episode 19: first increase
        assert w_at(250 * 39) == 50.0
        assert w_at(250 * 1000) == 10.0 + 20.0 * 11  # capped (max+1 reference quirk)

    def test_dr_params_randomized(self, env16):
        state, _ = jax.jit(env16.reset)(jax.random.PRNGKey(0))
        mu = np.asarray(state.params.tire_mu)
        assert mu.min() >= 0.3 - 1e-6 and mu.max() <= 0.5 + 1e-6
        assert np.unique(mu.round(6)).size > 3  # buckets actually vary
        mass = np.asarray(state.params.mass)
        assert ((mass >= 4.1 - 1e-5) & (mass <= 4.3 + 1e-5)).all()  # 3.8 + [0.3, 0.5]


class TestRewards:
    def test_reward_signs_sensible(self, env16):
        """A car sitting still on the track line: progress ~ 0, vel penalty
        negative-weighted positive distance -> net negative speed shaping."""
        env = env16
        state, obs = jax.jit(env.reset)(jax.random.PRNGKey(2))
        state, out = jax.jit(env.step)(state, jnp.zeros((16, 2)))
        # vel term: weight -5 * ((0-3)^2 - 9) * dt = -5 * 0 = 0 at rest
        np.testing.assert_allclose(
            np.asarray(out.info["rew/vel"]), 0.0, atol=0.5)
        # term_pens zero while on track
        assert (np.asarray(out.info["rew/term_pens"]) <= 0).all()


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-x", "-q"]))
