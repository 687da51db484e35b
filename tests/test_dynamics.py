"""Physics-core unit tests: closed-form checks the reference never had
(SURVEY.md §4 — unit tests per physics kernel)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.flatten_util import ravel_pytree

from wheeledlab_tpu.sim import (
    ActionMapCfg, Heightfield, VehicleState, action_to_targets,
    default_mushr_params, step,
)
from wheeledlab_tpu.utils import math as wmath

MUSHR_ACTION = ActionMapCfg(drivetrain="rwd", scale=(3.0, 0.488),
                            bounding_strategy="clip", no_reverse=True)
DT, DECIMATION = 0.005, 4


REST_H = 0.06  # body-origin rest height = params.com_height


def make_state():
    state = VehicleState.zero()
    return state.replace(pos=state.pos.at[2].set(REST_H))


def control_step(state, params, terrain, action, n=1):
    steer_t, wheel_t = action_to_targets(jnp.asarray(action), MUSHR_ACTION)

    def body(s, _):
        s, aux = step(s, params, terrain, steer_t, wheel_t, DT, DECIMATION)
        return s, aux

    return jax.lax.scan(body, state, None, length=n)


class TestRest:
    def test_settles_at_rest(self):
        """A car with zero action must settle (no contact jitter)."""
        params = default_mushr_params()
        terrain = Heightfield.flat()
        state = make_state()
        final, _ = jax.jit(control_step, static_argnums=(4,))(
            state, params, terrain, jnp.zeros(2), 100)
        np.testing.assert_allclose(np.asarray(final.lin_vel), 0.0, atol=0.05)
        np.testing.assert_allclose(np.asarray(final.ang_vel), 0.0, atol=0.05)
        # sits near rest height (small static suspension compression)
        assert abs(float(final.pos[2]) - REST_H) < 0.01
        assert abs(float(final.pos[0])) < 0.02
        assert jnp.all(jnp.isfinite(ravel_pytree(final)[0]))


class TestStraightLine:
    def test_accelerates_towards_target_speed(self):
        """Full throttle, zero steer -> forward speed approaches 3 m/s."""
        params = default_mushr_params()
        terrain = Heightfield.flat()
        state = make_state()
        final, _ = jax.jit(control_step, static_argnums=(4,))(
            state, params, terrain, jnp.array([1.0, 0.0]), 150)  # 3 s
        vx = float(final.lin_vel[0])
        assert 2.0 < vx <= 3.3, f"vx={vx}"
        assert abs(float(final.pos[1])) < 0.1  # straight
        assert abs(float(final.lin_vel[1])) < 0.1

    def test_no_reverse(self):
        """no_reverse clamps throttle at 0 (reference actions_cfg no_reverse)."""
        params = default_mushr_params()
        terrain = Heightfield.flat()
        state = make_state()
        final, _ = jax.jit(control_step, static_argnums=(4,))(
            state, params, terrain, jnp.array([-1.0, 0.0]), 50)
        assert float(final.lin_vel[0]) > -0.05


class TestTurning:
    def test_turn_radius_low_speed(self):
        """At low speed (no slip), kinematic turn radius ~= L / tan(delta)."""
        params = default_mushr_params()
        terrain = Heightfield.flat()
        state = make_state()
        action = jnp.array([0.25, 1.0])  # 0.75 m/s, full steer 0.488 rad
        final, _ = jax.jit(control_step, static_argnums=(4,))(
            state, params, terrain, action, 300)  # 6 s
        # steady-state: yaw rate = v / R
        speed = float(jnp.linalg.norm(final.lin_vel[:2]))
        yaw_rate = float(final.ang_vel[2])
        r_expected = 0.325 / np.tan(0.488)
        r_actual = speed / abs(yaw_rate)
        assert 0.5 * r_expected < r_actual < 2.0 * r_expected, (
            f"R={r_actual} vs {r_expected}")
        assert yaw_rate > 0.3  # steering left turns left (CCW)

    def test_tire_saturation_at_high_speed(self):
        """At 3 m/s + full steer on low friction the lateral force saturates:
        the car cannot track the kinematic radius (limit understeer). This is
        the grip limit that makes the drift task non-trivial."""
        params = default_mushr_params()
        params = params.replace(tire_mu=jnp.full((4,), 0.4))
        terrain = Heightfield.flat()
        state = make_state().replace(
            lin_vel=jnp.array([3.0, 0.0, 0.0]),
            wheel_omega=jnp.full((4,), 60.0))
        final, _ = jax.jit(control_step, static_argnums=(4,))(
            state, params, terrain, jnp.array([1.0, 1.0]), 100)
        assert jnp.all(jnp.isfinite(ravel_pytree(final)[0]))
        speed = float(jnp.linalg.norm(final.lin_vel[:2]))
        yaw_rate = abs(float(final.ang_vel[2]))
        r_kinematic = 0.325 / np.tan(0.488)
        r_actual = speed / max(yaw_rate, 1e-3)
        assert r_actual > 2.0 * r_kinematic, (
            f"R={r_actual} vs kinematic {r_kinematic}: tires did not saturate")
        # lateral accel capped near mu*g
        assert speed * yaw_rate < 0.4 * 9.81 * 1.6

    def test_oversteer_slip_from_flick(self):
        """A flick (yaw-rate kick) + full throttle spins the rear wheels,
        collapsing rear lateral grip -> large body slip angle. This is the
        mechanism the drift policy must exploit (side_slip reward,
        reference mushr_drift_env_cfg.py:219-230)."""
        params = default_mushr_params().replace(tire_mu=jnp.full((4,), 0.4))
        terrain = Heightfield.flat()
        state = make_state().replace(
            lin_vel=jnp.array([2.0, 0.0, 0.0]),
            ang_vel=jnp.array([0.0, 0.0, 2.5]),
            wheel_omega=jnp.full((4,), 40.0))
        steer_t, wheel_t = action_to_targets(jnp.array([1.0, 1.0]), MUSHR_ACTION)

        def body(s, _):
            s2, _ = step(s, params, terrain, steer_t, wheel_t, DT, DECIMATION)
            v_b = wmath.quat_rotate_inverse(s2.quat, s2.lin_vel)
            slip = jnp.abs(jnp.arctan2(v_b[1], jnp.abs(v_b[0])))
            return s2, slip

        final, slips = jax.jit(
            lambda s: jax.lax.scan(body, s, None, length=75))(state)
        assert jnp.all(jnp.isfinite(ravel_pytree(final)[0]))
        assert float(jnp.max(slips)) > 0.25, f"max slip={float(jnp.max(slips))}"


class TestActions:
    def test_ackermann_closed_form(self):
        """Ackermann map reproduces the reference formulas bit-for-bit
        (ackermann_actions.py:181-199)."""
        cfg = ActionMapCfg(drivetrain="ackermann", scale=(1.0, 1.0),
                           bounding_strategy=None, no_reverse=False,
                           base_length=0.325, base_width=0.2,
                           wheel_radius=0.05)
        v, delta = 2.0, 0.3
        steer_t, wheel_t = action_to_targets(jnp.array([v, delta]), cfg)
        L, W, r = 0.325, 0.2, 0.05
        R = L / np.tan(delta)
        np.testing.assert_allclose(
            float(steer_t[0]), np.arctan(L / (R - W / 2)), rtol=1e-5)
        np.testing.assert_allclose(
            float(steer_t[1]), np.arctan(L / (R + W / 2)), rtol=1e-5)
        np.testing.assert_allclose(
            float(wheel_t[0]), v * abs((R - W / 2) / (R * r)), rtol=1e-5)
        np.testing.assert_allclose(
            float(wheel_t[3]), v * abs(np.sqrt((R + W / 2) ** 2 + L**2) / (R * r)),
            rtol=1e-5)

    def test_rwd_map(self):
        """RWD: tan steering + uniform rear throttle (rc_car_actions.py:12-29)."""
        steer_t, wheel_t = action_to_targets(jnp.array([0.5, 0.5]), MUSHR_ACTION)
        v, d = 0.5 * 3.0, 0.5 * 0.488
        np.testing.assert_allclose(float(steer_t[0]), np.tan(d), rtol=1e-5)
        np.testing.assert_allclose(float(wheel_t[0]), v / 0.05, rtol=1e-5)
        np.testing.assert_allclose(float(wheel_t[2]), 0.0, atol=1e-6)

    def test_clip_bounding(self):
        steer_t, wheel_t = action_to_targets(jnp.array([5.0, -5.0]), MUSHR_ACTION)
        np.testing.assert_allclose(float(wheel_t[0]), 3.0 / 0.05, rtol=1e-5)
        np.testing.assert_allclose(float(steer_t[0]), np.tan(-0.488), rtol=1e-5)


class TestBatchedVmap:
    def test_vmap_batch(self):
        params = default_mushr_params()
        batch = 8
        bparams = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (batch,) + x.shape), params)
        states = VehicleState.zero((batch,))
        states = states.replace(pos=states.pos.at[:, 2].set(REST_H))
        terrain = Heightfield.flat()
        actions = jnp.tile(jnp.array([1.0, 0.0]), (batch, 1))

        def one(s, p, a):
            f, _ = control_step(s, p, terrain, a, 20)
            return f

        finals = jax.jit(jax.vmap(one))(states, bparams, actions)
        assert finals.pos.shape == (batch, 3)
        vx = np.asarray(finals.lin_vel[:, 0])
        assert (vx > 0.5).all()
        np.testing.assert_allclose(vx, vx[0], rtol=1e-5)  # identical envs


class TestHeightfield:
    def test_bilinear_lookup(self):
        h = jnp.arange(16, dtype=jnp.float32).reshape(4, 4)
        hf = Heightfield(height=h, cell=jnp.asarray(1.0),
                         friction=jnp.asarray(1.0))
        # center of grid: between indices 1 and 2 -> average of 4 cells
        val = float(hf.lookup(jnp.array([0.0, 0.0])))
        np.testing.assert_allclose(val, np.mean([5, 6, 9, 10]), rtol=1e-6)

    def test_slope_normal(self):
        nx = 32
        xs = (jnp.arange(nx, dtype=jnp.float32) - (nx - 1) / 2)
        h = jnp.tile(xs[:, None] * 0.1, (1, nx))  # dh/dx = 0.1
        hf = Heightfield(height=h, cell=jnp.asarray(1.0),
                         friction=jnp.asarray(1.0))
        n = np.asarray(hf.normal(jnp.array([0.0, 0.0])))
        expect = np.array([-0.1, 0.0, 1.0])
        expect /= np.linalg.norm(expect)
        np.testing.assert_allclose(n, expect, atol=1e-5)

    def test_car_rests_on_slope(self):
        """Car dropped on a gentle slope stays finite and in contact."""
        nx = 64
        xs = jnp.arange(nx, dtype=jnp.float32) - (nx - 1) / 2
        h = jnp.tile(xs[:, None] * 0.05, (1, nx))
        hf = Heightfield(height=h, cell=jnp.asarray(0.5),
                         friction=jnp.asarray(1.0))
        params = default_mushr_params()
        state = make_state().replace(pos=jnp.array([0.0, 0.0, 0.2]))
        final, aux = jax.jit(control_step, static_argnums=(4,))(
            state, params, hf, jnp.zeros(2), 200)
        assert jnp.all(jnp.isfinite(ravel_pytree(final)[0]))
        assert bool(jnp.any(aux.contact[-1]))


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-x", "-q"]))
