"""Pallas kernel parity: the fused SoA substep must match the reference
vmapped XLA substep bit-for-bit-ish (same math, same order) on random states.

Runs in interpreter mode on CPU (SURVEY.md §4: no TPU needed for kernel
correctness tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wheeledlab_tpu.ops.pallas_substep import pallas_step
from wheeledlab_tpu.sim.dynamics import step as sim_step
from wheeledlab_tpu.sim.soa import (
    NUM_PARAM, NUM_STATE, pack_params, pack_state, substep_soa, unpack_state,
)
from wheeledlab_tpu.sim.terrain import Heightfield
from wheeledlab_tpu.sim.types import (
    VehicleState, batch_params, default_mushr_params,
)

B = 32
DT, DECIMATION = 0.005, 4


def random_states(key, b=B):
    ks = jax.random.split(key, 8)
    u = lambda k, s, lo, hi: jax.random.uniform(k, s, minval=lo, maxval=hi)
    quat = jax.random.normal(ks[1], (b, 4))
    quat = quat.at[:, 0].add(4.0)  # near identity, normalized below
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    return VehicleState(
        pos=u(ks[0], (b, 3), -1.0, 1.0) * jnp.array([1, 1, 0.02])
        + jnp.array([0, 0, 0.06]),
        quat=quat,
        lin_vel=u(ks[2], (b, 3), -3.0, 3.0) * jnp.array([1, 1, 0.1]),
        ang_vel=u(ks[3], (b, 3), -2.0, 2.0) * jnp.array([0.2, 0.2, 1]),
        wheel_omega=u(ks[4], (b, 4), -10.0, 80.0),
        steer_pos=u(ks[5], (b, 2), -0.5, 0.5),
        steer_vel=u(ks[6], (b, 2), -2.0, 2.0),
    )


@pytest.fixture(scope="module")
def setup():
    params = batch_params(default_mushr_params(), B)
    # randomize per-env params a bit (DR realism)
    key = jax.random.PRNGKey(1)
    mu = jax.random.uniform(key, (B, 4), minval=0.3, maxval=0.5)
    params = params.replace(tire_mu=mu)
    states = random_states(jax.random.PRNGKey(0))
    steer_t = jax.random.uniform(jax.random.PRNGKey(2), (B, 2),
                                 minval=-0.5, maxval=0.5)
    wheel_t = jax.random.uniform(jax.random.PRNGKey(3), (B, 4),
                                 minval=0.0, maxval=60.0)
    return params, states, steer_t, wheel_t


class TestPackUnpack:
    def test_roundtrip(self, setup):
        _, states, _, _ = setup
        packed = pack_state(states)
        assert packed.shape == (NUM_STATE, B)
        rt = unpack_state(packed)
        for a, b_ in zip(jax.tree_util.tree_leaves(states),
                         jax.tree_util.tree_leaves(rt)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    def test_params_shape(self, setup):
        params, _, _, _ = setup
        packed = pack_params(params, jnp.asarray(1.0))
        assert packed.shape == (NUM_PARAM, B)


class TestSoAParity:
    def test_soa_matches_vmapped_substep(self, setup):
        """One control step (4 substeps): SoA path == vmapped XLA path."""
        params, states, steer_t, wheel_t = setup
        terrain = Heightfield.flat()

        ref, _ = jax.jit(jax.vmap(
            sim_step, in_axes=(0, 0, None, 0, 0, None, None)),
            static_argnums=(5, 6))(
            states, params, terrain, steer_t, wheel_t, DT, DECIMATION)

        packed = pack_state(states)
        pparams = pack_params(params, terrain.friction)

        def scan_soa(s):
            def body(x, _):
                return substep_soa(x, pparams, steer_t.T, wheel_t.T, DT), None
            return jax.lax.scan(body, s, None, length=DECIMATION)[0]

        got = unpack_state(jax.jit(scan_soa)(packed))
        for name in ("pos", "quat", "lin_vel", "ang_vel", "wheel_omega",
                     "steer_pos", "steer_vel"):
            np.testing.assert_allclose(
                np.asarray(getattr(got, name)),
                np.asarray(getattr(ref, name)),
                rtol=2e-5, atol=2e-5, err_msg=name)

    def test_pallas_interpret_matches_soa(self, setup):
        """The pallas_call (interpret mode) == raw SoA scan."""
        params, states, steer_t, wheel_t = setup
        packed = pack_state(states)
        pparams = pack_params(params, jnp.asarray(1.0))

        def scan_soa(s):
            def body(x, _):
                return substep_soa(x, pparams, steer_t.T, wheel_t.T, DT), None
            return jax.lax.scan(body, s, None, length=DECIMATION)[0]

        ref = jax.jit(scan_soa)(packed)
        got = pallas_step(packed, pparams, steer_t.T, wheel_t.T, DT,
                          DECIMATION, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


class TestEnvPallasFlag:
    def test_env_forced_pallas_interpret_equivalence(self):
        """Full drift env step with use_pallas off vs the SoA math by hand —
        covered above; here just assert the flag plumbs through."""
        from wheeledlab_tpu.tasks.drift.task import DriftTaskCfg, make_drift_env

        env_off = make_drift_env(DriftTaskCfg(num_envs=8))
        assert env_off._use_pallas in (False,)  # CPU test backend


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-x", "-q"]))
