"""Parity tests for the fused heightfield physics kernel
(ops/pallas_substep_hf.py + sim/soa_hf.py) against the generic XLA
rough-terrain path (dynamics.step over a PatchAtlas) — run in Pallas
interpreter mode on CPU (SURVEY.md §4 test strategy; same pattern as
tests/test_fused_drift.py for the drift whole-step kernel).

The heightfield substep math (`sim.soa_hf.substep_soa_hf`) mirrors
`dynamics.substep` + `TerrainPatch.lookup_and_normal` operand-for-operand,
so short-horizon trajectories agree to float-associativity tolerance; the
kernel wrapper is the exact same function, so kernel parity is by
construction and these tests guard the tiling/layout plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wheeledlab_tpu.sim import dynamics
from wheeledlab_tpu.sim.soa import pack_params, pack_state, unpack_state
from wheeledlab_tpu.sim.soa_hf import substep_soa_hf
from wheeledlab_tpu.tasks.elevation.task import (
    ElevationTaskCfg, make_elevation_env, make_elevation_task,
)

N = 32


@pytest.fixture(scope="module")
def task():
    return make_elevation_task(ElevationTaskCfg(num_envs=N))


def _inputs(task, seed=0):
    key = jax.random.PRNGKey(seed)
    params = task.init_params(key, N)
    veh = task.sample_spawn(jax.random.fold_in(key, 1), N)
    steer = jnp.full((N, 2), 0.3)
    wheel = jnp.full((N, 4), 20.0)
    return params, veh, steer, wheel


class TestSoaHfParity:
    """substep_soa_hf (shared kernel math) vs dynamics.step over the atlas."""

    def test_control_step_matches_xla_path(self, task):
        cfg = task.cfg
        params, veh, steer, wheel = _inputs(task)
        atlas = task.contact_atlas
        v_ref, _ = jax.jit(jax.vmap(
            dynamics.step, in_axes=(0, 0, None, 0, 0, None, None, None)),
            static_argnums=(5, 6))(
            veh, params, task.terrain, steer, wheel,
            cfg.sim_dt, cfg.decimation, atlas)

        m = pack_state(veh)
        pp = pack_params(params, task.terrain.friction)
        patch, org = atlas.extract_rows(m[0], m[1])
        nx, ny = atlas.grid_shape

        def control_step(m):
            def body(s, _):
                return substep_soa_hf(
                    s, pp, patch, org, steer.T, wheel.T, cfg.sim_dt,
                    p=atlas.p, nx=nx, ny=ny, cell=float(atlas.cell)), None
            return jax.lax.scan(body, m, None, length=cfg.decimation)[0]

        v_soa = unpack_state(jax.jit(control_step)(m))
        np.testing.assert_allclose(
            np.asarray(v_ref.pos), np.asarray(v_soa.pos), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(v_ref.quat), np.asarray(v_soa.quat), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(v_ref.lin_vel), np.asarray(v_soa.lin_vel), atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(v_ref.ang_vel), np.asarray(v_soa.ang_vel), atol=1e-2)
        np.testing.assert_allclose(
            np.asarray(v_ref.wheel_omega), np.asarray(v_soa.wheel_omega),
            atol=1e-2)

    def test_kernel_interpret_matches_soa(self, task):
        """pallas_call plumbing (tiling, block specs) vs the plain SoA fn."""
        from wheeledlab_tpu.ops.pallas_substep_hf import pallas_step_hf

        cfg = task.cfg
        params, veh, steer, wheel = _inputs(task, seed=2)
        atlas = task.contact_atlas
        m = pack_state(veh)
        pp = pack_params(params, task.terrain.friction)
        patch, org = atlas.extract_rows(m[0], m[1])
        nx, ny = atlas.grid_shape

        out_k = pallas_step_hf(
            m, pp, patch, org, steer.T, wheel.T, cfg.sim_dt, cfg.decimation,
            p=atlas.p, nx=nx, ny=ny, cell=float(atlas.cell), interpret=True)

        def body(s, _):
            return substep_soa_hf(
                s, pp, patch, org, steer.T, wheel.T, cfg.sim_dt,
                p=atlas.p, nx=nx, ny=ny, cell=float(atlas.cell)), None

        out_s = jax.lax.scan(body, m, None, length=cfg.decimation)[0]
        np.testing.assert_allclose(
            np.asarray(out_k), np.asarray(out_s), atol=1e-6)

    def test_sloped_contact_normal_tilts_chassis(self, task):
        """On a mound flank the suspension normal force must follow the
        surface normal: a vehicle dropped on sloped terrain settles with a
        non-vertical contact normal (regression guard that the hf path is
        not silently running flat-ground physics)."""
        cfg = task.cfg
        params, veh, _, _ = _inputs(task)
        atlas = task.contact_atlas
        # place env 0 on the steepest local slope among the spawns
        terr = task.terrain
        g = np.asarray(terr.height)
        gx, gy = np.gradient(g)
        i, j = np.unravel_index(
            np.argmax(np.hypot(gx, gy)[8:-8, 8:-8]), np.hypot(gx, gy)[8:-8, 8:-8].shape)
        i, j = i + 8, j + 8
        nx_, ny_ = g.shape
        wx = (i - (nx_ - 1) / 2) * float(terr.cell)
        wy = (j - (ny_ - 1) / 2) * float(terr.cell)
        pos = np.asarray(veh.pos).copy()
        pos[0] = [wx, wy, g[i, j] + 0.2]
        veh = veh.replace(pos=jnp.asarray(pos),
                          lin_vel=jnp.zeros_like(veh.lin_vel))
        m = pack_state(veh)
        pp = pack_params(params, terr.friction)
        nx, ny = atlas.grid_shape

        def control_step(m):
            patch, org = atlas.extract_rows(m[0], m[1])
            def body(s, _):
                return substep_soa_hf(
                    s, pp, patch, org, jnp.zeros((2, N)), jnp.zeros((4, N)),
                    cfg.sim_dt, p=atlas.p, nx=nx, ny=ny,
                    cell=float(atlas.cell)), None
            return jax.lax.scan(body, m, None, length=cfg.decimation)[0]

        step = jax.jit(control_step)
        for _ in range(30):   # settle 3 s of sim time
            m = step(m)
        v = unpack_state(m)
        quat0 = np.asarray(v.quat)[0]
        # settled on a slope: roll/pitch quaternion components nonzero
        tilt = np.abs(quat0[1]) + np.abs(quat0[2])
        assert tilt > 5e-3, f"chassis stayed flat on a slope (quat {quat0})"
        # and it did not fall through the terrain
        ground = float(np.asarray(
            task.terrain.lookup(v.pos[0:1, :2]))[0])
        assert float(v.pos[0, 2]) > ground - 0.05


class TestFusedElevationEnvParity:
    """Env-level integration: elevation env with the hf kernel (interpret
    mode) vs the generic XLA path — same semantics end to end."""

    def make_pair(self, **kw):
        cfg = ElevationTaskCfg(num_envs=N, events_enabled=False,
                               enable_corruption=False, **kw)
        env_x = make_elevation_env(cfg)
        env_f = make_elevation_env(cfg)
        env_f._use_pallas_hf = True
        env_f._pallas_interpret = True
        return env_x, env_f

    def test_trajectories_match(self):
        env_x, env_f = self.make_pair()
        sx, ox = jax.jit(env_x.reset)(jax.random.PRNGKey(0))
        sf, of = jax.jit(env_f.reset)(jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(ox), np.asarray(of), atol=1e-6)
        step_x = jax.jit(env_x.step)
        step_f = jax.jit(env_f.step)
        alive = np.ones((N,), bool)
        for t in range(8):
            a = jnp.stack([jnp.full((N,), 0.5),
                           jnp.full((N,), 0.3 * np.sin(0.5 * t))], -1)
            sx, outx = step_x(sx, a)
            sf, outf = step_f(sf, a)
            np.testing.assert_array_equal(
                np.asarray(outx.done)[alive], np.asarray(outf.done)[alive])
            alive &= ~np.asarray(outx.done)
            assert alive.sum() >= N // 2
            np.testing.assert_allclose(
                np.asarray(sx.vehicle.pos)[alive],
                np.asarray(sf.vehicle.pos)[alive], atol=2e-3,
                err_msg=f"pos step {t}")
            # rewards amplify mm-scale height drift by height_weight=5000
            np.testing.assert_allclose(
                np.asarray(outx.reward)[alive],
                np.asarray(outf.reward)[alive], atol=0.1,
                err_msg=f"reward step {t}")
            np.testing.assert_allclose(
                np.asarray(outx.obs)[alive], np.asarray(outf.obs)[alive],
                atol=0.05, err_msg=f"obs step {t}")

    def test_auto_backend_selection(self):
        """CPU backend keeps the XLA path; use_pallas='on' engages the hf
        kernel (not the flat kernel) for heightfield terrain."""
        cfg = ElevationTaskCfg(num_envs=N)
        env = make_elevation_env(cfg)
        assert not env._use_pallas and not env._use_pallas_hf  # cpu auto
        from wheeledlab_tpu.envs.env import WheeledEnv

        task = env.task._replace(cfg=env.task.cfg.replace(use_pallas="on"))
        env_on = WheeledEnv(task)
        assert env_on._use_pallas_hf and not env_on._use_pallas
