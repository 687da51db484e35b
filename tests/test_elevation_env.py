"""Elevation task tests: terrain gen, height-scan obs, terminations, smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.flatten_util import ravel_pytree

from wheeledlab_tpu.tasks.elevation.task import (
    ELEV_OBS_DIM, REST_H, SCAN_N, ElevationTaskCfg, at_goal,
    make_elevation_env, rollover, stuck,
)
from wheeledlab_tpu.tasks.elevation.terrain_gen import generate_elevation_terrain

CFG = ElevationTaskCfg(num_envs=8, terrain_extent=20.0, num_mounds=10)


@pytest.fixture(scope="module")
def env8():
    return make_elevation_env(CFG)


class TestTerrainGen:
    def test_deterministic_and_bounded(self):
        key = jax.random.PRNGKey(7)
        t1 = generate_elevation_terrain(key, extent=20.0, num_mounds=10)
        t2 = generate_elevation_terrain(key, extent=20.0, num_mounds=10)
        np.testing.assert_array_equal(np.asarray(t1.height), np.asarray(t2.height))
        h = np.asarray(t1.height)
        assert h.min() >= 0.0 and h.max() <= 0.9 + 1e-6
        assert h.max() > 0.1  # actually has mounds

    def test_slope_capped(self):
        t = generate_elevation_terrain(jax.random.PRNGKey(7), extent=20.0,
                                       num_mounds=10)
        h = np.asarray(t.height)
        cell = float(t.cell)
        gx = np.abs(np.diff(h, axis=0)) / cell
        gy = np.abs(np.diff(h, axis=1)) / cell
        assert max(gx.max(), gy.max()) < 0.45  # climbable grade


class TestPatchAtlas:
    """The gather-free terrain path: per-env patch row gather + one-hot
    contractions must reproduce direct global bilinear lookups exactly
    (contact) / to bf16-MXU tolerance (scan)."""

    @pytest.fixture(scope="class")
    def terrain(self):
        return generate_elevation_terrain(jax.random.PRNGKey(3))

    def test_patch_lookup_matches_direct(self, terrain):
        key = jax.random.PRNGKey(0)
        centers = jax.random.uniform(key, (64, 2), minval=-18, maxval=18)
        offs = jax.random.uniform(
            jax.random.PRNGKey(1), (64, 4, 2), minval=-0.6, maxval=0.6)
        pts = centers[:, None, :] + offs
        h_ref, n_ref = terrain.lookup_and_normal(pts)
        atlas = terrain.build_atlas(p=24, stride=6)
        h_p, n_p = jax.vmap(
            lambda c, q: atlas.extract(c).lookup_and_normal(q))(centers, pts)
        np.testing.assert_allclose(h_p, h_ref, atol=1e-5)
        np.testing.assert_allclose(n_p, n_ref, atol=1e-5)

    def test_atlas_covers_map_borders(self, terrain):
        # extraction at/over the border clamps to a valid window and points
        # clamp like the global lookup's edge clamp
        atlas = terrain.build_atlas(p=24, stride=6)
        centers = jnp.array([[-22.0, -22.0], [22.0, 22.0], [0.0, -22.0]])
        h_p, _ = jax.vmap(
            lambda c: atlas.extract(c).lookup_and_normal(c))(centers)
        h_ref, _ = terrain.lookup_and_normal(centers)
        np.testing.assert_allclose(h_p, h_ref, atol=1e-5)

    def test_atlas_lookup_matches_heightfield_lookup(self, terrain):
        """PatchAtlas.lookup (the gather-free step-path height query used
        by spawn snapping / height terminations / metrics, round 5) must
        match the full-grid bilinear to float associativity everywhere —
        including at the map borders."""
        atlas = terrain.build_atlas(p=12, stride=2)
        pts = jnp.concatenate([
            jax.random.uniform(jax.random.PRNGKey(4), (256, 2),
                               minval=-19, maxval=19),
            jnp.array([[-22.0, -22.0], [22.0, 22.0], [0.0, 22.0]]),
        ])
        np.testing.assert_allclose(
            np.asarray(atlas.lookup(pts)),
            np.asarray(terrain.lookup(pts)), atol=1e-5)

    def test_patch_grid_scan_matches_global_bilinear(self, terrain):
        atlas = terrain.build_atlas(p=24, stride=6)
        centers = jax.random.uniform(
            jax.random.PRNGKey(2), (32, 2), minval=-15, maxval=15)
        yaws = jax.random.uniform(
            jax.random.PRNGKey(3), (32,), minval=-np.pi, maxval=np.pi)
        scan_p = jax.vmap(
            lambda c, y: atlas.extract(c).grid_scan(c, y, 2.5, 0.1)
        )(centers, yaws)
        scan_ref = terrain.grid_scan(centers, yaws, 2.5, 0.1)
        # DEFAULT dot precision rounds operands to bf16 on TPU; on CPU exact
        np.testing.assert_allclose(scan_p, scan_ref, atol=5e-3)


class TestSmoke:
    def test_reset_and_step(self, env8):
        env = env8
        state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
        assert obs.shape == (8, ELEV_OBS_DIM)
        step = jax.jit(env.step)

        def body(s, k):
            a = jax.random.uniform(k, (8, 2), minval=-1, maxval=1)
            s, out = step(s, a)
            return s, (out.reward, out.obs)

        keys = jax.random.split(jax.random.PRNGKey(1), 30)
        state, (rews, obses) = jax.lax.scan(body, state, keys)
        assert jnp.all(jnp.isfinite(ravel_pytree(state.vehicle)[0]))
        assert jnp.all(jnp.isfinite(rews))
        assert jnp.all(jnp.isfinite(obses))

    def test_spawn_on_terrain(self, env8):
        state, _ = jax.jit(env8.reset)(jax.random.PRNGKey(3))
        pos = np.asarray(state.vehicle.pos)
        ground = np.asarray(env8.task.terrain.lookup(state.vehicle.pos[:, :2]))
        np.testing.assert_allclose(pos[:, 2], ground + REST_H + 0.02, atol=1e-5)

    def test_goal_command_resamples(self, env8):
        """Goal commands change after resampling_time_s (10 s = 100 steps)."""
        env = env8
        state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
        goal0 = np.asarray(state.command)
        step = jax.jit(env.step)

        def body(s, _):
            s, out = step(s, jnp.zeros((8, 2)))
            return s, s.command

        state, commands = jax.lax.scan(body, state, None, length=101)
        # some env must have had a reset or timer-resample changing its goal
        assert not np.allclose(np.asarray(commands[-1]), goal0)


class TestTerms:
    def _ctx(self, env, **over):
        state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
        vehicle = state.vehicle
        for k, v in over.items():
            vehicle = vehicle.replace(**{k: v})
        state = state.with_vehicle(vehicle)
        return env._make_ctx(state, state.vehicle, None)

    def test_rollover_detects_flip(self, env8):
        n = env8.num_envs
        flipped = jnp.tile(jnp.array([0.0, 1.0, 0.0, 0.0]), (n, 1))  # roll pi
        ctx = self._ctx(env8, quat=flipped)
        assert bool(rollover(ctx).all())
        ctx = self._ctx(env8)
        assert not bool(rollover(ctx).any())

    def test_stuck_needs_both_conditions(self, env8):
        n = env8.num_envs
        spinning = jnp.full((n, 4), 10.0)
        still = jnp.zeros((n, 3))
        ctx = self._ctx(env8, wheel_omega=spinning, lin_vel=still)
        assert bool(stuck(ctx).all())
        ctx = self._ctx(env8, lin_vel=still)  # still, wheels still
        assert not bool(stuck(ctx).any())

    def test_at_goal(self, env8):
        state, _ = jax.jit(env8.reset)(jax.random.PRNGKey(0))
        vehicle = state.vehicle.replace(
            pos=state.vehicle.pos.at[:, :2].set(state.command[:, :2]))
        ctx = env8._make_ctx(state.with_vehicle(vehicle), vehicle, None)
        assert bool(at_goal(ctx).all())


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-x", "-q"]))
