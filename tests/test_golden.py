"""Golden-trajectory regression tests (SURVEY.md hard part (b)): fixed-seed
rollout statistics pinned to recorded values for ALL three task MDPs —
drift, elevation (PatchAtlas terrain contact + height scan), visual
(ColorMapAtlas camera render). Parity is defined at the trajectory-statistics
level (not bitwise) so jit/sharding/backend changes that preserve physics
pass, while physics/renderer regressions fail.

To regenerate after an INTENTIONAL physics change:
    python tests/test_golden.py --regen
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN_DIR = os.path.dirname(__file__)


def rollout(env, num_envs, steps, seed_reset, seed_act):
    """Random-action rollout; returns stacked (reward, pos, vel, done, obs)."""
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(seed_reset))

    def body(s, k):
        action = jax.random.uniform(k, (num_envs, 2), minval=-1.0, maxval=1.0)
        s, out = env.step(s, action)
        return s, (out.reward, s.vehicle.pos, s.vehicle.lin_vel, out.done,
                   out.obs)

    keys = jax.random.split(jax.random.PRNGKey(seed_act), steps)
    _, traj = jax.jit(lambda s: jax.lax.scan(body, s, keys))(state)
    return traj


def base_stats(rew, pos, vel, done):
    speed = jnp.linalg.norm(vel[..., :2], axis=-1)
    return {
        "reward_mean": float(rew.mean()),
        "reward_std": float(rew.std()),
        "speed_mean": float(speed.mean()),
        "speed_max": float(speed.max()),
        "xy_abs_mean": float(jnp.abs(pos[..., :2]).mean()),
        "z_mean": float(pos[..., 2].mean()),
        "done_frac": float(done.mean()),
    }


def compute_drift_stats():
    from wheeledlab_tpu.tasks.drift.task import DriftTaskCfg, make_drift_env

    env = make_drift_env(DriftTaskCfg(num_envs=32))
    rew, pos, vel, done, _ = rollout(env, 32, 100, 1234, 5678)
    return base_stats(rew, pos, vel, done)


def compute_elevation_stats():
    from wheeledlab_tpu.tasks.elevation.task import (
        SCAN_N, ElevationTaskCfg, make_elevation_env)

    env = make_elevation_env(ElevationTaskCfg(
        num_envs=16, terrain_extent=20.0, num_mounds=10, spawn_range=8.0,
        goal_range=8.0))
    rew, pos, vel, done, obs = rollout(env, 16, 60, 4321, 8765)
    stats = base_stats(rew, pos, vel, done)
    # height-scan slice of the obs: pins the PatchAtlas grid-scan kernel and
    # the actual-z world correction (mushr_elevation_env_cfg.py:44-48)
    scan = obs[..., -SCAN_N * SCAN_N:]
    stats["scan_mean"] = float(scan.mean())
    stats["scan_std"] = float(scan.std())
    stats["scan_absmax"] = float(jnp.abs(scan).max())
    return stats


def compute_visual_stats():
    from wheeledlab_tpu.tasks.visual.task import (
        CAMERA_OBS, VisualTaskCfg, make_visual_env)

    small = dict(num_envs=8, map_rows=100, map_cols=100, env_rows=20,
                 env_cols=20, group_rows=5, group_cols=5)
    env = make_visual_env(VisualTaskCfg(**small))
    rew, pos, vel, done, obs = rollout(env, 8, 40, 2468, 1357)
    stats = base_stats(rew, pos, vel, done)
    # camera slice: pins the ColorMapAtlas render + augmentation pipeline
    cam = obs[..., :CAMERA_OBS]
    stats["cam_mean"] = float(cam.mean())
    stats["cam_std"] = float(cam.std())
    # fast-vs-exact render divergence (the atlas clamps pixels beyond its
    # ~7.5 m patch to the border color — camera.py:ColorMapAtlas). Pinning
    # the divergent-pixel fraction catches patch-size/FOV regressions that
    # the stats above could miss.
    from wheeledlab_tpu.tasks.visual.camera import (
        HEIGHT, ColorMap, ColorMapAtlas, render, render_fast)
    from wheeledlab_tpu.tasks.visual.map_gen import generate_traversability_map

    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(99))
    v = state.vehicle
    crop = HEIGHT // 3

    trav = generate_traversability_map(
        42, map_size=(100, 100), env_size=(20, 20), sub_group_size=(5, 5),
        num_walkers=1)
    cm = ColorMap(grid=np.asarray(trav, np.float32), cell=np.float32(0.5),
                  rows=100, cols=100)
    atlas = ColorMapAtlas.build(cm)
    exact = jax.jit(lambda p, q: render(cm, p, q)[:, crop:, :])(v.pos, v.quat)
    fast = jax.jit(lambda p, q: render_fast(atlas, p, q, crop_top=crop))(
        v.pos, v.quat)
    stats["fast_exact_diff_frac"] = float(
        (jnp.abs(exact - fast) > 0.5).mean())
    return stats


TASKS = {
    "drift": (compute_drift_stats, "golden_drift.json"),
    "elevation": (compute_elevation_stats, "golden_elevation.json"),
    "visual": (compute_visual_stats, "golden_visual.json"),
}

# tolerance per stat: loose enough for cross-backend float drift, tight
# enough to catch real physics changes (VERDICT r1: <=10% where stable)
TOLS = {
    "reward_mean": 0.10, "reward_std": 0.10, "speed_mean": 0.05,
    "speed_max": 0.10, "xy_abs_mean": 0.05, "z_mean": 0.02, "done_frac": 0.10,
    "scan_mean": 0.10, "scan_std": 0.10, "scan_absmax": 0.10,
    "cam_mean": 0.05, "cam_std": 0.05, "fast_exact_diff_frac": 0.05,
}
# stats that hover near zero get an absolute tolerance instead
ABS_TOLS = {"scan_mean": 0.02, "cam_mean": 0.05,
            "fast_exact_diff_frac": 0.005, "done_frac": 0.01}


@pytest.mark.parametrize("task", sorted(TASKS))
def test_golden_trajectory(task):
    fn, fname = TASKS[task]
    path = os.path.join(GOLDEN_DIR, fname)
    if not os.path.exists(path):
        pytest.skip(f"no golden file {fname}; run with --regen")
    golden = json.load(open(path))
    got = fn()
    for k, ref in golden.items():
        err = abs(got[k] - ref)
        if k in ABS_TOLS and abs(ref) < 10 * ABS_TOLS[k]:
            assert err < ABS_TOLS[k], \
                f"{task}/{k}: got {got[k]}, golden {ref} (abs {err:.4f})"
        else:
            rel = err / (abs(ref) + 1e-6)
            assert rel < TOLS[k], \
                f"{task}/{k}: got {got[k]}, golden {ref} (rel {rel:.3f})"


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        jax.config.update("jax_platforms", "cpu")
        for task, (fn, fname) in TASKS.items():
            stats = fn()
            path = os.path.join(GOLDEN_DIR, fname)
            json.dump(stats, open(path, "w"), indent=2)
            print("wrote", path, stats)
    else:
        sys.exit(pytest.main([__file__, "-x", "-q"]))
