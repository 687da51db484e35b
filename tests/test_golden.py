"""Golden-trajectory regression tests (SURVEY.md hard part (b)): fixed-seed
rollout statistics pinned to recorded values. Parity is defined at the
trajectory-statistics level (not bitwise) so jit/sharding/backend changes
that preserve physics pass, while physics regressions fail.

To regenerate after an INTENTIONAL physics change:
    python tests/test_golden.py --regen
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_drift.json")


def compute_stats():
    from wheeledlab_tpu.tasks.drift.task import DriftTaskCfg, make_drift_env

    env = make_drift_env(DriftTaskCfg(num_envs=32))
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(1234))

    def body(s, k):
        action = jax.random.uniform(k, (32, 2), minval=-1.0, maxval=1.0)
        s, out = env.step(s, action)
        return s, (out.reward, s.vehicle.pos, s.vehicle.lin_vel, out.done)

    keys = jax.random.split(jax.random.PRNGKey(5678), 100)
    state, (rew, pos, vel, done) = jax.jit(
        lambda s: jax.lax.scan(body, s, keys))(state)
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


# tolerance per stat: loose enough for cross-backend float drift, tight
# enough to catch real physics changes
TOLS = {
    "reward_mean": 0.15, "reward_std": 0.15, "speed_mean": 0.05,
    "speed_max": 0.10, "xy_abs_mean": 0.05, "z_mean": 0.02, "done_frac": 0.25,
}


@pytest.mark.skipif(not os.path.exists(GOLDEN_PATH),
                    reason="no golden file; run with --regen")
def test_golden_drift_trajectory():
    golden = json.load(open(GOLDEN_PATH))
    got = compute_stats()
    for k, ref in golden.items():
        rel = abs(got[k] - ref) / (abs(ref) + 1e-6)
        assert rel < TOLS[k], f"{k}: got {got[k]}, golden {ref} (rel {rel:.3f})"


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        jax.config.update("jax_platforms", "cpu")
        stats = compute_stats()
        json.dump(stats, open(GOLDEN_PATH, "w"), indent=2)
        print("wrote", GOLDEN_PATH, stats)
    else:
        sys.exit(pytest.main([__file__, "-x", "-q"]))
