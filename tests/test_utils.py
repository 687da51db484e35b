"""Utils tests: config override grammar, registry, quaternion math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wheeledlab_tpu.utils import math as wmath
from wheeledlab_tpu.utils.config import (
    Registry, apply_overrides, configclass, override, parse_cli_overrides,
    to_dict,
)


@configclass
class Inner:
    weight: float = 1.0
    name: str = "x"
    flags: tuple = (1.0, 2.0)


@configclass
class Outer:
    inner: Inner = Inner()
    count: int = 3
    enabled: bool = True


class TestConfig:
    def test_override_types(self):
        cfg = Outer()
        cfg = override(cfg, "inner.weight", "2.5")     # str -> float
        cfg = override(cfg, "count", "7")              # str -> int
        cfg = override(cfg, "enabled", "false")        # str -> bool
        cfg = override(cfg, "inner.flags", "3.0,4.0")  # str -> tuple
        assert cfg.inner.weight == 2.5
        assert cfg.count == 7 and cfg.enabled is False
        assert cfg.inner.flags == (3.0, 4.0)
        # original untouched (frozen)
        assert Outer().inner.weight == 1.0

    def test_bad_path_raises(self):
        with pytest.raises(KeyError):
            override(Outer(), "inner.nope", 1)

    def test_parse_cli(self):
        out = parse_cli_overrides(
            ["--flag", "a.b=1", "c=x,y", "-r", "NAME", "plain"])
        assert out == {"a.b": "1", "c": "x,y"}

    def test_to_dict(self):
        d = to_dict(Outer())
        assert d["inner"]["weight"] == 1.0
        assert d["count"] == 3

    def test_registry(self):
        r = Registry("thing")
        r.register("a", 1)
        assert r.get("a") == 1 and "a" in r
        with pytest.raises(KeyError):
            r.get("b")


class TestQuatMath:
    def test_rotate_roundtrip(self):
        key = jax.random.PRNGKey(0)
        q = wmath.quat_normalize(jax.random.normal(key, (16, 4)))
        v = jax.random.normal(jax.random.PRNGKey(1), (16, 3))
        back = wmath.quat_rotate_inverse(q, wmath.quat_rotate(q, v))
        np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-5)

    def test_euler_roundtrip(self):
        rpy = jnp.array([[0.3, -0.4, 1.2], [0.0, 0.0, -2.9], [-1.0, 0.5, 0.1]])
        q = wmath.quat_from_euler_xyz(rpy[:, 0], rpy[:, 1], rpy[:, 2])
        back = wmath.euler_xyz_from_quat(q)
        np.testing.assert_allclose(np.asarray(back), np.asarray(rpy), atol=1e-5)

    def test_yaw_quat(self):
        yaw = jnp.array([0.5, -2.0, 3.0])
        q = wmath.quat_from_yaw(yaw)
        np.testing.assert_allclose(
            np.asarray(wmath.yaw_from_quat(q)), np.asarray(yaw), atol=1e-6)

    def test_matrix_matches_rotate(self):
        q = wmath.quat_normalize(jax.random.normal(jax.random.PRNGKey(2), (4,)))
        v = jnp.array([1.0, -2.0, 0.5])
        m = wmath.matrix_from_quat(q)
        np.testing.assert_allclose(
            np.asarray(m @ v), np.asarray(wmath.quat_rotate(q, v)), atol=1e-5)

    def test_integrate_small_rotation(self):
        q = wmath.quat_identity()
        omega = jnp.array([0.0, 0.0, 1.0])
        for _ in range(100):
            q = wmath.quat_integrate(q, omega, 0.01)
        # 1 rad about z
        np.testing.assert_allclose(float(wmath.yaw_from_quat(q)), 1.0,
                                   atol=1e-3)

    def test_up_dot(self):
        # identity: up; 90deg roll: horizontal
        assert float(wmath.up_dot(wmath.quat_identity())) == pytest.approx(1.0)
        q = wmath.quat_from_euler_xyz(
            jnp.asarray(jnp.pi / 2), jnp.asarray(0.0), jnp.asarray(0.0))
        assert abs(float(wmath.up_dot(q))) < 1e-6

    def test_atan_approx_accuracy(self):
        from wheeledlab_tpu.sim.soa import atan_approx

        x = jnp.linspace(-50.0, 50.0, 10001)
        err = jnp.abs(atan_approx(x) - jnp.arctan(x))
        assert float(err.max()) < 5e-3


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-x", "-q"]))


class TestTaskCfgOverridability:
    """Every field of every task cfg must be reachable through the dotted
    CLI override grammar (reference utils/hydra.py:103-167 accepts overrides
    for any env cfg path) — the CLI routes `env.<field>=<str>` here via
    RunConfig.env_overrides -> make_env -> apply_overrides."""

    @pytest.mark.parametrize("task_cfg_cls", [
        "drift", "elevation", "visual"])
    def test_every_field_round_trips_from_string(self, task_cfg_cls):
        import dataclasses

        if task_cfg_cls == "drift":
            from wheeledlab_tpu.tasks.drift.task import DriftTaskCfg as C
        elif task_cfg_cls == "elevation":
            from wheeledlab_tpu.tasks.elevation.task import (
                ElevationTaskCfg as C)
        else:
            from wheeledlab_tpu.tasks.visual.task import VisualTaskCfg as C

        cfg = C()
        for f in dataclasses.fields(cfg):
            v = getattr(cfg, f.name)
            if v is None:
                continue  # untyped default; CLI literal-parses these
            if isinstance(v, tuple):
                s = "(" + ",".join(str(x) for x in v) + ")"
            else:
                s = str(v)
            new = apply_overrides(cfg, {f.name: s})
            got = getattr(new, f.name)
            if isinstance(v, float):
                assert abs(got - v) < 1e-12, (f.name, got, v)
            else:
                assert got == v, (f.name, got, v)


class TestCompilationCacheMode:
    def test_resolve_cache_mode(self, monkeypatch):
        """"auto" = on for local hosts, off over the axon remote tunnel
        (VERDICT r3 #4: cache on by default where it wins)."""
        from wheeledlab_tpu.utils.cache import resolve_cache_mode

        monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
        assert resolve_cache_mode("auto") is False      # tunnel detected
        monkeypatch.delenv("PALLAS_AXON_POOL_IPS")
        assert resolve_cache_mode("auto") is True       # local host
        assert resolve_cache_mode("on") is True
        assert resolve_cache_mode("off") is False
        assert resolve_cache_mode("False") is False     # CLI override string
        assert resolve_cache_mode(True) is True
        assert resolve_cache_mode(False) is False

class TestAotWarmStart:
    """utils/aot.py — serialized-executable warm-start cache. The full
    roundtrip (compile -> pickle -> fresh-process load -> bit-equal
    iteration output) is validated on the real TPU backend and committed as
    docs/runs/rss_drift_tpu/warm_start.json; here we pin the guards and the
    cache-key semantics on the CPU mesh."""

    def test_multi_device_client_disables_cache(self, tmp_path, monkeypatch):
        """deserialize_and_load binds every local device, so the cache must
        stand down on multi-device clients (this test mesh has 8) even when
        forced on — the plain jit comes back unchanged."""
        import jax

        from wheeledlab_tpu.rl.ppo import make_ppo
        from wheeledlab_tpu.tasks import make_env
        from wheeledlab_tpu.utils import aot
        from wheeledlab_tpu.utils.config import RUN_CONFIGS, override
        import wheeledlab_tpu.rl  # register configs

        monkeypatch.setenv("WHEELEDLAB_AOT_DIR", str(tmp_path))
        run_cfg = RUN_CONFIGS.get("RSS_DRIFT_CONFIG")
        run_cfg = override(run_cfg, "num_envs", 16)
        run_cfg = override(run_cfg, "train.aot_warm_start", "on")
        env = make_env(run_cfg.task_name, num_envs=16)
        init_fn, train_iteration, _ = make_ppo(env, run_cfg.agent)
        state0 = jax.jit(init_fn)(jax.random.PRNGKey(0))
        jfn = jax.jit(train_iteration)
        assert len(jax.devices()) > 1
        f = aot.maybe_aot_warm_start(jfn, state0, run_cfg, None)
        assert f is jfn
        assert not list(tmp_path.glob("iter-*.pkl"))

    def test_key_changes_with_config(self, tmp_path, monkeypatch):
        from wheeledlab_tpu.utils import aot
        from wheeledlab_tpu.utils.config import RUN_CONFIGS, override
        import wheeledlab_tpu.rl

        cfg = RUN_CONFIGS.get("RSS_DRIFT_CONFIG")
        k1 = aot._cache_key(cfg)
        k2 = aot._cache_key(override(cfg, "num_envs", 32))
        assert k1 != k2
        # program-irrelevant knobs (budget, seed, log paths) share the key
        k3 = aot._cache_key(override(cfg, "train.num_iterations", 7))
        k4 = aot._cache_key(override(cfg, "train.seed", 99))
        assert k1 == k3 == k4

    def test_auto_mode_off_on_cpu_tests(self):
        from wheeledlab_tpu.utils.aot import resolve_aot_mode

        # the test mesh runs on cpu: auto must stay off even with the
        # tunnel env var set (it is, in this environment)
        assert resolve_aot_mode("auto") is False
        assert resolve_aot_mode("on") is True
        assert resolve_aot_mode("off") is False
