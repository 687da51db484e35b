"""Multi-device sharding tests on the fake 8-device CPU mesh
(SURVEY.md §4: multi-host tests via xla_force_host_platform_device_count)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wheeledlab_tpu.parallel.mesh import (
    batch_sharding, make_mesh, shard_train_state,
)
from wheeledlab_tpu.rl.ppo import PPOCfg, make_ppo
from wheeledlab_tpu.tasks import make_env

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (fake) devices")


SMALL_PPO = PPOCfg(num_steps_per_env=8, num_learning_epochs=2,
                   num_mini_batches=2)


class TestMesh:
    def test_mesh_axes(self):
        mesh = make_mesh(8)
        assert mesh.axis_names == ("data", "model")
        assert mesh.devices.shape == (8, 1)

    def test_model_axis(self):
        mesh = make_mesh(8, model_parallel=2)
        assert mesh.devices.shape == (4, 2)


class TestTensorParallel:
    def test_model_parallel_policy_forward(self):
        """TP placement (SURVEY.md §2c): Dense kernels sharded over `model`;
        forward pass on a (data=4, model=2) mesh matches replicated output."""
        from wheeledlab_tpu.parallel.mesh import shard_params_model_parallel
        from wheeledlab_tpu.rl.networks import ActorCritic

        model = ActorCritic(action_dim=2)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 14)))
        obs = jax.random.normal(jax.random.PRNGKey(1), (16, 14))
        ref_mean, ref_std, ref_val = model.apply(params, obs)

        mesh = make_mesh(8, model_parallel=2)
        tp_params = shard_params_model_parallel(params, mesh)
        kernel = tp_params["params"]["actor"]["Dense_0"]["kernel"]
        assert not kernel.sharding.is_fully_replicated
        with jax.sharding.set_mesh(mesh):
            mean, std, val = jax.jit(model.apply)(tp_params, obs)
        np.testing.assert_allclose(np.asarray(mean), np.asarray(ref_mean),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(val), np.asarray(ref_val),
                                   rtol=1e-5, atol=1e-5)


class TestShardedTraining:
    def test_full_train_step_on_mesh(self):
        """Env batch sharded over 8 devices; full PPO step compiles and runs;
        result matches the unsharded step (same seed, same math)."""
        n = 64
        env = make_env("MushrDriftRL-v0", num_envs=n)
        init_fn, train_iter, _ = make_ppo(env, SMALL_PPO)
        state0 = jax.jit(init_fn)(jax.random.PRNGKey(0))

        # unsharded
        _, m_ref = jax.jit(train_iter)(state0)

        # sharded
        mesh = make_mesh(8)
        sharded = shard_train_state(state0, mesh, n)
        with jax.sharding.set_mesh(mesh):
            new_state, m = jax.jit(train_iter)(sharded)
        jax.block_until_ready(m)

        assert np.isfinite(float(m["loss/total"]))
        np.testing.assert_allclose(
            float(m["rollout/reward_mean"]),
            float(m_ref["rollout/reward_mean"]), rtol=2e-4)

    def test_env_state_actually_sharded(self):
        n = 64
        env = make_env("MushrDriftRL-v0", num_envs=n)
        init_fn, _, _ = make_ppo(env, SMALL_PPO)
        state = jax.jit(init_fn)(jax.random.PRNGKey(0))
        mesh = make_mesh(8)
        sharded = shard_train_state(state, mesh, n)
        pos_sharding = sharded.env_state.vehicle.pos.sharding
        assert pos_sharding == batch_sharding(mesh)
        # each device holds 1/8 of the env batch
        shard_shapes = {s.data.shape for s in
                        sharded.env_state.vehicle.pos.addressable_shards}
        assert shard_shapes == {(n // 8, 3)}
        # params replicated
        assert sharded.params["params"]["actor"]["Dense_0"][
            "kernel"].sharding.is_fully_replicated

    @pytest.mark.parametrize("task,overrides", [
        ("MushrElevationRL-v0", dict(terrain_extent=20.0, num_mounds=10,
                                     spawn_range=8.0, goal_range=8.0)),
        ("MushrVisualRL-v0", dict(map_rows=100, map_cols=100, env_rows=20,
                                  env_cols=20, group_rows=5, group_cols=5)),
    ])
    def test_sharded_train_step_other_tasks(self, task, overrides):
        """Elevation (PatchAtlas row gather + height scan) and visual (3200-D
        camera obs) train steps compile and run under `data` sharding and
        match the unsharded step (VERDICT r1 item 6)."""
        n = 16
        env = make_env(task, num_envs=n, overrides=overrides)
        init_fn, train_iter, _ = make_ppo(env, SMALL_PPO)
        state0 = jax.jit(init_fn)(jax.random.PRNGKey(0))
        _, m_ref = jax.jit(train_iter)(state0)

        mesh = make_mesh(8)
        sharded = shard_train_state(state0, mesh, n)
        with jax.sharding.set_mesh(mesh):
            _, m = jax.jit(train_iter)(sharded)
        jax.block_until_ready(m)
        assert np.isfinite(float(m["loss/total"]))
        np.testing.assert_allclose(
            float(m["rollout/reward_mean"]),
            float(m_ref["rollout/reward_mean"]), rtol=2e-4)

    def test_rollout_scales_without_collectives(self):
        """Pure env rollout on the mesh: per-shard independence means the
        compiled HLO contains no cross-device collectives."""
        n = 64
        env = make_env("MushrDriftRL-v0", num_envs=n)
        mesh = make_mesh(8)
        state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
        from wheeledlab_tpu.parallel.mesh import shard_batched_pytree

        state = shard_batched_pytree(state, mesh, n)

        def rollout(state):
            def body(s, _):
                s, out = env.step(s, jnp.zeros((n, 2)))
                return s, out.reward
            return jax.lax.scan(body, state, None, length=4)

        with jax.sharding.set_mesh(mesh):
            lowered = jax.jit(rollout).lower(state)
            compiled = lowered.compile()
            hlo = compiled.as_text()
        for collective in ("all-reduce", "all-gather", "all-to-all",
                          "collective-permute"):
            assert collective not in hlo, f"unexpected {collective} in rollout"


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-x", "-q"]))


def _collective_shapes(hlo: str, ops=("all-gather", "all-to-all")):
    """Element counts of every all-gather/all-to-all result in an HLO dump."""
    import re

    out = []
    for line in hlo.splitlines():
        if any(f"{op}(" in line or f"{op}-start(" in line for op in ops):
            m = re.search(r"=\s*\(?([a-z0-9]+)\[([0-9,]*)\]", line)
            if m and m.group(2):
                els = 1
                for d in m.group(2).split(","):
                    els *= int(d)
                out.append((els, line.strip()[:120]))
            else:
                out.append((0, line.strip()[:120]))
    return out


class TestShardLocalShuffle:
    """VERDICT r3 weak #1 / next-round #2: the PPO epoch shuffle must be
    shard-local under data parallelism — the old global permutation was a
    cross-shard all-to-all of the whole rollout dataset every epoch
    (~1 GB/epoch over ICI at 64k envs)."""

    def test_sharded_update_moves_no_rollout_data(self):
        n = 64
        env = make_env("MushrDriftRL-v0", num_envs=n)
        mesh = make_mesh(8)
        init_fn, train_iter, _ = make_ppo(env, SMALL_PPO, mesh=mesh)
        state = jax.jit(init_fn)(jax.random.PRNGKey(0))
        state = shard_train_state(state, mesh, n)
        with jax.sharding.set_mesh(mesh):
            hlo = jax.jit(train_iter).lower(state).compile().as_text()
        # dataset-scale collectives: rollout is [T=8, B=64] x 14-D obs =
        # 7168 obs floats; anything remotely that size is a bug. Tiny
        # all-gathers (traj/* video captures, scalar packing) are fine.
        big = [(e, l) for e, l in _collective_shapes(hlo) if e > 1024]
        assert not big, f"dataset-scale collective in sharded update: {big}"
        # and the shard-local path actually trains
        with jax.sharding.set_mesh(mesh):
            _, m = jax.jit(train_iter)(state)
        assert np.isfinite(float(m["loss/total"]))

    def test_sharded_recurrent_update_moves_no_rollout_data(self):
        n = 64
        env = make_env("MushrDriftRL-v0", num_envs=n)
        mesh = make_mesh(8)
        cfg = SMALL_PPO.replace(policy_class="ActorCriticRecurrent",
                                rnn_hidden_size=16)
        from wheeledlab_tpu.rl.ppo import make_learner

        init_fn, train_iter, _ = make_learner(env, cfg, mesh=mesh)
        state = jax.jit(init_fn)(jax.random.PRNGKey(0))
        state = shard_train_state(state, mesh, n)
        with jax.sharding.set_mesh(mesh):
            hlo = jax.jit(train_iter).lower(state).compile().as_text()
        big = [(e, l) for e, l in _collective_shapes(hlo) if e > 1024]
        assert not big, f"dataset-scale collective in recurrent update: {big}"
        with jax.sharding.set_mesh(mesh):
            _, m = jax.jit(train_iter)(state)
        assert np.isfinite(float(m["loss/total"]))

    def test_shard_local_shuffle_learns_like_global(self):
        """Statistical equivalence: a few iterations with the shard-local
        shuffle track the global-shuffle run closely (same seed, same data —
        only minibatch composition differs)."""
        n = 64
        env = make_env("MushrDriftRL-v0", num_envs=n)
        mesh = make_mesh(8)

        def run(mesh_arg, iters):
            init_fn, train_iter, _ = make_ppo(env, SMALL_PPO, mesh=mesh_arg)
            state = jax.jit(init_fn)(jax.random.PRNGKey(0))
            state = shard_train_state(state, mesh, n)
            it = jax.jit(train_iter)
            with jax.sharding.set_mesh(mesh):
                for _ in range(iters):
                    state, m = it(state)
            return {k: float(v) for k, v in m.items()
                    if getattr(v, "ndim", None) == 0}

        # iteration 1: identical params -> identical rollout (the shuffle
        # only affects the update); divergence here would mean the local
        # path corrupted the data, not just regrouped it
        m1_local, m1_global = run(mesh, 1), run(None, 1)
        np.testing.assert_allclose(m1_local["rollout/reward_mean"],
                                   m1_global["rollout/reward_mean"],
                                   rtol=1e-5)
        # after 3 update iterations the two runs differ only by which
        # samples share a minibatch — learning signal must stay in band
        m_local, m_global = run(mesh, 3), run(None, 3)
        np.testing.assert_allclose(m_local["rollout/reward_mean"],
                                   m_global["rollout/reward_mean"], rtol=0.1)
        assert np.isfinite(m_local["loss/kl"]) and m_local["loss/kl"] < 0.5


class TestShardedRecurrent:
    """The recurrent learner's (B, H) LSTM carries must shard with the env
    batch (VERDICT-class gap: shard_train_state previously skipped the
    `hidden` field, leaving it off-mesh)."""

    def test_recurrent_train_step_on_mesh(self):
        from wheeledlab_tpu.rl.ppo import PPOCfg, make_learner

        n = 64
        env = make_env("MushrDriftRL-v0", num_envs=n)
        cfg = PPOCfg(policy_class="ActorCriticRecurrent", rnn_hidden_size=16,
                     num_steps_per_env=8, num_learning_epochs=2,
                     num_mini_batches=2)
        init_fn, train_iter, _ = make_learner(env, cfg)
        state0 = jax.jit(init_fn)(jax.random.PRNGKey(0))

        _, m_ref = jax.jit(train_iter)(state0)

        mesh = make_mesh(8)
        sharded = shard_train_state(state0, mesh, n)
        # hidden carries shard over the data axis like the env batch
        h_leaf = jax.tree_util.tree_leaves(sharded.hidden)[0]
        assert h_leaf.sharding == batch_sharding(mesh)
        assert {s.data.shape for s in h_leaf.addressable_shards} == \
            {(n // 8, 16)}
        # ... and so does every other per-env carry (ADVICE r3 #2:
        # reset_prev was left at its original placement)
        assert sharded.reset_prev.sharding == batch_sharding(mesh)
        with jax.sharding.set_mesh(mesh):
            new_state, m = jax.jit(train_iter)(sharded)
        jax.block_until_ready(m["loss/total"])
        assert np.isfinite(float(m["loss/total"]))
        np.testing.assert_allclose(
            float(m["rollout/reward_mean"]),
            float(m_ref["rollout/reward_mean"]), rtol=2e-4)
