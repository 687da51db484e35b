"""Worker process for tests/test_distributed.py.

Runs one PPO train iteration on the drift task with the TrainState sharded
over the GLOBAL device mesh — in a real `jax.distributed` job when launched
with nproc > 1 (127.0.0.1 coordinator, 4 virtual CPU devices per process,
8-device global mesh), or single-process with 8 local devices when
nproc == 1 (the comparison anchor).

Prints `RESULT {json}` with the scalar training metrics; the parent test
asserts both processes agree and match the single-process run.

Also exercises MULTI-HOST CHECKPOINTING when a 4th argv (checkpoint dir) is
given: every process participates in one orbax save of the sharded
TrainState (process 0 coordinates, each host writes its shards), then
restores it and verifies the restored params match bit-for-bit — the
orbax-multi-host seam VERDICT r2 called out as untested.

Usage: python _distributed_worker.py <port> <nproc> <pid> [ckpt_dir]
"""

import json
import os
import sys


def main():
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    import jax

    jax.config.update("jax_platforms", "cpu")
    port, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    ckpt_dir = sys.argv[4] if len(sys.argv) > 4 else None

    from wheeledlab_tpu.parallel import distributed
    from wheeledlab_tpu.parallel.mesh import shard_train_state

    if nproc > 1:
        # STRICT path: explicit coordinator — raises on rendezvous failure
        distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert distributed.is_main_process() == (pid == 0)

    num_envs = 64
    per = num_envs // nproc
    sl = distributed.local_batch_slice(num_envs)
    assert sl == slice(pid * per, (pid + 1) * per), sl

    from wheeledlab_tpu.rl.ppo import PPOCfg, make_learner
    from wheeledlab_tpu.tasks import make_env

    env = make_env("MushrDriftRL-v0", num_envs=num_envs)
    cfg = PPOCfg(num_steps_per_env=8, num_learning_epochs=2,
                 num_mini_batches=2)
    mesh = distributed.global_mesh()
    init_fn, train_iteration, _ = make_learner(env, cfg, mesh=mesh)
    # every process computes the identical full state (same seed), then
    # re-shards it onto the global mesh
    state = jax.jit(init_fn)(jax.random.PRNGKey(0))
    state = shard_train_state(state, mesh, num_envs)

    iter_jit = jax.jit(train_iteration, donate_argnums=(0,))
    state, metrics = iter_jit(state)
    state, metrics = iter_jit(state)

    if ckpt_dir is not None:
        import numpy as np
        import orbax.checkpoint as ocp

        mgr = ocp.CheckpointManager(os.path.abspath(ckpt_dir))
        mgr.save(2, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()
        restored = mgr.restore(2, args=ocp.args.StandardRestore(state))
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(jax.device_get(a)),
                                          np.asarray(jax.device_get(b)))
        # the restored sharded env state must be usable: one more train step
        state2, metrics2 = jax.jit(train_iteration)(restored)
        assert bool(jax.numpy.isfinite(metrics2["loss/total"]))
        print("CKPT_OK", flush=True)

    out = {k: float(jax.device_get(v)) for k, v in metrics.items()
           if getattr(v, "ndim", None) == 0}
    assert out, "no scalar metrics returned"

    # Recurrent learner over the same global mesh: its per-env carries
    # (hidden LSTM state, reset_prev) must be sharded too — in a real
    # multi-process job a host-local [B] array fed into the global-mesh jit
    # is non-addressable and fails at dispatch (ADVICE r3 #2).
    rnn_cfg = cfg.replace(policy_class="ActorCriticRecurrent",
                          rnn_hidden_size=16)
    rnn_init, rnn_iteration, _ = make_learner(env, rnn_cfg, mesh=mesh)
    rnn_state = jax.jit(rnn_init)(jax.random.PRNGKey(0))
    rnn_state = shard_train_state(rnn_state, mesh, num_envs)
    rnn_state, rnn_metrics = jax.jit(rnn_iteration)(rnn_state)
    out.update({f"rnn/{k}": float(jax.device_get(v))
                for k, v in rnn_metrics.items()
                if getattr(v, "ndim", None) == 0})

    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
