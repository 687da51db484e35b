#!/usr/bin/env python
"""Train-to-return benchmark — the machine-checkable version of the
reference's headline capability claim ("a couple hours to a transferable
policy", reference README.md:68) and BASELINE.json's north star
("RSS_DRIFT_CONFIG to reference return <10 min").

Runs a named run config on the current backend until `--target-return` is
reached (or the iteration budget runs out) and prints ONE JSON line:

    {"metric": "drift_train_to_return_s", "value": <wall s>,
     "unit": "s", "return": <reached>, "env_steps": N, "iterations": N,
     "target_return": T, "reached": bool}

The run directory (metrics.jsonl + run_config.json + checkpoints) lands under
--logs-dir; commit it under docs/runs/ as the learning-evidence artifact.

    python scripts/train_bench.py --config RSS_DRIFT_CONFIG \
        --target-return 800 --max-iterations 2000 --logs-dir docs/runs \
        --run-name rss_drift_tpu
"""

import argparse
import json
import os
import sys
import time

# runnable as `python scripts/train_bench.py` without installing the package:
# the interpreter puts scripts/ on sys.path, not the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="RSS_DRIFT_CONFIG")
    p.add_argument("--target-return", type=float, default=800.0)
    p.add_argument("--max-iterations", type=int, default=None,
                   help="iteration budget; defaults to the named config's "
                        "train.num_iterations (the committed-artifact budget)")
    p.add_argument("--num-envs", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--logs-dir", default="logs")
    p.add_argument("--run-name", default="train_bench")
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--no-checkpoints", action="store_true")
    args = p.parse_args(sys.argv[1:] if argv is None else argv)

    import wheeledlab_tpu.rl  # noqa: F401  registers run configs
    from wheeledlab_tpu.rl.runner import train
    from wheeledlab_tpu.utils.config import RUN_CONFIGS

    cfg = RUN_CONFIGS.get(args.config)
    cfg = cfg.replace(train=cfg.train.replace(
        seed=args.seed,
        num_iterations=args.max_iterations or cfg.train.num_iterations,
        target_return=args.target_return,
        log=cfg.train.log.replace(
            logs_dir=args.logs_dir, run_name=args.run_name,
            log_every=args.log_every,
            no_checkpoints=args.no_checkpoints)))
    if args.num_envs:
        cfg = cfg.replace(num_envs=args.num_envs)

    t0 = time.time()
    state, metrics = train(cfg)
    wall = time.time() - t0

    import os

    import jax

    iterations = int(jax.device_get(state.iteration))
    env_steps = iterations * cfg.agent.num_steps_per_env * cfg.num_envs
    final_return = metrics.get("episode/return", float("nan"))
    result = {
        "metric": f"{args.config.lower()}_train_to_return_s",
        "value": round(wall, 1),
        "unit": "s",
        "return": round(final_return, 1),
        "target_return": args.target_return,
        "reached": final_return >= args.target_return,
        "iterations": iterations,
        "env_steps": env_steps,
        "vs_baseline": round(7200.0 / max(wall, 1e-9), 2),  # ref: ~2 h (README.md:68)
    }
    # compile / steady-state split: XLA compilation of the fused iteration is
    # a one-time cost with high variance on remote-tunnel backends (measured
    # 38-276 s for the same program), so record the post-compile training
    # rate separately from the end-to-end wall clock
    run_dir = os.path.join(args.logs_dir, args.run_name)
    mpath = os.path.join(run_dir, "metrics.jsonl")
    if os.path.exists(mpath):
        rows = [json.loads(line) for line in open(mpath)]
        if len(rows) >= 2:
            d_it = rows[-1]["iteration"] - rows[0]["iteration"]
            d_wall = rows[-1]["perf/wall_s"] - rows[0]["perf/wall_s"]
            steps_per_iter = cfg.agent.num_steps_per_env * cfg.num_envs
            if d_it > 0 and d_wall > 0:
                result["steady_ms_per_iteration"] = round(d_wall / d_it * 1e3, 2)
                result["steady_env_steps_per_s"] = round(
                    steps_per_iter * d_it / d_wall, 0)
                result["train_s"] = round(
                    rows[-1]["iteration"] * d_wall / d_it, 1)
                result["compile_s"] = round(wall - result["train_s"], 1)
    print(json.dumps(result))
    if os.path.isdir(run_dir):
        with open(os.path.join(run_dir, "result.json"), "w") as f:
            json.dump(result, f)


if __name__ == "__main__":
    main()
