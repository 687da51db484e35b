#!/usr/bin/env python
"""Headline benchmark: drift-task env throughput (env-steps/s per chip,
16k envs) — the BASELINE.json metric.

Baseline: the reference's implied single-GPU throughput is ~90k env-steps/s
(655M env-steps in "a couple hours", BASELINE.md). vs_baseline is the speedup
over that number.

Measurement methodology (dispatch-proof):
  * the repeat count auto-scales until the timed window is >= MIN_WALL
    seconds, so per-dispatch round trips (milliseconds, and link-dependent on
    a remote-tunnel backend) are amortized to noise;
  * the window is anchored by `jax.device_get` of a scalar that data-depends
    on EVERY iteration (env state chains through all rollouts), so the clock
    cannot stop before the device has actually produced the result — timing
    async dispatch instead of execution is impossible by construction;
  * the measurement runs twice and the SLOWER run is reported (conservative);
  * a roofline sanity check computes the HBM bandwidth implied by the
    reported rate from the packed state/param layouts (sim/soa.py) and fails
    the bench outright if it exceeds the chip's peak — a number that violates
    physics must never be published.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

`bench.py --train [...]` instead runs the train-to-return benchmark
(scripts/train_bench.py — wall-clock for RSS_DRIFT to reach a target return;
the BASELINE.json "<10 min" north star), forwarding remaining args.
"""

import json
import math
import sys
import time

import jax

MIN_WALL = 2.0      # seconds the timed window must span
MAX_ITERS = 8192    # safety cap on the repeat count

# Peak HBM bandwidth per chip, bytes/s (public spec sheets). Used only for
# the roofline sanity check; unknown kinds skip the check.
PEAK_HBM_BYTES_PER_S = {
    "TPU v4": 1.2e12,
    "TPU v5 lite": 819e9,      # v5e
    "TPU v5": 2.77e12,         # v5p
    "TPU v6 lite": 1.6e12,     # v6e / Trillium
}


# Peak dense FLOP/s per chip (bf16 MXU, public spec sheets). The env step is
# VPU-elementwise work, so utilization against MXU peak is a strict LOWER
# bound on remaining speed-of-light headroom — reported to make "is it
# actually fast" quantitative (VERDICT r3 #8), not as an MFU claim.
PEAK_FLOPS_PER_S = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,     # v5e
    "TPU v5": 459e12,          # v5p
    "TPU v6 lite": 918e12,     # v6e / Trillium
}

# Analytic FLOPs per drift env control step (fused kernel,
# tasks/drift/fused.py): substep_soa ~550 flops (quat rotation 33, steering
# servo ~25, 4 wheels x ~105 [contact, tire curve incl. atan_approx, motor,
# force/torque accumulation], rigid-body + quaternion integration ~70)
# x decimation 4, plus the in-kernel epilogue ~350 (action map, pushes,
# terminations, 7 reward terms, body-frame rotations x2, spawn select,
# euler obs). Conservative (undercounts transcendentals).
FLOPS_PER_ENV_STEP = 550 * 4 + 350


def _peak(table) -> float | None:
    kind = jax.devices()[0].device_kind
    for name, val in table.items():
        if kind.startswith(name):
            return val
    return None


def _peak_hbm() -> float | None:
    return _peak(PEAK_HBM_BYTES_PER_S)


def measure(rollout, state, key, steps_per_iter: int):
    """Auto-scaling anchored timing; returns (steps_per_s, wall_s, iters).

    Never accepts a window of fewer than MIN_ITERS calls: a single call can
    embed one-time costs (measured: the second call with a distinct input
    layout triggers a ~2 s relayout recompile via the remote compile
    service), and a 1-call window that happens to exceed MIN_WALL would
    publish that artifact as the steady rate."""
    MIN_ITERS = 4
    iters = 1
    while True:
        # per-iteration keys precomputed OUTSIDE the timed window — fold_in
        # is an eager device op (a dispatch over the tunnel) that would
        # otherwise serialize into the measured loop
        keys = [jax.random.fold_in(key, i) for i in range(iters)]
        jax.block_until_ready(keys[-1])
        t0 = time.perf_counter()
        s = state
        for i in range(iters):
            s, r = rollout(s, keys[i])
        anchor = float(jax.device_get(r))  # forces real execution to finish
        assert math.isfinite(anchor), "benchmark rollout produced non-finite reward"
        wall = time.perf_counter() - t0
        if (wall >= MIN_WALL and iters >= MIN_ITERS) or iters >= MAX_ITERS:
            return steps_per_iter * iters / wall, wall, iters
        grow = max(2.0, MIN_WALL * 1.25 / max(wall, 1e-9))
        iters = min(MAX_ITERS, max(MIN_ITERS, int(math.ceil(iters * grow))))


def roofline_check(env_steps_per_s: float, num_envs: int):
    """Fail if the measured rate implies HBM traffic beyond the chip's peak.

    Per control step the fused step must at minimum stream the packed
    vehicle state (read + write) and the packed per-env params (read) —
    the layouts in sim/soa.py (NUM_STATE=21, NUM_PARAM=45 f32 rows)."""
    from wheeledlab_tpu.sim.soa import NUM_PARAM, NUM_STATE

    bytes_per_env_step = 4 * (2 * NUM_STATE + NUM_PARAM)
    implied = env_steps_per_s * bytes_per_env_step
    peak = _peak_hbm()
    if peak is not None and implied > 1.1 * peak:
        raise SystemExit(
            f"ROOFLINE VIOLATION: measured {env_steps_per_s:,.0f} env-steps/s "
            f"implies {implied / 1e9:,.0f} GB/s of HBM traffic "
            f"({bytes_per_env_step} B/env-step) but "
            f"{jax.devices()[0].device_kind} peaks at {peak / 1e9:,.0f} GB/s — "
            "the measurement is timing dispatch, not execution.")
    return implied, peak


def main():
    from wheeledlab_tpu.tasks import make_env
    from wheeledlab_tpu.utils.rng import enable_fast_prng

    enable_fast_prng()

    num_envs = 16384
    rollout_len = 128
    env = make_env("MushrDriftRL-v0", num_envs=num_envs)

    key = jax.random.PRNGKey(0)
    state, _ = jax.jit(env.reset)(key)

    @jax.jit
    def rollout(state, key):
        def body(carry, k):
            s = carry
            action = jax.random.uniform(k, (num_envs, 2), minval=-1.0, maxval=1.0)
            s, out = env.step(s, action)
            return s, out.reward.sum()

        keys = jax.random.split(key, rollout_len)
        state, rews = jax.lax.scan(body, state, keys)
        return state, rews.sum()

    # warmup/compile (anchored, so compile time never leaks into the window).
    # TWO chained calls: the second call sees the rollout's own output
    # layouts as inputs, which can differ from reset's and trigger one more
    # (remote) compile — that must happen here, not in a timed window.
    state, r = rollout(state, jax.random.PRNGKey(1))
    float(jax.device_get(r))
    state, r = rollout(state, jax.random.PRNGKey(1000))
    float(jax.device_get(r))

    runs = [measure(rollout, state, jax.random.PRNGKey(2 + i),
                    num_envs * rollout_len) for i in range(2)]
    steps_per_s, wall, iters = min(runs)  # conservative: slower run
    spread = abs(runs[0][0] - runs[1][0]) / max(r[0] for r in runs)
    print(f"# runs: {[f'{r[0]:,.0f} steps/s over {r[1]:.2f}s ({r[2]} iters)' for r in runs]}"
          f" spread={spread:.1%}", file=sys.stderr)

    implied_bw, peak_bw = roofline_check(steps_per_s, num_envs)
    print(f"# roofline: implied HBM {implied_bw / 1e9:.1f} GB/s"
          + (f" of {peak_bw / 1e9:.0f} GB/s peak" if peak_bw else ""),
          file=sys.stderr)
    # FLOP-side accounting (VERDICT r3 #8): implied compute rate + fraction
    # of the chip's dense peak. This workload is VPU-elementwise, so the
    # MXU-bf16 fraction is a lower bound on speed-of-light headroom.
    implied_flops = steps_per_s * FLOPS_PER_ENV_STEP
    peak_flops = _peak(PEAK_FLOPS_PER_S)
    print(f"# flops: ~{FLOPS_PER_ENV_STEP} flops/env-step analytic -> "
          f"{implied_flops / 1e12:.3f} TFLOP/s"
          + (f" = {implied_flops / peak_flops:.2%} of dense bf16 peak"
             if peak_flops else ""), file=sys.stderr)

    baseline = 90_000.0  # reference implied steps/s on one GPU (BASELINE.md)
    print(json.dumps({
        "metric": "drift_env_steps_per_s_per_chip",
        "value": round(steps_per_s, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_s / baseline, 2),
        "implied_hbm_gbps": round(implied_bw / 1e9, 1),
        "implied_tflops": round(implied_flops / 1e12, 3),
        "flops_per_env_step": FLOPS_PER_ENV_STEP,
        "frac_of_dense_bf16_peak": (round(implied_flops / peak_flops, 4)
                                    if peak_flops else None),
    }))


if __name__ == "__main__":
    if "--train" in sys.argv:
        import os

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "scripts"))
        import train_bench

        argv = [a for a in sys.argv[1:] if a != "--train"]
        train_bench.main(argv)
    else:
        main()
