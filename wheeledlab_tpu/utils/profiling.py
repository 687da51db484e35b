"""Tracing / profiling hooks — the observability subsystem the reference
lacks (SURVEY.md §5: only coarse collection/learn wall-clock splits existed,
modified_rsl_rl_runner.py:111-120).

- `phase_timer`: named wall-clock phases with steps/s derivation.
- `trace`: context manager around `jax.profiler` for TensorBoard-viewable
  device traces (XLA op timeline).
- `debug_nans(True)` flips jax's nan-checking mode — the compiled-mode
  equivalent of the reference's NaN action guard
  (modified_rsl_rl_runner.py:74-75)."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


class PhaseTimer:
    """Accumulates wall-clock per named phase; `summary()` gives totals and
    fractions. Blocks on device completion at phase end so device time is
    attributed to the right phase."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync: Optional[object] = None) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        total = sum(self.totals.values()) or 1.0
        out = {}
        for name, t in self.totals.items():
            out[f"time/{name}_s"] = t
            out[f"time/{name}_frac"] = t / total
            if self.counts[name]:
                out[f"time/{name}_mean_ms"] = 1000.0 * t / self.counts[name]
        return out

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace (open with TensorBoard or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def debug_nans(enable: bool = True) -> None:
    """Global NaN checking for debugging exploding dynamics/learning."""
    jax.config.update("jax_debug_nans", enable)
