"""Observability: structured per-phase timing + jax.profiler hooks.

The reference's observability is println! (SURVEY §5). Here: a lightweight
phase timer that blocks on device results (so numbers mean device time, not
dispatch time), structured per-iteration optimizer metrics, and a context
manager around ``jax.profiler.trace`` for XLA-level traces.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from collections import defaultdict

import jax


@dataclasses.dataclass
class PhaseTimer:
    """Accumulates wall time per named phase; blocks on pytree outputs."""

    totals: dict = dataclasses.field(default_factory=lambda: defaultdict(float))
    counts: dict = dataclasses.field(default_factory=lambda: defaultdict(int))

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_ms": 1e3 * self.totals[name] / max(self.counts[name], 1),
            }
            for name in self.totals
        }


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """Capture an XLA profile (open with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class OptimizerMetrics:
    """Structured per-iteration PGO metrics (role of the reference's log
    lines, pose_graph_optimization.rs:288-293, as data instead of text)."""

    chi2: list = dataclasses.field(default_factory=list)
    norm_dx: list = dataclasses.field(default_factory=list)
    lam: list = dataclasses.field(default_factory=list)

    def callback(self, it, graph, error, norm_dx, lam):
        del it, graph
        self.chi2.append(float(error))
        self.norm_dx.append(float(norm_dx))
        self.lam.append(float(lam))

    def as_dict(self) -> dict:
        return {"chi2": self.chi2, "norm_dx": self.norm_dx, "lam": self.lam}
