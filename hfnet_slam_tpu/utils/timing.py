"""Per-stage timing registry — the REGISTER_TIMES analogue.

The reference gates std::chrono instrumentation behind a compile-time flag
(/root/reference/CMakeLists.txt:14, include/Tracking.h:175-206) and dumps
named timing vectors per thread at shutdown (System::PrintTimeStats,
src/Tracking.cc:167-354). Here it is a tiny always-available registry:
`with timings.section("extract"):` around any stage; JAX async dispatch is
handled by passing the stage's output through `block(...)` so the timer
measures device completion, not enqueue.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import numpy as np


class TimingRegistry:
    def __init__(self):
        self._samples = defaultdict(list)
        self.enabled = True

    @contextlib.contextmanager
    def section(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._samples[name].append(time.perf_counter() - t0)

    def block(self, x):
        """Barrier a JAX value inside a section so the sample includes
        device time (jax.block_until_ready), passing the value through."""
        try:
            import jax

            jax.block_until_ready(x)
        except Exception:
            pass
        return x

    def add(self, name: str, seconds: float):
        self._samples[name].append(seconds)

    # ------------------------------------------------------------------
    def stats(self):
        """{name: (n, mean_ms, std_ms, p50_ms, p95_ms)}"""
        out = {}
        for k, v in self._samples.items():
            a = np.asarray(v) * 1e3
            out[k] = (len(a), float(a.mean()), float(a.std()),
                      float(np.median(a)), float(np.percentile(a, 95)))
        return out

    def report(self) -> str:
        """Formatted dump (PrintTimeStats analogue)."""
        lines = [f"{'stage':<28}{'n':>6}{'mean ms':>10}{'std':>8}{'p50':>8}{'p95':>8}"]
        for k in sorted(self._samples):
            n, mean, std, p50, p95 = self.stats()[k]
            lines.append(f"{k:<28}{n:>6}{mean:>10.2f}{std:>8.2f}{p50:>8.2f}{p95:>8.2f}")
        return "\n".join(lines)

    def save(self, path):
        with open(path, "w") as f:
            f.write(self.report() + "\n")

    def reset(self):
        self._samples.clear()


# process-global default registry (the reference's static vectors)
timings = TimingRegistry()
