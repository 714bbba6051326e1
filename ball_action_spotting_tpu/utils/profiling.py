"""Profiling / tracing utilities.

The reference has no tracing (SURVEY §5 — only tqdm bars); here the train
and predict paths can capture XLA device traces via ``jax.profiler`` and the
host input pipeline reports per-stage timings.

Usage::

    with device_trace("/tmp/trace"):       # view in XProf/TensorBoard
        run_steps()

    timer = StageTimer()
    with timer.stage("decode"):
        ...
    print(timer.report())
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Iterator


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace into ``log_dir``."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulating wall-clock timer for host pipeline stages."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            total = self.totals[name]
            count = self.counts[name]
            lines.append(
                f"{name}: total {total:.3f}s, {count} calls, "
                f"{total / count * 1000:.2f} ms/call"
            )
        return "\n".join(lines)

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


def synchronize(tree) -> None:
    """Force completion of all device work reachable from ``tree`` by
    materializing one scalar per leaf group (``block_until_ready`` is
    unreliable on some remote platforms)."""
    import jax
    import numpy as np

    leaves = jax.tree.leaves(tree)
    if leaves:
        np.asarray(jax.numpy.sum(leaves[0].astype("float32")))
