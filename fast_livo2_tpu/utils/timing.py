"""Observability: per-frame stage timing tables + device profiling.

The reference prints per-frame ANSI box tables of stage wall-times
(LIO: DownSample/ICP/updateVoxelMap, LIVMapper.cpp:465-476; VIO stage
table, vio.cpp:1851-1868) with running averages. Here the same surface is
data-first: `StageTable` collects rows, renders the same style of table
on demand, and `device_trace` wraps a block in jax.profiler for kernel-
level traces (viewable in TensorBoard / xprof)."""

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


class StageTable:
    """Collect named stage durations per frame; render running-average
    tables in the reference's box style."""

    def __init__(self, title: str):
        self.title = title
        self.rows: List[Dict[str, float]] = []
        self._current: Dict[str, float] = {}
        self._t0: Optional[float] = None
        self._stage: Optional[str] = None

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        yield
        self._current[name] = self._current.get(name, 0.0) + time.perf_counter() - t0

    def mark(self, name: str, seconds: float):
        self._current[name] = self._current.get(name, 0.0) + seconds

    def end_frame(self):
        self.rows.append(self._current)
        self._current = {}

    def averages(self) -> Dict[str, float]:
        keys = {k for r in self.rows for k in r}
        return {k: float(np.mean([r.get(k, 0.0) for r in self.rows])) for k in sorted(keys)}

    def render(self, last_n: Optional[int] = None) -> str:
        rows = self.rows[-last_n:] if last_n else self.rows
        if not rows:
            return f"[{self.title}] no frames"
        keys = sorted({k for r in rows for k in r})
        width = 63
        bar = "+" + "-" * (width - 2) + "+"
        out = [bar, f"| {self.title:^{width - 4}} |", bar,
               f"| {'Stage':29} | {'avg (ms)':>12} | {'last (ms)':>12} |", bar]
        for k in keys:
            avg = np.mean([r.get(k, 0.0) for r in rows]) * 1e3
            last = rows[-1].get(k, 0.0) * 1e3
            out.append(f"| {k:29} | {avg:12.2f} | {last:12.2f} |")
        total_avg = np.mean([sum(r.values()) for r in rows]) * 1e3
        out += [bar, f"| {'Total':29} | {total_avg:12.2f} | "
                     f"{sum(rows[-1].values()) * 1e3:12.2f} |", bar]
        return "\n".join(out)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Profile a block with jax.profiler (kernel-level device trace)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named sub-region inside a device trace."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
