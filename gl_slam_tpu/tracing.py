"""Tracing / profiling / structured metrics (SURVEY.md §5.1, §5.5).

The reference's observability is commented-out chrono probes
(`src/threading/thread_pool.cpp:194-198`) and numbered cout markers
(`src/core/slam_core.cpp:757-878`). Here: a lightweight per-stage timer that
respects JAX async dispatch (explicit block points), a structured per-frame
metrics recorder, and a context manager around the JAX profiler for real
TPU traces.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, List, Optional

import jax


class StageTimer:
    """Accumulates wall time per pipeline stage.

    `block=True` inserts a device sync so the measurement is the true stage
    cost rather than enqueue time — use only when profiling, never in the
    throughput path."""

    def __init__(self, block: bool = False):
        self.block = block
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        yield
        if self.block and sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1

    def summary(self) -> Dict[str, dict]:
        return {k: {"total_s": round(v, 4),
                    "mean_ms": round(1e3 * v / max(self.counts[k], 1), 3),
                    "count": self.counts[k]}
                for k, v in sorted(self.totals.items())}


class MetricsRecorder:
    """Structured per-frame metrics (reference: unstructured couts —
    match counts `slam_core.cpp:130`, triangulation counts `:252`, map sizes
    `:422-425`, GT errors `thread_pool.cpp:287-288`)."""

    def __init__(self):
        self.frames: List[dict] = []

    def record(self, frame_idx: int, **kv):
        row = {"frame": int(frame_idx)}
        for k, v in kv.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                row[k] = v
        self.frames.append(row)

    def to_jsonl(self, path: str):
        with open(path, "w") as f:
            for row in self.frames:
                f.write(json.dumps(row) + "\n")

    def last(self) -> Optional[dict]:
        return self.frames[-1] if self.frames else None


@contextlib.contextmanager
def profiler_trace(logdir: str = "/tmp/gl_slam_tpu_trace"):
    """JAX profiler capture around a region (view with tensorboard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
