"""Tracing / profiling hooks (the reference has none — SURVEY.md §5).

- ``trace_context``: jax.profiler trace wrapper (view with xprof/TensorBoard).
- ``StepTimer``: block_until_ready-bracketed step timing with rolling
  frames/sec — the measurement discipline behind bench.py.
- ``MetricsLogger``: structured JSONL metrics (the reference only prints).
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path

import jax


@contextlib.contextmanager
def trace_context(log_dir: str | None):
    """Profile the enclosed block with jax.profiler when log_dir is set."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


class StepTimer:
    def __init__(self, window: int = 50):
        self.window = window
        self._times: list[float] = []
        self._last = None

    def start(self):
        self._last = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._last
        self._times.append(dt)
        if len(self._times) > self.window:
            self._times.pop(0)
        return dt

    @property
    def mean_step_s(self) -> float:
        return sum(self._times) / max(len(self._times), 1)

    def frames_per_sec(self, batch_size: int) -> float:
        m = self.mean_step_s
        return batch_size / m if m > 0 else 0.0


class MetricsLogger:
    """Append-only JSONL metrics stream."""

    def __init__(self, path: str | Path | None):
        self.path = Path(path) if path else None
        if self.path:
            self.path.parent.mkdir(parents=True, exist_ok=True)

    def log(self, step: int, **metrics):
        if not self.path:
            return
        rec = {"step": step, "ts": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
