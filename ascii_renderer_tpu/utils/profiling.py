"""Tracing / profiling / observability (SURVEY §5).

The reference has only a frame-delta FPS estimator shown in the UI layer
(js/main.js:402, js/renderer.js:140-147) and ?debug console logging. Here:

  - FrameStats: rolling frame-time statistics (fps, p50/p95 latency) — the
    FPS-counter capability plus the latency metrics BASELINE asks for;
  - trace(): context manager around jax.profiler for real TPU traces;
  - timed(): wall-clock phase timer with HONEST device completion — on the
    axon platform block_until_ready returns before execution finishes, so
    completion is forced by a host round trip of (a reduction of) outputs;
  - log(): structured single-line JSON logging to stderr.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from collections import deque
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def force_completion(out: Any) -> None:
    """Block until device work for `out` has really finished (axon-safe)."""
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "dtype"):
            np.asarray(leaf)


class FrameStats:
    """Rolling frame statistics (window of N frames)."""

    def __init__(self, window: int = 120):
        self._dts = deque(maxlen=window)
        self._last = None

    def tick(self) -> float:
        """Mark a frame boundary; returns instantaneous fps."""
        now = time.perf_counter()
        if self._last is not None:
            self._dts.append(now - self._last)
        self._last = now
        return self.fps

    @property
    def fps(self) -> float:
        if not self._dts:
            return 0.0
        return 1.0 / max(float(np.mean(self._dts)), 1e-9)

    @property
    def p50_ms(self) -> float:
        return float(np.percentile(self._dts, 50)) * 1e3 if self._dts else 0.0

    @property
    def p95_ms(self) -> float:
        return float(np.percentile(self._dts, 95)) * 1e3 if self._dts else 0.0

    def summary(self) -> dict:
        return {"fps": round(self.fps, 2), "p50_ms": round(self.p50_ms, 3),
                "p95_ms": round(self.p95_ms, 3), "frames": len(self._dts)}


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/ascii_tpu_trace"):
    """jax.profiler trace scope (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str, sink=None):
    """Wall-clock phase timer; logs one structured line on exit."""
    t0 = time.perf_counter()
    yield
    log("timing", label=label, ms=round((time.perf_counter() - t0) * 1e3, 3),
        sink=sink)


def log(event: str, sink=None, **fields) -> None:
    """Structured one-line JSON log (ref: the DBG console.log pattern,
    pathtrace.js:14 — but machine-parseable)."""
    rec = {"event": event, "t": round(time.time(), 3), **fields}
    print(json.dumps(rec), file=sink or sys.stderr, flush=True)


def dump_preview(frame, path: str = "/tmp/preview.png") -> str:
    """Save the raw RGB cell grid as a PNG — the ?debug preview canvas
    capability (js/main.js:206-213,411-419)."""
    from PIL import Image
    rgb = np.asarray(frame.rgb)
    Image.fromarray(rgb).save(path)
    return path
