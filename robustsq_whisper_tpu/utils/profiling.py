"""Profiling / observability helpers.

The reference's only observability is the per-step stats dict + commented-out
model summaries (SURVEY.md §5). TPU-native equivalents:

- ``trace`` context manager around steps -> TensorBoard-loadable traces via
  ``jax.profiler`` (set RSQ_TRACE_DIR or pass a dir),
- ``annotate`` named regions (shows up on the TPU timeline),
- ``StepTimer`` EMA steps/sec + tokens/sec accounting,
- ``log_compile_time`` wrapper reporting first-call (compile) latency.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from typing import Callable, Dict, Iterator, Optional

import jax

logger = logging.getLogger("robustsq_whisper_tpu.profiling")


@contextlib.contextmanager
def trace(trace_dir: Optional[str] = None) -> Iterator[None]:
    """Capture a jax.profiler trace if a directory is configured."""
    trace_dir = trace_dir or os.environ.get("RSQ_TRACE_DIR")
    if not trace_dir:
        yield
        return
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", trace_dir)


def annotate(name: str):
    """Named trace region (jax.profiler.TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """EMA throughput tracker for the training loop."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self._last: Optional[float] = None
        self.steps_per_sec: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.time()
        if self._last is not None:
            inst = 1.0 / max(now - self._last, 1e-9)
            self.steps_per_sec = (
                inst
                if self.steps_per_sec is None
                else self.ema * self.steps_per_sec + (1 - self.ema) * inst
            )
        self._last = now
        return self.steps_per_sec


def log_compile_time(name: str, fn: Callable) -> Callable:
    """Wrap a jitted callable; log the first-call (compile) latency."""
    state: Dict[str, bool] = {"first": True}

    def wrapped(*args, **kwargs):
        if state["first"]:
            t0 = time.time()
            out = fn(*args, **kwargs)
            jax.block_until_ready(jax.tree_util.tree_leaves(out)[:1])
            logger.info("%s: first call (compile) %.1fs", name, time.time() - t0)
            state["first"] = False
            return out
        return fn(*args, **kwargs)

    return wrapped
