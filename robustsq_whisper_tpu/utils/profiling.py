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


def op_stats(
    trace_dir: str, runs: int = 1, line_filter: str = "XLA Ops"
) -> Dict[str, Dict[str, float]]:
    """Aggregate per-op busy time from a ``jax.profiler`` trace.

    Parses the newest ``*.xplane.pb`` under ``trace_dir`` with the
    TensorFlow/tsl xplane protobuf (no TensorBoard server needed — the
    installed ``tensorboard_plugin_profile`` converter is broken against
    this TF build, and this is the tool every round-2 kernel profile in
    docs/KERNELS.md was produced with). Returns
    ``{op_name: {"ms": total_ms / runs, "count": calls / runs}}`` for every
    device plane, summed over the trace's ``line_filter`` lines.

    ``runs`` divides the totals by the number of profiled iterations so the
    numbers read as per-step. Events nest (a ``while`` op's duration
    contains its body), so the sum over ops exceeds wall time — compare
    siblings, not the grand total. Set
    ``PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python`` if the fast-proto
    runtime rejects the schema.
    """
    import glob as _glob
    from collections import defaultdict

    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except Exception as e:  # pragma: no cover - depends on installed TF
        raise ImportError(
            "op_stats needs the tensorflow tsl xplane protos "
            f"(tensorflow.tsl.profiler.protobuf.xplane_pb2): {e}"
        )

    paths = sorted(
        _glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    )
    if not paths:
        raise FileNotFoundError(f"no *.xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())

    out: Dict[str, Dict[str, float]] = defaultdict(
        lambda: {"ms": 0.0, "count": 0.0}
    )
    for plane in xs.planes:
        ev_meta = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if line_filter not in line.name:
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                rec = out[name]
                rec["ms"] += ev.duration_ps / 1e9 / max(runs, 1)
                rec["count"] += 1.0 / max(runs, 1)
    return dict(out)


def top_ops(stats: Dict[str, Dict[str, float]], n: int = 25) -> str:
    """Human-readable table of the ``n`` most expensive ops from
    :func:`op_stats`, sorted by total busy ms."""
    rows = sorted(stats.items(), key=lambda kv: -kv[1]["ms"])[:n]
    return "\n".join(
        f"{r['ms']:9.2f} ms  x{r['count']:<6.0f} {name[:100]}"
        for name, r in rows
    )


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
