"""Profiling helpers: trace capture + the xplane op-stats parser (the tool
the docs/KERNELS.md round-2 profiles were produced with)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robustsq_whisper_tpu.utils import profiling


def test_trace_and_op_stats(tmp_path):
    pytest.importorskip("tensorflow.tsl.profiler.protobuf.xplane_pb2")
    td = str(tmp_path / "trace")

    @jax.jit
    def f(x):
        return jnp.tanh(x @ x.T).sum()

    x = jnp.asarray(np.random.default_rng(0).standard_normal((64, 64)))
    float(f(x))  # warm (compile outside the trace)
    with profiling.trace(td):
        for _ in range(2):
            float(f(x))

    found = []
    for root, _, files in os.walk(td):
        found += [f_ for f_ in files if f_.endswith(".xplane.pb")]
    assert found, "trace wrote no xplane.pb"

    # CPU-backend traces put XLA modules on "XLA Modules"/thread lines, not
    # the TPU "XLA Ops" line — parse leniently (any line) and check shape.
    stats = profiling.op_stats(td, runs=2, line_filter="")
    assert stats, "parser returned no events"
    for rec in stats.values():
        assert rec["ms"] >= 0.0 and rec["count"] > 0
    table = profiling.top_ops(stats, n=5)
    assert isinstance(table, str) and table


def test_op_stats_missing_dir(tmp_path):
    pytest.importorskip("tensorflow.tsl.profiler.protobuf.xplane_pb2")
    with pytest.raises(FileNotFoundError):
        profiling.op_stats(str(tmp_path / "nope"))


def test_step_timer_monotonic():
    t = profiling.StepTimer()
    assert t.tick() is None
    assert t.tick() is not None and t.steps_per_sec > 0
