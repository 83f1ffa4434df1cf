"""Pallas HBM->HBM beam reorder of the decode self-attention cache.

Beam search reorders the per-beam KV cache by the step's backpointers
(``src_beam``) before every decode step. XLA lowers the natural
``jnp.take(cache, idx, axis=1)`` to a gather that measured ~78 GB/s on the
(layers, batch*beam, time, heads, head_dim) cache — 4x below this chip's
HBM bandwidth and the dominant term of the whole beam loop (~60 ms/step at
medium/batch 32/beam 5; a one-hot-matmul reformulation only reached
~140 GB/s). This kernel is a pure data-movement program: one grid step per
(layer, output row) issues direct HBM->HBM DMAs of whole cache rows
(``in``/``out`` stay in ``ANY`` memory space, never touching VMEM), with
the source row picked from a scalar-prefetch index — the same
machine-speed copy engines XLA uses for big contiguous copies, minus the
gather lowering.

Every row is copied in full (not just the live [0, pos) prefix): the
output buffer of a scan-carried gather is fresh, uninitialized HBM each
step, and the masked self-attention read multiplies the dead tail by
exactly-0.0 softmax weights — an uninitialized NaN/inf bit pattern there
would still poison the output (0 * NaN). Copying all tiles keeps the
buffer fully defined (by induction from the zeros of ``init_cache``) at
bandwidth cost only, which the DMA path has headroom for.

Used by ``decode.search.build_beam_decoder``; equality with ``jnp.take``
is pinned in tests/test_decode.py.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(n_leaves, src_ref, *refs):
    # refs: n in-HBM refs, n out-HBM refs, n DMA semaphores
    l = pl.program_id(0)
    rows = src_ref.shape[0]
    ins = refs[:n_leaves]
    outs = refs[n_leaves : 2 * n_leaves]
    sems = refs[2 * n_leaves :]

    # Start EVERY row copy of this layer before waiting on any: a ~0.5 MB
    # row DMA is latency-dominated (~20 us issue+completion vs ~1 us of
    # wire time), so a start/wait-per-row loop runs at jnp.take speed
    # (~85 GB/s measured). With all rows in flight the copy engines
    # pipeline back-to-back and the same shapes stream at HBM speed.
    def start(i, _):
        src = src_ref[i]
        for x, o, sem in zip(ins, outs, sems):
            pltpu.make_async_copy(x.at[l, src], o.at[l, i], sem).start()
        return 0

    jax.lax.fori_loop(0, rows, start, 0)

    # Drain: every completed copy credits its byte count to the leaf's
    # semaphore; waiting with a same-shaped descriptor debits one row.
    def drain(i, _):
        for x, o, sem in zip(ins, outs, sems):
            pltpu.make_async_copy(x.at[l, 0], o.at[l, i], sem).wait()
        return 0

    jax.lax.fori_loop(0, rows, drain, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def beam_reorder_cache(
    cache: Sequence[jax.Array],  # leaves (layers, rows, time, ...)
    src_rows: jax.Array,  # (rows,) int32 source row per output row
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """Reorder every cache leaf's ``rows`` axis (axis 1) by ``src_rows``.

    Equivalent to ``tuple(jnp.take(x, src_rows, axis=1) for x in cache)``,
    lowered as direct HBM->HBM row DMAs (module docstring). All leaves ride
    one pallas_call so the (layers, rows) grid is walked once.
    """
    cache = tuple(cache)
    n = len(cache)
    layers, rows = cache[0].shape[:2]
    assert all(x.shape[:2] == (layers, rows) for x in cache), [
        x.shape for x in cache
    ]
    assert src_rows.shape == (rows,), (src_rows.shape, rows)

    # Mosaic requires the DMA'd slice to span whole (sublane, lane) tiles:
    # reshape each row's payload (time, heads, head_dim) to (P/128, 128) so
    # the lane dim is exactly one tile wide and the sublane dim holds the
    # rest — a row slice [l, src] is then trivially tile-aligned. The
    # reshape is a free bitcast (the trailing dims are contiguous) and is
    # undone on the way out. P/128 must cover the sublane tile at the
    # widest packing (int8: 32) — callers size the cache time axis so this
    # holds (build_beam_decoder rounds it up to a multiple of 32).
    flat = tuple(
        x.reshape(layers, rows, x.size // (layers * rows * 128), 128)
        for x in cache
    )
    assert all(x.shape[2] % 32 == 0 for x in flat), [x.shape for x in flat]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(layers,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n,
        scratch_shapes=[pltpu.SemaphoreType.DMA] * n,
    )
    out = pl.pallas_call(
        functools.partial(_kernel, n),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(x.shape, x.dtype) for x in flat],
        interpret=interpret,
    )(src_rows.astype(jnp.int32), *flat)
    return tuple(o.reshape(x.shape) for o, x in zip(out, cache))
