"""Pallas beam reorder of the decode self-attention cache.

Beam search reorders the per-beam KV cache by the step's backpointers
(``src_beam``) before every decode step. XLA lowers the natural
``jnp.take(cache, idx, axis=1)`` to a gather measured ~4x below this
chip's streaming bandwidth on the (layers, batch*beam, time, heads,
head_dim) cache — the dominant term of the whole beam loop at
medium/batch 32/beam 5 (28 ms/step isolated; ~60 ms/step in the e2e
loop where the gather also blocks fusion around the cache update).

Two DMA designs were measured before this one (docs/KERNELS.md §5):

- per-(layer, row) HBM->HBM row DMAs: 29.2 ms/step — every 294 KB row
  costs ~3.6 us of descriptor issue/latency against ~0.4 us of wire
  time, so 7680 descriptors/step is ISSUE-bound, not bandwidth-bound;
- one strided DMA per row spanning all layers (``x.at[:, src]``, 24x
  fewer descriptors): hung the chip — DMA slices with the dynamic index
  behind a full leading slice are not a supported Mosaic pattern (the
  guide documents leading ``.at[idx]`` slices only).

This version issues no per-row copies at all: the grid walks
(layers, payload-chunks), Pallas streams ``(rows, chunk)`` blocks
through VMEM with its usual double-buffered block DMAs, and the row
reorder inside each block is a ONE-HOT MATMUL on the MXU: ``out =
P @ x`` with ``P[i, j] = (src[i] == j)``. The product is numerically
EXACT — each output row sums exactly one nonzero term (1 * x), and
0 + x is exact in every float format — int8 leaves ride as bf16
(integers <= 256 are exact in bf16), f32 leaves in f32. The matmul is
noise next to the MXU's throughput; measured 14.5 ms/step at
medium/batch 32/beam 5 — AT this chip's streaming-copy roofline (a
pure pallas copy of the same buffers measures the same 318 GB/s
effective, strided or contiguous, so the reorder itself is free).

Remaining bytes are then cut with the ``live`` argument: at decode
step i only positions [0, live) of the time axis hold data. Two leaf
forms, two mechanisms:

- Packed 4-D leaves (the flat decode cache, ``_permute4d_kernel``): the
  time-chunk GRID dimension is the traced live-chunk count — dead
  chunks never execute — and the output ALIASES the input, so the
  untouched dead tail keeps the cache's zeros (exact: the tail is zeros
  by induction from ``init_cache``) and XLA threads the scan carry
  without the ~2.8 ms/leaf defensive copy it inserts for fresh pallas
  outputs. Aliasing is safe here precisely because no reshape surrounds
  the call; in the flattened path below it was measured and rejected —
  aliasing pins the buffer layouts and turns the surrounding bitcast
  reshapes into ~2 ms copies each.
- Flattened (S, 128) leaves (legacy 5-D caches): dead chunks are
  ZERO-FILLED WITHOUT BEING READ — their input block index maps clamp
  to the last live chunk and the ``pl.when`` dead branch writes zeros
  (the write cannot be skipped: the output buffer is fresh HBM and the
  masked self-attention read would 0 * NaN on garbage).

Used by ``decode.search.build_beam_decoder``; equality with ``jnp.take``
is pinned in tests/test_decode.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _permute_kernel(meta_ref, src_ref, *refs, rows: int):
    """o[i] = x[src[i]] within (rows, chunk, 128) VMEM blocks (module
    docstring). refs holds n input blocks followed by n output blocks;
    blocks past the live prefix (chunk index >= meta_ref[0]) are
    zero-filled without being read (their input DMA is elided by the
    clamped index map).

    bf16 blocks go through the one-hot MXU matmul — exact, because
    bf16 x bf16 products are exact in the f32 accumulator and each
    output row sums exactly one nonzero term. Every other dtype copies
    row-by-row with dynamic slices instead: the MXU truncates f32
    inputs to bf16 passes at default precision (caught on hardware as a
    ~1e-2 error the CPU interpreter does not reproduce), and arbitrary
    bit patterns cannot ride a float matmul safely."""
    n = len(refs) // 2
    c = pl.program_id(1)
    live = c < meta_ref[0]

    @pl.when(live)
    def _():
        mxu = [
            (x, o) for x, o in zip(refs[:n], refs[n:])
            if x.dtype == jnp.bfloat16
        ]
        if mxu:
            onehot = (
                src_ref[:]  # (rows, 1) int32
                == jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
            ).astype(jnp.bfloat16)
            for x_ref, o_ref in mxu:
                out = jax.lax.dot_general(
                    onehot, x_ref[:].reshape(rows, -1),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o_ref[:] = out.reshape(o_ref.shape).astype(o_ref.dtype)
        for x_ref, o_ref in zip(refs[:n], refs[n:]):
            if x_ref.dtype == jnp.bfloat16:
                continue
            for i in range(rows):  # static unroll; src from SMEM scalars
                o_ref[pl.ds(i, 1)] = x_ref[pl.ds(meta_ref[1 + i], 1)]

    @pl.when(jnp.logical_not(live))
    def _():
        # The decode cache's dead tail is all-zeros (init_cache zeros it;
        # prefill and the per-step update only write the live prefix), so
        # writing zeros reproduces jnp.take exactly there while skipping
        # the read. The write itself cannot be skipped: the output buffer
        # is fresh, and the masked self-attention read would 0 * NaN.
        for o_ref in refs[n:]:
            o_ref[:] = jnp.zeros_like(o_ref)


def _permute4d_kernel(meta_ref, src_ref, x_ref, o_ref, *, rows: int):
    """Same one-hot row permute, on a NATIVE packed 4-D block
    (rows, t_chunk, state_chunk) — the flat decode cache's own layout, so
    no flatten/unflatten reshape surrounds the call (on TPU the
    (T, n_state) <-> (T*n_state/128, 128) reshape is a real retile —
    profiled ~2.9 ms per leaf per beam step when this kernel's wrapper
    still did it).

    The output ALIASES the input (in-place: safe, each output block
    depends only on the same input block, already resident before the
    write), which lets XLA thread the scan carry without the ~2.8 ms/leaf
    defensive copy it inserts for fresh pallas outputs — and makes the
    dead tail completely free: the time-chunk GRID DIMENSION is the
    traced live-chunk count, so dead chunks never execute (clamped index
    maps were measured to still FETCH their block every step — ~2x the
    live-only traffic), and the untouched aliased tail keeps the cache's
    zeros."""
    t_chunk = x_ref.shape[1]
    if x_ref.dtype in (jnp.bfloat16, jnp.int8):
        # int8 rides the same one-hot matmul as bf16: |int8| <= 127 is
        # exactly representable in bf16, the products and f32 accumulator
        # are exact, and the f32 -> int8 cast of exact integers is exact
        onehot = (
            src_ref[:]
            == jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
        ).astype(jnp.bfloat16)
        for t in range(t_chunk):  # static: rank-2 MXU dots
            o_ref[:, t] = jax.lax.dot_general(
                onehot, x_ref[:, t].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)
    else:
        for i in range(rows):
            o_ref[pl.ds(i, 1)] = x_ref[pl.ds(meta_ref[i], 1)]


@functools.partial(jax.jit, static_argnames=("time_len", "interpret"))
def beam_reorder_cache(
    cache: Sequence[jax.Array],  # leaves (layers, rows, time, ...)
    src_rows: jax.Array,  # (rows,) int32 source row per output row
    live: Optional[jax.Array] = None,  # scalar: valid time positions
    time_len: Optional[int] = None,  # static time-axis length (with live)
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """Reorder every cache leaf's ``rows`` axis (axis 1) by ``src_rows``.

    Equivalent to ``tuple(jnp.take(x, src_rows, axis=1) for x in cache)``
    — except that with ``live``/``time_len``, only the leading
    ``live/time_len`` fraction of each row's payload is read and
    reordered; the tail is written as zeros without reading (module
    docstring; exact for the decode cache, whose tail beyond ``live``
    positions is always zeros).
    Each leaf's per-row payload must flatten into whole (32, 128) tiles
    — ``build_beam_decoder`` pads the cache length so this holds and
    falls back to the XLA gather when it can't.
    """
    cache = tuple(cache)
    layers, rows = cache[0].shape[:2]
    assert all(x.shape[:2] == (layers, rows) for x in cache), [
        x.shape for x in cache
    ]
    assert src_rows.shape == (rows,), (src_rows.shape, rows)
    assert (live is None) == (time_len is None), "live needs time_len"

    src = src_rows.astype(jnp.int32)[:, None]  # (rows, 1) for VMEM
    out: list = [None] * len(cache)
    # Packed 4-D leaves (the flat decode cache, minor dim % 128) ride a
    # reshape-free kernel on their native layout; everything else goes
    # through the (S, 128) flattening below.
    packed: list = []
    rest: list = []
    for i, x in enumerate(cache):
        if x.ndim == 4 and x.shape[3] % 128 == 0 and x.shape[2] % 8 == 0:
            packed.append(i)
        else:
            rest.append(i)
    for i in packed:
        x = cache[i]
        T, n_state = x.shape[2], x.shape[3]
        t_chunk = 8
        n_chunks = T // t_chunk
        # sub-chunk the state dim so blocks stay ~1.3 MB and the pipeline
        # double-buffers comfortably (2.6 MB blocks measured ~2x slower)
        s_chunk = n_state
        while s_chunk % 2 == 0 and (
            rows * t_chunk * s_chunk * x.dtype.itemsize > 1_400_000
        ):
            s_chunk //= 2
        assert s_chunk % 128 == 0, (n_state, s_chunk)
        if live is None:
            valid = jnp.int32(n_chunks)
        else:
            valid = jnp.clip(
                (live + t_chunk - 1) // t_chunk, 1, n_chunks
            ).astype(jnp.int32)
        meta = src_rows.astype(jnp.int32)
        # t-chunk grid dim is the TRACED live-chunk count: dead chunks
        # never run, their aliased output blocks keep the cache's zeros
        spec = pl.BlockSpec(
            (None, rows, t_chunk, s_chunk),
            lambda l, s, c, v: (l, 0, c, s),
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(layers, n_state // s_chunk, valid),
            in_specs=[
                pl.BlockSpec((rows, 1), lambda l, s, c, v: (0, 0)), spec
            ],
            out_specs=spec,
        )
        out[i] = pl.pallas_call(
            functools.partial(_permute4d_kernel, rows=rows),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            input_output_aliases={2: 0},
            interpret=interpret,
        )(meta, src, x)
    # One pallas_call per leaf. Merging the k and v leaves into a shared
    # grid was measured 2x SLOWER (28.6 vs 14.5 ms/step at medium/
    # batch 32/beam 5): the doubled block set plus the f32 matmul
    # intermediates oversubscribe VMEM and the pipeline serializes.
    groups = [(cache[i].size // (layers * rows * 128), [i]) for i in rest]
    for s_full, idxs in groups:
        # (layers, rows, S, 128): lane dim exactly one tile wide, S holds
        # the rest of the row payload — a free bitcast (trailing dims are
        # contiguous), undone on the way out.
        assert s_full % 32 == 0, (cache[idxs[0]].shape, s_full)
        flats = [cache[i].reshape(layers, rows, s_full, 128) for i in idxs]
        # chunk the payload so each block double-buffers comfortably in
        # VMEM (~16 MB/core): 32 sublane-tiles is ~1.3 MB/block per bf16
        # leaf at rows=160. Measured flat from 32 to 128 (the whole loop
        # is HBM-streaming-bound), so the smallest tiling also gives the
        # live-prefix skip its finest granularity.
        chunk = 32
        while s_full % chunk != 0:  # payload guaranteed % 32 only
            chunk //= 2
        n_chunks = s_full // chunk
        if live is None:
            valid = jnp.full((1,), n_chunks, jnp.int32)
        else:
            # ceil(live * s_full / time_len) valid sublanes -> chunks
            valid_s = (live * s_full + time_len - 1) // time_len
            valid = jnp.maximum(
                1, (valid_s + chunk - 1) // chunk
            ).astype(jnp.int32)[None]
        # prefetch scalars: [valid_chunks, src_rows...] — index maps read
        # element 0; the non-bf16 row-copy path reads the rest from SMEM
        meta = jnp.concatenate([valid, src_rows.astype(jnp.int32)])
        # inputs: clamp dead chunks to the last live one (consecutive
        # equal indices -> the pipeline skips the fetch). Outputs must
        # map c -> c unclamped: every block gets written exactly once.
        in_spec = pl.BlockSpec(
            (None, rows, chunk, 128),
            lambda l, c, v: (l, 0, jnp.minimum(c, v[0] - 1), 0),
        )
        out_spec = pl.BlockSpec(
            (None, rows, chunk, 128), lambda l, c, v: (l, 0, c, 0)
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(layers, n_chunks),
            in_specs=[pl.BlockSpec((rows, 1), lambda l, c, v: (0, 0))]
            + [in_spec] * len(flats),
            out_specs=[out_spec] * len(flats),
        )
        # NO input_output_aliases: aliasing the big buffers pins their
        # layouts and turns the surrounding (free, bitcast) flatten/
        # unflatten reshapes into real copies — profiled at ~4 x 2 ms per
        # beam step, dwarfing what in-place saved.
        res = pl.pallas_call(
            functools.partial(_permute_kernel, rows=rows),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct(f.shape, f.dtype) for f in flats],
            interpret=interpret,
        )(meta, src, *flats)
        for i, o in zip(idxs, res):
            out[i] = o.reshape(cache[i].shape)
    return tuple(out)
