"""Pallas fused single-token cross-attention for the decode loop.

The decode step's dominant HBM traffic is re-reading the full encoder-memory
K/V every token (SURVEY.md §3.2). The XLA path pays extra on quantized K/V:
dequantizing int8 materializes a bf16 copy (int8 read + bf16 write + bf16
read — *more* traffic than dense). This kernel streams K/V tiles HBM->VMEM
once, converts int8->f32 in registers, and keeps the online-softmax state in
scratch — the only HBM traffic is the int8 (or bf16) tensors themselves.

Layout: K and V ride TRANSPOSED as (batch, heads, head_dim, kv_len) so tiles
are (heads*head_dim, block_t) — lane dim = time, a multiple of 128, full-width
vector loads for d_head=64 models (a (T, 64) layout would waste half the
lanes). One program handles ALL heads of one batch row, so each grid step
DMAs heads*head_dim*block_t bytes (~0.5-1 MB) — big enough to hit peak HBM
bandwidth. Scales fold exactly outside the kernel:
``scores = (q * k_scale) @ kT_q`` and ``out = (p @ vT_q^T) * v_scale``.

Grid: (batch, kv tiles); the kv-tile axis is the minor sequential grid dim,
so pallas double-buffers the K/V tile DMAs against compute.

int4 mode (``packed_int4=True``): K/V ride as two 4-bit values per int8 byte
— HALF the HBM traffic of int8 on the decode loop's dominant term. jax's
native int4 dtype currently fails dispatch (RecursionError, round-1 note), so
the packing is explicit — along the HEAD_DIM axis: byte (h, i, t) of the
packed (..., heads, head_dim/2, T) tensor holds channel ``i`` in its low
nibble and channel ``i + head_dim/2`` in its high nibble (``pack_int4``).
Packing along head_dim (a sublane axis) leaves the lane/time axis untouched,
so XLA fuses quantize+pack into ONE pass over the dense K/V; the original
time-tile packing forced ~74 ms of lane-retiling reshapes per medium/batch-32
decode session (profiled round 2). The kernel sign-extends both nibbles with
shifts in registers and splits q / concatenates the output along head_dim.
Scales still fold outside, exactly as int8.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_T = 512
NEG_INF = -1e30


def pack_int4(q4: jax.Array) -> jax.Array:
    """Pack int4 values (int8 in [-7, 7], axis -2 = head_dim, even length)
    two-per-byte along HEAD_DIM: byte (..., i, t) = (channel ``i`` low
    nibble) | (channel ``i + d/2`` high nibble). Returns int8 of shape
    (..., head_dim // 2, T).

    Packing along a sublane axis leaves the lane/time axis untouched, so
    this is two strided views + shift/or — XLA fuses it straight into the
    quantization pass (no lane-retiling reshapes; see module docstring).
    Stays entirely in int8 arithmetic — ``hi << 4`` wraps to exactly the
    byte we want in two's complement."""
    d = q4.shape[-2]
    assert d % 2 == 0, d
    half = d // 2
    v = q4.astype(jnp.int8)
    lo = jax.lax.slice_in_dim(v, 0, half, axis=v.ndim - 2)
    hi = jax.lax.slice_in_dim(v, half, d, axis=v.ndim - 2)
    return jnp.left_shift(hi, 4) | (lo & jnp.int8(0xF))


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Inverse of ``pack_int4`` (XLA path, used by tests and any quantized
    multi-token attention). Returns int32 in [-8, 7], head_dim restored on
    axis -2."""
    w = packed.astype(jnp.int32)
    lo = jnp.left_shift(w, 28) >> 28  # sign-extended low nibble
    hi = jnp.left_shift(w, 24) >> 28
    return jnp.concatenate([lo, hi], axis=w.ndim - 2)


def _kernel(
    meta_ref,  # (3,) int32 scalar-prefetch: [layer, true kv length, chunks]
    q_ref,  # (h, d) f32
    kt_ref,  # (h, d, block_t) int8/bf16/f32
    vt_ref,  # (h, d, block_t)
    *refs,  # o [, ms, ls], then scratch m, l, acc
    block_t: int,
    packed: bool = False,
    with_state: bool = False,
):
    if with_state:
        o_ref, ms_ref, ls_ref, m_ref, l_ref, acc_ref = refs
    else:
        o_ref, m_ref, l_ref, acc_ref = refs
    j = pl.program_id(1)
    h, d = q_ref.shape

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def unpack(w):  # (h, d/2, bt) int8 -> 2x (h, d/2, bt) f32 nibbles
        w = w.astype(jnp.int32)
        lo = jnp.left_shift(w, 28) >> 28
        hi = jnp.left_shift(w, 24) >> 28
        return lo.astype(jnp.float32), hi.astype(jnp.float32)

    q = q_ref[:].astype(jnp.float32)  # (h, d)
    # batched over heads on the VPU (Mosaic rejects dot_general with no lhs
    # non-contracting dim; the kernel is BW-bound so VPU reduce is free):
    # s[h, t] = sum_d q[h, d] * kt[h, d, t]
    if packed:
        # head_dim-packed nibbles: low = channels [:d/2], high = [d/2:]
        half = d // 2
        k_lo, k_hi = unpack(kt_ref[:])
        q_lo = jnp.expand_dims(jax.lax.slice_in_dim(q, 0, half, axis=1), 2)
        q_hi = jnp.expand_dims(jax.lax.slice_in_dim(q, half, d, axis=1), 2)
        s = jnp.sum(k_lo * q_lo, axis=1) + jnp.sum(k_hi * q_hi, axis=1)
    else:
        kt = kt_ref[:].astype(jnp.float32)  # (h, d, bt)
        s = jnp.sum(kt * q[:, :, None], axis=1)  # (h, bt)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_t
    s = jnp.where(col < meta_ref[1], s, NEG_INF)

    m_prev = m_ref[:]  # (h, 1)
    l_prev = l_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)  # (h, bt)
    alpha = jnp.exp(m_prev - m_new)  # (h, 1)
    # out[h, d] = sum_t p[h, t] * vt[h, d, t]
    if packed:
        # nibbles are head_dim halves: weight both with the same p, then
        # reassemble the output channels by concatenation along d
        v_lo, v_hi = unpack(vt_ref[:])
        pw = p[:, None, :]
        pv = jnp.concatenate(
            [jnp.sum(v_lo * pw, axis=2), jnp.sum(v_hi * pw, axis=2)], axis=1
        )  # (h, d)
    else:
        vt = vt_ref[:].astype(jnp.float32)  # (h, d, bt)
        pv = jnp.sum(vt * p[:, None, :], axis=2)  # (h, d)
    m_ref[:] = m_new
    l_ref[:] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(j == meta_ref[2] - 1)
    def _():
        o_ref[:] = (
            acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
        ).astype(o_ref.dtype)
        if with_state:
            ms_ref[:] = m_ref[:]
            ls_ref[:] = l_ref[:]


def _kernel_grouped(
    meta_ref,  # (3,) int32 scalar-prefetch: [layer, true kv length, chunks]
    q_ref,  # (h, g, d) f32 — g beam queries per head, shared K/V
    kt_ref,  # (h, d[/2], block_t) int8/bf16/f32
    vt_ref,  # (h, d[/2], block_t)
    *refs,  # o [, ms, ls], then scratch m, l, acc
    block_t: int,
    packed: bool = False,
    with_state: bool = False,
):
    """Beam-grouped variant of ``_kernel``: one program attends ``g`` query
    rows (the beams of one utterance) against a SINGLE K/V read — the
    decode loop's dominant HBM term does not scale with the beam width.

    The per-tile contractions run as head-batched ``dot_general`` on the
    MXU (M = g gives the lhs a real non-contracting dim, unlike the M = 1
    case Mosaic rejects); the online-softmax state is kept flattened as
    (h*g, 1) rows exactly like the ungrouped kernel.

    **Precision**: a default-precision f32 dot on the MXU truncates both
    operands to ONE bf16 pass. The K/V side is exact (int4/int8 values are
    small integers, bf16-representable), but q (after scale folding) and
    the softmax weights p lose mantissa below 2^-8 relative. A hi/lo
    bf16-split variant recovering ~f32 dots was built and measured on-chip:
    8.39 ms vs 6.52 ms (this kernel) vs 7.4 ms (VPU ``_kernel``) per
    medium/b64/int4 24-layer token step — the in-kernel split/concat
    relayouts cost more than the exact mantissa is worth, given the int4/
    int8 quantization error this serving path already carries (~3-6% on
    K/V values, vs ~0.4% here). Shipped: truncated dots, deviation
    documented (docs/KERNELS.md §7); ``mxu=False`` on the wrapper is the
    full-precision escape hatch for the ungrouped path.
    """
    if with_state:
        o_ref, ms_ref, ls_ref, m_ref, l_ref, acc_ref = refs
    else:
        o_ref, m_ref, l_ref, acc_ref = refs
    j = pl.program_id(1)
    h, g, d = q_ref.shape

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def unpack(w):  # (h, d/2, bt) int8 -> 2x (h, d/2, bt) f32 nibbles
        w = w.astype(jnp.int32)
        lo = jnp.left_shift(w, 28) >> 28
        hi = jnp.left_shift(w, 24) >> 28
        return lo.astype(jnp.float32), hi.astype(jnp.float32)

    def bdot_qk(qg, kt):  # (h, g, dd) x (h, dd, bt) -> (h, g, bt)
        return jax.lax.dot_general(
            qg, kt, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    def bdot_pv(p3, vt):  # (h, g, bt) x (h, dd, bt) -> (h, g, dd)
        return jax.lax.dot_general(
            p3, vt, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    q = q_ref[:].astype(jnp.float32)  # (h, g, d)
    if packed:
        half = d // 2
        k_lo, k_hi = unpack(kt_ref[:])
        q_lo = jax.lax.slice_in_dim(q, 0, half, axis=2)
        q_hi = jax.lax.slice_in_dim(q, half, d, axis=2)
        s = bdot_qk(q_lo, k_lo) + bdot_qk(q_hi, k_hi)  # (h, g, bt)
    else:
        s = bdot_qk(q, kt_ref[:].astype(jnp.float32))
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2) + j * block_t
    s = jnp.where(col < meta_ref[1], s, NEG_INF)
    s2 = s.reshape(h * g, s.shape[-1])

    m_prev = m_ref[:]  # (h*g, 1)
    l_prev = l_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s2, axis=-1, keepdims=True))
    p = jnp.exp(s2 - m_new)  # (h*g, bt)
    alpha = jnp.exp(m_prev - m_new)
    p3 = p.reshape(h, g, p.shape[-1])
    if packed:
        v_lo, v_hi = unpack(vt_ref[:])
        pv = jnp.concatenate(
            [bdot_pv(p3, v_lo), bdot_pv(p3, v_hi)], axis=2
        )  # (h, g, d)
    else:
        pv = bdot_pv(p3, vt_ref[:].astype(jnp.float32))
    m_ref[:] = m_new
    l_ref[:] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + pv.reshape(h * g, d)

    @pl.when(j == meta_ref[2] - 1)
    def _():
        o_ref[:] = (
            acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
        ).reshape(h, g, d).astype(o_ref.dtype)
        if with_state:
            ms_ref[:] = m_ref[:]
            ls_ref[:] = l_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_t", "interpret", "packed_int4", "group", "mxu",
        "dynamic_grid", "return_state",
    ),
)
def decode_cross_attention(
    q: jax.Array,  # (batch, heads, head_dim); (batch, heads, group, head_dim) if group > 1
    kt: jax.Array,  # (batch, heads, head_dim, T) int8/bf16/f32, T % block
    vt: jax.Array,  # (batch, heads, head_dim, T)
    k_scale: Optional[jax.Array] = None,  # (batch, heads, head_dim)
    v_scale: Optional[jax.Array] = None,
    kv_len: Optional[jax.Array] = None,  # scalar int32 true length <= T
    layer_idx: Optional[jax.Array] = None,  # scalar int32, stacked kt/vt
    block_t: int = DEFAULT_BLOCK_T,
    interpret: bool = False,
    packed_int4: bool = False,
    group: int = 1,  # beam queries per K/V row (beam search shares K/V)
    mxu: bool = True,  # group=1: ride the grouped MXU kernel via a dup row
    dynamic_grid: bool = False,  # grid bound = traced ceil(kv_len/block_t)
    return_state: bool = False,  # also return the online-softmax (m, l)
) -> jax.Array:
    """Softmax(q·K/sqrt(d)) @ V for one query position. Returns
    (batch, heads, head_dim) in q.dtype.

    ``kt``/``vt`` should already be padded to a multiple of ``block_t`` (pad
    once at quantization time, not per decode step) with ``kv_len`` marking
    the true length; unpadded inputs are padded here as a fallback.

    ``packed_int4=True``: kt/vt are int8 holding two 4-bit values per byte in
    ``pack_int4`` layout, shape (batch, heads, head_dim // 2, T) with T
    already a multiple of ``block_t`` (pad once at quantization time; no
    fallback padding here).

    **Stacked-layer mode** (``kt.ndim == 5`` + ``layer_idx``): kt/vt carry a
    leading LAYER axis, (layers, batch, heads, head_dim, T[/2]), and the
    kernel's index_map picks ``layer_idx``'s slab via scalar prefetch. This
    exists because peeling the per-layer K/V as ``nn.scan`` xs makes XLA
    dynamic-slice-COPY each layer's tensor inside the token loop — measured
    ~1.7 ms/step at medium/batch 32/int4, i.e. the decode loop's dominant
    HBM term was being read twice (profiled round 2). Indexing inside the
    kernel reads each tile exactly once, straight from the stacked tensor.

    **Beam-grouped mode** (``group > 1``): ``q`` is (batch, heads, group,
    head_dim) — the ``group`` beams of each utterance attend the SAME
    encoder memory (the reference broadcasts the prompt/memory across beams,
    whisper_decoder.py:330-332), so one program reads each K/V tile once for
    all beams instead of the naive beam-expanded layout reading it ``group``
    times. Returns (batch, heads, group, head_dim); scales fold outside
    exactly as in the ungrouped path.

    ``mxu=True`` (default) routes ``group == 1`` through the grouped kernel
    with the query row DUPLICATED to g = 2: M = 2 gives the per-tile
    contractions a real lhs non-contracting dim, so they run as
    head-batched MXU ``dot_general`` instead of the >=3-VPU-ops-per-element
    multiply-reduce of ``_kernel``, and the K/V tile read — the term the
    kernel is bound by — is unchanged (the duplicate row rides the lhs,
    which is tiny). Measured medium/b64/int4: 7.38 -> 6.52 ms per 24-layer
    token step, +5% end-to-end greedy RTF. The MXU dots truncate q/p to one
    bf16 pass (see ``_kernel_grouped``); interpret-mode tests pin equality
    with the VPU kernel exactly, on-chip the ~2^-8 relative score error is
    dominated by the quantized K/V this path carries. ``mxu=False`` keeps
    the full-f32 VPU kernel.
    """
    squeeze_g = group == 1 and mxu
    if squeeze_g:
        b, h, d = q.shape
        q = jnp.concatenate([q[:, :, None, :]] * 2, axis=2)  # (b, h, 2, d)
        group = 2
    elif group > 1:
        b, h, gq, d = q.shape
        assert gq == group, (q.shape, group)
    else:
        b, h, d = q.shape
    stacked = kt.ndim == 5
    assert stacked == (layer_idx is not None), (kt.shape, layer_idx)
    if packed_int4:
        t_pad = kt.shape[-1]
        assert t_pad % block_t == 0, (t_pad, block_t)
        assert kt.shape[-2] == d // 2, (kt.shape, d)
    else:
        t_in = kt.shape[-1]
        block_t = min(block_t, max(128, t_in))

    qs = q.astype(jnp.float32) * (d**-0.5)
    if k_scale is not None:
        ks = k_scale.astype(jnp.float32)
        qs = qs * (ks[:, :, None, :] if group > 1 else ks)

    if not packed_int4:
        pad = (-t_in) % block_t
        if pad:
            widths = [(0, 0)] * (kt.ndim - 1) + [(0, pad)]
            kt = jnp.pad(kt, widths)
            vt = jnp.pad(vt, widths)
        t_pad = t_in + pad
    if kv_len is None:
        kv_len = t_pad if packed_int4 else t_in
    n_chunks = t_pad // block_t
    if dynamic_grid:
        # only the chunks holding live positions run (and are DMA'd): the
        # growing self-KV cache is mostly padding early in a decode session
        live = jnp.clip(
            (jnp.asarray(kv_len, jnp.int32) + block_t - 1) // block_t,
            1, n_chunks,
        )
    else:
        live = jnp.int32(n_chunks)
    meta = jnp.stack(
        [
            jnp.asarray(0 if layer_idx is None else layer_idx, jnp.int32),
            jnp.asarray(kv_len, jnp.int32),
            live,
        ]
    )

    dd = d // 2 if packed_int4 else d  # head_dim of the stored tensor
    if stacked:
        kv_spec = pl.BlockSpec(
            (None, None, h, dd, block_t), lambda i, j, m: (m[0], i, 0, 0, j)
        )
    else:
        kv_spec = pl.BlockSpec(
            (None, h, dd, block_t), lambda i, j, m: (i, 0, 0, j)
        )
    if group > 1:
        q_spec = pl.BlockSpec(
            (None, h, group, d), lambda i, j, m: (i, 0, 0, 0)
        )
        out_shape = (b, h, group, d)
        rows = h * group
        kernel = functools.partial(
            _kernel_grouped, block_t=block_t, packed=packed_int4,
            with_state=return_state,
        )
    else:
        q_spec = pl.BlockSpec((None, h, d), lambda i, j, m: (i, 0, 0))
        out_shape = (b, h, d)
        rows = h
        kernel = functools.partial(
            _kernel, block_t=block_t, packed=packed_int4,
            with_state=return_state,
        )
    out_specs = [q_spec]
    # when the caller merges further terms (the self-KV new token), the
    # attended output rides out in f32 so the merge is exact
    out_shapes = [
        jax.ShapeDtypeStruct(
            out_shape, jnp.float32 if return_state else q.dtype
        )
    ]
    if return_state:
        assert k_scale is None and v_scale is None, (
            "return_state is for the dense (unscaled) self-KV path; fold "
            "scales outside after the merge instead"
        )
        st_spec = pl.BlockSpec((None, rows, 1), lambda i, j, m: (i, 0, 0))
        out_specs += [st_spec, st_spec]
        out_shapes += [jax.ShapeDtypeStruct((b, rows, 1), jnp.float32)] * 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, live) if dynamic_grid else (b, n_chunks),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=out_specs if return_state else out_specs[0],
        scratch_shapes=[
            pltpu.VMEM((rows, 1), jnp.float32),
            pltpu.VMEM((rows, 1), jnp.float32),
            pltpu.VMEM((rows, d), jnp.float32),
        ],
    )
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes if return_state else out_shapes[0],
        interpret=interpret,
    )(meta, qs, kt, vt)
    out, state = (res[0], res[1:]) if return_state else (res, ())

    if squeeze_g:
        out = out[:, :, 0]  # back to the ungrouped (b, h, d) layout
    if v_scale is not None:
        vs = v_scale.astype(jnp.float32)
        if group > 1 and not squeeze_g:
            vs = vs[:, :, None, :]
        out = (out.astype(jnp.float32) * vs).astype(q.dtype)
    if return_state:
        # (b, rows, 1) -> (b, h[, g]); the dup route's two rows are
        # identical — return the first
        m_st, l_st = (
            x.reshape(b, h, -1)[:, :, 0] if (squeeze_g or group == 1)
            else x.reshape(b, h, group)
            for x in state
        )
        return out, m_st, l_st
    return out
