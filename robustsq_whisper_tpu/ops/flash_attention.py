"""Pallas flash attention for TPU: fused, tiled, online-softmax attention.

Replaces the materialized (batch, heads, q, kv) score tensor of the XLA
fallback (ops/attention.py) for the encoder's long self-attention
(q = kv = prompt+1500 frames): scores never leave VMEM, HBM traffic drops
from O(q·kv) to O(q+kv), and both contractions hit the MXU per tile.

Design (pallas_guide.md patterns):
- grid over (batch*heads, q tiles); K/V streamed tile-by-tile with an
  fori_loop of MXU matmuls, fp32 running max/denominator (online softmax),
- block sizes 128/256 aligned to MXU tiles; arrays are NOT padded — partial
  trailing blocks are masked in-kernel with iota row/col guards,
- optional additive mask folded in per tile (used for causal/padding).

Differentiable: a ``jax.custom_vjp`` supplies the flash backward — the
forward additionally writes the per-row log-sum-exp, and two backward
kernels recompute probabilities tile-by-tile to accumulate dQ (pass over kv
tiles) and dK/dV (pass over q tiles) without ever materializing the
(q, kv) score tensor. Training therefore runs the Pallas kernel end-to-end
(encoder hot loop, SURVEY.md §3.1).

``flash_attention`` is a drop-in for ``dot_product_attention`` under the
same (batch, len, heads, head_dim) layout, used when ``use_flash=True`` and
shapes qualify; the XLA path remains the numerics oracle in tests.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 1536
NEG_INF = -1e30


def _attn_kernel(
    q_ref,  # (block_q, head_dim)
    k_ref,  # (block_k, head_dim) — one kv tile per grid step
    v_ref,  # (block_k, head_dim)
    mask_ref,  # (block_q, block_k) additive fp32, or None
    o_ref,  # (block_q, head_dim)
    lse_ref,  # (block_q, 1) f32 log-sum-exp (saved for the backward)
    m_sc,  # scratch (block_q, 1) f32
    l_sc,  # scratch (block_q, 1) f32
    acc_sc,  # scratch (block_q, head_dim) f32
    *,
    scale: float,
    block_k: int,
    kv_len: int,
    kv_axis: int = 2,  # grid axis of the kv tiles (3 for the 4D-block grid)
):
    j = pl.program_id(kv_axis)
    nj = pl.num_programs(kv_axis)

    @pl.when(j == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, NEG_INF)
        l_sc[:] = jnp.zeros_like(l_sc)
        acc_sc[:] = jnp.zeros_like(acc_sc)

    q = q_ref[:].astype(jnp.float32) * scale
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    # zero the ragged kv tail of V: its rows are uninitialized (NaN in
    # interpret mode) and even a 0-weighted NaN poisons the p@V accumulate
    row = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0) + j * block_k
    v = jnp.where(row < kv_len, v, 0.0)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, block_k)
    if mask_ref is not None:
        s = s + mask_ref[:].astype(jnp.float32)
    # mask the ragged kv tail LAST (arrays are NOT padded by the wrapper —
    # per-call padding would copy the whole K/V; also the tail of a partial
    # mask block is uninitialized, so it must be overridden here)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
    s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev, l_prev = m_sc[:], l_sc[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    m_sc[:] = m_new
    l_sc[:] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_sc[:] = acc_sc[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(j == nj - 1)
    def _():
        l_final = jnp.maximum(l_sc[:], 1e-30)
        o_ref[:] = (acc_sc[:] / l_final).astype(o_ref.dtype)
        lse_ref[:] = m_sc[:] + jnp.log(l_final)


def _mask_bh(mask, b, h, q_len, kv_len):
    if mask is None:
        return None
    mask4 = jnp.broadcast_to(mask.astype(jnp.float32), (b, h, q_len, kv_len))
    return mask4.reshape(b * h, q_len, kv_len)


def _fwd_impl(q, k, v, mask, block_q, block_k, interpret):
    b, q_len, h, d = q.shape
    kv_len = k.shape[1]
    scale = d**-0.5
    out_dtype = q.dtype

    block_q = min(block_q, max(q_len, 8))
    block_k = min(block_k, max(kv_len, 128))

    # (b*h, len, d) layout; NO padding — partial trailing blocks are handled
    # by pallas block masking + the in-kernel iota column mask.
    def bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qb, kb, vb = bh(q), bh(k), bh(v)
    nq, nk = pl.cdiv(q_len, block_q), pl.cdiv(kv_len, block_k)
    mask_b = _mask_bh(mask, b, h, q_len, kv_len)

    kernel = functools.partial(
        _attn_kernel, scale=scale, block_k=block_k, kv_len=kv_len
    )
    grid = (b * h, nq, nk)
    in_specs = [
        pl.BlockSpec((None, block_q, d), lambda i, qi, ki: (i, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, block_k, d), lambda i, qi, ki: (i, ki, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, block_k, d), lambda i, qi, ki: (i, ki, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qb, kb, vb]
    if mask_b is not None:
        in_specs.append(
            pl.BlockSpec(
                (None, block_q, block_k), lambda i, qi, ki: (i, qi, ki),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(mask_b)

    if mask_b is None:
        def body(q_ref, k_ref, v_ref, o_ref, lse_ref, m_sc, l_sc, acc_sc):
            kernel(q_ref, k_ref, v_ref, None, o_ref, lse_ref, m_sc, l_sc, acc_sc)
    else:
        def body(q_ref, k_ref, v_ref, mk_ref, o_ref, lse_ref, m_sc, l_sc, acc_sc):
            kernel(q_ref, k_ref, v_ref, mk_ref, o_ref, lse_ref, m_sc, l_sc, acc_sc)

    out, lse = pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, qi, ki: (i, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_q, 1), lambda i, qi, ki: (i, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, q_len, d), out_dtype),
            jax.ShapeDtypeStruct((b * h, q_len, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(*args)

    return out.reshape(b, h, q_len, d).transpose(0, 2, 1, 3), lse


def _recompute_p_ds(q, k, v, do, lse, delta, mask_tile, *, scale,
                    q_off, kv_off, q_len, kv_len):
    """Shared backward tile math: returns (p, ds) fp32 (block_q, block_k),
    with ragged rows/cols hard-zeroed (uninitialized block tails would
    otherwise poison the accumulates)."""
    row_valid = (
        jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], k.shape[0]), 0)
        + q_off
    ) < q_len
    col_valid = (
        jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], k.shape[0]), 1)
        + kv_off
    ) < kv_len
    # sanitize ragged-row lse/delta (uninitialized tails would turn the
    # 0-weighted products below into NaN)
    rv1 = (
        jax.lax.broadcasted_iota(jnp.int32, lse.shape, 0) + q_off
    ) < q_len
    lse = jnp.where(rv1, lse, 0.0)
    delta = jnp.where(rv1, delta, 0.0)
    s = scale * jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if mask_tile is not None:
        s = s + mask_tile.astype(jnp.float32)
    s = jnp.where(row_valid & col_valid, s - lse, NEG_INF)
    p = jnp.exp(s)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta) * scale
    return p, ds


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, mask_ref,
    dq_ref, dq_sc, *, scale, block_q, block_k, q_len, kv_len,
):
    qi, ki = pl.program_id(1), pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        dq_sc[:] = jnp.zeros_like(dq_sc)

    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    do = do_ref[:].astype(jnp.float32)
    # zero uninitialized ragged tails that enter matmuls directly
    krow = jax.lax.broadcasted_iota(jnp.int32, k.shape, 0) + ki * block_k
    k = jnp.where(krow < kv_len, k, 0.0)
    v = jnp.where(krow < kv_len, v, 0.0)

    _, ds = _recompute_p_ds(
        q, k, v, do, lse_ref[:], delta_ref[:],
        mask_ref[:] if mask_ref is not None else None,
        scale=scale, q_off=qi * block_q, kv_off=ki * block_k,
        q_len=q_len, kv_len=kv_len,
    )
    dq_sc[:] = dq_sc[:] + jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ki == nk - 1)
    def _():
        dq_ref[:] = dq_sc[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, mask_ref,
    dk_ref, dv_ref, dk_sc, dv_sc, *, scale, block_q, block_k, q_len, kv_len,
):
    ki, qi = pl.program_id(1), pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _():
        dk_sc[:] = jnp.zeros_like(dk_sc)
        dv_sc[:] = jnp.zeros_like(dv_sc)

    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    do = do_ref[:].astype(jnp.float32)
    qrow = jax.lax.broadcasted_iota(jnp.int32, q.shape, 0) + qi * block_q
    q = jnp.where(qrow < q_len, q, 0.0)
    do = jnp.where(qrow < q_len, do, 0.0)
    krow = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0) + ki * block_k
    v = jnp.where(krow < kv_len, v, 0.0)

    p, ds = _recompute_p_ds(
        q, k, v, do, lse_ref[:], delta_ref[:],
        mask_ref[:] if mask_ref is not None else None,
        scale=scale, q_off=qi * block_q, kv_off=ki * block_k,
        q_len=q_len, kv_len=kv_len,
    )
    dv_sc[:] = dv_sc[:] + jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dk_sc[:] = dk_sc[:] + jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(qi == nq - 1)
    def _():
        dk_ref[:] = dk_sc[:].astype(dk_ref.dtype)
        dv_ref[:] = dv_sc[:].astype(dv_ref.dtype)


def _bwd_impl(q, k, v, mask, out, lse, g, block_q, block_k, interpret):
    b, q_len, h, d = q.shape
    kv_len = k.shape[1]
    scale = d**-0.5

    block_q = min(block_q, max(q_len, 8))
    block_k = min(block_k, max(kv_len, 128))

    def bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qb, kb, vb = bh(q), bh(k), bh(v)
    dob = bh(g.astype(q.dtype))
    outb = bh(out)
    # delta_i = sum_d dO_i . O_i   (rewrites sum_j dS_ij p_ij without S)
    delta = jnp.sum(
        dob.astype(jnp.float32) * outb.astype(jnp.float32),
        axis=-1, keepdims=True,
    )  # (b*h, q_len, 1)
    mask_b = _mask_bh(mask, b, h, q_len, kv_len)
    nq, nk = pl.cdiv(q_len, block_q), pl.cdiv(kv_len, block_k)

    q_spec = lambda im: pl.BlockSpec((None, block_q, d), im, memory_space=pltpu.VMEM)
    k_spec = lambda im: pl.BlockSpec((None, block_k, d), im, memory_space=pltpu.VMEM)
    r_spec = lambda im: pl.BlockSpec((None, block_q, 1), im, memory_space=pltpu.VMEM)

    # ---- dQ: grid (bh, nq, nk), accumulate over kv tiles ----
    in_specs = [
        q_spec(lambda i, qi, ki: (i, qi, 0)),
        k_spec(lambda i, qi, ki: (i, ki, 0)),
        k_spec(lambda i, qi, ki: (i, ki, 0)),
        q_spec(lambda i, qi, ki: (i, qi, 0)),
        r_spec(lambda i, qi, ki: (i, qi, 0)),
        r_spec(lambda i, qi, ki: (i, qi, 0)),
    ]
    args = [qb, kb, vb, dob, lse, delta]
    kern = functools.partial(
        _bwd_dq_kernel, scale=scale, block_q=block_q, block_k=block_k,
        q_len=q_len, kv_len=kv_len,
    )
    if mask_b is not None:
        in_specs.append(pl.BlockSpec(
            (None, block_q, block_k), lambda i, qi, ki: (i, qi, ki),
            memory_space=pltpu.VMEM,
        ))
        args.append(mask_b)
        body = kern
    else:
        def body(q_r, k_r, v_r, do_r, l_r, de_r, dq_r, dq_sc):
            kern(q_r, k_r, v_r, do_r, l_r, de_r, None, dq_r, dq_sc)

    dq = pl.pallas_call(
        body,
        grid=(b * h, nq, nk),
        in_specs=in_specs,
        out_specs=q_spec(lambda i, qi, ki: (i, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, q_len, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
    )(*args)

    # ---- dK/dV: grid (bh, nk, nq), accumulate over q tiles ----
    in_specs = [
        q_spec(lambda i, ki, qi: (i, qi, 0)),
        k_spec(lambda i, ki, qi: (i, ki, 0)),
        k_spec(lambda i, ki, qi: (i, ki, 0)),
        q_spec(lambda i, ki, qi: (i, qi, 0)),
        r_spec(lambda i, ki, qi: (i, qi, 0)),
        r_spec(lambda i, ki, qi: (i, qi, 0)),
    ]
    args = [qb, kb, vb, dob, lse, delta]
    kern = functools.partial(
        _bwd_dkv_kernel, scale=scale, block_q=block_q, block_k=block_k,
        q_len=q_len, kv_len=kv_len,
    )
    if mask_b is not None:
        in_specs.append(pl.BlockSpec(
            (None, block_q, block_k), lambda i, ki, qi: (i, qi, ki),
            memory_space=pltpu.VMEM,
        ))
        args.append(mask_b)
        body = kern
    else:
        def body(q_r, k_r, v_r, do_r, l_r, de_r, dk_r, dv_r, dk_sc, dv_sc):
            kern(q_r, k_r, v_r, do_r, l_r, de_r, None, dk_r, dv_r, dk_sc, dv_sc)

    dk, dv = pl.pallas_call(
        body,
        grid=(b * h, nk, nq),
        in_specs=in_specs,
        out_specs=[
            k_spec(lambda i, ki, qi: (i, ki, 0)),
            k_spec(lambda i, ki, qi: (i, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, kv_len, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, kv_len, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=interpret,
    )(*args)

    def unbh(x, length):
        return x.reshape(b, h, length, d).transpose(0, 2, 1, 3)

    return unbh(dq, q_len), unbh(dk, kv_len), unbh(dv, kv_len)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _flash(block_q, block_k, interpret, q, k, v, mask):
    out, _ = _fwd_impl(q, k, v, mask, block_q, block_k, interpret)
    return out


def _flash_fwd(block_q, block_k, interpret, q, k, v, mask):
    out, lse = _fwd_impl(q, k, v, mask, block_q, block_k, interpret)
    return out, (q, k, v, mask, out, lse)


def _flash_bwd(block_q, block_k, interpret, res, g):
    q, k, v, mask, out, lse = res
    dq, dk, dv = _bwd_impl(
        q, k, v, mask, out, lse, g, block_q, block_k, interpret
    )
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dq, dk, dv, dmask


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,  # (batch, q_len, heads, head_dim)
    k: jax.Array,  # (batch, kv_len, heads, head_dim)
    v: jax.Array,
    mask: Optional[jax.Array] = None,  # additive, bcast (batch, heads, q, kv)
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jax.Array:
    """Differentiable flash attention (forward + flash backward)."""
    return _flash(block_q, block_k, interpret, q, k, v, mask)


def _attn_kernel_tmaj(
    q_ref,  # (head_dim, block_q) — lanes are TIME, sublanes are channels
    k_ref,  # (head_dim, block_k)
    v_ref,  # (head_dim, block_k)
    o_ref,  # (head_dim, block_q)
    m_sc,  # scratch (1, block_q) f32 running max
    l_sc,  # scratch (1, block_q) f32 running denominator
    acc_sc,  # scratch (head_dim, block_q) f32
    *,
    scale: float,
    block_k: int,
    kv_len: int,
):
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, NEG_INF)
        l_sc[:] = jnp.zeros_like(l_sc)
        acc_sc[:] = jnp.zeros_like(acc_sc)

    q = q_ref[:].astype(jnp.float32) * scale
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    # zero the ragged kv tail of V (kv positions are COLUMNS here); a
    # 0-weighted uninitialized row still poisons the v @ p accumulate
    col_v = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1) + j * block_k
    v = jnp.where(col_v < kv_len, v, 0.0)
    # transposed score matrix: rows are kv positions, columns are queries
    s = jax.lax.dot_general(
        k, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_k, block_q)
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + j * block_k
    s = jnp.where(row < kv_len, s, NEG_INF)

    m_prev, l_prev = m_sc[:], l_sc[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    m_sc[:] = m_new
    l_sc[:] = l_prev * alpha + jnp.sum(p, axis=0, keepdims=True)
    acc_sc[:] = acc_sc[:] * alpha + jax.lax.dot_general(
        v, p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (head_dim, block_q)

    @pl.when(j == nj - 1)
    def _():
        o_ref[:] = (acc_sc[:] / jnp.maximum(l_sc[:], 1e-30)).astype(o_ref.dtype)


def _tmaj_fwd_impl(q, k, v, block_q, block_k, interpret):
    bh, d, t = q.shape
    block_q = min(block_q, max(t, 128))
    block_k = min(block_k, max(t, 128))
    nq, nk = pl.cdiv(t, block_q), pl.cdiv(t, block_k)
    kernel = functools.partial(
        _attn_kernel_tmaj, scale=d**-0.5, block_k=block_k, kv_len=t
    )
    return pl.pallas_call(
        kernel,
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((None, d, block_q), lambda i, qi, ki: (i, 0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, d, block_k), lambda i, qi, ki: (i, 0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, d, block_k), lambda i, qi, ki: (i, 0, ki),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, d, block_q), lambda i, qi, ki: (i, 0, qi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, d, t), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, block_q), jnp.float32),
            pltpu.VMEM((1, block_q), jnp.float32),
            pltpu.VMEM((d, block_q), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _flash_tmaj(block_q, block_k, interpret, q, k, v):
    return _tmaj_fwd_impl(q, k, v, block_q, block_k, interpret)


def _flash_tmaj_fwd(block_q, block_k, interpret, q, k, v):
    return _tmaj_fwd_impl(q, k, v, block_q, block_k, interpret), (q, k, v)


def _flash_tmaj_bwd(block_q, block_k, interpret, res, g):
    # Fallback backward: transpose to the row-major layout (bh as batch,
    # one head) and differentiate through the row-major flash VJP. Pays a
    # forward recompute + six transposes — training configs default to the
    # row-major route; this exists so a decode-tuned config with
    # flash_tmaj=True still trains correctly instead of failing to trace.
    q, k, v = res
    rm = lambda z: z.transpose(0, 2, 1)[:, :, None, :]  # (bh, t, 1, d)
    _, vjp = jax.vjp(
        lambda a, b, c: _flash(block_q, block_k, interpret, a, b, c, None),
        rm(q), rm(k), rm(v),
    )
    dq, dk, dv = vjp(rm(g))
    tm = lambda z: z[:, :, 0, :].transpose(0, 2, 1)
    return tm(dq), tm(dk), tm(dv)


_flash_tmaj.defvjp(_flash_tmaj_fwd, _flash_tmaj_bwd)


def flash_attention_tmaj(
    q: jax.Array,  # (batch*heads, head_dim, seq) — transposed layout
    k: jax.Array,
    v: jax.Array,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention in the TRANSPOSED (bh, head_dim, T) layout: lanes
    are time, sublanes are channels, the score matrix is (kv, q).

    Why it exists: the row-major kernel above forces its producers into
    (b*h, T, d) — four (b, T, n_state) <-> head-split transposes per encoder
    layer, ~4.9 ms/layer at medium batch 64 (KERNELS.md §8: "the wrapper
    transposes"). In this layout the q/k/v projections emit (b, n_state, T)
    DIRECTLY (the transpose fuses into the projection dot's output layout)
    and the head split/merge around the kernel is a free major-axis reshape.
    Measured on chip (medium layer shapes, b64): hybrid encoder layer
    24.96 ms vs 28.49 ms row-major — the §8 estimate realized without the
    full channels-major residual-stream rewrite.

    Same math as ``flash_attention`` (scale inside, f32 online softmax,
    ragged tails masked in-kernel, no wrapper padding). Differentiable via
    a fallback VJP that routes the backward through the row-major flash
    kernels (extra transposes + a forward recompute) — correct under grad,
    but training configs should keep the row-major route for speed.
    """
    return _flash_tmaj(block_q, block_k, interpret, q, k, v)
