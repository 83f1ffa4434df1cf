"""Pallas flash attention for TPU: fused, tiled, online-softmax attention.

Replaces the materialized (batch, heads, q, kv) score tensor of the XLA
fallback (ops/attention.py) for the encoder's long self-attention
(q = kv = prompt+1500 frames): scores never leave VMEM, HBM traffic drops
from O(q·kv) to O(q+kv), and both contractions hit the MXU per tile.

Design (pallas_guide.md patterns):
- grid over (batch*heads, q tiles); K/V streamed tile-by-tile with an
  fori_loop of MXU matmuls, fp32 running max/denominator (online softmax),
- block sizes 128/256 aligned to MXU tiles; inputs padded by the wrapper to
  multiples of the block size and masked with -inf so padding never leaks,
- optional additive mask folded in per tile (used for causal/padding).

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
    m_sc,  # scratch (block_q, 1) f32
    l_sc,  # scratch (block_q, 1) f32
    acc_sc,  # scratch (block_q, head_dim) f32
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
        o_ref[:] = (acc_sc[:] / jnp.maximum(l_sc[:], 1e-30)).astype(
            o_ref.dtype
        )


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def flash_attention(
    q: jax.Array,  # (batch, q_len, heads, head_dim)
    k: jax.Array,  # (batch, kv_len, heads, head_dim)
    v: jax.Array,
    mask: Optional[jax.Array] = None,  # additive, bcast (batch, heads, q, kv)
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jax.Array:
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

    mask_b = None
    if mask is not None:
        mask4 = jnp.broadcast_to(
            mask.astype(jnp.float32), (b, h, q_len, kv_len)
        )
        mask_b = mask4.reshape(b * h, q_len, kv_len)

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
        def body(q_ref, k_ref, v_ref, o_ref, m_sc, l_sc, acc_sc):
            kernel(q_ref, k_ref, v_ref, None, o_ref, m_sc, l_sc, acc_sc)
    else:
        def body(q_ref, k_ref, v_ref, mk_ref, o_ref, m_sc, l_sc, acc_sc):
            kernel(q_ref, k_ref, v_ref, mk_ref, o_ref, m_sc, l_sc, acc_sc)

    out = pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (None, block_q, d), lambda i, qi, ki: (i, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, q_len, d), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(*args)

    return out.reshape(b, h, q_len, d).transpose(0, 2, 1, 3)
