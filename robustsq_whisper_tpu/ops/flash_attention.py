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

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256
NEG_INF = -1e30


def _attn_kernel(
    q_ref,  # (block_q, head_dim)
    k_ref,  # (kv_len, head_dim)
    v_ref,  # (kv_len, head_dim)
    mask_ref,  # (block_q, kv_len) additive fp32, or None
    o_ref,  # (block_q, head_dim)
    *,
    scale: float,
    block_k: int,
    kv_len: int,
):
    block_q, head_dim = q_ref.shape
    q = q_ref[:].astype(jnp.float32) * scale

    m = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, head_dim), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, block_k)
        if mask_ref is not None:
            s = s + mask_ref[:, pl.ds(i * block_k, block_k)].astype(jnp.float32)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, kv_len // block_k, body, (m, l, acc))
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _pad_to(x: jax.Array, axis: int, mult: int, value=0.0) -> jax.Array:
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, pad)
    return jnp.pad(x, pads, constant_values=value)


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

    # (b*h, len, d) layout; pad lengths to block multiples
    def bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qb, kb, vb = bh(q), bh(k), bh(v)
    qb = _pad_to(qb, 1, block_q)
    kb = _pad_to(kb, 1, block_k)
    vb = _pad_to(vb, 1, block_k)
    q_pad, kv_pad = qb.shape[1], kb.shape[1]

    # additive mask: broadcast to (b*h, q_pad, kv_pad); padding keys get -inf
    need_mask = mask is not None or kv_pad != kv_len
    mask_b = None
    if need_mask:
        full = jnp.zeros((b, h, q_pad, kv_pad), jnp.float32)
        if kv_pad != kv_len:
            full = full.at[..., kv_len:].set(NEG_INF)
        if mask is not None:
            mask4 = jnp.broadcast_to(
                mask.astype(jnp.float32),
                (b, h, q_len, kv_len) if mask.ndim == 4 else mask.shape,
            )
            if mask4.ndim != 4:
                mask4 = jnp.broadcast_to(mask4, (b, h, q_len, kv_len))
            full = full.at[..., :q_len, :kv_len].add(mask4)
        mask_b = full.reshape(b * h, q_pad, kv_pad)

    kernel = functools.partial(
        _attn_kernel, scale=scale, block_k=block_k, kv_len=kv_pad
    )
    grid = (b * h, q_pad // block_q)
    in_specs = [
        pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, kv_pad, d), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, kv_pad, d), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qb, kb, vb]
    if mask_b is not None:
        in_specs.append(
            pl.BlockSpec((None, block_q, kv_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(mask_b)

    if mask_b is None:
        def body(q_ref, k_ref, v_ref, o_ref):
            kernel(q_ref, k_ref, v_ref, None, o_ref)
    else:
        def body(q_ref, k_ref, v_ref, m_ref, o_ref):
            kernel(q_ref, k_ref, v_ref, m_ref, o_ref)

    out = pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (None, block_q, d), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, q_pad, d), out_dtype),
        interpret=interpret,
    )(*args)

    out = out[:, :q_len].reshape(b, h, q_len, d).transpose(0, 2, 1, 3)
    return out
