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


def _kernel(
    len_ref,  # (1, 1) int32 SMEM: true kv length (tail may be padding)
    q_ref,  # (h, d) f32
    kt_ref,  # (h, d, block_t) int8/bf16/f32
    vt_ref,  # (h, d, block_t)
    o_ref,  # (h, d)
    m_ref,  # scratch (h, 1) f32
    l_ref,  # scratch (h, 1) f32
    acc_ref,  # scratch (h, d) f32
    *,
    block_t: int,
):
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    h, d = q_ref.shape

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[:].astype(jnp.float32)  # (h, d)
    kt = kt_ref[:].astype(jnp.float32)  # (h, d, bt)
    # batched over heads on the VPU (Mosaic rejects dot_general with no lhs
    # non-contracting dim; the kernel is BW-bound so VPU reduce is free):
    # s[h, t] = sum_d q[h, d] * kt[h, d, t]
    s = jnp.sum(kt * q[:, :, None], axis=1)  # (h, bt)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_t
    s = jnp.where(col < len_ref[0, 0], s, NEG_INF)

    m_prev = m_ref[:]  # (h, 1)
    l_prev = l_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)  # (h, bt)
    alpha = jnp.exp(m_prev - m_new)  # (h, 1)
    vt = vt_ref[:].astype(jnp.float32)  # (h, d, bt)
    # out[h, d] = sum_t p[h, t] * vt[h, d, t]
    pv = jnp.sum(vt * p[:, None, :], axis=2)  # (h, d)
    m_ref[:] = m_new
    l_ref[:] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(j == nj - 1)
    def _():
        o_ref[:] = (
            acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_t", "interpret"))
def decode_cross_attention(
    q: jax.Array,  # (batch, heads, head_dim) — single decode position
    kt: jax.Array,  # (batch, heads, head_dim, T) int8/bf16/f32, T % block
    vt: jax.Array,  # (batch, heads, head_dim, T)
    k_scale: Optional[jax.Array] = None,  # (batch, heads, head_dim)
    v_scale: Optional[jax.Array] = None,
    kv_len: Optional[jax.Array] = None,  # scalar int32 true length <= T
    block_t: int = DEFAULT_BLOCK_T,
    interpret: bool = False,
) -> jax.Array:
    """Softmax(q·K/sqrt(d)) @ V for one query position. Returns
    (batch, heads, head_dim) in q.dtype.

    ``kt``/``vt`` should already be padded to a multiple of ``block_t`` (pad
    once at quantization time, not per decode step) with ``kv_len`` marking
    the true length; unpadded inputs are padded here as a fallback.
    """
    b, h, d = q.shape
    t_in = kt.shape[-1]
    block_t = min(block_t, max(128, t_in))

    qs = q.astype(jnp.float32) * (d**-0.5)
    if k_scale is not None:
        qs = qs * k_scale.astype(jnp.float32)

    pad = (-t_in) % block_t
    if pad:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, 0), (0, pad)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, 0), (0, pad)))
    t_pad = t_in + pad
    if kv_len is None:
        kv_len = t_in
    len_arr = jnp.full((1, 1), kv_len, jnp.int32)

    out = pl.pallas_call(
        functools.partial(_kernel, block_t=block_t),
        grid=(b, t_pad // block_t),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, h, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, h, d, block_t), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, h, d, block_t), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, h, d), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, d), jnp.float32),
        ],
        interpret=interpret,
    )(len_arr, qs, kt, vt)

    if v_scale is not None:
        out = (out.astype(jnp.float32) * v_scale.astype(jnp.float32)).astype(
            q.dtype
        )
    return out
