"""W8A8 quantized matmuls for the decode token loop.

The decode step at medium/batch-32 reads ~340M decoder parameters from HBM
per emitted token (q/k/v/out + cross q/out + mlp per layer, plus the tied
output embedding) — after the cross-KV was quantized (ops/decode_attention),
weights are the next-largest per-step HBM term (SURVEY.md §3.2 perf note).

Approach: symmetric per-output-channel int8 weights computed ONCE at decode
session setup, dynamic per-row activation scales computed per step, and an
int8 x int8 -> int32 ``lax.dot_general`` so XLA emits a *native* int8 MXU
matmul. This sidesteps the dequantize-materialization trap documented in
docs/KERNELS.md §2: writing ``w_q.astype(bf16)`` before a matmul makes XLA
materialize the dequantized copy in HBM (int8 read + bf16 write + bf16 read
is more traffic than dense bf16). With an integer dot there is nothing to
dequantize — scales fold into the fp32 epilogue:

    y = (x_q @ w_q) * (a_scale * w_scale) + bias

Training and prefill never use this path (they run the dense fp weights);
only the single-token decode step does, where the weight read is pure
overhead re-paid every token.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def quantize_weight(
    w: jax.Array, contract_axis: int = -2
) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8 quantization of a dense kernel.

    Args:
        w: kernel of shape (..., in, out) (flax Dense layout).
        contract_axis: the axis that a matmul contracts over (the "in" axis);
            scales are computed over it so every *output* channel gets its
            own scale.
    Returns:
        (w_q int8 same shape, scale fp32 with ``contract_axis`` removed).
    """
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=contract_axis)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    w_q = jnp.round(w / jnp.expand_dims(scale, contract_axis))
    return w_q.astype(jnp.int8), scale


def quantize_activation(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Dynamic symmetric per-row int8 quantization over the last axis.

    Returns (x_q int8, scale fp32 with last axis kept as size 1).
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    x_q = jnp.round(xf / scale).astype(jnp.int8)
    return x_q, scale


def qmatmul(
    x: jax.Array,  # (..., in) fp activations
    w_q: jax.Array,  # (in, out) int8
    w_s: jax.Array,  # (out,) fp32
    bias: Optional[jax.Array] = None,  # (out,) fp32
    out_dtype=None,
) -> jax.Array:
    """W8A8 matmul: dynamic activation quant -> int8 MXU dot -> fp epilogue.

    Output is fp32 unless ``out_dtype`` says otherwise; callers in the decode
    step typically cast to the compute dtype afterwards.
    """
    x_q, a_s = quantize_activation(x)
    nd = x_q.ndim
    y = jax.lax.dot_general(
        x_q,
        w_q,
        dimension_numbers=(((nd - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (a_s * w_s)
    if bias is not None:
        y = y + bias
    if out_dtype is not None:
        y = y.astype(out_dtype)
    return y
