"""Multi-head attention compute ops.

`dot_product_attention` is the reference XLA path: einsum QK^T -> fp32
softmax -> einsum over V. XLA fuses the elementwise work into the two MXU
contractions. A Pallas flash-attention kernel (ops/flash_attention.py) is used
for long-sequence encoder self-attention when enabled; this module is the
always-correct fallback and the numerics oracle.

Matches the reference attention semantics (OpenAI Whisper blocks, used at
/root/reference/model/whisper_encoder.py:150 and whisper_decoder.py:143):
additive mask before softmax, no dropout inside attention.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    out_dtype: Optional[jnp.dtype] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Scaled dot-product attention.

    Args:
        q: (batch, q_len, heads, head_dim)
        k: (batch, kv_len, heads, head_dim)
        v: (batch, kv_len, heads, head_dim)
        mask: optional additive mask broadcastable to
            (batch, heads, q_len, kv_len), fp32, 0 for keep / -inf (or large
            negative) for drop.
        dropout_rate/dropout_rng: post-softmax attention-probs dropout (BERT
            semantics, used by the Qformer at training time — reference
            Qformer.py attention_probs_dropout_prob). Inactive when the rate
            is 0 or no rng is given; Whisper blocks never pass these.
    Returns:
        (batch, q_len, heads, head_dim) in ``out_dtype`` (defaults to q.dtype).
    """
    out_dtype = out_dtype or q.dtype
    head_dim = q.shape[-1]
    # Whisper splits the 1/sqrt(d) scale as d**-0.25 on both q and k; a single
    # d**-0.5 on q is numerically equivalent at fp32 softmax precision.
    scale = head_dim**-0.5
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    scores = scores.astype(jnp.float32) * scale
    if mask is not None:
        scores = scores + mask.astype(jnp.float32)
    weights = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd",
        weights.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(out_dtype)


def causal_mask(q_len: int, kv_len: Optional[int] = None) -> jax.Array:
    """Additive causal mask (q_len, kv_len), 0 on/below diagonal, -inf above.

    Mirrors Whisper's decoder mask semantics (upper-triangular -inf), aligned
    so query i attends to keys [0, kv_len - q_len + i].
    """
    kv_len = kv_len or q_len
    offset = kv_len - q_len
    q_ids = jnp.arange(q_len)[:, None]
    k_ids = jnp.arange(kv_len)[None, :]
    allowed = k_ids <= (q_ids + offset)
    return jnp.where(allowed, 0.0, -jnp.inf).astype(jnp.float32)


def padding_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """Additive key-padding mask (batch, 1, 1, max_len): 0 valid, -1e9 pad."""
    valid = jnp.arange(max_len)[None, :] < lengths[:, None]
    return jnp.where(valid, 0.0, -1e9).astype(jnp.float32)[:, None, None, :]
