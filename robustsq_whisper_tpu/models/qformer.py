"""BLIP-2-style Qformer speaker-prompt adapter as flax modules, TPU-first.

Re-designed from the behavior of the reference's LAVIS-derived Qformer
(/root/reference/model/Qformer.py) and its wrapper
(/root/reference/model/qformer_adapter.py:26-94). Only the subset the TS-ASR
task exercises is built (the MLM / LM-generation heads at Qformer.py:953-1199
are dead code for this task — see SURVEY.md §7.3):

- ``BertEmbeddings`` whose "word embedding" is a Linear projecting continuous
  enrollment features encoder_width -> hidden, plus fixed sinusoidal positions
  (Qformer.py:51-87); learned query tokens are prepended before LayerNorm.
- Post-LN transformer layers where self-attention runs over the joint
  [queries; enrollment] sequence, cross-attention runs on the **query slice
  only** against the speech memory (Qformer.py:411-430), and queries get their
  own FFN (``intermediate_query``/``output_query``, Qformer.py:379-380,
  432-445) while enrollment tokens use the regular FFN.
- Standard bidirectional extended masks: additive ``(1-m) * -10000``
  (Qformer.py:698-787 for the non-decoder path actually taken).

TPU choices: static shapes with explicit length-derived masks; fp32 softmax /
layernorm; queries+enrollment processed as one padded sequence so the whole
layer is three MXU matmul groups; no attention-map side-car state (the
reference clones per-layer attention probs for inspection — here a pure
``return_attn`` path can be added if needed without mutable state).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import dot_product_attention
from .whisper.config import sinusoids

Dtype = Any


@dataclasses.dataclass(frozen=True)
class QformerConfig:
    """Mirrors the knobs the reference sets on BertConfig
    (qformer_adapter.py:35-41); defaults are huggingface BertConfig defaults.
    """

    encoder_width: int = 1024
    hidden_size: int = 768
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    num_hidden_layers: int = 2
    num_query_tokens: int = 1
    max_position_embeddings: int = 1500  # same as whisper encoder
    layer_norm_eps: float = 1e-12
    initializer_range: float = 0.02
    cross_attention_freq: int = 1


class BertSelfAttentionBlock(nn.Module):
    """Post-LN attention sub-block: attn -> dense -> LN(residual).

    Matches BertAttention = BertSelfAttention + BertSelfOutput
    (Qformer.py:90-326) with dropout elided (inference/bf16-training path;
    dropout is applied by callers via ``nn.Dropout`` when configured).
    """

    cfg: QformerConfig
    kv_width: int  # encoder_width for cross-attention, hidden for self
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        kv_src: jax.Array,
        mask: Optional[jax.Array],
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.cfg
        head_dim = cfg.hidden_size // cfg.num_attention_heads

        def split(t: jax.Array) -> jax.Array:
            b, l, _ = t.shape
            return t.reshape(b, l, cfg.num_attention_heads, head_dim)

        q = split(nn.Dense(cfg.hidden_size, dtype=self.dtype, name="query")(x))
        k = split(nn.Dense(cfg.hidden_size, dtype=self.dtype, name="key")(kv_src))
        v = split(nn.Dense(cfg.hidden_size, dtype=self.dtype, name="value")(kv_src))
        o = dot_product_attention(q, k, v, mask=mask)
        o = o.reshape(x.shape)
        o = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="out")(o)
        return nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="ln"
        )(o + x).astype(self.dtype)


class BertFFN(nn.Module):
    """Post-LN FFN sub-block: dense-gelu-dense -> LN(residual)
    (BertIntermediate/BertOutput, Qformer.py:329-355)."""

    cfg: QformerConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(h)
        return nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="ln"
        )(h + x).astype(self.dtype)


class QformerLayer(nn.Module):
    """One Qformer layer over the joint [query; enrollment] sequence.

    Query tokens cross-attend to the speech memory; enrollment tokens skip
    cross-attention; the two halves use separate FFNs (Qformer.py:411-445).
    The query/enroll split position is static (num_query_tokens), so the
    slice/concat compiles to cheap static reshapes under XLA.
    """

    cfg: QformerConfig
    has_cross_attention: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (batch, nq + n_enroll, hidden)
        self_mask: Optional[jax.Array],
        memory: jax.Array,  # (batch, src, encoder_width)
        memory_mask: Optional[jax.Array],
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.cfg
        nq = cfg.num_query_tokens

        x = BertSelfAttentionBlock(
            cfg, cfg.hidden_size, dtype=self.dtype, name="attention"
        )(x, x, self_mask, deterministic)

        q_part, e_part = x[:, :nq], x[:, nq:]
        if self.has_cross_attention:
            q_part = BertSelfAttentionBlock(
                cfg, cfg.encoder_width, dtype=self.dtype, name="crossattention"
            )(q_part, memory.astype(self.dtype), memory_mask, deterministic)

        q_part = BertFFN(cfg, dtype=self.dtype, name="ffn_query")(q_part)
        e_part = BertFFN(cfg, dtype=self.dtype, name="ffn")(e_part)
        return jnp.concatenate([q_part, e_part], axis=1)


class QFormerAdapter(nn.Module):
    """Speaker-prompt Qformer (reference qformer_adapter.py:26-94).

    ``__call__`` takes speech conv-stem features (memory) and enrollment
    conv-stem features (input sequence) plus their frame lengths, and returns
    ``(query_embeddings, enroll_embeddings)`` — the reference's
    ``(spk_prompt, enroll_embedding)`` before any ``prompt_proj``.
    """

    cfg: QformerConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.query_tokens = self.param(
            "query_tokens",
            nn.initializers.normal(cfg.initializer_range),
            (1, cfg.num_query_tokens, cfg.hidden_size),
        )
        self.word_embeddings = nn.Dense(
            cfg.hidden_size, dtype=self.dtype, name="word_embeddings"
        )
        self.emb_ln = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="emb_ln"
        )
        # non-trainable buffer (see AudioEncoder.pos_table note)
        self.pos_table = self.variable(
            "buffers",
            "position_embeddings",
            lambda: jnp.asarray(
                sinusoids(self.cfg.max_position_embeddings, self.cfg.hidden_size)
            ),
        )
        self.layers = [
            QformerLayer(
                cfg,
                has_cross_attention=(i % cfg.cross_attention_freq == 0),
                dtype=self.dtype,
                name=f"layers_{i}",
            )
            for i in range(cfg.num_hidden_layers)
        ]

    def __call__(
        self,
        memory: jax.Array,  # (batch, src, encoder_width) speech stem + pos
        memory_lens: Optional[jax.Array],  # (batch,) valid frames
        enroll: jax.Array,  # (batch, enr, encoder_width) enrollment stem
        enroll_lens: Optional[jax.Array],  # (batch,) valid frames
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        cfg = self.cfg
        b, n_enroll = enroll.shape[0], enroll.shape[1]
        nq = cfg.num_query_tokens

        # Embeddings: Linear word-emb on continuous feats + sinusoid positions,
        # queries prepended, joint LayerNorm (Qformer.py:69-87).
        e = self.word_embeddings(enroll.astype(self.dtype))
        e = e + self.pos_table.value[:n_enroll].astype(e.dtype)
        q = jnp.broadcast_to(
            self.query_tokens.astype(self.dtype), (b, nq, cfg.hidden_size)
        )
        x = self.emb_ln(jnp.concatenate([q, e], axis=1)).astype(self.dtype)

        # Extended masks, (1-m)*-10000 additive over keys (Qformer.py:698-787
        # non-decoder path; queries are always valid, qformer_adapter.py:69-73).
        self_mask = None
        if enroll_lens is not None:
            valid = jnp.concatenate(
                [
                    jnp.ones((b, nq), dtype=bool),
                    jnp.arange(n_enroll)[None, :] < enroll_lens[:, None],
                ],
                axis=1,
            )
            self_mask = jnp.where(valid, 0.0, -10000.0).astype(jnp.float32)[
                :, None, None, :
            ]
        memory_mask = None
        if memory_lens is not None:
            m_valid = jnp.arange(memory.shape[1])[None, :] < memory_lens[:, None]
            memory_mask = jnp.where(m_valid, 0.0, -10000.0).astype(jnp.float32)[
                :, None, None, :
            ]

        for layer in self.layers:
            x = layer(x, self_mask, memory, memory_mask, deterministic)

        return x[:, :nq], x[:, nq:]

    @property
    def output_size(self) -> int:
        return self.cfg.hidden_size

    @staticmethod
    def make_buffers(cfg: QformerConfig) -> dict:
        return {
            "position_embeddings": jnp.asarray(
                sinusoids(cfg.max_position_embeddings, cfg.hidden_size)
            )
        }
