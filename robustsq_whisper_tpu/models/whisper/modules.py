"""Whisper encoder/decoder as flax.linen modules, TPU-first.

Re-designed from the behavior of the reference wrappers
(/root/reference/model/whisper_encoder.py:17-192,
/root/reference/model/whisper_decoder.py:41-226) and the OpenAI Whisper block
structure they load: pre-LN residual attention blocks, GELU MLPs, sinusoidal
audio positions (fixed), learned text positions, tied-embedding logits.

TPU choices:
- static shapes everywhere; lengths travel as separate int arrays,
- params live in fp32, matmuls run in a configurable compute dtype (bf16 on
  TPU), layernorms and softmax in fp32,
- decoding uses a preallocated per-layer KV cache updated with
  ``lax.dynamic_update_slice`` (the reference deliberately re-runs the whole
  prefix each step, whisper_decoder.py:174-176 — this is the main perf gap the
  TPU build closes).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.attention import causal_mask, dot_product_attention
from .config import WhisperDims, sinusoids

Dtype = Any


def _gelu(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=False)


class MultiHeadAttention(nn.Module):
    """Whisper-style MHA: q/v/out with bias, k without bias."""

    n_state: int
    n_head: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.query = nn.Dense(self.n_state, dtype=self.dtype, name="query")
        self.key = nn.Dense(self.n_state, use_bias=False, dtype=self.dtype, name="key")
        self.value = nn.Dense(self.n_state, dtype=self.dtype, name="value")
        self.out = nn.Dense(self.n_state, dtype=self.dtype, name="out")

    def _split(self, x: jax.Array) -> jax.Array:
        b, t, _ = x.shape
        return x.reshape(b, t, self.n_head, self.n_state // self.n_head)

    def _merge(self, x: jax.Array) -> jax.Array:
        b, t, _, _ = x.shape
        return x.reshape(b, t, self.n_state)

    def kv(self, src: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Project keys/values of ``src``: 2x (batch, len, heads, head_dim)."""
        return self._split(self.key(src)), self._split(self.value(src))

    def attend(
        self,
        x: jax.Array,
        k: jax.Array,
        v: jax.Array,
        mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        q = self._split(self.query(x))
        o = dot_product_attention(q, k, v, mask=mask)
        return self.out(self._merge(o))

    def __call__(
        self,
        x: jax.Array,
        xa: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        k, v = self.kv(x if xa is None else xa)
        return self.attend(x, k, v, mask=mask)


class ResidualAttentionBlock(nn.Module):
    n_state: int
    n_head: int
    cross_attention: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=name)
        self.attn_ln = ln("attn_ln")
        self.attn = MultiHeadAttention(self.n_state, self.n_head, self.dtype, name="attn")
        if self.cross_attention:
            self.cross_attn_ln = ln("cross_attn_ln")
            self.cross_attn = MultiHeadAttention(
                self.n_state, self.n_head, self.dtype, name="cross_attn"
            )
        self.mlp_ln = ln("mlp_ln")
        self.mlp_fc1 = nn.Dense(4 * self.n_state, dtype=self.dtype, name="mlp_fc1")
        self.mlp_fc2 = nn.Dense(self.n_state, dtype=self.dtype, name="mlp_fc2")

    def _mlp(self, x: jax.Array) -> jax.Array:
        return self.mlp_fc2(_gelu(self.mlp_fc1(x)))

    def _cast(self, x: jax.Array) -> jax.Array:
        return x.astype(self.dtype)

    def __call__(
        self,
        x: jax.Array,
        xa: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        x = x + self.attn(self._cast(self.attn_ln(x)), mask=mask)
        if self.cross_attention:
            x = x + self.cross_attn(self._cast(self.cross_attn_ln(x)), xa=xa)
        x = x + self._mlp(self._cast(self.mlp_ln(x)))
        return x

    def step(
        self,
        x: jax.Array,
        self_k: jax.Array,
        self_v: jax.Array,
        pos: jax.Array,
        cross_k: jax.Array,
        cross_v: jax.Array,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Single-token decode step against a preallocated KV cache.

        Args:
            x: (batch, 1, n_state) current-position hidden state.
            self_k/self_v: (batch, max_len, heads, head_dim) cache buffers.
            pos: scalar int32 write/attend position.
            cross_k/cross_v: precomputed encoder-memory projections.
        Returns:
            (new_x, updated self_k, updated self_v).
        """
        h = self._cast(self.attn_ln(x))
        k_new, v_new = self.attn.kv(h)
        self_k = jax.lax.dynamic_update_slice(self_k, k_new, (0, pos, 0, 0))
        self_v = jax.lax.dynamic_update_slice(self_v, v_new, (0, pos, 0, 0))
        max_len = self_k.shape[1]
        step_mask = jnp.where(
            jnp.arange(max_len)[None, :] <= pos, 0.0, -1e9
        ).astype(jnp.float32)[None, None, :, :]
        x = x + self.attn.attend(h, self_k, self_v, mask=step_mask)
        x = x + self.cross_attn.attend(self._cast(self.cross_attn_ln(x)), cross_k, cross_v)
        x = x + self._mlp(self._cast(self.mlp_ln(x)))
        return x, self_k, self_v


class AudioEncoder(nn.Module):
    """Whisper audio encoder; exposes the conv stem and the block stack
    separately so target-speaker variants can inject speaker prompts between
    them (reference whisper_encoder.py:437-504)."""

    dims: WhisperDims
    dtype: Dtype = jnp.float32

    def setup(self):
        d = self.dims
        self.conv1 = nn.Conv(
            d.n_audio_state, (3,), padding=((1, 1),), dtype=self.dtype, name="conv1"
        )
        self.conv2 = nn.Conv(
            d.n_audio_state, (3,), strides=(2,), padding=((1, 1),),
            dtype=self.dtype, name="conv2",
        )
        self.blocks = [
            ResidualAttentionBlock(
                d.n_audio_state, d.n_audio_head, dtype=self.dtype, name=f"blocks_{i}"
            )
            for i in range(d.n_audio_layer)
        ]
        self.ln_post = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post")

    def conv_stem(self, mel: jax.Array, add_positions: bool = True) -> jax.Array:
        """(batch, n_mels, frames) -> (batch, frames//2, n_state).

        ``add_positions=False`` reproduces the enrollment path, which skips
        positional embeddings (reference whisper_encoder.py:464-472).
        """
        x = mel.astype(self.dtype).transpose(0, 2, 1)  # NLC for flax conv
        x = _gelu(self.conv1(x))
        x = _gelu(self.conv2(x))
        if add_positions:
            pos = jnp.asarray(sinusoids(self.dims.n_audio_ctx, self.dims.n_audio_state))
            x = x + pos[: x.shape[1]].astype(x.dtype)
        return x

    def run_blocks(self, x: jax.Array) -> jax.Array:
        x = x.astype(self.dtype)
        for block in self.blocks:
            x = block(x)
        return self.ln_post(x).astype(self.dtype)

    def __call__(self, mel: jax.Array) -> jax.Array:
        return self.run_blocks(self.conv_stem(mel))

    @staticmethod
    def output_lengths(ilens: jax.Array, max_ctx: int) -> jax.Array:
        """Conv2 length formula (reference whisper_encoder.py:158-167):
        1 + (ilens - kernel + 2*padding) // stride, clamped to the pos budget."""
        return jnp.minimum(1 + (ilens - 3 + 2) // 2, max_ctx)


class TextDecoder(nn.Module):
    """Whisper text decoder with tied-embedding logits and KV-cache decoding."""

    dims: WhisperDims
    dtype: Dtype = jnp.float32

    def setup(self):
        d = self.dims
        self.token_embedding = nn.Embed(d.n_vocab, d.n_text_state, name="token_embedding")
        self.positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(0.02),
            (d.n_text_ctx, d.n_text_state),
        )
        self.blocks = [
            ResidualAttentionBlock(
                d.n_text_state, d.n_text_head, cross_attention=True,
                dtype=self.dtype, name=f"blocks_{i}",
            )
            for i in range(d.n_text_layer)
        ]
        self.ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln")

    def embed(self, tokens: jax.Array) -> jax.Array:
        return self.token_embedding(tokens)

    def logits(self, x: jax.Array) -> jax.Array:
        """Tied-embedding output projection, fp32 (whisper_decoder.py:149-151)."""
        emb = self.token_embedding.embedding
        return jnp.einsum(
            "btd,vd->btv",
            x.astype(self.dtype),
            emb.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ).astype(jnp.float32)

    def forward_embedded(
        self, x_emb: jax.Array, memory: jax.Array, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        """Run blocks on already-embedded input (positions added here)."""
        length = x_emb.shape[1]
        x = x_emb + self.positional_embedding[:length]
        x = x.astype(self.dtype)
        if mask is None:
            mask = causal_mask(length)
        memory = memory.astype(self.dtype)
        for block in self.blocks:
            x = block(x, xa=memory, mask=mask)
        return self.ln(x).astype(self.dtype)

    def __call__(self, tokens: jax.Array, memory: jax.Array) -> jax.Array:
        """(batch, len) int tokens + (batch, src, n_state) memory -> fp32 logits."""
        x = self.forward_embedded(self.embed(tokens), memory)
        return self.logits(x)

    # ---- KV-cache decode path ----

    def cross_kv(self, memory: jax.Array) -> List[Tuple[jax.Array, jax.Array]]:
        memory = memory.astype(self.dtype)
        return [block.cross_attn.kv(memory) for block in self.blocks]

    def init_cache(self, batch: int, max_len: int) -> List[Tuple[jax.Array, jax.Array]]:
        d = self.dims
        shape = (batch, max_len, d.n_text_head, d.n_text_state // d.n_text_head)
        zeros = jnp.zeros(shape, dtype=self.dtype)
        return [(zeros, zeros) for _ in range(d.n_text_layer)]

    def prefill(
        self,
        x_emb: jax.Array,
        cache: List[Tuple[jax.Array, jax.Array]],
        cross: List[Tuple[jax.Array, jax.Array]],
    ) -> Tuple[jax.Array, List[Tuple[jax.Array, jax.Array]]]:
        """Run a multi-token prefix through the decoder, filling cache[0:L].

        Returns fp32 logits of the last position and the updated cache.
        """
        length = x_emb.shape[1]
        x = (x_emb + self.positional_embedding[:length]).astype(self.dtype)
        mask = causal_mask(length)
        new_cache = []
        for block, (ck, cv), (xk, xv) in zip(self.blocks, cross, cache):
            h = block._cast(block.attn_ln(x))
            k_new, v_new = block.attn.kv(h)
            xk = jax.lax.dynamic_update_slice(xk, k_new, (0, 0, 0, 0))
            xv = jax.lax.dynamic_update_slice(xv, v_new, (0, 0, 0, 0))
            x = x + block.attn.attend(h, k_new, v_new, mask=mask)
            x = x + block.cross_attn.attend(block._cast(block.cross_attn_ln(x)), ck, cv)
            x = x + block._mlp(block._cast(block.mlp_ln(x)))
            new_cache.append((xk, xv))
        x = self.ln(x[:, -1:]).astype(self.dtype)
        return self.logits(x)[:, 0], new_cache

    def step(
        self,
        token_emb: jax.Array,
        pos: jax.Array,
        cache: List[Tuple[jax.Array, jax.Array]],
        cross: List[Tuple[jax.Array, jax.Array]],
    ) -> Tuple[jax.Array, List[Tuple[jax.Array, jax.Array]]]:
        """One decode step. token_emb: (batch, 1, n_state); pos: scalar int.

        Returns fp32 logits (batch, n_vocab) and the updated cache.
        """
        pos_emb = jax.lax.dynamic_slice_in_dim(
            self.positional_embedding, pos, 1, axis=0
        )
        x = (token_emb + pos_emb[None]).astype(self.dtype)
        new_cache = []
        for block, (ck, cv), (sk, sv) in zip(self.blocks, cross, cache):
            x, sk, sv = block.step(x, sk, sv, pos, ck, cv)
            new_cache.append((sk, sv))
        x = self.ln(x).astype(self.dtype)
        return self.logits(x)[:, 0], new_cache
