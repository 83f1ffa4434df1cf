"""Target-speaker Whisper decoder (flax), TPU-first.

Behavior parity with QFormerTgtSpkWhisperDecoder_V2
(/root/reference/model/whisper_decoder.py:229-380):

- training forward prepends ``<|startofprev|>`` (id 50361 by default) token
  embedding and the speaker-prompt embeddings ahead of the target-token
  embeddings (:265-279), adds text positional embeddings over the FULL
  prefixed sequence, runs causally-masked blocks with cross-attention to the
  encoder memory, projects through the tied token embedding, and slices the
  logits so the loss covers only the real targets (:292-293);
- decode-time scoring broadcasts the speaker prompt across beams (:330-332).

TPU redesign: the reference "deliberately" re-runs the whole prefix through
every block per generated token ("cache implementation is ignored for now",
whisper_decoder.py:174-176). Here decode uses TextDecoder's preallocated
KV cache: ``prefill`` runs [startofprev; spk_prompt; init tokens] once, then
``step`` extends one token at a time with ``lax.dynamic_update_slice`` — the
O(L²·steps) → O(L²) win the RTF north-star rests on (SURVEY.md §3.2).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .whisper.config import WhisperDims
from .whisper.modules import TextDecoder

Dtype = Any

STARTOFPREV = 50361  # <|startofprev|> (reference whisper_decoder.py:240)


class TSDecoder(nn.Module):
    """Speaker-prompted Whisper text decoder."""

    dims: WhisperDims
    startofprev_token: int = STARTOFPREV
    use_spk_prompt: bool = True
    dtype: Dtype = jnp.float32
    remat: bool = False
    cross_kv_bits: int = 8  # quantized decode cross-KV width (8 or 4)
    self_kv_bits: int = 16  # decode self-attn cache: 16 = dense, 8 = int8
    # packed flat self-KV cache (auto-disabled when dims don't support it;
    # see TextDecoder.flat_self_cache / ops/self_attention.py)
    flat_self_cache: bool = True
    # time-minor self-KV cache — opt-in, measured-negative at <=128-token
    # outputs (see TextDecoder.tmin_self_cache)
    tmin_self_cache: bool = False
    # sequence parallelism for the training forward (see TextDecoder)
    sequence_parallel: bool = False

    def setup(self):
        self.decoder = TextDecoder(
            self.dims, dtype=self.dtype, remat=self.remat,
            cross_kv_bits=self.cross_kv_bits,
            self_kv_bits=self.self_kv_bits,
            flat_self_cache=self.flat_self_cache,
            tmin_self_cache=self.tmin_self_cache,
            sequence_parallel=self.sequence_parallel, name="decoder",
        )

    def __call__(
        self,
        memory: jax.Array,  # (batch, src, n_state) encoder output
        ys_in: jax.Array,  # (batch, tgt_len) int tokens (sos-prefixed)
        spk_prompt: Optional[jax.Array],  # (batch, n_q, n_state)
    ) -> jax.Array:
        """Training forward. Returns fp32 logits (batch, tgt_len, vocab) —
        already sliced to cover only the real targets."""
        b = ys_in.shape[0]
        tgt_emb = self.decoder.embed(ys_in)
        if self.use_spk_prompt and spk_prompt is not None:
            sop = jnp.full((b, 1), self.startofprev_token, dtype=ys_in.dtype)
            sop_emb = self.decoder.embed(sop)
            x_emb = jnp.concatenate(
                [sop_emb, spk_prompt.astype(sop_emb.dtype), tgt_emb], axis=1
            )
            prompt_len = 1 + spk_prompt.shape[1]
        else:
            x_emb = tgt_emb
            prompt_len = 0
        hidden = self.decoder.forward_embedded(x_emb, memory)
        logits = self.decoder.logits(hidden)
        return logits[:, prompt_len:]

    # ---- KV-cache decode ----

    def prompt_len(self, spk_prompt: Optional[jax.Array]) -> int:
        if self.use_spk_prompt and spk_prompt is not None:
            return 1 + spk_prompt.shape[1]
        return 0

    def cross_kv(self, memory: jax.Array, quantize: bool = False):
        return self.decoder.cross_kv(memory, quantize=quantize)

    def quantize_cross(self, cross):
        return self.decoder.quantize_cross(cross)

    def init_cache(
        self, batch: int, max_len: int, layout: Optional[str] = None
    ):
        return self.decoder.init_cache(batch, max_len, layout=layout)

    def prefill(
        self,
        init_tokens: jax.Array,  # (batch, n_init) e.g. [sot, lang, task, nots]
        spk_prompt: Optional[jax.Array],
        cache: List[Tuple[jax.Array, jax.Array]],
        cross: List[Tuple[jax.Array, jax.Array]],
    ) -> Tuple[jax.Array, List[Tuple[jax.Array, jax.Array]]]:
        """Run [startofprev; spk_prompt; init_tokens] once, filling the cache.

        Returns fp32 logits for the position after ``init_tokens`` and the
        updated cache. The next ``step`` call must use
        ``pos = prompt_len + n_init``.
        """
        b = init_tokens.shape[0]
        tok_emb = self.decoder.embed(init_tokens)
        if self.use_spk_prompt and spk_prompt is not None:
            if spk_prompt.shape[0] != b:  # beam-expanded scoring (:330-332)
                spk_prompt = jnp.broadcast_to(
                    spk_prompt, (b,) + spk_prompt.shape[1:]
                )
            sop = jnp.full((b, 1), self.startofprev_token, dtype=init_tokens.dtype)
            x_emb = jnp.concatenate(
                [self.decoder.embed(sop), spk_prompt.astype(tok_emb.dtype), tok_emb],
                axis=1,
            )
        else:
            x_emb = tok_emb
        return self.decoder.prefill(x_emb, cache, cross)

    def step(
        self,
        token: jax.Array,  # (batch, 1) int token ids
        pos: jax.Array,  # scalar int32 absolute position incl. prompt
        cache: List[Tuple[jax.Array, jax.Array]],
        cross: List[Tuple[jax.Array, jax.Array]],
        qw=None,  # int8 step weights (quantize_step_weights)
        beam_group: int = 1,  # beams per utterance sharing quantized cross
        row_map=None,  # deferred beam reorder: physical row per logical row
        settled=None,  # deferred beam reorder: settled-prefix length
        defer_window: int = 8,
    ) -> Tuple[jax.Array, List[Tuple[jax.Array, jax.Array]]]:
        return self.decoder.step(
            self.decoder.embed(token), pos, cache, cross, qw=qw,
            beam_group=beam_group, row_map=row_map, settled=settled,
            defer_window=defer_window,
        )


def quantize_step_weights(variables) -> dict:
    """Int8 decode-step weights for a TSDecoder variables dict (see
    whisper.modules.quantize_step_weights). Computed once per decode session;
    prefill and training keep the dense fp weights."""
    from .whisper.modules import quantize_step_weights as _q

    return _q(variables["params"]["decoder"])
