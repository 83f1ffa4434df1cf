"""Batched KV-cache greedy and beam search for TS-Whisper decode.

This replaces the reference's decode stack — ESPnet's Python ``BeamSearch``
driving a cacheless ``forward_one_step`` that re-runs the whole prefix
through every block per emitted token
(/root/reference/model/whisper_decoder.py:174-176, 297-352; SURVEY.md §3.2).
That path is O(steps · L²); this one is a single jit-compiled ``lax.scan``
over decode steps with a preallocated per-layer KV cache updated in place via
``lax.dynamic_update_slice`` — O(L²) total, batched over utterances, with the
speaker prompt prefix ([<|startofprev|>; spk_prompt]) prefilled once.

Beam search flattens (batch, beam) into the leading axis so every step is one
MXU-shaped matmul batch; hypothesis reordering copies cache rows with direct
HBM->HBM DMAs (ops/beam_gather.py; ``jnp.take``'s gather lowering measured
~4x below HBM bandwidth) and the quantized cross K/V is SHARED across beams
by the grouped decode kernel instead of beam-expanded. Scoring follows
ESPnet/Whisper beam=1..k attention-decoder semantics: accumulated log-probs,
finished beams frozen by forcing eot with score 0.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Callable, List, Tuple

import jax
import jax.numpy as jnp

from ..models.ts_decoder import TSDecoder, quantize_step_weights
from ..ops.beam_gather import beam_reorder_cache


@dataclasses.dataclass(frozen=True)
class DecodeConfig:
    max_new_tokens: int = 200
    # suppress eot until this many tokens were emitted (per row/beam) — the
    # ESPnet ``minlenratio`` analog (the reference decodes through
    # espnet2.bin.asr_inference, whose beam search drops hypotheses ending
    # before minlen; here the min length is absolute, like max_new_tokens).
    # Masking happens on the raw logits BEFORE log_softmax, so scores stay
    # renormalized log-probs of the restricted distribution. 0 = off.
    min_new_tokens: int = 0
    eot: int = 50257
    # init sequence after the speaker-prompt prefix, e.g.
    # [<|startoftranscript|>, <|en|>, <|transcribe|>, <|notimestamps|>]
    init_tokens: Tuple[int, ...] = (50258,)
    beam_size: int = 1
    length_penalty: float = 0.0  # 0 = pure sum of log-probs
    # int8-quantize the cross-attention K/V (the decode loop's dominant HBM
    # traffic; ~2x less per-step memory read at negligible accuracy cost)
    quantize_cross_kv: bool = False
    # W8A8 int8 weights for the decode step: per-output-channel int8 kernels
    # computed once at build time, dynamic activation scales per token, native
    # int8 MXU dots (ops/quant.py) — halves the per-token weight read (the
    # second-largest HBM term after the cross-KV). Prefill stays dense fp.
    quantize_weights: bool = False
    # lax.while_loop early exit once every utterance emitted eot — on real
    # speech (~30-50 tokens per 30 s) this cuts decode wall time 2-3x vs the
    # fixed-length scan. Applies to greedy AND beam search: the beam variant
    # preallocates the (steps, b, k) token/backpointer history and exits when
    # every beam of every utterance is finished; the tail it never writes
    # (eot tokens, identity backpointers) is exactly what the post-all-done
    # scan steps would have produced, so outputs are token-identical.
    stop_early: bool = True
    # beam-search cache reorder: "dma" = the Pallas HBM->HBM row-copy kernel
    # (ops/beam_gather.py; the XLA gather lowering of jnp.take measured ~4x
    # below HBM bandwidth on the cache and dominates the beam loop), "take"
    # = the XLA gather, "auto" = the kernel whenever the cache rows tile
    # into whole (32, 128) DMA tiles (padding the cache length slightly if
    # that makes them tile), gather otherwise.
    beam_reorder: str = "auto"
    # Deferred beam reorder (docs/KERNELS.md §11): flush period R > 0 stops
    # physically permuting the whole live cache prefix every beam step (the
    # measured-dominant beam-loop HBM term, at streaming-copy roofline).
    # Instead the settled prefix stays in last-flush row order and is READ
    # through a per-row indirection inside the self-attention kernel
    # (ops/self_attention.py settled_self_attention); only the <= R most
    # recent positions are mini-reordered each step, and the accumulated
    # row permutation is applied once every R steps — the reorder traffic
    # drops ~R x. Token-identical to the eager path. Requires the dense
    # flat self cache (self_kv_bits 16). 0 = eager reorder (default).
    defer_reorder: int = 0
    # quantize the cross K/V INSIDE the projection scan and run the prefill
    # on the quantized form, instead of prefilling on dense K/V and
    # quantizing after. The dense stacked cross K/V is the decode session's
    # HBM *capacity* peak — 2 * layers * b * T * n_state bf16 (15.9 GB for
    # large-v3 at batch 64, the measured single-chip OOM) — and this option
    # never materializes it. Costs a per-position dequant in the prefill
    # einsum (~130 ms at medium/b32/int4) and prefill attends the quantized
    # K/V (the token loop already does). Requires quantize_cross_kv.
    prefill_quantized: bool = False
    # speculative greedy decode (decode/speculative.py): propose this many
    # tokens per round with an early-exit draft (the first ``draft_layers``
    # decoder layers + the shared head), then VERIFY them in one causal
    # multi-token chunk — the per-token HBM reads (cross-KV, cache, weights)
    # amortize over the accepted run. 0 = off. Greedy only (beam_size 1);
    # requires a TSDecoder built with flat_self_cache=False. Output is the
    # target model's greedy transcript token-for-token; only speed depends
    # on the draft's acceptance rate.
    speculative_gamma: int = 0
    draft_layers: int = 4
    # --- joint CTC/attention decode (decode/joint.py; ESPnet beam_search
    # parity options, SURVEY.md §3.2). ctc_decode_weight > 0 routes decoding
    # through build_joint_beam_decoder: combined score =
    # (1-w)·att_logp + w·ctc_prefix_delta over a per-hypothesis candidate
    # set the attention decoder pre-selects (``pre_beam`` candidates — the
    # ESPnet partial-scorer pattern; full-vocab CTC prefix scoring is
    # O(T·V) per step). Attention-only decode is unaffected at the default.
    ctc_decode_weight: float = 0.0
    pre_beam: int = 8
    # encoder-length-relative output bounds (ESPnet maxlenratio/minlenratio):
    # maxlen_i = floor(ratio * enc_frames_i), forced-eot beyond; minlen_i
    # masks eot below. 0 = absolute max_new_tokens/min_new_tokens semantics.
    # Per-utterance when the runner passes mem_lens; else the static window.
    maxlenratio: float = 0.0
    minlenratio: float = 0.0
    # Whisper timestamp-token decoding (decode/timestamps.py): drop
    # <|notimestamps|> from init_tokens and constrain sampling with the
    # published timestamp rules (pairs, monotonicity, first-token window,
    # timestamp-mass). Greedy only; the reference decodes <|notimestamps|>
    # so this is a completeness feature (`--timestamps`).
    with_timestamps: bool = False
    timestamp_begin: int = 50364
    max_initial_timestamp_index: int = 50  # 1.0 s at 0.02 s per step


def length_bounds(
    cfg: "DecodeConfig", memory: jax.Array, spk_prompt: jax.Array,
    use_prompt: bool,
) -> Tuple[int, int]:
    """(max_new, min_new) with the encoder-relative ratio bounds applied
    against the STATIC encoder window (trace-time ints — memory shapes are
    static under jit). The joint decoder (decode/joint.py) additionally
    applies per-utterance dynamic bounds from mem_lens."""
    enc_t = memory.shape[1] - (spk_prompt.shape[1] if use_prompt else 0)
    return length_bounds_static(cfg, enc_t)


def length_bounds_static(cfg: "DecodeConfig", enc_t: int) -> Tuple[int, int]:
    """The ratio-bound arithmetic on a bare trace-time encoder length —
    one formula shared by the attention-only paths (length_bounds) and the
    joint decoder's static budget (decode/joint.py)."""
    max_new = cfg.max_new_tokens
    if cfg.maxlenratio > 0:
        max_new = min(max_new, max(1, int(cfg.maxlenratio * enc_t)))
    min_new = cfg.min_new_tokens
    if cfg.minlenratio > 0:
        min_new = max(min_new, int(cfg.minlenratio * enc_t))
    return max_new, min_new


def _step_weights(dec: TSDecoder, variables: Any, cfg: "DecodeConfig"):
    """One-time int8 quantization of the decode-step weights (or None).

    Computed eagerly at builder time and bound as a jit ARGUMENT — like the
    dense weights, never a closure (closed-over device arrays lower as HLO
    constants, each fetched device->host during tracing)."""
    if not cfg.quantize_weights:
        return None
    return jax.jit(quantize_step_weights)(variables)


def build_greedy_decoder(
    dec: TSDecoder,
    variables: Any,
    cfg: DecodeConfig = DecodeConfig(),
) -> Callable[[jax.Array, jax.Array], Tuple[jax.Array, jax.Array]]:
    """Returns jitted ``run(memory, spk_prompt) -> (tokens, scores)``.

    tokens: (batch, max_new_tokens) int32, eot-padded after stop.
    scores: (batch,) summed log-probs of emitted tokens (up to eot).

    The weights enter the jit as an ARGUMENT (bound via partial), never as a
    closure: closed-over device arrays lower as per-leaf HLO constants, each
    fetched device->host during lowering — minutes of wall time on a
    tunneled TPU.
    """
    if cfg.speculative_gamma > 0:
        from .speculative import build_speculative_decoder

        if cfg.with_timestamps:
            raise ValueError(
                "timestamp decoding is plain-greedy only (the draft/verify "
                "chunks don't apply the timestamp rules)"
            )
        return build_speculative_decoder(dec, variables, cfg)

    if cfg.prefill_quantized and not cfg.quantize_cross_kv:
        raise ValueError(
            "prefill_quantized requires quantize_cross_kv=True: the option "
            "prefills on the QUANTIZED cross K/V so the dense stacked form "
            "is never materialized (its whole point); without a quantized "
            "token loop it would silently change nothing"
        )

    @functools.partial(jax.jit, donate_argnums=())
    def run(
        variables: Any, qw: Any, memory: jax.Array, spk_prompt: jax.Array
    ):
        b = memory.shape[0]
        prompt_len = 1 + spk_prompt.shape[1] if dec.use_spk_prompt else 0
        max_new, min_new = length_bounds(
            cfg, memory, spk_prompt, dec.use_spk_prompt
        )
        total = prompt_len + len(cfg.init_tokens) + max_new

        m = lambda method, *a, **kw: dec.apply(variables, *a, method=method, **kw)
        # prefill on DENSE cross K/V (exact numerics, runs once), quantize
        # after for the token loop — the quantized layout costs a pack/unpack
        # pass the one-shot prefill should never pay. prefill_quantized flips
        # that trade to cap the HBM peak (see DecodeConfig).
        pq = cfg.prefill_quantized
        cross = m(TSDecoder.cross_kv, memory, quantize=pq)
        cache = m(TSDecoder.init_cache, b, total)
        init = jnp.tile(
            jnp.asarray(cfg.init_tokens, jnp.int32)[None, :], (b, 1)
        )
        logits, cache = m(TSDecoder.prefill, init, spk_prompt, cache, cross)
        if cfg.quantize_cross_kv and not pq:
            cross = m(TSDecoder.quantize_cross, cross)

        def emit(logits, done, score, idx, ts_state):
            # idx = emission index of this token (0-based); eot is masked
            # from the raw logits until min_new tokens were emitted
            if min_new > 0:
                masked = logits.at[:, cfg.eot].set(jnp.float32(-1e30))
                logits = jnp.where(idx < min_new, masked, logits)
            if cfg.with_timestamps:
                from .timestamps import (
                    apply_timestamp_rules, update_timestamp_state,
                )

                last, penult, max_ts = ts_state
                logits = apply_timestamp_rules(
                    logits.astype(jnp.float32), last, penult, max_ts,
                    cfg.timestamp_begin, cfg.eot,
                    cfg.max_initial_timestamp_index,
                )
            logp = jax.nn.log_softmax(logits, axis=-1)
            tok = jnp.argmax(logp, axis=-1).astype(jnp.int32)  # (b,)
            tok = jnp.where(done, cfg.eot, tok)
            tok_logp = jnp.take_along_axis(logp, tok[:, None], axis=-1)[:, 0]
            score = score + jnp.where(done, 0.0, tok_logp)
            done = done | (tok == cfg.eot)
            if cfg.with_timestamps:
                ts_state = update_timestamp_state(
                    tok, ts_state[0], ts_state[2], cfg.timestamp_begin
                )
            return tok, done, score, ts_state

        base = prompt_len + len(cfg.init_tokens)
        done0 = jnp.zeros((b,), bool)
        score0 = jnp.zeros((b,), jnp.float32)
        ts0 = (
            jnp.full((b,), -1, jnp.int32),  # last token
            jnp.full((b,), -1, jnp.int32),  # penultimate token
            jnp.full((b,), cfg.timestamp_begin, jnp.int32),  # max timestamp
        )

        if cfg.stop_early:
            tokens0 = jnp.full((b, max_new), cfg.eot, jnp.int32)

            def cond(carry):
                i, _, _, done = carry[:4]
                return (i < max_new) & ~jnp.all(done)

            def body(carry):
                i, logits, cache, done, score, tokens, ts = carry
                tok, done, score, ts = emit(logits, done, score, i, ts)
                tokens = jax.lax.dynamic_update_slice(
                    tokens, tok[:, None], (0, i)
                )
                new_logits, cache = m(
                    TSDecoder.step, tok[:, None], base + i, cache, cross,
                    qw=qw,
                )
                return (i + 1, new_logits, cache, done, score, tokens, ts)

            _, _, _, _, scores, tokens, _ = jax.lax.while_loop(
                cond, body, (0, logits, cache, done0, score0, tokens0, ts0)
            )
            return tokens, scores

        def step(carry, i):
            logits, cache, done, score, ts = carry
            tok, done, score, ts = emit(logits, done, score, i, ts)
            new_logits, cache2 = m(
                TSDecoder.step, tok[:, None], base + i, cache, cross, qw=qw
            )
            return (new_logits, cache2, done, score, ts), tok

        carry = (logits, cache, done0, score0, ts0)
        (_, _, _, scores, _), tokens = jax.lax.scan(
            step, carry, jnp.arange(max_new)
        )
        return tokens.T, scores  # (b, max_new), (b,)

    return functools.partial(run, variables, _step_weights(dec, variables, cfg))


def build_beam_decoder(
    dec: TSDecoder,
    variables: Any,
    cfg: DecodeConfig = DecodeConfig(),
) -> Callable[[jax.Array, jax.Array], Tuple[jax.Array, jax.Array]]:
    """Returns jitted ``run(memory, spk_prompt) -> (tokens, scores)`` for
    ``cfg.beam_size`` beams; the best hypothesis per utterance is returned.

    The (batch, beam) axes are flattened for every decoder call; the KV cache
    is gathered per step with the beam backpointers.
    """
    k = cfg.beam_size
    if k == 1:
        return build_greedy_decoder(dec, variables, cfg)
    if cfg.speculative_gamma > 0:
        raise ValueError(
            "speculative decode is greedy-only: beam_size must be 1 when "
            "speculative_gamma > 0"
        )
    if cfg.with_timestamps:
        raise ValueError(
            "timestamp decoding is greedy-only (beam_size 1): the timestamp "
            "rules are not threaded through the beam carry"
        )

    if cfg.prefill_quantized and not cfg.quantize_cross_kv:
        raise ValueError(
            "prefill_quantized requires quantize_cross_kv=True: the option "
            "prefills on the QUANTIZED cross K/V so the dense stacked form "
            "is never materialized (its whole point); without a quantized "
            "token loop it would silently change nothing"
        )

    @functools.partial(jax.jit, donate_argnums=())
    def run(
        variables: Any, qw: Any, memory: jax.Array, spk_prompt: jax.Array
    ):
        b = memory.shape[0]
        prompt_len = 1 + spk_prompt.shape[1] if dec.use_spk_prompt else 0
        max_new, min_new = length_bounds(
            cfg, memory, spk_prompt, dec.use_spk_prompt
        )
        total = prompt_len + len(cfg.init_tokens) + max_new
        vocab = dec.dims.n_vocab

        m = lambda method, *a, **kw: dec.apply(variables, *a, method=method, **kw)
        # Pick the cache-reorder path. The DMA kernel copies whole cache
        # rows HBM->HBM, so every leaf's per-row payload must flatten into
        # whole (32, 128) tiles: total * per_position_elements % 4096 == 0.
        # A short extra tail on the cache length buys that for the dense
        # bf16 cache (per-pos = n_heads * head_dim); the int8 cache's fp32
        # scale leaves (per-pos = n_heads) would need a tail in the
        # hundreds, so "auto" falls back to the XLA gather there.
        # beam search pins the FLAT cache layout: the reorder kernel's
        # live-prefix read optimization needs time sublane-major (the
        # time-minor greedy layout interleaves live columns through the
        # whole flattened row payload)
        per_pos = [
            int(math.prod(x.shape[3:]))
            for x in jax.tree_util.tree_leaves(
                jax.eval_shape(
                    lambda: m(TSDecoder.init_cache, b, total, layout="flat")
                )
            )
        ]
        required = 1
        for pp in per_pos:
            required = math.lcm(required, 4096 // math.gcd(pp, 4096))
        use_dma = cfg.beam_reorder == "dma" or (
            cfg.beam_reorder == "auto" and required <= 64
        )
        base = prompt_len + len(cfg.init_tokens)
        # flush boundaries must align to the reorder kernel's 8-position
        # chunks (a partial chunk would re-permute already-logical window
        # entries): round the period up and start the first window at the
        # aligned boundary at or below the prefix end — the few prefix
        # positions that land in the window are identical across beams, so
        # window handling of them is trivially correct.
        R = -(-cfg.defer_reorder // 8) * 8 if cfg.defer_reorder > 0 else 0
        if R > 0:
            # deferred reorder: dense flat cache only; pad the cache length
            # by one window, rounded only to what the flush kernel's DMA
            # tiles and the 8-position chunks need — the settled kernel's
            # position group adapts to any 8-multiple length, and padding
            # to a power of two was measured to OOM medium/b64/beam5 by
            # 45 MB (the beam-tiled cache grows with every padded position)
            # the EFFECTIVE layout, not just the request: the flat cache
            # auto-disables when n_state doesn't tile 128 lanes (TextDecoder
            # ._flat_self), and the deferred window/flush math is written
            # against the flat (L, b*k, T, n_state) leaves only
            hd = dec.dims.n_text_state // dec.dims.n_text_head
            if not (
                dec.self_kv_bits == 16
                and dec.flat_self_cache
                and dec.dims.n_text_state % 128 == 0
                and 128 % hd == 0
            ):
                raise ValueError(
                    "defer_reorder needs the dense flat self cache, which "
                    f"these dims do not support (n_state="
                    f"{dec.dims.n_text_state} must tile 128 lanes)"
                )
            assert required <= 64, required
            mlt = math.lcm(required, 8)
            total = -(-(total + R) // mlt) * mlt
        elif use_dma:
            total = -(-total // required) * required  # pad to tile
        # Prefill at PLAIN batch rows: every beam starts from the identical
        # prefix, so cross K/V projection + prefill run ONCE per utterance
        # and the resulting cache/logits are tiled across beams after — k x
        # less prefill compute and HBM than beam-expanding the memory first.
        pq = cfg.prefill_quantized
        cross = m(TSDecoder.cross_kv, memory, quantize=pq)
        cache = m(TSDecoder.init_cache, b, total, layout="flat")
        init = jnp.tile(
            jnp.asarray(cfg.init_tokens, jnp.int32)[None, :], (b, 1)
        )
        logits, cache = m(TSDecoder.prefill, init, spk_prompt, cache, cross)
        if cfg.quantize_cross_kv:
            # The quantized cross K/V STAYS at b rows for the whole token
            # loop: the grouped Pallas kernel reads each utterance's K/V
            # tiles once for all k beams (attend_quant beam_group) — the
            # decode loop's dominant HBM term does not scale with the beam
            # width, and the k x cross-KV memory blowup never happens.
            if not pq:
                cross = m(TSDecoder.quantize_cross, cross)
            group = k
        else:
            # dense cross K/V goes through plain per-row attention and must
            # be physically beam-expanded (stacked batch axis 1)
            cross = jax.tree_util.tree_map(
                lambda x: jnp.repeat(x, k, axis=1), cross
            )
            group = 1
        # beam-flatten the prefix state: (layers, b, ...) -> (layers, b*k, ...)
        cache = jax.tree_util.tree_map(
            lambda x: jnp.repeat(x, k, axis=1), cache
        )
        logits = jnp.repeat(logits, k, axis=0)  # (b*k, vocab)

        neg_inf = jnp.float32(-1e30)
        # beam 0 active, others dead at start so the first step picks top-k
        # distinct continuations of the single initial hypothesis.
        scores = jnp.tile(
            jnp.concatenate(
                [jnp.zeros((1,)), jnp.full((k - 1,), neg_inf)]
            )[None, :],
            (b, 1),
        )  # (b, k)

        anc0 = jnp.arange(b * k, dtype=jnp.int32)  # deferred lineage map
        s0_init = jnp.int32(base - base % 8)  # chunk-aligned (see above)

        def step_core(i, logits, cache, scores, done, lengths, s0, anc):
            # every live beam has emitted exactly i tokens at step i, so the
            # min-length eot mask is uniform; finished beams are overridden
            # to eot-only right after, unaffected by the mask
            if min_new > 0:
                masked = logits.at[:, cfg.eot].set(jnp.float32(-1e30))
                logits = jnp.where(i < min_new, masked, logits)
            logp = jax.nn.log_softmax(logits, axis=-1).reshape(b, k, vocab)

            # finished beams: only eot allowed, at zero cost
            eot_only = jnp.full((vocab,), neg_inf).at[cfg.eot].set(0.0)
            logp = jnp.where(done[..., None], eot_only[None, None, :], logp)

            cand = scores[..., None] + logp  # (b, k, vocab)
            flat = cand.reshape(b, k * vocab)
            top_scores, top_idx = jax.lax.top_k(flat, k)  # (b, k)
            src_beam = top_idx // vocab  # (b, k)
            tok = (top_idx % vocab).astype(jnp.int32)  # (b, k)

            # gather carry state along beams; cache leaves are stacked
            # (layers, batch*beam, ...) so the beam axis is 1
            gather_idx = (
                jnp.arange(b)[:, None] * k + src_beam
            ).reshape(-1)  # (b*k,)
            if R > 0:
                # deferred reorder: track lineage, mini-reorder only the
                # window slab, flush the settled permutation every R steps
                pos_now = base + i
                anc2 = jnp.take(anc, gather_idx)  # compose permutations

                def window_reorder(x):
                    L_ = x.shape[0]
                    slab = jax.lax.dynamic_slice(
                        x, (0, 0, s0, 0),
                        (L_, b * k, R, x.shape[3]),
                    )
                    slab = jnp.take(slab, gather_idx, axis=1)
                    return jax.lax.dynamic_update_slice(
                        x, slab, (0, 0, s0, 0)
                    )

                cache2 = jax.tree_util.tree_map(window_reorder, cache)
                # branchless flush: live=0 on non-flush steps copies one
                # identity chunk (the aliased kernel leaves the rest
                # untouched), live=s0 applies the accumulated permutation
                flush = (pos_now - s0) >= R
                live = jnp.where(flush, s0, 0)
                # the reorder kernel clips to a 1-chunk minimum even at
                # live=0 — keep the identity permutation unless a flush
                # with a NON-EMPTY settled region is due, or that chunk of
                # already-logical window entries gets spuriously permuted
                idx_f = jnp.where(flush & (s0 > 0), anc2, anc0)
                leaves, treedef = jax.tree_util.tree_flatten(cache2)
                cache2 = jax.tree_util.tree_unflatten(
                    treedef,
                    beam_reorder_cache(
                        leaves, idx_f, live=live, time_len=total,
                        interpret=jax.default_backend() == "cpu",
                    ),
                )
                anc2 = jnp.where(flush, anc0, anc2)
                s0 = jnp.where(flush, s0 + R, s0)
            elif use_dma:
                leaves, treedef = jax.tree_util.tree_flatten(cache)
                cache2 = jax.tree_util.tree_unflatten(
                    treedef,
                    beam_reorder_cache(
                        leaves, gather_idx,
                        # positions [0, prefix + i) are filled; the tail
                        # is zero-filled without being read
                        live=prompt_len + len(cfg.init_tokens) + i,
                        time_len=total,
                        interpret=jax.default_backend() == "cpu",
                    ),
                )
            else:
                cache2 = jax.tree_util.tree_map(
                    lambda x: jnp.take(x, gather_idx, axis=1), cache
                )
            if R == 0:
                anc2 = anc
            done_prev = jnp.take_along_axis(done, src_beam, axis=1)
            done2 = done_prev | (tok == cfg.eot)
            # hypothesis length follows the beam LINEAGE (gather by src_beam);
            # counting per fixed slot would mix lengths across reshuffles
            lengths2 = jnp.take_along_axis(lengths, src_beam, axis=1) + (
                ~done_prev
            ).astype(jnp.int32)
            pos = base + i
            step_kw = {}
            if R > 0:
                step_kw = dict(row_map=anc2, settled=s0, defer_window=R)
            new_logits, cache3 = m(
                TSDecoder.step, tok.reshape(-1, 1), pos, cache2, cross,
                qw=qw, beam_group=group, **step_kw,
            )
            return (
                (new_logits, cache3, top_scores, done2, lengths2, s0, anc2),
                (tok, src_beam),
            )

        done0 = jnp.zeros((b, k), bool)
        lengths0 = jnp.zeros((b, k), jnp.int32)
        if cfg.stop_early:
            # While-loop with preallocated history buffers. Once every beam
            # of every utterance is done, each further step would emit eot
            # with identity backpointers and unchanged scores/lengths (top_k
            # over already-sorted finished scores is the identity permutation)
            # — so the unwritten tail below IS the scan's tail.
            toks0 = jnp.full((max_new, b, k), cfg.eot, jnp.int32)
            backptr0 = jnp.broadcast_to(
                jnp.arange(k, dtype=jnp.int32)[None, None, :],
                (max_new, b, k),
            )

            def cond(carry):
                i, _, _, _, done = carry[:5]
                return (i < max_new) & ~jnp.all(done)

            def body(carry):
                (i, logits, cache, scores, done, lengths, s0, anc, toks,
                 backptr) = carry
                (logits, cache, scores, done, lengths, s0, anc), (tok, src) = (
                    step_core(i, logits, cache, scores, done, lengths, s0, anc)
                )
                toks = jax.lax.dynamic_update_slice(
                    toks, tok[None], (i, 0, 0)
                )
                backptr = jax.lax.dynamic_update_slice(
                    backptr, src.astype(jnp.int32)[None], (i, 0, 0)
                )
                return (
                    i + 1, logits, cache, scores, done, lengths, s0, anc,
                    toks, backptr,
                )

            (_, _, _, final_scores, _, final_lengths, _, _, toks, backptr) = (
                jax.lax.while_loop(
                    cond,
                    body,
                    (0, logits, cache, scores, done0, lengths0, s0_init,
                     anc0, toks0, backptr0),
                )
            )
        else:
            def step(carry, i):
                logits, cache, scores, done, lengths, s0, anc = carry
                return step_core(
                    i, logits, cache, scores, done, lengths, s0, anc
                )

            carry = (logits, cache, scores, done0, lengths0, s0_init, anc0)
            (_, _, final_scores, _, final_lengths, _, _), (toks, backptr) = (
                jax.lax.scan(step, carry, jnp.arange(max_new))
            )
        # toks/backptr: (steps, b, k). Backtrace best beam per utterance.
        if cfg.length_penalty > 0.0:
            norm = final_scores / (
                final_lengths.astype(jnp.float32) ** cfg.length_penalty
            )
        else:
            norm = final_scores
        best = jnp.argmax(norm, axis=-1)  # (b,)

        def backtrace(carry, step_data):
            beam = carry  # (b,)
            tok_s, ptr_s = step_data  # (b, k) each
            t = jnp.take_along_axis(tok_s, beam[:, None], axis=1)[:, 0]
            prev = jnp.take_along_axis(ptr_s, beam[:, None], axis=1)[:, 0]
            return prev, t

        _, rev_tokens = jax.lax.scan(
            backtrace, best, (toks, backptr), reverse=True
        )
        # rev_tokens is time-ordered already (scan reverse collects in original
        # order), shape (steps, b)
        best_scores = jnp.take_along_axis(
            final_scores, best[:, None], axis=1
        )[:, 0]
        return rev_tokens.T, best_scores

    return functools.partial(run, variables, _step_weights(dec, variables, cfg))


def strip_eot(tokens, eot: int) -> List[List[int]]:
    """Host-side: cut each row at the first eot."""
    out = []
    for row in tokens:
        row = list(int(t) for t in row)
        if eot in row:
            row = row[: row.index(eot)]
        out.append(row)
    return out
