"""Joint CTC/attention beam search with encoder-relative length bounds.

The reference decodes through ESPnet's ``espnet.nets.beam_search``
(SURVEY.md §3.2), which supports (a) a CTC prefix scorer joined with the
attention decoder at ``ctc_weight`` and (b) ``maxlenratio``/``minlenratio``
output bounds relative to the encoder length. The named reference config is
beam-1 attention-only, so ``decode/search.py`` (the optimized serving path)
stays attention-only; this module supplies the parity options as a separate,
simpler jitted program:

- combined score = ``(1-w)·att_cum + w·ctc_prefix_cum`` per hypothesis,
  where the CTC term is Graves prefix scoring (decode/ctc_prefix.py) and
  eot's CTC score is the full-labelling probability — ESPnet
  CTCPrefixScorer semantics;
- partial scoring: CTC scores only the ``cfg.pre_beam`` candidates the
  attention posterior ranks highest per hypothesis (ESPnet's
  ``pre_beam_score_key`` pattern) — full-vocab prefix scoring would be
  O(T·V) per step;
- per-utterance length bounds from ``mem_lens`` (falling back to the static
  window): eot is masked below ``minlen_i`` and forced at ``maxlen_i``.

TPU notes: everything is statically shaped — the candidate set (k·C per
utterance), the CTC forward-variable state (N, T, 2), and the fixed-length
``lax.scan`` over decode steps (sized by ``maxlenratio`` against the static
encoder window at trace time). The (b, T, V) CTC log-softmax is never
materialized: per-frame logsumexp once, candidate columns gathered per step.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.ts_decoder import TSDecoder
from .ctc_prefix import NEG_INF, score_candidate_columns
from .search import DecodeConfig, length_bounds_static


def build_joint_beam_decoder(
    dec: TSDecoder,
    variables: Any,
    ctc_apply: Callable[[Any, jax.Array], jax.Array],
    ctc_vars: Any,
    cfg: DecodeConfig,
    prompt_frames: int = 0,
) -> Callable[..., Tuple[jax.Array, jax.Array]]:
    """Returns jitted ``run(memory, spk_prompt, mem_lens=None) ->
    (tokens, scores)``.

    ``ctc_apply(ctc_vars, memory_stripped)`` maps prompt-stripped encoder
    frames to CTC logits (b, T, V). ``ctc_vars`` rides as a jit ARGUMENT
    (bound via partial) like the decoder weights — the medium CTC kernel is
    ~200 MB and a closed-over device array would lower as an HLO constant
    fetched device->host during tracing. ``prompt_frames`` = speaker-prompt
    frames to strip before CTC (the reference computes CTC on
    ``encoder_out[:, prompt_lens:]``, ts_qformer_espnet_model.py:215-222)."""
    k = cfg.beam_size
    w = cfg.ctc_decode_weight
    assert 0.0 <= w < 1.0, f"ctc_decode_weight must be in [0, 1), got {w}"
    c_cand = max(cfg.pre_beam, k + 1)  # candidates must cover a top-k + eot
    blank = 0

    @functools.partial(jax.jit, static_argnums=(), donate_argnums=())
    def run(
        variables: Any,
        ctc_vars: Any,
        memory: jax.Array,
        spk_prompt: jax.Array,
        mem_lens: Optional[jax.Array] = None,
    ):
        b = memory.shape[0]
        vocab = dec.dims.n_vocab
        enc_t = memory.shape[1] - prompt_frames

        # static decode-step budget (trace-time int; shared ratio formula)
        maxlen_static, _ = length_bounds_static(cfg, enc_t)

        if mem_lens is None:
            ctc_lens = jnp.full((b,), enc_t, jnp.int32)
        else:
            ctc_lens = jnp.clip(mem_lens - prompt_frames, 1, enc_t)
        if cfg.maxlenratio > 0:
            # >= 1 like the static formula (ESPnet's max(1, ratio*len)):
            # a 1-2 frame utterance must still get to emit one token
            maxlen_i = jnp.minimum(
                jnp.maximum(
                    (cfg.maxlenratio * ctc_lens).astype(jnp.int32), 1
                ),
                maxlen_static,
            )
        else:
            maxlen_i = jnp.full((b,), maxlen_static, jnp.int32)
        if cfg.minlenratio > 0:
            minlen_i = (cfg.minlenratio * ctc_lens).astype(jnp.int32)
        else:
            minlen_i = jnp.full((b,), cfg.min_new_tokens, jnp.int32)

        # ---- CTC posteriors: logits + per-frame logsumexp, blank columns,
        # frame masks; the (b, T, V) log-softmax is never materialized.
        ctc_logits = ctc_apply(
            ctc_vars, memory[:, prompt_frames:].astype(jnp.float32)
        )  # (b, T, V)
        lse = jax.nn.logsumexp(ctc_logits, axis=-1)  # (b, T)
        pad = (
            jnp.arange(enc_t)[None, :] >= ctc_lens[:, None]
        )  # (b, T) frames beyond the utterance
        x_blank_b = jnp.where(
            pad, 0.0, ctc_logits[..., blank] - lse
        )  # (b, T)

        # empty-prefix CTC state per hypothesis: r_b = cumsum blank, dead nb
        r_b0 = jnp.cumsum(x_blank_b, axis=1)  # (b, T)
        state0 = jnp.stack(
            [jnp.full_like(r_b0, NEG_INF), r_b0], axis=-1
        )  # (b, T, 2)
        state0 = jnp.repeat(state0, k, axis=0)  # (N, T, 2)

        # ---- attention decoder prefill (shared prefix; tile across beams)
        m = lambda method, *a, **kw: dec.apply(variables, *a, method=method, **kw)
        prompt_len = dec.prompt_len(spk_prompt) if dec.use_spk_prompt else 0
        total = prompt_len + len(cfg.init_tokens) + maxlen_static
        cross = m(TSDecoder.cross_kv, memory)
        cache = m(TSDecoder.init_cache, b, total)
        init = jnp.tile(jnp.asarray(cfg.init_tokens, jnp.int32)[None], (b, 1))
        logits, cache = m(TSDecoder.prefill, init, spk_prompt, cache, cross)
        cross = jax.tree_util.tree_map(
            lambda x: jnp.repeat(x, k, axis=1), cross
        )
        cache = jax.tree_util.tree_map(
            lambda x: jnp.repeat(x, k, axis=1), cache
        )
        logits = jnp.repeat(logits, k, axis=0)  # (N, vocab)

        neg_inf = jnp.float32(-1e30)
        att_cum0 = jnp.tile(
            jnp.concatenate([jnp.zeros((1,)), jnp.full((k - 1,), neg_inf)])[
                None
            ],
            (b, 1),
        )  # (b, k): beam 0 live
        ctc_cum0 = jnp.zeros((b, k))  # psi(empty) = 0
        last0 = jnp.full((b * k,), -1, jnp.int32)
        done0 = jnp.zeros((b, k), bool)
        lengths0 = jnp.zeros((b, k), jnp.int32)
        utt = jnp.repeat(jnp.arange(b), k)  # (N,) hypothesis -> utterance

        def step(carry, i):
            (logits, cache, state, att_cum, ctc_cum, last, done, lengths) = carry
            att_logp = jax.nn.log_softmax(logits, axis=-1)  # (N, vocab)

            # min-length eot mask (per utterance), uniform across live beams
            below_min = (i < minlen_i)[:, None]  # (b, 1)
            eot_mask = jnp.where(below_min, neg_inf, 0.0)  # (b, 1)
            att_logp = att_logp.at[:, cfg.eot].add(
                jnp.repeat(eot_mask[:, 0], k)
            )

            # ---- candidate pre-selection by the attention posterior, with
            # eot always in the set (its CTC score is the labelling prob)
            cand_logp, cands = jax.lax.top_k(att_logp, c_cand)  # (N, C)
            # the LAST slot is the one canonical eot candidate; any eot the
            # top-k already picked elsewhere becomes a dead slot — a
            # duplicated candidate could otherwise occupy two beams and
            # collapse diversity (worst for finished beams, where both
            # copies would carry the identical frozen score)
            dead = (cands == cfg.eot).at[:, -1].set(False)
            cands = cands.at[:, -1].set(cfg.eot)
            cand_logp = cand_logp.at[:, -1].set(att_logp[:, cfg.eot])
            slot_eot = jnp.zeros((c_cand,), bool).at[-1].set(True)[None, :]

            # ---- CTC prefix scores of the candidates
            # gather candidate columns from (b, T, V): group hyps by utt
            cands_b = cands.reshape(b, k * c_cand)  # (b, k*C)
            cols = jnp.take_along_axis(
                ctc_logits, cands_b[:, None, :], axis=2
            )  # (b, T, k*C)
            cols = cols - lse[..., None]
            cols = jnp.where(pad[..., None], NEG_INF, cols)
            x_c = (
                cols.reshape(b, enc_t, k, c_cand)
                .transpose(0, 2, 1, 3)
                .reshape(b * k, enc_t, c_cand)
            )  # (N, T, C)
            x_blank = x_blank_b[utt]  # (N, T)
            same = cands == last[:, None]
            psi, new_states = score_candidate_columns(
                state, x_c, x_blank, same, last < 0
            )  # (N, C), (N, C, T, 2)
            # eot candidate: CTC score = full-labelling probability
            eos_sc = jnp.logaddexp(state[:, -1, 0], state[:, -1, 1])  # (N,)
            psi = jnp.where(slot_eot, eos_sc[:, None], psi)

            # ---- combined candidate scores
            att_new = att_cum.reshape(-1)[:, None] + cand_logp  # (N, C)
            comb = (1.0 - w) * att_new + w * psi
            comb = jnp.where(dead, neg_inf, comb)

            # finished beams: only the canonical eot slot, at frozen score
            frozen = (
                (1.0 - w) * att_cum.reshape(-1) + w * ctc_cum.reshape(-1)
            )[:, None]
            done_n = done.reshape(-1)[:, None]
            comb = jnp.where(
                done_n, jnp.where(slot_eot, frozen, neg_inf), comb
            )
            att_new = jnp.where(done_n, att_cum.reshape(-1)[:, None], att_new)
            psi = jnp.where(done_n, ctc_cum.reshape(-1)[:, None], psi)

            # maxlen: past the per-utterance bound everything must end now
            over = (i >= maxlen_i)[:, None]  # (b, 1)
            over_n = jnp.repeat(over[:, 0], k)[:, None]
            comb = jnp.where(
                over_n & ~slot_eot & ~done_n, neg_inf, comb
            )

            # ---- top-k over each utterance's k*C candidate pool
            pool = comb.reshape(b, k * c_cand)
            top_scores, top_idx = jax.lax.top_k(pool, k)  # (b, k) combined
            src_beam = top_idx // c_cand  # (b, k)
            src_cand = top_idx % c_cand
            flat_src = (jnp.arange(b)[:, None] * k + src_beam).reshape(-1)
            flat_pick = (
                flat_src * c_cand + src_cand.reshape(-1)
            )  # index into (N*C,)

            tok = cands.reshape(-1)[flat_pick].reshape(b, k).astype(jnp.int32)
            att_cum2 = att_new.reshape(-1)[flat_pick].reshape(b, k)
            ctc_cum2 = psi.reshape(-1)[flat_pick].reshape(b, k)
            state2 = new_states.reshape(-1, enc_t, 2)[flat_pick]  # (N, T, 2)
            # finished lineages keep their old state (their forward vars are
            # final; new_states for forced eot rows are meaningless)
            done_prev = jnp.take_along_axis(done, src_beam, axis=1)
            state_prev = state[flat_src]
            state2 = jnp.where(
                done_prev.reshape(-1)[:, None, None], state_prev, state2
            )
            last2 = jnp.where(
                done_prev.reshape(-1), last[flat_src], tok.reshape(-1)
            )
            cache2 = jax.tree_util.tree_map(
                lambda x: jnp.take(x, flat_src, axis=1), cache
            )
            done2 = done_prev | (tok == cfg.eot)
            lengths2 = jnp.take_along_axis(lengths, src_beam, axis=1) + (
                ~done_prev
            ).astype(jnp.int32)

            pos = prompt_len + len(cfg.init_tokens) + i
            new_logits, cache3 = m(
                TSDecoder.step, tok.reshape(-1, 1), pos, cache2, cross
            )
            return (
                (new_logits, cache3, state2, att_cum2, ctc_cum2, last2,
                 done2, lengths2),
                (tok, src_beam),
            )

        carry = (
            logits, cache, state0, att_cum0, ctc_cum0, last0, done0, lengths0
        )
        (_, _, _, att_f, ctc_f, _, _, lengths_f), (toks, backptr) = (
            jax.lax.scan(step, carry, jnp.arange(maxlen_static))
        )
        final_scores = (1.0 - w) * att_f + w * ctc_f
        if cfg.length_penalty > 0.0:
            norm = final_scores / (
                jnp.maximum(lengths_f, 1).astype(jnp.float32)
                ** cfg.length_penalty
            )
        else:
            norm = final_scores
        best = jnp.argmax(norm, axis=-1)  # (b,)

        def backtrace(beam, step_data):
            tok_s, ptr_s = step_data
            t = jnp.take_along_axis(tok_s, beam[:, None], axis=1)[:, 0]
            prev = jnp.take_along_axis(ptr_s, beam[:, None], axis=1)[:, 0]
            return prev, t

        _, rev = jax.lax.scan(backtrace, best, (toks, backptr), reverse=True)
        best_scores = jnp.take_along_axis(final_scores, best[:, None], axis=1)[
            :, 0
        ]
        return rev.T, best_scores

    return functools.partial(run, variables, ctc_vars)
