"""Self-drafting speculative greedy decode (multi-token verify).

The decode token loop is HBM-bound: every emitted token re-reads the full
cross-attention K/V, the self-KV cache prefix, and (dense mode) the decoder
weights — docs/KERNELS.md §7 measures the cross-attention read alone at its
hardware ceiling (~7 ms/step at medium/batch-64; three independent walls bind
at the same point). The only lever left is the ELEMENT COUNT PER TOKEN:
this module amortizes every per-step HBM read over multiple tokens.

Scheme (greedy-exact speculative decoding):

1. **Draft**: the first ``draft_layers`` decoder layers plus the shared
   final LayerNorm + tied-embedding head propose ``gamma`` greedy tokens,
   one at a time (an early-exit "self-draft" — zero extra weights, and the
   draft re-uses the target's own cross K/V and cache layout, just sliced
   to its depth).
2. **Verify**: the FULL decoder runs ONE causal chunk over the
   ``gamma + 1`` tokens ``[pending, d_1..d_gamma]`` — the cross-KV / cache
   / weight reads are paid once for the whole chunk
   (``TextDecoder.step`` with M > 1) — and greedily re-decodes each
   position.
3. **Accept** the longest draft prefix that matches the target's own
   greedy choices, plus the target's next token (the "bonus"); rows of the
   batch advance independently (per-row ragged positions, scatter cache
   writes).

The output is the TARGET's greedy transcript, token for token — drafting
only affects speed, never content (every emitted token is an argmax of
full-model logits over the identical committed context; the equality is
pinned by tests/test_speculative.py against ``build_greedy_decoder``).

Per-token cost model (per accepted-token HBM traffic):

    cost/token = (gamma * C_draft + C_verify) / (E[n_acc] + 1)

with ``C_draft ~ (draft_layers / n_layers) * C_step`` and
``C_verify ~ C_step`` (the verify chunk's reads are the same reads one
step pays). At draft_layers=4/24 and gamma=4: break-even at a ~33%
acceptance rate, ~2.4x fewer bytes/token at 80% acceptance. Acceptance is
a property of the trained weights and the audio — measure it on real
checkpoints before turning this on in production (random-init weights
accept ~nothing, so synthetic benches understate it; see docs/SERVING.md).

No reference counterpart: the reference decodes cachelessly one token at a
time (/root/reference/model/whisper_decoder.py:174-176); this is a
serving-capacity feature of the TPU build on top of the exact same model.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

from ..models.ts_decoder import TSDecoder
from .search import DecodeConfig, _step_weights


def draft_variables(variables: Any, draft_layers: int) -> Any:
    """Slice a TSDecoder variables dict down to the first ``draft_layers``
    decoder blocks (the early-exit draft). Embeddings, positions and the
    final LayerNorm are shared with the full model (same leaves)."""
    dec_p = variables["params"]["decoder"]
    new_dec = dict(dec_p)
    if "block" in dec_p:  # nn.scan stacked: leaves carry a leading L axis
        new_dec["block"] = jax.tree_util.tree_map(
            lambda x: x[:draft_layers], dec_p["block"]
        )
    else:
        for name in list(new_dec):
            if name.startswith("blocks_") and (
                int(name.split("_")[-1]) >= draft_layers
            ):
                del new_dec[name]
    out = dict(variables)
    out["params"] = dict(variables["params"])
    out["params"]["decoder"] = new_dec
    return out


def _slice_stack(tree: Any, n: int) -> Any:
    """First ``n`` entries of every stacked-leading-layer-axis leaf."""
    return jax.tree_util.tree_map(lambda x: x[:n], tree)


def build_speculative_decoder(
    dec: TSDecoder,
    variables: Any,
    cfg: DecodeConfig,
    return_stats: bool = False,
    draft_vars: Any = None,
) -> Callable[[jax.Array, jax.Array], Tuple[jax.Array, jax.Array]]:
    """Returns jitted ``run(memory, spk_prompt) -> (tokens, scores)`` with
    the same contract as ``build_greedy_decoder`` — eot-padded token rows
    and per-row summed log-probs of the emitted tokens.

    ``draft_vars=None`` (default) self-drafts: the draft is the first
    ``cfg.draft_layers`` blocks of the target's own weights, so its cross
    K/V and prefix cache are SLICES of the target's (zero extra compute).
    Passing ``draft_vars`` (a TSDecoder variables dict at
    ``n_text_layer=cfg.draft_layers``, e.g. a distilled draft from
    ``train.distill.distill_draft``) switches to separate-draft mode: the
    draft computes its OWN cross K/V, prefill and per-chunk cache writes
    from its own weights (one extra draft step per chunk processes the
    last proposal so the draft cache stays complete without copying from
    the target — target-cache entries are wrong for non-target draft
    weights). Either way every emitted token is an argmax of FULL-model
    logits, so the output is exactly the target's greedy transcript.

    With ``return_stats=True`` the runner returns a third element, a dict
    of per-row int32 counters for measuring DRAFT ACCEPTANCE on real
    checkpoints (the quantity the whole scheme's speedup rides on — see
    the module docstring's cost model): ``chunks`` (draft+verify rounds
    run while the row was live), ``accepted`` (raw matched-prefix draft
    tokens, the cost model's E[n_acc] numerator; drafted = chunks*gamma),
    and ``emitted`` (tokens emitted after the prefill token). The token/
    score outputs are identical to the stats-less runner.

    Requires ``cfg.speculative_gamma >= 1``, ``1 <= cfg.draft_layers <=
    n_text_layer``, and a decoder built with ``flat_self_cache=False``
    (ragged per-row positions need the 5-D cache; the packed-flat Pallas
    kernel is uniform-position only).
    """
    g = int(cfg.speculative_gamma)
    d = int(cfg.draft_layers)
    n_layers = dec.dims.n_text_layer
    if g < 1:
        raise ValueError(f"speculative_gamma must be >= 1, got {g}")
    if not (1 <= d <= n_layers):
        raise ValueError(
            f"draft_layers must be in [1, {n_layers}], got {d}"
        )
    # the packed flat cache is uniform-position only; spec decode needs the
    # 5-D cache's per-row scatter writes. Check the EFFECTIVE property (the
    # flag auto-disables on dims the flat layout can't tile).
    from ..models.whisper.modules import TextDecoder

    probe = TextDecoder(
        dec.dims, dtype=dec.dtype, cross_kv_bits=dec.cross_kv_bits,
        self_kv_bits=dec.self_kv_bits, flat_self_cache=dec.flat_self_cache,
    )
    if probe._flat_self:
        raise ValueError(
            "speculative decode needs per-row ragged cache writes: build "
            "the TSDecoder with flat_self_cache=False"
        )
    if cfg.prefill_quantized and not cfg.quantize_cross_kv:
        raise ValueError(
            "prefill_quantized requires quantize_cross_kv=True (see "
            "DecodeConfig)"
        )

    draft = TSDecoder(
        dec.dims.replace(n_text_layer=d),
        startofprev_token=dec.startofprev_token,
        use_spk_prompt=dec.use_spk_prompt,
        dtype=dec.dtype,
        cross_kv_bits=dec.cross_kv_bits,
        self_kv_bits=dec.self_kv_bits,
        flat_self_cache=False,
    )
    separate = draft_vars is not None
    dvars = draft_vars if separate else draft_variables(variables, d)
    qw = _step_weights(dec, variables, cfg)
    dqw = (
        _step_weights(draft, dvars, cfg) if separate
        else None if qw is None
        else {"layers": _slice_stack(qw["layers"], d), "emb": qw["emb"]}
    )
    max_new = cfg.max_new_tokens

    @functools.partial(jax.jit, donate_argnums=())
    def run(
        variables: Any, dvars: Any, qw: Any, dqw: Any,
        memory: jax.Array, spk_prompt: jax.Array,
    ):
        b = memory.shape[0]
        prompt_len = 1 + spk_prompt.shape[1] if dec.use_spk_prompt else 0
        base = prompt_len + len(cfg.init_tokens)
        # + g + 1 slack: the last verify chunk may write past the budget
        total = base + max_new + g + 1

        m = lambda meth, *a, **kw: dec.apply(variables, *a, method=meth, **kw)
        md = lambda meth, *a, **kw: draft.apply(dvars, *a, method=meth, **kw)

        pq = cfg.prefill_quantized
        cross = m(TSDecoder.cross_kv, memory, quantize=pq)
        cache = m(TSDecoder.init_cache, b, total)
        init = jnp.tile(
            jnp.asarray(cfg.init_tokens, jnp.int32)[None, :], (b, 1)
        )
        logits, cache = m(TSDecoder.prefill, init, spk_prompt, cache, cross)
        if cfg.quantize_cross_kv and not pq:
            cross = m(TSDecoder.quantize_cross, cross)
        if separate:
            # distilled draft: its own cross K/V projections and prefix
            # cache — target-cache slices would be wrong for its weights
            dcross = md(TSDecoder.cross_kv, memory, quantize=pq)
            dcache = md(TSDecoder.init_cache, b, total)
            _, dcache = md(
                TSDecoder.prefill, init, spk_prompt, dcache, dcross
            )
            if cfg.quantize_cross_kv and not pq:
                dcross = md(TSDecoder.quantize_cross, dcross)
        else:
            # self-draft: the draft reads the SAME cross K/V and prefix
            # cache, sliced to its depth (identical weights -> identical
            # entries)
            dcross = _slice_stack(cross, d)
            dcache = _slice_stack(cache, d)

        # first emitted token: argmax of the prefill logits (as in greedy);
        # min_new_tokens masks eot from the raw logits exactly like the
        # greedy loop (emission index 0 < min)
        if cfg.min_new_tokens > 0:
            logits = logits.at[:, cfg.eot].set(jnp.float32(-1e30))
        logp0 = jax.nn.log_softmax(logits, axis=-1)
        tok0 = jnp.argmax(logp0, axis=-1).astype(jnp.int32)  # (b,)
        score0 = jnp.take_along_axis(logp0, tok0[:, None], axis=-1)[:, 0]
        done0 = tok0 == cfg.eot
        out0 = jnp.full((b, max_new), cfg.eot, jnp.int32).at[:, 0].set(tok0)
        count0 = jnp.ones((b,), jnp.int32)
        pos0 = jnp.full((b,), base, jnp.int32)
        rows = jnp.arange(b)
        j = jnp.arange(g + 1)  # chunk-local indices

        def sync_draft(dleaf, tleaf, pos):
            """Copy the verify chunk's first-d-layer cache entries into the
            draft cache (covers the bonus position the draft never ran)."""
            def per_row(t_r, d_r, p):
                sl = jax.lax.dynamic_slice(
                    t_r, (0, p) + (0,) * (t_r.ndim - 2),
                    (d, g + 1) + t_r.shape[2:],
                )
                return jax.lax.dynamic_update_slice(
                    d_r, sl, (0, p) + (0,) * (d_r.ndim - 2)
                )

            return jax.vmap(per_row, in_axes=(1, 1, 0), out_axes=1)(
                tleaf[:d], dleaf, pos
            )

        def cond(c):
            return ~jnp.all(c[0])

        def body(c):
            done, pending, pos, count, score, out, cache, dcache, st = c

            # ---- draft phase: gamma early-exit greedy proposals ----
            # ei = the emission index the proposal is verified AT (draft
            # d_{j+1} vs target t_j at index count+j): apply the same
            # min-length eot mask as the verifier so min_new_tokens doesn't
            # tank acceptance
            def dstep(carry, _):
                dcache, tok, p, ei = carry
                lg, dcache = md(
                    TSDecoder.step, tok[:, None], p, dcache, dcross, qw=dqw
                )
                if cfg.min_new_tokens > 0:
                    lgm = lg.at[:, cfg.eot].set(jnp.float32(-1e30))
                    lg = jnp.where(
                        ei[:, None] < cfg.min_new_tokens, lgm, lg
                    )
                nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
                return (dcache, nxt, p + 1, ei + 1), nxt

            # separate-draft mode runs ONE extra step processing the last
            # proposal d_g (output discarded) so the draft's own cache is
            # complete through pos+g — the full-acceptance bonus position
            # that sync_draft would otherwise copy from the target
            (dcache, _, _, _), drafts = jax.lax.scan(
                dstep, (dcache, pending, pos, count), None,
                length=g + 1 if separate else g,
            )
            drafts = jnp.moveaxis(drafts, 0, 1)[:, :g]  # (b, g)

            # ---- verify: one causal chunk through the full decoder ----
            ver_in = jnp.concatenate([pending[:, None], drafts], axis=1)
            vlogits, cache = m(
                TSDecoder.step, ver_in, pos, cache, cross, qw=qw
            )  # (b, g+1, vocab)
            # chunk position jj of a row with count emitted tokens would be
            # emitted at index count+jj: mask eot there below min_new_tokens
            # (raw logits, before log_softmax — the greedy emit() convention)
            if cfg.min_new_tokens > 0:
                eidx = count[:, None] + j[None, :]  # (b, g+1)
                vmasked = vlogits.at[:, :, cfg.eot].set(jnp.float32(-1e30))
                vlogits = jnp.where(
                    eidx[..., None] < cfg.min_new_tokens, vmasked, vlogits
                )
            vlogp = jax.nn.log_softmax(vlogits, axis=-1)
            t = jnp.argmax(vlogits, axis=-1).astype(jnp.int32)  # (b, g+1)

            # ---- accept: longest matching prefix + the bonus token ----
            match = (drafts == t[:, :-1]).astype(jnp.int32)  # (b, g)
            n_acc = jnp.sum(jnp.cumprod(match, axis=1), axis=1)  # [0, g]
            active = (~done).astype(jnp.int32)
            st = (st[0] + active, st[1] + active * n_acc)
            cand = j[None, :] <= n_acc[:, None]  # candidate emissions
            is_eot = (t == cfg.eot) & cand
            # first candidate eot (g+1 when none): emission stops there
            eot_at = jnp.min(jnp.where(is_eot, j[None, :], g + 1), axis=1)
            n_emit = jnp.minimum(n_acc + 1, eot_at + 1)
            n_emit = jnp.minimum(n_emit, max_new - count)  # token budget
            n_emit = jnp.where(done, 0, n_emit)  # (b,)
            emit = j[None, :] < n_emit[:, None]  # (b, g+1)

            # scatter emitted tokens at per-row output offsets
            col = jnp.where(emit, count[:, None] + j[None, :], max_new)
            out = out.at[rows[:, None], col].set(t, mode="drop")
            tok_logp = jnp.take_along_axis(vlogp, t[..., None], -1)[..., 0]
            score = score + jnp.sum(
                jnp.where(emit, tok_logp, 0.0), axis=1
            )

            count = count + n_emit
            done = done | (eot_at < n_emit) | (count >= max_new)
            # the last emitted token becomes the next pending token; its
            # K/V is NOT in the cache yet (it is the next chunk's first row)
            last = jnp.maximum(n_emit - 1, 0)
            pending = jnp.where(
                n_emit > 0, jnp.take_along_axis(t, last[:, None], 1)[:, 0],
                pending,
            )
            pos = pos + n_emit
            if not separate:
                # self-draft: copy the verify chunk's first-d-layer entries
                # (exact for shared weights). The separate draft's own
                # sequential writes already cover every position the next
                # chunk can read — accepted-prefix entries match by
                # construction, and any stale rejected-draft slot is
                # rewritten (write-before-attend) before it is attended.
                dcache = tuple(
                    sync_draft(dl, tl, pos - n_emit)
                    for dl, tl in zip(dcache, cache)
                )
            return done, pending, pos, count, score, out, cache, dcache, st

        zeros = jnp.zeros((b,), jnp.int32)
        carry = (
            done0, tok0, pos0, count0, score0, out0, cache, dcache,
            (zeros, zeros),
        )
        fin = jax.lax.while_loop(cond, body, carry)
        out, score = fin[5], fin[4]
        if return_stats:
            chunks, accepted = fin[8]
            stats = {
                "chunks": chunks,
                "accepted": accepted,
                "emitted": fin[3] - 1,  # count minus the prefill token
            }
            return out, score, stats
        return out, score

    return functools.partial(run, variables, dvars, qw, dqw)
