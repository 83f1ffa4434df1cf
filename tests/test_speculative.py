"""Speculative decode (decode/speculative.py): exact greedy equality.

The speculative decoder's contract is that drafting NEVER changes the
output — every emitted token is an argmax of full-model logits over the
identical committed context — so each test pins token-for-token (and
score) equality against ``build_greedy_decoder`` across draft depths,
gamma values, cross-KV quantization modes, and budget edge cases.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robustsq_whisper_tpu.decode.search import (
    DecodeConfig,
    build_beam_decoder,
    build_greedy_decoder,
)
from robustsq_whisper_tpu.decode.speculative import (
    build_speculative_decoder,
    draft_variables,
)
from robustsq_whisper_tpu.models import TSDecoder, WhisperDims

DIMS = WhisperDims(
    n_mels=80, n_vocab=50, n_audio_ctx=16, n_audio_state=32,
    n_audio_head=2, n_audio_layer=1, n_text_ctx=64, n_text_state=32,
    n_text_head=2, n_text_layer=4,
)
CFG = DecodeConfig(max_new_tokens=10, eot=2, init_tokens=(1,), beam_size=1)


@pytest.fixture(scope="module")
def dec_and_params():
    dec = TSDecoder(DIMS, startofprev_token=3, flat_self_cache=False)
    rng = np.random.default_rng(7)
    memory = jnp.asarray(rng.standard_normal((3, 10, 32)), jnp.float32)
    prompt = jnp.asarray(rng.standard_normal((3, 2, 32)), jnp.float32)
    ys = jnp.asarray(rng.integers(0, 50, (3, 4)))
    variables = dec.init(jax.random.PRNGKey(0), memory, ys, prompt)
    return dec, variables, memory, prompt


def _assert_equal(dec, variables, memory, prompt, cfg):
    g = build_greedy_decoder(
        dec, variables, dataclasses.replace(cfg, speculative_gamma=0)
    )
    s = build_speculative_decoder(dec, variables, cfg)
    tg, sg = g(memory, prompt)
    ts, ss = s(memory, prompt)
    np.testing.assert_array_equal(np.asarray(tg), np.asarray(ts))
    np.testing.assert_allclose(
        np.asarray(sg), np.asarray(ss), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("gamma", [1, 2, 4])
@pytest.mark.parametrize("draft_layers", [1, 2])
def test_speculative_matches_greedy(dec_and_params, gamma, draft_layers):
    dec, variables, memory, prompt = dec_and_params
    cfg = dataclasses.replace(
        CFG, speculative_gamma=gamma, draft_layers=draft_layers
    )
    _assert_equal(dec, variables, memory, prompt, cfg)


def test_full_depth_draft_accepts_everything(dec_and_params):
    """draft_layers == n_text_layer makes the draft the target itself —
    every proposal is accepted and the output is still exactly greedy."""
    dec, variables, memory, prompt = dec_and_params
    cfg = dataclasses.replace(
        CFG, speculative_gamma=3, draft_layers=DIMS.n_text_layer
    )
    _assert_equal(dec, variables, memory, prompt, cfg)


def test_speculative_quantized_cross_matches_quantized_greedy(
    dec_and_params,
):
    """With int8 cross-KV, spec decode must equal the QUANTIZED greedy
    loop (both paths attend the same quantized tensors)."""
    dec, variables, memory, prompt = dec_and_params
    cfg = dataclasses.replace(
        CFG, speculative_gamma=2, draft_layers=2, quantize_cross_kv=True
    )
    _assert_equal(dec, variables, memory, prompt, cfg)


def test_speculative_budget_shorter_than_chunk(dec_and_params):
    """max_new_tokens smaller than gamma+1 must truncate exactly like the
    greedy loop's fixed budget."""
    dec, variables, memory, prompt = dec_and_params
    cfg = dataclasses.replace(
        CFG, max_new_tokens=3, speculative_gamma=4, draft_layers=2
    )
    _assert_equal(dec, variables, memory, prompt, cfg)


def test_min_new_tokens_matches_greedy(dec_and_params):
    """min_new_tokens masks eot identically in the draft, verify, and
    greedy paths — speculative output stays token-for-token greedy."""
    dec, variables, memory, prompt = dec_and_params
    cfg = dataclasses.replace(
        CFG, speculative_gamma=2, draft_layers=2, min_new_tokens=6
    )
    _assert_equal(dec, variables, memory, prompt, cfg)
    ts, _ = build_speculative_decoder(dec, variables, cfg)(memory, prompt)
    assert (np.asarray(ts)[:, :6] != CFG.eot).all()


def test_return_stats_contract(dec_and_params):
    """return_stats=True: identical tokens/scores plus consistent per-row
    acceptance counters (the measurement docs/SERVING.md says to take
    before enabling speculation on a checkpoint)."""
    dec, variables, memory, prompt = dec_and_params
    g = int(3)
    cfg = dataclasses.replace(CFG, speculative_gamma=g, draft_layers=2)
    plain = build_speculative_decoder(dec, variables, cfg)
    with_stats = build_speculative_decoder(
        dec, variables, cfg, return_stats=True
    )
    tp, sp = plain(memory, prompt)
    ts, ss, st = with_stats(memory, prompt)
    np.testing.assert_array_equal(np.asarray(tp), np.asarray(ts))
    np.testing.assert_allclose(np.asarray(sp), np.asarray(ss), rtol=1e-6)

    chunks = np.asarray(st["chunks"])
    accepted = np.asarray(st["accepted"])
    emitted = np.asarray(st["emitted"])
    toks = np.asarray(ts)
    # every row that decoded anything ran at least one chunk
    assert (chunks >= 1).all()
    # raw matched-prefix acceptance is bounded by gamma per chunk
    assert (accepted <= chunks * g).all() and (accepted >= 0).all()
    # emitted excludes the prefill token and covers the non-padding tail:
    # per-row emitted tokens == non-eot prefix length (+ its eot if the
    # row terminated within budget), minus the 1 prefill emission
    n_real = (toks != CFG.eot).sum(axis=1)
    terminated = n_real < toks.shape[1]
    expect = n_real + terminated.astype(n_real.dtype) - 1
    np.testing.assert_array_equal(emitted, expect)
    # full-depth draft accepts every proposal
    full = build_speculative_decoder(
        dec, variables,
        dataclasses.replace(cfg, draft_layers=DIMS.n_text_layer),
        return_stats=True,
    )
    _, _, st_full = full(memory, prompt)
    acc_full = np.asarray(st_full["accepted"])
    ch_full = np.asarray(st_full["chunks"])
    em_full = np.asarray(st_full["emitted"])
    # each full-depth chunk matches the whole draft except possibly the
    # final (eot/budget-truncated) one
    assert (acc_full >= (ch_full - 1) * g).all()
    assert (em_full == emitted).all()


def test_builder_routes_and_validates(dec_and_params):
    dec, variables, memory, prompt = dec_and_params
    # build_beam_decoder routes beam=1 + gamma>0 to the speculative path
    cfg = dataclasses.replace(CFG, speculative_gamma=2, draft_layers=1)
    run = build_beam_decoder(dec, variables, cfg)
    g = build_greedy_decoder(
        dec, variables, dataclasses.replace(cfg, speculative_gamma=0)
    )
    np.testing.assert_array_equal(
        np.asarray(run(memory, prompt)[0]), np.asarray(g(memory, prompt)[0])
    )
    with pytest.raises(ValueError, match="greedy-only"):
        build_beam_decoder(
            dec, variables, dataclasses.replace(cfg, beam_size=4)
        )
    with pytest.raises(ValueError, match="draft_layers"):
        build_speculative_decoder(
            dec, variables, dataclasses.replace(cfg, draft_layers=99)
        )
    with pytest.raises(ValueError, match="speculative_gamma"):
        build_speculative_decoder(
            dec, variables, dataclasses.replace(cfg, speculative_gamma=-1)
        )


def test_draft_variables_slices_blocks(dec_and_params):
    dec, variables, *_ = dec_and_params
    dv = draft_variables(variables, 2)
    blk = dv["params"]["decoder"]["block"]
    full = variables["params"]["decoder"]["block"]
    for leaf_d, leaf_f in zip(
        jax.tree_util.tree_leaves(blk), jax.tree_util.tree_leaves(full)
    ):
        assert leaf_d.shape[0] == 2
        np.testing.assert_array_equal(
            np.asarray(leaf_d), np.asarray(leaf_f[:2])
        )
    # shared leaves are untouched
    assert (
        dv["params"]["decoder"]["token_embedding"]["embedding"]
        is variables["params"]["decoder"]["token_embedding"]["embedding"]
    )


def test_separate_draft_vars_exactness(dec_and_params):
    """draft_vars mode (distilled-draft plumbing): the output must be
    exactly greedy for ARBITRARY draft weights — a randomly re-initialized
    draft proposes garbage, acceptance collapses, tokens don't change."""
    dec, variables, memory, prompt = dec_and_params
    d = 2
    draft = TSDecoder(
        DIMS.replace(n_text_layer=d), startofprev_token=3,
        flat_self_cache=False,
    )
    ys = jnp.asarray(np.random.default_rng(1).integers(0, 50, (3, 4)))
    rand_dv = draft.init(jax.random.PRNGKey(99), memory, ys, prompt)
    cfg = dataclasses.replace(CFG, speculative_gamma=3, draft_layers=d)
    g = build_greedy_decoder(
        dec, variables, dataclasses.replace(cfg, speculative_gamma=0)
    )
    s = build_speculative_decoder(dec, variables, cfg, draft_vars=rand_dv)
    tg, sg_ = g(memory, prompt)
    ts, ss = s(memory, prompt)
    np.testing.assert_array_equal(np.asarray(tg), np.asarray(ts))
    np.testing.assert_allclose(
        np.asarray(sg_), np.asarray(ss), rtol=1e-5, atol=1e-5
    )


def test_separate_draft_with_teacher_slice_matches_self_mode(dec_and_params):
    """Passing draft_vars = the teacher's own sliced layers must reproduce
    self-draft mode exactly — same tokens AND same acceptance counters
    (the separate path's own prefill/cross/cache writes equal the slices
    they replace when the weights are identical)."""
    dec, variables, memory, prompt = dec_and_params
    cfg = dataclasses.replace(CFG, speculative_gamma=3, draft_layers=2)
    dv = draft_variables(variables, 2)
    s_self = build_speculative_decoder(
        dec, variables, cfg, return_stats=True
    )
    s_sep = build_speculative_decoder(
        dec, variables, cfg, return_stats=True, draft_vars=dv
    )
    t1, s1, st1 = s_self(memory, prompt)
    t2, s2, st2 = s_sep(memory, prompt)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_allclose(
        np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(st1["accepted"]), np.asarray(st2["accepted"])
    )
    np.testing.assert_array_equal(
        np.asarray(st1["chunks"]), np.asarray(st2["chunks"])
    )


def test_separate_draft_quantized_cross(dec_and_params):
    """Separate-draft mode under int8 cross-KV still equals the quantized
    greedy loop (both the target and the draft quantize their own cross)."""
    dec, variables, memory, prompt = dec_and_params
    d = 2
    draft = TSDecoder(
        DIMS.replace(n_text_layer=d), startofprev_token=3,
        flat_self_cache=False,
    )
    ys = jnp.asarray(np.random.default_rng(2).integers(0, 50, (3, 4)))
    rand_dv = draft.init(jax.random.PRNGKey(5), memory, ys, prompt)
    cfg = dataclasses.replace(
        CFG, speculative_gamma=2, draft_layers=d, quantize_cross_kv=True
    )
    g = build_greedy_decoder(
        dec, variables, dataclasses.replace(cfg, speculative_gamma=0)
    )
    s = build_speculative_decoder(dec, variables, cfg, draft_vars=rand_dv)
    np.testing.assert_array_equal(
        np.asarray(g(memory, prompt)[0]), np.asarray(s(memory, prompt)[0])
    )


def test_distill_draft_learns_teacher(dec_and_params):
    """train/distill.py end-to-end at tiny dims: distilling a 1-layer draft
    against the 4-layer teacher's greedy transcripts must (a) reach high
    teacher-forced argmax agreement, (b) raise measured decode-time
    acceptance above the undistilled draft's, (c) keep the output exactly
    greedy."""
    from robustsq_whisper_tpu.decode.search import strip_eot
    from robustsq_whisper_tpu.train.distill import (
        distill_draft,
        teacher_forcing_inputs,
    )

    dec, variables, memory, prompt = dec_and_params
    cfg = dataclasses.replace(CFG, speculative_gamma=3, draft_layers=1)
    greedy = build_greedy_decoder(
        dec, variables, dataclasses.replace(cfg, speculative_gamma=0)
    )
    tg, _ = greedy(memory, prompt)
    rows = strip_eot(np.asarray(tg), CFG.eot)
    L = max(len(r) for r in rows)
    text = np.full((len(rows), L), -1, np.int32)
    lens = np.zeros((len(rows),), np.int32)
    for i, r in enumerate(rows):
        text[i, : len(r)] = r
        lens[i] = len(r)
    ys_in, mask = teacher_forcing_inputs(text, lens, sot=1, eot=CFG.eot)

    def acceptance(dv):
        s = build_speculative_decoder(
            dec, variables, cfg, return_stats=True, draft_vars=dv
        )
        ts, _, st = s(memory, prompt)
        np.testing.assert_array_equal(np.asarray(tg), np.asarray(ts))
        ch = int(np.sum(np.asarray(st["chunks"])))
        return int(np.sum(np.asarray(st["accepted"]))) / max(
            ch * cfg.speculative_gamma, 1
        )

    base = acceptance(draft_variables(variables, 1))
    dv, stats = distill_draft(
        dec, variables, 1, memory, prompt, ys_in, mask,
        steps=200, lr=3e-3, batch_size=3, seed=0,
    )
    after = acceptance(dv)
    assert stats["final_agreement"] > 0.8, stats
    assert after > max(base, 0.5), (base, after, stats)


def test_ragged_step_matches_uniform_step(dec_and_params):
    """TextDecoder.step with a per-row position VECTOR (all equal) must
    reproduce the scalar-position step bit-for-bit — the ragged machinery
    (pos-emb gather, per-row masks, scatter writes) is a strict
    generalization."""
    dec, variables, memory, prompt = dec_and_params
    b = memory.shape[0]
    total = 16

    def run(pos):
        m = lambda meth, *a, **kw: dec.apply(
            variables, *a, method=meth, **kw
        )
        cross = m(TSDecoder.cross_kv, memory)
        cache = m(TSDecoder.init_cache, b, total)
        init = jnp.ones((b, 1), jnp.int32)
        logits, cache = m(TSDecoder.prefill, init, prompt, cache, cross)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
        return m(TSDecoder.step, tok, pos, cache, cross)

    base = 1 + prompt.shape[1] + 1
    lg_s, cache_s = jax.jit(run)(jnp.int32(base))
    lg_v, cache_v = jax.jit(run)(jnp.full((b,), base, jnp.int32))
    np.testing.assert_allclose(
        np.asarray(lg_s), np.asarray(lg_v), rtol=1e-6, atol=1e-6
    )
    for cs, cv in zip(cache_s, cache_v):
        np.testing.assert_allclose(
            np.asarray(cs), np.asarray(cv), rtol=1e-6, atol=1e-6
        )


def test_verify_chunk_matches_sequential_steps(dec_and_params):
    """One multi-token step (M=3) must produce the same logits trajectory
    and cache as three single-token steps over the same tokens."""
    dec, variables, memory, prompt = dec_and_params
    b = memory.shape[0]
    total = 16
    toks = jnp.asarray(
        np.random.default_rng(3).integers(4, 50, (b, 3)), jnp.int32
    )

    m = lambda meth, *a, **kw: dec.apply(variables, *a, method=meth, **kw)

    def setup():
        cross = m(TSDecoder.cross_kv, memory)
        cache = m(TSDecoder.init_cache, b, total)
        init = jnp.ones((b, 1), jnp.int32)
        _, cache = m(TSDecoder.prefill, init, prompt, cache, cross)
        return cross, cache

    base = 1 + prompt.shape[1] + 1
    cross, cache = jax.jit(setup)()

    @jax.jit
    def multi(cache):
        return m(
            TSDecoder.step, toks, jnp.full((b,), base, jnp.int32), cache,
            cross,
        )

    @jax.jit
    def seq(cache):
        lgs = []
        for i in range(3):
            lg, cache = m(
                TSDecoder.step, toks[:, i : i + 1], base + i, cache, cross
            )
            lgs.append(lg)
        return jnp.stack(lgs, axis=1), cache

    lg_m, cache_m = multi(cache)
    lg_s, cache_s = seq(cache)
    np.testing.assert_allclose(
        np.asarray(lg_m), np.asarray(lg_s), rtol=2e-5, atol=2e-5
    )
    for cm, cs in zip(cache_m, cache_s):
        np.testing.assert_allclose(
            np.asarray(cm), np.asarray(cs), rtol=2e-5, atol=2e-5
        )


@pytest.mark.slow
def test_trained_toy_has_nonzero_acceptance():
    """End-to-end speedup signal on a TRAINED model (VERDICT r2 weak #3):
    overfit the tiny TS model on a fixed synthetic batch, then speculative-
    decode the training inputs — the draft (early-exit prefix of the
    decoder) of a converged model must accept a nonzero fraction of
    proposals while the output stays exactly the full model's greedy
    transcript."""
    from robustsq_whisper_tpu.models import (
        TSASRModel, TSEncoderConfig, TSModelConfig,
    )
    from robustsq_whisper_tpu.models.ts_encoder import QFormerTSEncoder
    from robustsq_whisper_tpu.train.optim import OptimConfig
    from robustsq_whisper_tpu.train.step import (
        TrainConfig, create_train_state, make_train_step,
    )

    dims = dataclasses.replace(DIMS, n_vocab=64)
    ts = TSEncoderConfig(
        num_query_tokens=2, num_hidden_layers=1, qformer_hidden_size=32,
        qformer_heads=2, qformer_intermediate_size=64,
    )
    mcfg = TSModelConfig(
        vocab_size=64, sos=1, eos=2, startofprev=3, num_speakers=8,
        num_negatives=2, ctc_weight=0.0, contrastive_weight=0.0,
        use_specaug=False,
    )
    model = TSASRModel(dims, ts, mcfg)
    rng = np.random.default_rng(0)
    b, samples = 4, dims.n_audio_ctx * 2 * 160
    # fixed targets: short distinct sequences ending in eos
    text = np.full((b, 6), -1, np.int32)
    text_lens = np.zeros((b,), np.int32)
    seqs = [[10, 11, 12, 2], [20, 21, 2], [30, 31, 32, 33, 2], [40, 2]]
    for i, s in enumerate(seqs):
        text[i, : len(s)] = s
        text_lens[i] = len(s)
    batch = {
        "speech": jnp.asarray(
            rng.standard_normal((b, samples)) * 0.1, jnp.float32
        ),
        "speech_lens": jnp.full((b,), samples, jnp.int32),
        "enroll": jnp.asarray(
            rng.standard_normal((b, samples // 2)) * 0.1, jnp.float32
        ),
        "enroll_lens": jnp.full((b,), samples // 2, jnp.int32),
        "text": jnp.asarray(text),
        "text_lens": jnp.asarray(text_lens),
        "neg_logits": jnp.ones((b, b), jnp.float32),
        "spk_labels": jnp.zeros((b,), jnp.int32),
    }
    key = jax.random.PRNGKey(0)
    variables = model.init(key, batch, key, 0, train=False)
    tcfg = TrainConfig(optim=OptimConfig(lr=3e-3, schedule="constant"))
    state, tx = create_train_state(key, variables, tcfg)
    step = make_train_step(model, tx, tcfg, donate=False)
    first = last = None
    for i in range(120):
        state, stats = step(state, batch, jax.random.fold_in(key, i), 0)
        if i == 0:
            first = float(stats["loss"])
        last = float(stats["loss"])
    assert last < first * 0.5, (first, last)  # converged toy

    # encode once, then greedy vs speculative on the SAME memory
    enc = QFormerTSEncoder(dims, ts)
    bufs = state.buffers.get("buffers", state.buffers)
    enc_vars = {"params": state.params["encoder"], "buffers": bufs["encoder"]}
    from robustsq_whisper_tpu.audio.frontend import log_mel_spectrogram

    feats, flens = log_mel_spectrogram(batch["speech"], batch["speech_lens"])
    efeats, eflens = log_mel_spectrogram(
        batch["enroll"], batch["enroll_lens"]
    )
    memory, _, spk_prompt, _ = enc.apply(
        enc_vars, feats, flens, efeats, eflens
    )

    dec = TSDecoder(
        dims, startofprev_token=3, flat_self_cache=False
    )
    dec_vars = {"params": state.params["decoder"]}
    dcfg = DecodeConfig(
        max_new_tokens=8, eot=2, init_tokens=(1,), beam_size=1,
        speculative_gamma=3, draft_layers=2,
    )
    greedy = build_greedy_decoder(
        dec, dec_vars, dataclasses.replace(dcfg, speculative_gamma=0)
    )
    spec = build_speculative_decoder(dec, dec_vars, dcfg, return_stats=True)
    tg, _ = greedy(memory, spk_prompt)
    tspec, _, stats = spec(memory, spk_prompt)
    np.testing.assert_array_equal(np.asarray(tg), np.asarray(tspec))
    chunks = int(np.sum(np.asarray(stats["chunks"])))
    accepted = int(np.sum(np.asarray(stats["accepted"])))
    acceptance = accepted / max(chunks * dcfg.speculative_gamma, 1)
    # a converged toy must accept a nontrivial draft fraction
    assert chunks > 0 and acceptance > 0.25, (chunks, accepted, acceptance)
