"""CTC prefix scoring + joint CTC/attention decode tests.

The reference decodes through espnet.nets.beam_search with an optional CTC
partial scorer (SURVEY.md §3.2). These tests pin the scorer against
brute-force path enumeration and an independent numpy recursion, then the
joint beam decoder against exhaustive hypothesis search on a tiny model.
"""

import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robustsq_whisper_tpu.decode.ctc_prefix import (
    ctc_label_prob_np,
    ctc_prefix_score_np,
    eos_score,
    init_state,
    mask_ctc_logp,
    score_candidates,
)


def _rand_logp(rng, t, v):
    x = rng.standard_normal((t, v)) * 1.5
    return x - np.log(np.exp(x).sum(-1, keepdims=True)).reshape(t, 1)


def _brute_prefix_prob(logp, prefix, blank=0):
    """Sum path probabilities over ALL alignments whose collapsed labelling
    begins with ``prefix`` (exponential; tiny T/V only)."""
    t, v = logp.shape
    total = -np.inf
    for path in itertools.product(range(v), repeat=t):
        lab = []
        prev = None
        for s in path:
            if s != blank and s != prev:
                lab.append(s)
            prev = s
        if tuple(lab[: len(prefix)]) == tuple(prefix):
            total = np.logaddexp(total, sum(logp[i, s] for i, s in enumerate(path)))
    return total


def _brute_label_prob(logp, labels, blank=0):
    t, v = logp.shape
    total = -np.inf
    for path in itertools.product(range(v), repeat=t):
        lab = []
        prev = None
        for s in path:
            if s != blank and s != prev:
                lab.append(s)
            prev = s
        if tuple(lab) == tuple(labels):
            total = np.logaddexp(total, sum(logp[i, s] for i, s in enumerate(path)))
    return total


def test_np_reference_vs_bruteforce():
    rng = np.random.default_rng(0)
    logp = _rand_logp(rng, 5, 3)
    for prefix in [(1,), (2,), (1, 2), (1, 1), (2, 1, 2)]:
        np.testing.assert_allclose(
            ctc_prefix_score_np(logp, list(prefix)),
            _brute_prefix_prob(logp, prefix),
            rtol=1e-6, atol=1e-8,
        )
        np.testing.assert_allclose(
            ctc_label_prob_np(logp, list(prefix)),
            _brute_label_prob(logp, prefix),
            rtol=1e-6, atol=1e-8,
        )


def test_incremental_scorer_matches_reference():
    """Drive score_candidates along token sequences; every step's psi must
    equal the from-scratch numpy prefix score, and eos_score the full
    labelling probability."""
    rng = np.random.default_rng(1)
    b, t, v = 2, 6, 5
    logp_np = np.stack([_rand_logp(rng, t, v) for _ in range(b)])
    logp = mask_ctc_logp(jnp.asarray(logp_np), jnp.asarray([t, t]))
    seqs = [[1, 2, 2, 3], [4, 1, 4, 4]]

    state = init_state(logp)
    last = jnp.asarray([-1, -1])
    cands = jnp.asarray(
        [[1, 2, 3, 4], [1, 2, 3, 4]]
    )  # score all non-blank tokens each step
    prefix = [[], []]
    for step in range(4):
        psi, new_states = score_candidates(state, last, logp, cands)
        for row in range(b):
            for ci in range(cands.shape[1]):
                want = ctc_prefix_score_np(
                    logp_np[row], prefix[row] + [int(cands[row, ci])]
                )
                np.testing.assert_allclose(
                    float(psi[row, ci]), want, rtol=1e-4, atol=1e-4
                )
        # follow the planned sequence
        chosen = [seqs[row][step] for row in range(b)]
        ci = [int(np.where(np.asarray(cands[row]) == chosen[row])[0][0]) for row in range(b)]
        state = jnp.stack([new_states[row, ci[row]] for row in range(b)])
        last = jnp.asarray(chosen)
        for row in range(b):
            prefix[row].append(chosen[row])

    es = eos_score(state)
    for row in range(b):
        want = ctc_label_prob_np(logp_np[row], prefix[row])
        np.testing.assert_allclose(float(es[row]), want, rtol=1e-4, atol=1e-4)


def test_scorer_respects_lengths():
    """Masked frames beyond each utterance's length must reproduce scoring on
    the truncated input exactly."""
    rng = np.random.default_rng(2)
    t_full, t_short, v = 7, 4, 4
    logp_np = _rand_logp(rng, t_full, v)
    logp = mask_ctc_logp(
        jnp.asarray(logp_np)[None], jnp.asarray([t_short])
    )
    state = init_state(logp)
    psi, new_states = score_candidates(
        state, jnp.asarray([-1]), logp, jnp.asarray([[1, 2, 3]])
    )
    for ci, c in enumerate([1, 2, 3]):
        want = ctc_prefix_score_np(logp_np[:t_short], [c])
        np.testing.assert_allclose(float(psi[0, ci]), want, rtol=1e-4, atol=1e-4)
    es = eos_score(new_states[0])  # states of prefixes (c,)
    for ci, c in enumerate([1, 2, 3]):
        want = ctc_label_prob_np(logp_np[:t_short], [c])
        np.testing.assert_allclose(float(es[ci]), want, rtol=1e-4, atol=1e-4)


# ---------------- joint beam decoder ----------------


from robustsq_whisper_tpu.decode.joint import build_joint_beam_decoder
from robustsq_whisper_tpu.decode.search import DecodeConfig, build_beam_decoder
from robustsq_whisper_tpu.models import TSDecoder, WhisperDims

DIMS = WhisperDims(
    n_mels=80, n_vocab=12, n_audio_ctx=8, n_audio_state=16,
    n_audio_head=2, n_audio_layer=1, n_text_ctx=32, n_text_state=16,
    n_text_head=2, n_text_layer=1,
)
EOT = 2


def _decoder_setup(seed=0, b=2):
    rng = np.random.default_rng(seed)
    dec = TSDecoder(DIMS, startofprev_token=3)
    memory = jnp.asarray(rng.standard_normal((b, 8, 16)), jnp.float32)
    prompt = jnp.asarray(rng.standard_normal((b, 2, 16)), jnp.float32)
    ys = jnp.asarray(rng.integers(0, 12, (b, 4)))
    variables = dec.init(jax.random.PRNGKey(seed), memory, ys, prompt)
    # a random CTC projection over the same frames; weights ride as a jit
    # argument (build_joint_beam_decoder contract)
    w_ctc = jnp.asarray(rng.standard_normal((16, 12)) * 0.7, jnp.float32)
    ctc_apply = lambda v, mem: mem @ v
    return dec, variables, memory, prompt, (ctc_apply, w_ctc)


def _ref_joint_beam(
    att_next_logp, ctc_logp_rows, cfg, prompt_frames_lens, maxlen_i, minlen_i
):
    """Independent python/numpy joint beam search (ESPnet-style partial
    scoring): att_next_logp(b_row, tokens) -> (vocab,) log-softmax."""
    b = len(ctc_logp_rows)
    k, C, w = cfg.beam_size, max(cfg.pre_beam, cfg.beam_size + 1), cfg.ctc_decode_weight
    results = []
    for row in range(b):
        logp_ctc = ctc_logp_rows[row]
        hyps = [((), 0.0, 0.0, False)]  # (tokens, att_cum, psi, done)
        for i in range(int(maxlen_i[row])):
            pool = []
            for tokens, att_cum, psi_cum, hdone in hyps:
                if hdone:
                    pool.append((tokens, att_cum, psi_cum, True,
                                 (1 - w) * att_cum + w * psi_cum))
                    continue
                att = att_next_logp(row, tokens)
                att = att.copy()
                if i < int(minlen_i[row]):
                    att[EOT] = -1e30
                order = np.argsort(-att)
                cands = [c for c in order[: C - 1] if c != EOT] + [EOT]
                for c in cands:
                    if i >= int(maxlen_i[row]) and c != EOT:
                        continue
                    if c == EOT:
                        psi_c = ctc_label_prob_np(logp_ctc, list(tokens))
                    else:
                        psi_c = ctc_prefix_score_np(
                            logp_ctc, list(tokens) + [int(c)]
                        )
                    att_c = att_cum + att[c]
                    comb = (1 - w) * att_c + w * psi_c
                    pool.append(
                        (tokens + (int(c),), att_c, psi_c, c == EOT, comb)
                    )
            pool.sort(key=lambda e: -e[4])
            hyps = [(t, a, p, d) for t, a, p, d, _ in pool[:k]]
        best = max(hyps, key=lambda e: (1 - w) * e[1] + w * e[2])
        toks = list(best[0])
        if EOT in toks:
            toks = toks[: toks.index(EOT)]
        results.append(toks)
    return results


def _att_next_logp_fn(dec, variables, memory, prompt, init_tokens):
    def fn(row, tokens):
        ys = jnp.asarray([list(init_tokens) + list(tokens)], jnp.int32)
        logits = dec.apply(
            variables, memory[row : row + 1], ys, prompt[row : row + 1]
        )
        return np.asarray(
            jax.nn.log_softmax(logits[0, -1].astype(jnp.float32))
        ).astype(np.float64)

    return fn


@pytest.mark.parametrize("w", [0.0, 0.3, 0.7])
def test_joint_beam_matches_reference(w):
    """The jitted joint decoder's tokens equal an independent cache-free
    python beam search using the numpy CTC recursions."""
    dec, variables, memory, prompt, (ctc_apply, ctc_vars) = _decoder_setup(seed=3)
    cfg = DecodeConfig(
        max_new_tokens=4, eot=EOT, init_tokens=(1,), beam_size=3,
        ctc_decode_weight=w, pre_beam=6,
    )
    run = build_joint_beam_decoder(dec, variables, ctc_apply, ctc_vars, cfg)
    tokens, scores = run(memory, prompt)
    from robustsq_whisper_tpu.decode.search import strip_eot

    got = strip_eot(np.asarray(tokens), EOT)

    logits_np = np.asarray(ctc_apply(ctc_vars, memory.astype(jnp.float32)))
    logp_rows = [
        (r - np.log(np.exp(r).sum(-1, keepdims=True))) for r in logits_np
    ]
    att_fn = _att_next_logp_fn(dec, variables, memory, prompt, cfg.init_tokens)
    want = _ref_joint_beam(
        att_fn, logp_rows, cfg, None,
        maxlen_i=[4, 4], minlen_i=[0, 0],
    )
    assert got == want, (got, want)


def test_joint_w0_matches_attention_beam():
    """ctc_decode_weight=0 must reproduce the optimized attention-only beam
    search token-for-token (pre-beam covers the selection)."""
    dec, variables, memory, prompt, (ctc_apply, ctc_vars) = _decoder_setup(seed=5)
    base = DecodeConfig(
        max_new_tokens=5, eot=EOT, init_tokens=(1,), beam_size=3,
    )
    att_run = build_beam_decoder(
        dec, variables,
        __import__("dataclasses").replace(base, stop_early=False),
    )
    joint_run = build_joint_beam_decoder(
        dec, variables, ctc_apply, ctc_vars,
        __import__("dataclasses").replace(
            base, ctc_decode_weight=0.0, pre_beam=11
        ),
    )
    t_att, s_att = att_run(memory, prompt)
    t_joint, s_joint = joint_run(memory, prompt)
    from robustsq_whisper_tpu.decode.search import strip_eot

    assert strip_eot(np.asarray(t_att), EOT) == strip_eot(
        np.asarray(t_joint), EOT
    )


def test_ratio_length_bounds():
    """maxlenratio caps output at floor(ratio*enc_len) per utterance;
    minlenratio masks eot below its floor."""
    dec, variables, memory, prompt, (ctc_apply, ctc_vars) = _decoder_setup(seed=7)
    from robustsq_whisper_tpu.decode.search import strip_eot

    cfg = DecodeConfig(
        max_new_tokens=8, eot=EOT, init_tokens=(1,), beam_size=2,
        ctc_decode_weight=0.2, pre_beam=6, maxlenratio=0.5, minlenratio=0.25,
    )
    run = build_joint_beam_decoder(dec, variables, ctc_apply, ctc_vars, cfg)
    mem_lens = jnp.asarray([8, 4], jnp.int32)
    tokens, _ = run(memory, prompt, mem_lens)
    rows = strip_eot(np.asarray(tokens), EOT)
    # maxlen: floor(0.5*8)=4, floor(0.5*4)=2; minlen: 2 and 1
    assert len(rows[0]) <= 4 and len(rows[1]) <= 2
    assert len(rows[0]) >= 2 and len(rows[1]) >= 1


def test_ratio_bounds_attention_only_paths():
    """maxlenratio/minlenratio also bound the optimized attention-only
    greedy and beam paths (static encoder window)."""
    from robustsq_whisper_tpu.decode.search import (
        build_greedy_decoder, strip_eot,
    )

    dec, variables, memory, prompt, _ = _decoder_setup(seed=9)
    cfg = DecodeConfig(
        max_new_tokens=8, eot=EOT, init_tokens=(1,), beam_size=1,
        maxlenratio=0.5, minlenratio=0.25,
    )
    run = build_greedy_decoder(dec, variables, cfg)
    tokens, _ = run(memory, prompt)
    # enc frames = 8 - 2 prompt = 6 -> maxlen 3, minlen 1
    assert tokens.shape[1] == 3
    rows = strip_eot(np.asarray(tokens), EOT)
    assert all(len(r) >= 1 for r in rows)

    cfgb = __import__("dataclasses").replace(cfg, beam_size=2)
    runb = build_beam_decoder(dec, variables, cfgb)
    tokens_b, _ = runb(memory, prompt)
    assert tokens_b.shape[1] == 3


def test_decode_dataset_threads_encoder_lengths(tmp_path, monkeypatch):
    """decode_dataset must hand the joint decoder per-utterance encoder
    lengths (regression: run(memory, spk_prompt) used to drop them, so the
    CTC prefix scorer treated every pad frame of the static window as real
    audio and the ratio bounds came from the padded length)."""
    from robustsq_whisper_tpu.data import simulate
    from robustsq_whisper_tpu.data.dataset import KaldiTSDataset
    from robustsq_whisper_tpu.decode import joint as joint_mod
    from robustsq_whisper_tpu.decode.pipeline import decode_dataset
    from robustsq_whisper_tpu.models import (
        QFormerTSEncoder,
        TSASRModel,
        TSEncoderConfig,
        TSModelConfig,
    )
    from robustsq_whisper_tpu.tokenizer.whisper_tokenizer import ByteTokenizer
    from tests.test_pipeline import _make_clean_dir

    edims = WhisperDims(
        n_mels=80, n_vocab=300, n_audio_ctx=32, n_audio_state=32,
        n_audio_head=2, n_audio_layer=1, n_text_ctx=64, n_text_state=32,
        n_text_head=2, n_text_layer=1,
    )
    ts = TSEncoderConfig(
        num_query_tokens=2, num_hidden_layers=1, qformer_hidden_size=32,
        qformer_heads=2, qformer_intermediate_size=64,
    )
    src = _make_clean_dir(tmp_path, n_speakers=3, utts_per_spk=2)
    data_dir = str(tmp_path / "mix")
    simulate.generate_overlap_enrollment(
        src, data_dir, simulate.OverlapConfig(num_mixtures=4, seed=0)
    )
    tok = ByteTokenizer()
    speech_sec = (edims.n_audio_ctx * 2 * 160) / 16000
    dataset = KaldiTSDataset(
        data_dir, tok, speech_seconds=speech_sec,
        enroll_seconds=speech_sec / 2, text_len=48, seed=0,
    )

    cfg = TSModelConfig(
        vocab_size=300, sos=257, eos=258, startofprev=259, ctc_weight=0.3,
    )
    model = TSASRModel(edims, ts, cfg)
    rng = jax.random.PRNGKey(0)
    first = next(dataset.batches(4, shuffle=False))
    first.pop("utt_ids")
    variables = model.init(rng, first, rng, 0, train=False)

    encoder = QFormerTSEncoder(edims, ts)
    decoder = TSDecoder(edims, startofprev_token=259)
    enc_vars = {
        "params": variables["params"]["encoder"],
        "buffers": variables["buffers"]["encoder"],
    }
    dec_vars = {"params": variables["params"]["decoder"]}
    ctc_vars = variables["params"]["ctc"]["ctc_lo"]

    seen = []
    orig = joint_mod.build_joint_beam_decoder

    def spy(*a, **kw):
        run = orig(*a, **kw)

        def wrapped(memory, spk_prompt, mem_lens=None):
            seen.append(
                (None if mem_lens is None else np.asarray(mem_lens),
                 np.asarray(memory.shape))
            )
            return run(memory, spk_prompt, mem_lens)

        return wrapped

    monkeypatch.setattr(joint_mod, "build_joint_beam_decoder", spy)
    dcfg = DecodeConfig(
        max_new_tokens=4, eot=258, init_tokens=(257,), beam_size=2,
        ctc_decode_weight=0.3, pre_beam=4,
    )
    result = decode_dataset(
        encoder, enc_vars, decoder, dec_vars, dataset, tok, dcfg,
        batch_size=4, ctc_vars=ctc_vars,
    )
    assert len(result.hyps) == len(dataset)
    assert seen, "the joint path never ran"
    prompt = ts.num_query_tokens
    for mem_lens, mem_shape in seen:
        assert mem_lens is not None, "mem_lens dropped (pad frames scored)"
        enc_t = int(mem_shape[1]) - prompt
        assert mem_lens.shape == (int(mem_shape[0]),)
        assert np.all(mem_lens >= 1 + prompt)
        assert np.all(mem_lens <= enc_t + prompt)
    # per-utterance lens follow the conv out-length formula on the mel lens
    batch = next(dataset.batches(4, shuffle=False))
    want = np.minimum(
        1 + (np.asarray(batch["speech_lens"]) // 160 - 1) // 2,
        edims.n_audio_ctx,
    ) + prompt
    np.testing.assert_array_equal(seen[0][0], want)
