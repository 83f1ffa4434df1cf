"""Tests for the TS-ASR stack: Qformer, TS encoder/decoder, losses, model.

Philosophy follows the reference's hermetic synthetic-fixture tests
(SURVEY.md §4) extended upward: behavioral invariants (mask correctness,
prompt-slice correctness, KV-cache equivalence) plus formula-level numeric
checks of the losses against independent numpy implementations.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robustsq_whisper_tpu.models import (
    QFormerAdapter,
    QformerConfig,
    QFormerTSEncoder,
    SpkAdapterTSEncoder,
    TSASRModel,
    TSDecoder,
    TSEncoderConfig,
    TSModelConfig,
    WhisperDims,
)
from robustsq_whisper_tpu.losses.asr import (
    add_sos_eos,
    label_smoothing_loss,
    token_accuracy,
)
from robustsq_whisper_tpu.losses.speaker import (
    AAMSoftmaxHead,
    AttentiveStatisticsPooling,
    arc_infonce_loss,
)
from robustsq_whisper_tpu.data import collate

DIMS = WhisperDims(
    n_mels=80, n_vocab=100, n_audio_ctx=32, n_audio_state=64,
    n_audio_head=2, n_audio_layer=2, n_text_ctx=64, n_text_state=64,
    n_text_head=2, n_text_layer=2,
)
QCFG = QformerConfig(
    encoder_width=64, hidden_size=48, num_attention_heads=4,
    intermediate_size=96, num_hidden_layers=2, num_query_tokens=4,
    max_position_embeddings=32,
)


# ---------------- Qformer ----------------


def test_qformer_shapes_and_padding_invariance():
    """Padded enrollment frames must not influence outputs (mask check)."""
    adapter = QFormerAdapter(QCFG)
    rng = np.random.default_rng(0)
    memory = jnp.asarray(rng.standard_normal((2, 10, 64)), jnp.float32)
    enroll = jnp.asarray(rng.standard_normal((2, 8, 64)), jnp.float32)
    enroll_lens = jnp.asarray([5, 8])
    memory_lens = jnp.asarray([10, 7])

    params = adapter.init(jax.random.PRNGKey(0), memory, memory_lens, enroll, enroll_lens)
    q, e = adapter.apply(params, memory, memory_lens, enroll, enroll_lens)
    assert q.shape == (2, 4, 48) and e.shape == (2, 8, 48)

    # corrupt the padded tail of enrollment row 0 — query/valid outputs of
    # row 0 must be identical
    enroll2 = enroll.at[0, 5:].set(99.0)
    q2, e2 = adapter.apply(params, memory, memory_lens, enroll2, enroll_lens)
    np.testing.assert_allclose(np.asarray(q[0]), np.asarray(q2[0]), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(e[0, :5]), np.asarray(e2[0, :5]), atol=2e-5
    )

    # corrupt padded speech memory of row 1 — row 1 queries must not change
    memory2 = memory.at[1, 7:].set(-50.0)
    q3, _ = adapter.apply(params, memory2, memory_lens, enroll, enroll_lens)
    np.testing.assert_allclose(np.asarray(q[1]), np.asarray(q3[1]), atol=2e-5)


def test_qformer_query_ffn_split():
    """Queries and enrollment must flow through different FFNs: zeroing the
    enrollment-FFN params must change enroll outputs but not query outputs
    at layer-level (cross-attn couples them across layers, so test 1 layer)."""
    cfg = QformerConfig(
        encoder_width=64, hidden_size=48, num_attention_heads=4,
        intermediate_size=96, num_hidden_layers=1, num_query_tokens=4,
        max_position_embeddings=32,
    )
    adapter = QFormerAdapter(cfg)
    rng = np.random.default_rng(1)
    memory = jnp.asarray(rng.standard_normal((1, 6, 64)), jnp.float32)
    enroll = jnp.asarray(rng.standard_normal((1, 5, 64)), jnp.float32)
    params = adapter.init(jax.random.PRNGKey(1), memory, None, enroll, None)
    q1, e1 = adapter.apply(params, memory, None, enroll, None)

    p = jax.tree_util.tree_map(lambda x: x, params)  # copy
    ffn = p["params"]["layers_0"]["ffn"]
    ffn["fc1"]["kernel"] = jnp.zeros_like(ffn["fc1"]["kernel"])
    q2, e2 = adapter.apply(p, memory, None, enroll, None)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-6)
    assert not np.allclose(np.asarray(e1), np.asarray(e2))


def test_qformer_training_dropout():
    """The Qformer trains with BertConfig-default dropout 0.1 (reference
    qformer_adapter.py:35 constructs BertConfig() with default
    hidden/attention dropout): stochastic under deterministic=False with
    distinct rngs, reproducible with the same rng, identity at inference,
    and disabled when the rates are zero."""
    import dataclasses as dc

    adapter = QFormerAdapter(QCFG)
    rng = np.random.default_rng(3)
    memory = jnp.asarray(rng.standard_normal((2, 10, 64)), jnp.float32)
    enroll = jnp.asarray(rng.standard_normal((2, 8, 64)), jnp.float32)
    params = adapter.init(jax.random.PRNGKey(0), memory, None, enroll, None)

    # inference path ignores any dropout rng entirely
    q0, _ = adapter.apply(params, memory, None, enroll, None)
    q1, _ = adapter.apply(
        params, memory, None, enroll, None, True, jax.random.PRNGKey(7)
    )
    np.testing.assert_array_equal(np.asarray(q0), np.asarray(q1))

    # training: distinct rngs -> distinct outputs; same rng -> reproducible
    qa, _ = adapter.apply(
        params, memory, None, enroll, None, False, jax.random.PRNGKey(1)
    )
    qb, _ = adapter.apply(
        params, memory, None, enroll, None, False, jax.random.PRNGKey(2)
    )
    qa2, _ = adapter.apply(
        params, memory, None, enroll, None, False, jax.random.PRNGKey(1)
    )
    assert np.abs(np.asarray(qa) - np.asarray(qb)).max() > 1e-4
    np.testing.assert_array_equal(np.asarray(qa), np.asarray(qa2))

    # zero rates restore determinism even in training mode
    zero = QFormerAdapter(
        dc.replace(QCFG, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    )
    qz, _ = zero.apply(
        params, memory, None, enroll, None, False, jax.random.PRNGKey(1)
    )
    np.testing.assert_allclose(np.asarray(qz), np.asarray(q0), atol=1e-6)


# ---------------- TS encoder ----------------


def test_ts_encoder_prompt_concat():
    enc = QFormerTSEncoder(
        DIMS,
        TSEncoderConfig(
            num_query_tokens=3, num_hidden_layers=1, qformer_hidden_size=48,
            qformer_heads=4, qformer_intermediate_size=96,
        ),
    )
    rng = np.random.default_rng(2)
    frames = 2 * DIMS.n_audio_ctx
    feats = jnp.asarray(rng.standard_normal((2, 80, frames)), jnp.float32)
    efeats = jnp.asarray(rng.standard_normal((2, 80, 20)), jnp.float32)
    feats_lens = jnp.asarray([frames, frames // 2])
    efeats_lens = jnp.asarray([20, 16])

    params = enc.init(jax.random.PRNGKey(2), feats, feats_lens, efeats, efeats_lens)
    out, out_lens, prompt, enroll_emb = enc.apply(
        params, feats, feats_lens, efeats, efeats_lens
    )
    assert out.shape == (2, 3 + DIMS.n_audio_ctx, 64)
    assert prompt.shape == (2, 3, 64)
    assert enroll_emb.shape == (2, 10, 64)  # conv2 stride 2: 20 -> 10
    np.testing.assert_array_equal(
        np.asarray(out_lens), [3 + DIMS.n_audio_ctx, 3 + DIMS.n_audio_ctx // 2]
    )


def test_spk_adapter_encoder_variants():
    rng = np.random.default_rng(3)
    frames = 2 * DIMS.n_audio_ctx
    feats = jnp.asarray(rng.standard_normal((2, 80, frames)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)
    for method in ["cat", "additive", "film", "cln"]:
        enc = SpkAdapterTSEncoder(DIMS, enroll_size=16, adapter_method=method)
        params = enc.init(jax.random.PRNGKey(3), feats, None, emb)
        out, _ = enc.apply(params, feats, None, emb)
        assert out.shape == (2, DIMS.n_audio_ctx, 64), method
        # different speaker embedding must change the output
        out2, _ = enc.apply(params, feats, None, emb + 1.0)
        if method == "cln":
            # zero-init delta heads: identical at init is expected; perturb
            p = jax.tree_util.tree_map(np.array, jax.device_get(params))
            p["params"]["attn_cln"]["delta_scale"]["kernel"] += 0.1
            out_a, _ = enc.apply(p, feats, None, emb)
            out_b, _ = enc.apply(p, feats, None, emb + 1.0)
            assert not np.allclose(np.asarray(out_a), np.asarray(out_b))
        else:
            assert not np.allclose(np.asarray(out), np.asarray(out2)), method


# ---------------- TS decoder ----------------


def test_ts_decoder_prompt_slice_and_cache():
    dec = TSDecoder(DIMS, startofprev_token=90)
    rng = np.random.default_rng(4)
    memory = jnp.asarray(rng.standard_normal((2, 12, 64)), jnp.float32)
    prompt = jnp.asarray(rng.standard_normal((2, 3, 64)), jnp.float32)
    ys_in = jnp.asarray(rng.integers(0, 100, (2, 6)))

    params = dec.init(jax.random.PRNGKey(4), memory, ys_in, prompt)
    logits = dec.apply(params, memory, ys_in, prompt)
    assert logits.shape == (2, 6, 100)

    # KV-cache path must reproduce the training-forward logits
    def m(method, *args):
        return dec.apply(params, *args, method=method)

    cross = m(TSDecoder.cross_kv, memory)
    cache = m(TSDecoder.init_cache, 2, 16)
    n_init = 2
    logits_pre, cache = m(
        TSDecoder.prefill, ys_in[:, :n_init], prompt, cache, cross
    )
    np.testing.assert_allclose(
        np.asarray(logits_pre), np.asarray(logits[:, n_init - 1]),
        rtol=1e-4, atol=1e-4,
    )
    prompt_len = 1 + 3
    for i in range(n_init, 6):
        step_logits, cache = m(
            TSDecoder.step,
            ys_in[:, i : i + 1],
            jnp.int32(prompt_len + i),
            cache,
            cross,
        )
        np.testing.assert_allclose(
            np.asarray(step_logits), np.asarray(logits[:, i]),
            rtol=1e-4, atol=1e-4, err_msg=f"step {i}",
        )


# ---------------- losses ----------------


def test_add_sos_eos():
    ys = jnp.asarray([[5, 6, 7, -1, -1], [8, -1, -1, -1, -1]])
    lens = jnp.asarray([3, 1])
    ys_in, ys_out, in_lens = add_sos_eos(ys, lens, sos=1, eos=2, pad_in=2)
    np.testing.assert_array_equal(
        np.asarray(ys_in), [[1, 5, 6, 7, 2, 2], [1, 8, 2, 2, 2, 2]]
    )
    np.testing.assert_array_equal(
        np.asarray(ys_out), [[5, 6, 7, 2, -1, -1], [8, 2, -1, -1, -1, -1]]
    )
    np.testing.assert_array_equal(np.asarray(in_lens), [4, 2])


def test_label_smoothing_loss_matches_manual():
    rng = np.random.default_rng(5)
    logits = rng.standard_normal((2, 4, 7)).astype(np.float32)
    targets = np.asarray([[1, 2, 3, -1], [4, -1, -1, -1]])
    got = float(
        label_smoothing_loss(
            jnp.asarray(logits), jnp.asarray(targets), smoothing=0.1
        )
    )
    # manual KLDiv computation (ESPnet semantics, batch-normalized)
    vocab = 7
    conf, off = 0.9, 0.1 / (vocab - 1)
    total = 0.0
    for b in range(2):
        for t in range(4):
            y = targets[b, t]
            if y == -1:
                continue
            logp = logits[b, t] - np.log(np.exp(logits[b, t]).sum())
            true = np.full(vocab, off)
            true[y] = conf
            total += float((true * (np.log(true) - logp)).sum())
    assert got == pytest.approx(total / 2, rel=1e-5)


def test_token_accuracy():
    logits = jnp.asarray(
        [[[0.0, 10.0, 0.0], [10.0, 0.0, 0.0]], [[0.0, 0.0, 10.0], [10.0, 0.0, 0.0]]]
    )
    targets = jnp.asarray([[1, 0], [2, -1]])
    assert float(token_accuracy(logits, targets)) == pytest.approx(1.0)
    targets2 = jnp.asarray([[1, 1], [2, -1]])
    assert float(token_accuracy(logits, targets2)) == pytest.approx(2 / 3)


def test_asp_matches_manual_formula():
    asp = AttentiveStatisticsPooling(8, use_projection=False)
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 5, 8)).astype(np.float32)
    lens = np.asarray([3, 5])
    out = asp.apply({"params": {}}, jnp.asarray(x), 4.0, jnp.asarray(lens))
    # manual
    for b, L in enumerate(lens):
        xa = x[b, :L]
        p = xa.mean(0)
        p = p / np.linalg.norm(p)
        s = 4.0 * (xa @ p)
        a = np.exp(s - s.max()); a /= a.sum()
        mu = (a[:, None] * xa).sum(0)
        m2 = (a[:, None] * xa * xa).sum(0)
        sd = np.sqrt(np.maximum(m2 - mu * mu, 0) + 1e-8)
        np.testing.assert_allclose(
            np.asarray(out[b]), np.concatenate([mu, sd]), rtol=1e-4, atol=1e-5
        )


def test_asp_projection_is_normalized():
    asp = AttentiveStatisticsPooling(8, use_projection=True)
    x = jnp.asarray(np.random.default_rng(7).standard_normal((3, 5, 8)), jnp.float32)
    params = asp.init(jax.random.PRNGKey(7), x, 6.0)
    out = asp.apply(params, x, 6.0)
    assert out.shape == (3, 8)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1), np.ones(3), rtol=1e-5
    )


def test_arc_infonce_margin_raises_loss():
    rng = np.random.default_rng(8)
    prompt = jnp.asarray(rng.standard_normal((4, 3, 8)), jnp.float32)
    enroll = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    enroll = enroll / jnp.linalg.norm(enroll, axis=-1, keepdims=True)
    neg_logits = jnp.asarray(collate.negative_logits(
        ["a-1_b-1_spk1", "b-1_a-1_spk1", "c-1_d-1_spk1", "d-1_c-1_spk1"]
    ))
    key = jax.random.PRNGKey(8)
    loss_m, acc = arc_infonce_loss(prompt, enroll, neg_logits, key, margin=0.15)
    loss_0, _ = arc_infonce_loss(prompt, enroll, neg_logits, key, margin=0.0)
    assert float(loss_m) > float(loss_0)
    assert 0.0 <= float(acc) <= 1.0


def test_arc_infonce_perfect_alignment_high_acc():
    """When prompt mean == enroll embedding and negatives differ, acc = 1."""
    d = 16
    eye = np.eye(4, d).astype(np.float32)
    prompt = jnp.asarray(np.repeat(eye[:, None, :], 2, axis=1))
    enroll = jnp.asarray(eye)
    neg_logits = jnp.asarray(collate.negative_logits(
        ["a-1_x-1_spk1", "b-1_x-1_spk1", "c-1_x-1_spk1", "d-1_x-1_spk1"]
    ))
    loss, acc = arc_infonce_loss(
        prompt, enroll, neg_logits, jax.random.PRNGKey(0), margin=0.0
    )
    assert float(acc) == pytest.approx(1.0)


def test_aam_softmax_margin_and_acc():
    head = AAMSoftmaxHead(num_speakers=10, input_dim=8)
    x = jnp.asarray(np.random.default_rng(9).standard_normal((4, 8)), jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3])
    params = head.init(jax.random.PRNGKey(9), x, labels, 0.0)
    loss0, acc0 = head.apply(params, x, labels, 0.0)
    lossm, _ = head.apply(params, x, labels, 0.25)
    assert float(lossm) > float(loss0)
    assert np.isfinite(float(loss0))


# ---------------- collator ----------------


def test_collator_parsers():
    utts = [
        "100-121669-0004_1089-134686-0000_spk1",
        "1089-134686-0000_100-121669-0004_spk2",  # same target spk: 100
        "26-495-0001_32-4137-0002_spk2",  # target 32
    ]
    assert collate.parse_speaker(utts[0]) == "100"
    assert collate.parse_speaker(utts[1]) == "100"
    assert collate.parse_speaker(utts[2]) == "32"
    sim = collate.similarity_matrix(utts)
    np.testing.assert_array_equal(
        sim, [[1, 1, 0], [1, 1, 0], [0, 0, 1]]
    )
    neg = collate.negative_logits(utts)
    assert neg[0, 1] == collate.NEG_MASK_VALUE and neg[0, 2] == 1.0
    labels = collate.speaker_labels(utts)
    np.testing.assert_array_equal(labels, [0, 0, 1])

    assert collate.parse_speaker("x_y_011c0201", "wsj2mix") == "011"
    assert collate.parse_speaker("a_b_c_SPK7_d", "ami") == "SPK7"


def test_collate_batch_shapes():
    utts = ["1-1-0_2-2-0_spk1", "2-2-0_1-1-0_spk2"]
    speech = [np.ones(100, np.float32), np.ones(300, np.float32)]
    enroll = [np.ones(50, np.float32), np.ones(80, np.float32)]
    texts = [np.asarray([3, 4, 5]), np.asarray([6])]
    batch = collate.collate_batch(
        utts, speech, enroll, texts,
        speech_samples=200, enroll_samples=60, text_len=4,
    )
    assert batch["speech"].shape == (2, 200)
    np.testing.assert_array_equal(batch["speech_lens"], [100, 200])
    np.testing.assert_array_equal(batch["enroll_lens"], [50, 60])
    np.testing.assert_array_equal(batch["text"][0], [3, 4, 5, -1])
    np.testing.assert_array_equal(batch["text_lens"], [3, 1])
    # both rows target speaker "1"? row0 spk1 field0 -> 1; row1 spk2 field1 -> 1
    np.testing.assert_array_equal(batch["spk_labels"], [0, 0])


# ---------------- full model smoke ----------------


@pytest.mark.slow
def test_ts_model_loss_forward():
    cfg = TSModelConfig(
        vocab_size=100, sos=1, eos=2, startofprev=3, num_speakers=10,
        num_negatives=2,
    )
    model = TSASRModel(
        DIMS,
        TSEncoderConfig(
            num_query_tokens=2, num_hidden_layers=1, qformer_hidden_size=48,
            qformer_heads=4, qformer_intermediate_size=96,
        ),
        cfg,
    )
    rng = np.random.default_rng(10)
    b = 2
    samples = DIMS.n_audio_ctx * 2 * 160  # mel frames = 2*ctx
    batch = {
        "speech": jnp.asarray(rng.standard_normal((b, samples)) * 0.1, jnp.float32),
        "speech_lens": jnp.asarray([samples, samples // 2]),
        "enroll": jnp.asarray(rng.standard_normal((b, samples // 2)) * 0.1, jnp.float32),
        "enroll_lens": jnp.asarray([samples // 2, samples // 4]),
        "text": jnp.asarray([[5, 6, 7, -1], [8, 9, -1, -1]]),
        "text_lens": jnp.asarray([3, 2]),
        "neg_logits": jnp.asarray(
            collate.negative_logits(["a-1_b-1_spk1", "b-1_a-1_spk1"])
        ),
        "spk_labels": jnp.asarray([0, 1]),
    }
    key = jax.random.PRNGKey(0)
    params = model.init(key, batch, key, 0, train=False)
    loss, stats = model.apply(params, batch, key, 0, train=True, rngs={})
    assert np.isfinite(float(loss))
    for k in ["loss", "loss_att", "loss_ctc", "loss_con", "loss_aam", "acc"]:
        assert k in stats, k
        assert np.isfinite(float(stats[k])), k

    # epoch scalar changes the loss only through schedules (finite either way)
    loss10, _ = model.apply(params, batch, key, 10, train=True, rngs={})
    assert np.isfinite(float(loss10))


def test_ts_encoder_quantized_weights_close_to_dense():
    """W8A8 int8 encoder blocks (quantize_encoder_weights) stay within a few
    percent of the dense output and leave the Qformer prompt untouched (only
    the whisper blocks are quantized). Inference-only path."""
    from robustsq_whisper_tpu.models.ts_encoder import quantize_encoder_weights

    enc = QFormerTSEncoder(
        DIMS,
        TSEncoderConfig(
            num_query_tokens=3, num_hidden_layers=1, qformer_hidden_size=48,
            qformer_heads=4, qformer_intermediate_size=96,
        ),
    )
    rng = np.random.default_rng(5)
    frames = 2 * DIMS.n_audio_ctx
    feats = jnp.asarray(rng.standard_normal((2, 80, frames)), jnp.float32)
    efeats = jnp.asarray(rng.standard_normal((2, 80, 20)), jnp.float32)
    feats_lens = jnp.asarray([frames, frames])
    efeats_lens = jnp.asarray([20, 20])
    params = enc.init(jax.random.PRNGKey(5), feats, feats_lens, efeats, efeats_lens)
    qw = quantize_encoder_weights(params)
    w_q, w_s, _ = qw["layers"]["attn"]["query"]
    assert w_q.dtype == jnp.int8 and w_q.shape[0] == DIMS.n_audio_layer

    out_d, _, prompt_d, _ = enc.apply(params, feats, feats_lens, efeats, efeats_lens)
    out_q, _, prompt_q, _ = enc.apply(
        params, feats, feats_lens, efeats, efeats_lens, qw=qw
    )
    np.testing.assert_array_equal(np.asarray(prompt_d), np.asarray(prompt_q))
    d = np.asarray(out_d, np.float32)
    dev = np.abs(np.asarray(out_q, np.float32) - d).max()
    assert dev < 0.1 * d.std(), dev


def test_ts_encoder_gelu_approx_close_to_exact():
    """tanh-approximate GELU (inference knob) stays within ~1e-2 of the
    exact-erf encoder output on the tiny model — the approximation error
    (max ~1e-3 per activation) does not compound materially over layers."""
    ts_exact = TSEncoderConfig(
        num_query_tokens=3, num_hidden_layers=1, qformer_hidden_size=48,
        qformer_heads=4, qformer_intermediate_size=96,
    )
    import dataclasses as dc

    ts_approx = dc.replace(ts_exact, gelu_approx=True)
    rng = np.random.default_rng(7)
    frames = 2 * DIMS.n_audio_ctx
    feats = jnp.asarray(rng.standard_normal((2, 80, frames)), jnp.float32)
    efeats = jnp.asarray(rng.standard_normal((2, 80, 20)), jnp.float32)
    fl = jnp.asarray([frames, frames]); el = jnp.asarray([20, 20])
    enc_e = QFormerTSEncoder(DIMS, ts_exact)
    enc_a = QFormerTSEncoder(DIMS, ts_approx)
    params = enc_e.init(jax.random.PRNGKey(7), feats, fl, efeats, el)
    out_e, _, _, _ = enc_e.apply(params, feats, fl, efeats, el)
    out_a, _, _, _ = enc_a.apply(params, feats, fl, efeats, el)
    e = np.asarray(out_e, np.float32)
    dev = np.abs(np.asarray(out_a, np.float32) - e).max()
    assert 0 < dev < 0.02 * e.std(), dev
