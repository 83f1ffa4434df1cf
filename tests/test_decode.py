"""Decode tests: KV-cache greedy/beam vs naive full-recompute decode, WER."""

import dataclasses
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robustsq_whisper_tpu.decode.scorer import cer, edit_distance, wer
from robustsq_whisper_tpu.decode.search import (
    DecodeConfig,
    build_beam_decoder,
    build_greedy_decoder,
    strip_eot,
)
from robustsq_whisper_tpu.models import TSDecoder, WhisperDims
from robustsq_whisper_tpu.tokenizer.whisper_tokenizer import (
    ByteTokenizer,
    special_tokens,
)

DIMS = WhisperDims(
    n_mels=80, n_vocab=50, n_audio_ctx=16, n_audio_state=32,
    n_audio_head=2, n_audio_layer=1, n_text_ctx=64, n_text_state=32,
    n_text_head=2, n_text_layer=2,
)
CFG = DecodeConfig(max_new_tokens=8, eot=2, init_tokens=(1,), beam_size=1)


@pytest.fixture(scope="module")
def dec_and_params():
    dec = TSDecoder(DIMS, startofprev_token=3)
    rng = np.random.default_rng(0)
    memory = jnp.asarray(rng.standard_normal((2, 10, 32)), jnp.float32)
    prompt = jnp.asarray(rng.standard_normal((2, 2, 32)), jnp.float32)
    ys = jnp.asarray(rng.integers(0, 50, (2, 4)))
    variables = dec.init(jax.random.PRNGKey(0), memory, ys, prompt)
    return dec, variables, memory, prompt


def naive_greedy(dec, variables, memory, prompt, cfg):
    """Reference decode: re-run the full prefix per step (the reference's
    cacheless forward_one_step semantics, whisper_decoder.py:297-352)."""
    b = memory.shape[0]
    tokens = np.tile(np.asarray(cfg.init_tokens, np.int32), (b, 1))
    out = []
    done = np.zeros(b, bool)
    for i in range(cfg.max_new_tokens):
        logits = dec.apply(
            variables, memory, jnp.asarray(tokens), prompt
        )  # (b, t, V) sliced to targets
        last = np.array(logits[:, -1], np.float32)  # writable copy
        if i < cfg.min_new_tokens:  # the ESPnet minlenratio analog
            last[:, cfg.eot] = -1e30
        nxt = np.argmax(last, axis=-1).astype(np.int32)
        nxt = np.where(done, cfg.eot, nxt)
        out.append(nxt)
        done |= nxt == cfg.eot
        tokens = np.concatenate([tokens, nxt[:, None]], axis=1)
    return np.stack(out, axis=1)


def test_greedy_matches_naive(dec_and_params):
    dec, variables, memory, prompt = dec_and_params
    run = build_greedy_decoder(dec, variables, CFG)
    tokens, scores = run(memory, prompt)
    ref = naive_greedy(dec, variables, memory, prompt, CFG)
    np.testing.assert_array_equal(np.asarray(tokens), ref)
    assert np.all(np.isfinite(np.asarray(scores)))


def test_min_new_tokens_matches_masked_oracle(dec_and_params):
    """min_new_tokens (the ESPnet minlenratio analog): no eot in the first
    m emissions, and the whole row equals a naive oracle applying the same
    raw-logits mask — on both greedy loop variants and under beam search."""
    dec, variables, memory, prompt = dec_and_params
    m = 5
    cfg = dataclasses.replace(CFG, min_new_tokens=m)
    ref = naive_greedy(dec, variables, memory, prompt, cfg)
    assert (ref[:, :m] != cfg.eot).all()
    for stop_early in (True, False):
        run = build_greedy_decoder(
            dec, variables, dataclasses.replace(cfg, stop_early=stop_early)
        )
        tokens, scores = run(memory, prompt)
        np.testing.assert_array_equal(np.asarray(tokens), ref)
        assert np.all(np.isfinite(np.asarray(scores)))
    # beam search: no returned hypothesis ends before m tokens
    bm = build_beam_decoder(
        dec, variables, dataclasses.replace(cfg, beam_size=3)
    )
    tb, _ = bm(memory, prompt)
    assert (np.asarray(tb)[:, :m] != cfg.eot).all()


def test_beam1_equals_greedy(dec_and_params):
    dec, variables, memory, prompt = dec_and_params
    g = build_greedy_decoder(dec, variables, CFG)
    b = build_beam_decoder(dec, variables, CFG)
    tg, _ = g(memory, prompt)
    tb, _ = b(memory, prompt)
    np.testing.assert_array_equal(np.asarray(tg), np.asarray(tb))


def test_beam_score_not_worse_than_greedy(dec_and_params):
    dec, variables, memory, prompt = dec_and_params
    cfg4 = DecodeConfig(max_new_tokens=8, eot=2, init_tokens=(1,), beam_size=4)
    g = build_greedy_decoder(dec, variables, CFG)
    bm = build_beam_decoder(dec, variables, cfg4)
    _, sg = g(memory, prompt)
    tb, sb = bm(memory, prompt)
    assert tb.shape[1] == 8
    # summed log-prob of the returned beam hypothesis >= greedy's
    assert np.all(np.asarray(sb) >= np.asarray(sg) - 1e-4)


def test_strip_eot():
    toks = np.asarray([[4, 5, 2, 2, 2], [6, 7, 8, 9, 10]])
    assert strip_eot(toks, 2) == [[4, 5], [6, 7, 8, 9, 10]]


def test_wer_cer():
    assert edit_distance("abc", "abc") == (0, 0, 0, 3)
    r = wer(["the cat sat"], ["the cat sat"])
    assert r["wer"] == 0.0
    r = wer(["the cat sat"], ["the bat sat down"])
    assert r["wer"] == pytest.approx(2 / 3)  # 1 sub + 1 ins over 3 words
    assert r["sub"] == pytest.approx(1 / 3)
    assert r["ins"] == pytest.approx(1 / 3)
    c = cer(["abc"], ["abd"])
    assert c["cer"] == pytest.approx(1 / 3)


def test_edit_distance_matches_scalar_oracle():
    """The row-vectorized DP must equal the classic scalar Levenshtein
    (s/d/i counts included) on random sequences incl. empty edges."""

    def oracle(ref, hyp):
        n, m = len(ref), len(hyp)
        dp = np.zeros((n + 1, m + 1), dtype=np.int32)
        dp[:, 0] = np.arange(n + 1)
        dp[0, :] = np.arange(m + 1)
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                cost = 0 if ref[i - 1] == hyp[j - 1] else 1
                dp[i, j] = min(
                    dp[i - 1, j - 1] + cost, dp[i - 1, j] + 1, dp[i, j - 1] + 1
                )
        return int(dp[n, m])

    rng = np.random.default_rng(0)
    for _ in range(40):
        n, m = rng.integers(0, 12, 2)
        ref = [str(x) for x in rng.integers(0, 5, n)]
        hyp = [str(x) for x in rng.integers(0, 5, m)]
        s, d, i, rl = edit_distance(ref, hyp)
        assert rl == len(ref)
        assert s + d + i == oracle(ref, hyp), (ref, hyp)
        # alignment identity: matches+subs+dels = |ref|, matches+subs+ins = |hyp|
        assert len(hyp) - i == len(ref) - d
        assert len(ref) - d - s >= 0


def test_tokenizer_special_layout():
    st = special_tokens(multilingual=True)
    assert st.eot == 50257
    assert st.sot == 50258
    assert st.lang("en") == 50259
    assert st.transcribe == 50359
    assert st.startofprev == 50361  # reference whisper_decoder.py:240
    assert st.notimestamps == 50363
    assert st.n_vocab == 51865
    assert st.sot_sequence("en", "transcribe", True) == (
        50258, 50259, 50359, 50363,
    )


def test_byte_tokenizer_roundtrip():
    tok = ByteTokenizer()
    text = "hello world! café"
    assert tok.decode(tok.encode(text)) == text
    # special ids pass through decode unharmed
    ids = tok.encode("hi") + [tok.special.eot]
    assert tok.decode(ids) == "hi"


def test_quantized_cross_kv_matches_dense(dec_and_params):
    """int8 cross-KV decode must reproduce dense-decode tokens on
    well-conditioned inputs."""
    dec, variables, memory, prompt = dec_and_params
    cfg_q = DecodeConfig(
        max_new_tokens=8, eot=2, init_tokens=(1,), quantize_cross_kv=True
    )
    g = build_greedy_decoder(dec, variables, CFG)
    gq = build_greedy_decoder(dec, variables, cfg_q)
    t_dense, s_dense = g(memory, prompt)
    t_q, s_q = gq(memory, prompt)
    np.testing.assert_array_equal(np.asarray(t_dense), np.asarray(t_q))
    np.testing.assert_allclose(
        np.asarray(s_dense), np.asarray(s_q), rtol=0.05, atol=0.1
    )


def test_int4_pack_roundtrip():
    from robustsq_whisper_tpu.ops.decode_attention import (
        pack_int4,
        unpack_int4,
    )

    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.integers(-7, 8, (2, 3, 8, 1024)), jnp.int8)
    packed = pack_int4(vals)  # head_dim axis (-2) packing
    assert packed.shape == (2, 3, 4, 1024) and packed.dtype == jnp.int8
    out = unpack_int4(packed)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(vals))


def test_int4_kernel_matches_dequant_oracle():
    """packed-int4 decode kernel == attention over the SAME dequantized
    values (isolates the kernel from the quantization error)."""
    from robustsq_whisper_tpu.ops.decode_attention import (
        decode_cross_attention,
        pack_int4,
    )

    rng = np.random.default_rng(1)
    b, h, d, t, block = 2, 4, 8, 1024, 512
    kv_len = 900
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    k4 = rng.integers(-7, 8, (b, h, d, t))
    v4 = rng.integers(-7, 8, (b, h, d, t))
    k_s = jnp.asarray(rng.uniform(0.01, 0.1, (b, h, d)), jnp.float32)
    v_s = jnp.asarray(rng.uniform(0.01, 0.1, (b, h, d)), jnp.float32)

    out = decode_cross_attention(
        q,
        pack_int4(jnp.asarray(k4, jnp.int8)),
        pack_int4(jnp.asarray(v4, jnp.int8)),
        k_s,
        v_s,
        kv_len=jnp.int32(kv_len),
        block_t=block,
        interpret=True,
        packed_int4=True,
    )

    kf = k4[..., :kv_len] * np.asarray(k_s)[..., None]
    vf = v4[..., :kv_len] * np.asarray(v_s)[..., None]
    s = np.einsum("bhd,bhdt->bht", np.asarray(q), kf) * (d**-0.5)
    w = np.exp(s - s.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    ref = np.einsum("bht,bhdt->bhd", w, vf)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_int4_cross_kv_decode_plumbing(dec_and_params):
    """End-to-end: packed-int4 cross-KV rides through cross_kv -> prefill
    (XLA unpack path) -> step (Pallas packed kernel) of the greedy decoder.

    A tiny RANDOM model's logits are near-uniform, so token equality with
    the dense path is not a meaningful bar at 4 bits (the kernel itself is
    pinned exactly by test_int4_kernel_matches_dequant_oracle); here the
    prefill/step LOGITS must track the dense path closely and the decode
    must run to completion."""
    dec, variables, memory, prompt = dec_and_params
    dec4 = TSDecoder(DIMS, startofprev_token=3, cross_kv_bits=4)
    cfg_q = DecodeConfig(
        max_new_tokens=8, eot=2, init_tokens=(1,), quantize_cross_kv=True
    )
    gq = build_greedy_decoder(dec4, variables, cfg_q)
    t_q, s_q = gq(memory, prompt)
    assert t_q.shape == (2, 8)
    assert np.all(np.isfinite(np.asarray(s_q)))

    def run_prefill_and_step(d, quantize):
        b = memory.shape[0]
        total = 1 + prompt.shape[1] + 1 + 2
        m = lambda method, *a, **kw: d.apply(
            variables, *a, method=method, **kw
        )
        cross = m(TSDecoder.cross_kv, memory, quantize=quantize)
        cache = m(TSDecoder.init_cache, b, total)
        init = jnp.ones((b, 1), jnp.int32)
        logits_p, cache = m(TSDecoder.prefill, init, prompt, cache, cross)
        tok = jnp.argmax(logits_p, axis=-1).astype(jnp.int32)[:, None]
        logits_s, _ = m(
            TSDecoder.step, tok, 1 + prompt.shape[1] + 1, cache, cross
        )
        return np.asarray(logits_p), np.asarray(logits_s)

    ref_p, ref_s = run_prefill_and_step(dec, quantize=False)
    q_p, q_s = run_prefill_and_step(dec4, quantize=True)
    for ref, got in ((ref_p, q_p), (ref_s, q_s)):
        spread = ref.max() - ref.min()
        assert np.max(np.abs(got - ref)) < 0.2 * spread, (
            np.max(np.abs(got - ref)),
            spread,
        )
        # and the two logit fields are strongly aligned
        a, b_ = ref - ref.mean(), got - got.mean()
        cos = (a * b_).sum() / (np.linalg.norm(a) * np.linalg.norm(b_))
        assert cos > 0.98, cos


def test_grouped_kernel_matches_per_beam_calls():
    """Beam-grouped decode kernel (one K/V read shared by ``g`` query rows)
    == ``g`` independent ungrouped calls, across int4/int8-stacked/dense
    variants."""
    from robustsq_whisper_tpu.ops.decode_attention import (
        decode_cross_attention,
        pack_int4,
    )

    rng = np.random.default_rng(0)
    b, g, h, d, t = 2, 3, 4, 8, 1024
    kv_len = 900
    q = jnp.asarray(rng.standard_normal((b, g, h, d)), jnp.float32)
    qg = q.transpose(0, 2, 1, 3)  # kernel layout (b, h, g, d)
    k_s = jnp.asarray(rng.uniform(0.01, 0.1, (b, h, d)), jnp.float32)
    v_s = jnp.asarray(rng.uniform(0.01, 0.1, (b, h, d)), jnp.float32)

    def compare(kt, vt, **kw):
        out = decode_cross_attention(
            qg, kt, vt, block_t=512, interpret=True, group=g, **kw
        )
        out = np.asarray(out).transpose(0, 2, 1, 3)  # (b, g, h, d)
        ref = np.stack(
            [
                np.asarray(
                    decode_cross_attention(
                        q[:, gi], kt, vt, block_t=512, interpret=True, **kw
                    )
                )
                for gi in range(g)
            ],
            axis=1,
        )
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-3)

    # packed int4
    k4 = pack_int4(jnp.asarray(rng.integers(-7, 8, (b, h, d, t)), jnp.int8))
    v4 = pack_int4(jnp.asarray(rng.integers(-7, 8, (b, h, d, t)), jnp.int8))
    compare(
        k4, v4, k_scale=k_s, v_scale=v_s, kv_len=jnp.int32(kv_len),
        packed_int4=True,
    )
    # stacked-layer int8 with scalar-prefetch layer select
    L = 3
    k8 = jnp.asarray(rng.integers(-127, 128, (L, b, h, d, t)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, (L, b, h, d, t)), jnp.int8)
    compare(
        k8, v8, k_scale=k_s, v_scale=v_s, kv_len=jnp.int32(kv_len),
        layer_idx=jnp.int32(1),
    )
    # dense fp with ragged tail (wrapper-side fallback padding)
    kf = jnp.asarray(rng.standard_normal((b, h, d, 700)), jnp.float32)
    vf = jnp.asarray(rng.standard_normal((b, h, d, 700)), jnp.float32)
    compare(kf, vf, kv_len=jnp.int32(650))


def test_greedy_mxu_routing_matches_vpu_kernel():
    """group=1 with mxu=True (the default: grouped MXU kernel via a
    duplicated query row) == the plain VPU-reduce kernel, int4 + stacked
    int8 + dense variants. Interpret mode computes both routes in exact
    f32 (the bf16 MXU truncation is hardware-only), so tolerances are
    reduction-order noise."""
    from robustsq_whisper_tpu.ops.decode_attention import (
        decode_cross_attention,
        pack_int4,
    )

    rng = np.random.default_rng(3)
    b, h, d, t = 2, 4, 8, 1024
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    k_s = jnp.asarray(rng.uniform(0.01, 0.1, (b, h, d)), jnp.float32)
    v_s = jnp.asarray(rng.uniform(0.01, 0.1, (b, h, d)), jnp.float32)

    def compare(kt, vt, **kw):
        a = decode_cross_attention(
            q, kt, vt, block_t=512, interpret=True, mxu=True, **kw
        )
        assert a.shape == (b, h, d)
        ref = decode_cross_attention(
            q, kt, vt, block_t=512, interpret=True, mxu=False, **kw
        )
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(ref), rtol=1e-5, atol=1e-6
        )

    k4 = pack_int4(jnp.asarray(rng.integers(-7, 8, (b, h, d, t)), jnp.int8))
    v4 = pack_int4(jnp.asarray(rng.integers(-7, 8, (b, h, d, t)), jnp.int8))
    compare(
        k4, v4, k_scale=k_s, v_scale=v_s, kv_len=jnp.int32(900),
        packed_int4=True,
    )
    L = 3
    k8 = jnp.asarray(rng.integers(-127, 128, (L, b, h, d, t)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, (L, b, h, d, t)), jnp.int8)
    compare(
        k8, v8, k_scale=k_s, v_scale=v_s, kv_len=jnp.int32(900),
        layer_idx=jnp.int32(2),
    )
    kf = jnp.asarray(rng.standard_normal((b, h, d, 700)), jnp.float32)
    vf = jnp.asarray(rng.standard_normal((b, h, d, 700)), jnp.float32)
    compare(kf, vf, kv_len=jnp.int32(650))


def test_tmin_self_attention_matches_dense_oracle():
    """decode_self_attention_tmin (time-minor cache read via the cross
    kernel's dynamic grid + return_state, new token merged in f32) ==
    dense softmax over [cache[:pos]; k_new], across pos edge cases and
    layer slabs."""
    from robustsq_whisper_tpu.ops.self_attention import (
        decode_self_attention_tmin,
    )

    rng = np.random.default_rng(7)
    L, B, H, D, T = 3, 2, 4, 16, 256
    kc = jnp.asarray(rng.standard_normal((L, B, H, D, T)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((L, B, H, D, T)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    for pos_v, li in [(1, 0), (5, 0), (128, 1), (130, 1), (255, 2)]:
        out = decode_self_attention_tmin(
            q, kn, vn, (kc, vc), jnp.int32(pos_v), jnp.int32(li),
            interpret=True,
        )
        k_all = jnp.concatenate(
            [kc[li, :, :, :, :pos_v], kn[..., None]], axis=-1
        )
        v_all = jnp.concatenate(
            [vc[li, :, :, :, :pos_v], vn[..., None]], axis=-1
        )
        s = jnp.einsum("bhd,bhdt->bht", q, k_all) * (D ** -0.5)
        ref = jnp.einsum(
            "bht,bhdt->bhd", jax.nn.softmax(s, axis=-1), v_all
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6,
            err_msg=f"pos={pos_v} layer={li}",
        )


def test_tmin_greedy_matches_flat_layout(dec_and_params):
    """Greedy decode on the time-minor self cache (opt-in; its per-token
    lane-column write measured ~128x-amplified, so flat is the default) ==
    the flat-layout cache, dense and fully-quantized (int8 cross +
    W8A8 step weights)."""
    dec_flat, variables, memory, prompt = dec_and_params
    dec = dataclasses.replace(dec_flat, tmin_self_cache=True)
    for kw in (
        dict(),
        dict(quantize_cross_kv=True, quantize_weights=True),
    ):
        cfg = dataclasses.replace(CFG, max_new_tokens=6, **kw)
        t_t, s_t = build_greedy_decoder(dec, variables, cfg)(memory, prompt)
        t_f, s_f = build_greedy_decoder(dec_flat, variables, cfg)(
            memory, prompt
        )
        np.testing.assert_array_equal(np.asarray(t_t), np.asarray(t_f))
        np.testing.assert_allclose(
            np.asarray(s_t), np.asarray(s_f), rtol=1e-5, atol=1e-5
        )


def test_beam_reorder_cache_matches_take():
    """DMA row-copy cache reorder == jnp.take along the rows axis, for a
    dense 2-leaf cache and a mixed-dtype 4-leaf (int8 + fp32 scales) one."""
    from robustsq_whisper_tpu.ops.beam_gather import beam_reorder_cache

    rng = np.random.default_rng(0)
    L, rows, T, h, hd = 3, 6, 64, 2, 64  # per-row payload 8192 = 64 tiles
    src = jnp.asarray([3, 0, 0, 5, 2, 1], jnp.int32)

    dense = tuple(
        jnp.asarray(rng.standard_normal((L, rows, T, h, hd)), jnp.float32)
        for _ in range(2)
    )
    out = beam_reorder_cache(dense, src, interpret=True)
    for o, x in zip(out, dense):
        np.testing.assert_array_equal(
            np.asarray(o), np.asarray(jnp.take(x, src, axis=1))
        )

    mixed = (
        jnp.asarray(rng.integers(-127, 128, (L, rows, T, h, hd)), jnp.int8),
        jnp.asarray(rng.standard_normal((L, rows, T * h, 2, hd)), jnp.float32),
    )
    out = beam_reorder_cache(mixed, src, interpret=True)
    for o, x in zip(out, mixed):
        np.testing.assert_array_equal(
            np.asarray(o), np.asarray(jnp.take(x, src, axis=1))
        )

    # live-prefix mode: tail beyond `live` positions is zeros (the decode
    # cache invariant) -> must still reproduce jnp.take exactly, while
    # only the live chunks are read
    for live in (1, 17, T):
        zeroed = tuple(
            x.at[:, :, live:].set(0) for x in dense
        )
        out = beam_reorder_cache(
            zeroed, src, live=jnp.int32(live), time_len=T, interpret=True
        )
        for o, x in zip(out, zeroed):
            np.testing.assert_array_equal(
                np.asarray(o), np.asarray(jnp.take(x, src, axis=1))
            )


def test_beam_dma_reorder_matches_take_decode(dec_and_params):
    """Full beam decode with the forced DMA cache reorder (padded cache
    length, interpret-mode kernel on CPU) == the XLA-gather reorder path."""
    dec, variables, memory, prompt = dec_and_params
    base = dict(max_new_tokens=8, eot=2, init_tokens=(1,), beam_size=3)
    t_take, s_take = build_beam_decoder(
        dec, variables, DecodeConfig(**base, beam_reorder="take")
    )(memory, prompt)
    t_dma, s_dma = build_beam_decoder(
        dec, variables, DecodeConfig(**base, beam_reorder="dma")
    )(memory, prompt)
    np.testing.assert_array_equal(np.asarray(t_take), np.asarray(t_dma))
    np.testing.assert_allclose(
        np.asarray(s_take), np.asarray(s_dma), rtol=1e-5, atol=1e-5
    )


def test_flat_self_cache_matches_5d():
    """Packed flat self-KV cache (Pallas kernel, ops/self_attention.py) ==
    the 5-D XLA score-concat path, for greedy and quantized beam decode.
    Same params drive both module configs (the flag is not in the tree)."""
    dims = WhisperDims(
        n_mels=80, n_vocab=64, n_audio_ctx=16, n_audio_state=128,
        n_audio_head=2, n_audio_layer=1, n_text_ctx=64, n_text_state=128,
        n_text_head=2, n_text_layer=2,
    )
    rng = np.random.default_rng(0)
    memory = jnp.asarray(rng.standard_normal((2, 10, 128)) * 0.3, jnp.float32)
    prompt = jnp.asarray(rng.standard_normal((2, 2, 128)) * 0.3, jnp.float32)
    ys = jnp.asarray(rng.integers(0, 64, (2, 4)))

    dec_flat = TSDecoder(dims, startofprev_token=3, cross_kv_bits=4)
    variables = dec_flat.init(jax.random.PRNGKey(0), memory, ys, prompt)
    dec_5d = TSDecoder(
        dims, startofprev_token=3, cross_kv_bits=4, flat_self_cache=False
    )

    g = dict(max_new_tokens=8, eot=2, init_tokens=(1,))
    tf, sf = build_greedy_decoder(dec_flat, variables, DecodeConfig(**g))(
        memory, prompt
    )
    t5, s5 = build_greedy_decoder(dec_5d, variables, DecodeConfig(**g))(
        memory, prompt
    )
    np.testing.assert_array_equal(np.asarray(tf), np.asarray(t5))
    np.testing.assert_allclose(np.asarray(sf), np.asarray(s5), rtol=1e-4, atol=1e-4)

    bq = DecodeConfig(
        **g, beam_size=3, quantize_cross_kv=True, quantize_weights=True
    )
    tfb, sfb = build_beam_decoder(dec_flat, variables, bq)(memory, prompt)
    t5b, s5b = build_beam_decoder(dec_5d, variables, bq)(memory, prompt)
    np.testing.assert_array_equal(np.asarray(tfb), np.asarray(t5b))
    np.testing.assert_allclose(
        np.asarray(sfb), np.asarray(s5b), rtol=1e-4, atol=1e-4
    )


def test_flat_int8_kernel_close_to_dense():
    """decode_self_attention on the int8 flat cache (quantize_flat_kv:
    int8 K/V + one packed bf16 scale leaf) stays within the per-head int8
    quantization error of the dense-flat kernel on the same cache."""
    from robustsq_whisper_tpu.ops.self_attention import (
        decode_self_attention,
        quantize_flat_kv,
    )

    rng = np.random.default_rng(0)
    L, b, T, n_state, heads = 2, 3, 16, 128, 2
    k = jnp.asarray(rng.standard_normal((L, b, T, n_state)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((L, b, T, n_state)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((b, n_state)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((b, n_state)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((b, n_state)), jnp.float32)
    pos = jnp.int32(11)
    kq, vq, sc = quantize_flat_kv(k, v, heads)
    assert kq.dtype == jnp.int8 and sc.shape == (L, b, T, 128)
    # round-trip: dequantized int8 reproduces K within the scale step
    step = np.asarray(sc[..., :heads], np.float32)
    krt = np.asarray(kq, np.float32).reshape(L, b, T, heads, -1) * step[
        ..., None
    ]
    np.testing.assert_allclose(
        krt.reshape(k.shape), np.asarray(k), atol=float(step.max()) * 0.51
    )
    for layer in (0, 1):
        dense = decode_self_attention(
            q, kn, vn, (k, v), pos, jnp.int32(layer), heads=2,
            interpret=True,
        )
        quant = decode_self_attention(
            q, kn, vn, (kq, vq, sc), pos, jnp.int32(layer), heads=2,
            interpret=True,
        )
        scale = float(jnp.max(jnp.abs(dense)))
        err = float(jnp.max(jnp.abs(quant - dense))) / scale
        assert err < 0.03, (layer, err)


def test_flat_int8_self_cache_close_to_dense():
    """End-to-end decode on the flat int8 self-KV cache (self_kv_bits=8 +
    flat cache: int8 data leaves + the shared scale leaf riding the beam
    reorder) reproduces dense-flat greedy tokens on well-conditioned
    inputs, and beam search (DMA reorder of the 3-leaf cache) stays in
    high agreement."""
    dims = WhisperDims(
        n_mels=80, n_vocab=64, n_audio_ctx=16, n_audio_state=128,
        n_audio_head=2, n_audio_layer=1, n_text_ctx=64, n_text_state=128,
        n_text_head=2, n_text_layer=2,
    )
    rng = np.random.default_rng(0)
    memory = jnp.asarray(rng.standard_normal((2, 10, 128)) * 0.3, jnp.float32)
    prompt = jnp.asarray(rng.standard_normal((2, 2, 128)) * 0.3, jnp.float32)
    ys = jnp.asarray(rng.integers(0, 64, (2, 4)))

    dec = TSDecoder(dims, startofprev_token=3, cross_kv_bits=4)
    variables = dec.init(jax.random.PRNGKey(0), memory, ys, prompt)
    dec8 = TSDecoder(
        dims, startofprev_token=3, cross_kv_bits=4, self_kv_bits=8
    )
    from robustsq_whisper_tpu.models.whisper.modules import TextDecoder

    assert TextDecoder(dims, self_kv_bits=8)._flat_quant

    g = dict(max_new_tokens=8, eot=2, init_tokens=(1,))
    td, sd = build_greedy_decoder(dec, variables, DecodeConfig(**g))(
        memory, prompt
    )
    tq, sq = build_greedy_decoder(dec8, variables, DecodeConfig(**g))(
        memory, prompt
    )
    np.testing.assert_array_equal(np.asarray(td), np.asarray(tq))
    np.testing.assert_allclose(np.asarray(sd), np.asarray(sq), rtol=0.05, atol=0.1)

    bq = DecodeConfig(
        **g, beam_size=3, quantize_cross_kv=True, beam_reorder="dma"
    )
    tdb, sdb = build_beam_decoder(dec, variables, bq)(memory, prompt)
    tqb, sqb = build_beam_decoder(dec8, variables, bq)(memory, prompt)
    agree = (np.asarray(tdb) == np.asarray(tqb)).mean()
    assert agree >= 0.75, (agree, np.asarray(tdb), np.asarray(tqb))
    np.testing.assert_allclose(
        np.asarray(sdb), np.asarray(sqb), rtol=0.2, atol=0.5
    )


def test_sharded_decoder_matches_single_device():
    """Data-parallel serving: decode sharded over an 8-device mesh
    (shard_map on the data axis, decode/sharded.py — the TPU-native
    analogue of the reference's inference_nj process sharding) returns
    the single-device decoder's tokens and scores, greedy and quantized
    beam, with the Pallas kernels running per shard at local shapes."""
    from robustsq_whisper_tpu.decode.sharded import build_sharded_decoder
    from robustsq_whisper_tpu.parallel.mesh import make_mesh

    dims = WhisperDims(
        n_mels=80, n_vocab=64, n_audio_ctx=16, n_audio_state=128,
        n_audio_head=2, n_audio_layer=1, n_text_ctx=64, n_text_state=128,
        n_text_head=2, n_text_layer=2,
    )
    rng = np.random.default_rng(1)
    b = 8
    memory = jnp.asarray(rng.standard_normal((b, 10, 128)) * 0.3, jnp.float32)
    prompt = jnp.asarray(rng.standard_normal((b, 2, 128)) * 0.3, jnp.float32)
    ys = jnp.asarray(rng.integers(0, 64, (b, 4)))
    dec = TSDecoder(dims, startofprev_token=3, cross_kv_bits=4)
    variables = dec.init(jax.random.PRNGKey(0), memory, ys, prompt)
    mesh = make_mesh(8, 1)

    g = dict(max_new_tokens=8, eot=2, init_tokens=(1,))
    for cfg in (
        DecodeConfig(**g),
        DecodeConfig(
            **g, beam_size=3, quantize_cross_kv=True, quantize_weights=True
        ),
    ):
        builder = (
            build_beam_decoder if cfg.beam_size > 1 else build_greedy_decoder
        )
        t1, s1 = builder(dec, variables, cfg)(memory, prompt)
        tN, sN = build_sharded_decoder(dec, variables, cfg, mesh)(
            memory, prompt
        )
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(tN))
        np.testing.assert_allclose(
            np.asarray(s1), np.asarray(sN), rtol=1e-4, atol=1e-4
        )


def test_prefill_quantized_matches_post_quantized(dec_and_params):
    """prefill_quantized=True (quantize the cross K/V inside the projection
    scan, prefill on the quantized form — the HBM-capacity mode that never
    materializes the dense stacked cross K/V) must reproduce the
    prefill-dense-then-quantize decoder's tokens on well-conditioned inputs,
    greedy and beam."""
    dec, variables, memory, prompt = dec_and_params
    for beam in (1, 3):
        cfg = DecodeConfig(
            max_new_tokens=8, eot=2, init_tokens=(1,), beam_size=beam,
            quantize_cross_kv=True,
        )
        cfg_pq = dataclasses.replace(cfg, prefill_quantized=True)
        builder = build_beam_decoder if beam > 1 else build_greedy_decoder
        t0, s0 = builder(dec, variables, cfg)(memory, prompt)
        t1, s1 = builder(dec, variables, cfg_pq)(memory, prompt)
        np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
        np.testing.assert_allclose(
            np.asarray(s0), np.asarray(s1), rtol=0.05, atol=0.1
        )


def test_prefill_quantized_requires_quantized_loop(dec_and_params):
    """prefill_quantized without quantize_cross_kv must raise at build time
    (silently materializing the dense cross-KV would defeat the option)."""
    dec, variables, memory, prompt = dec_and_params
    cfg = DecodeConfig(
        max_new_tokens=4, eot=2, init_tokens=(1,), prefill_quantized=True
    )
    with pytest.raises(ValueError, match="quantize_cross_kv"):
        build_greedy_decoder(dec, variables, cfg)
    with pytest.raises(ValueError, match="quantize_cross_kv"):
        build_beam_decoder(
            dec, variables, dataclasses.replace(cfg, beam_size=2)
        )


def test_chunked_encode_matches_full():
    """chunked_encode over uneven sub-batches == one full encode call, and
    chunk<=0 / chunk>=batch route to the single call."""
    from robustsq_whisper_tpu.decode.pipeline import chunked_encode

    calls = []

    def enc_fn(feats, fl, efeats, el):
        calls.append(feats.shape[0])
        return feats * 2.0, fl, efeats + 1.0, el

    r = np.random.default_rng(0)
    feats = jnp.asarray(r.standard_normal((5, 3)))
    fl = jnp.arange(5)
    efeats = jnp.asarray(r.standard_normal((5, 2)))
    el = jnp.arange(5)

    m_full, p_full = chunked_encode(enc_fn, feats, fl, efeats, el, 0)
    assert calls == [5]
    calls.clear()
    m_c, p_c = chunked_encode(enc_fn, feats, fl, efeats, el, 2)
    assert calls == [2, 2, 1]
    np.testing.assert_array_equal(np.asarray(m_full), np.asarray(m_c))
    np.testing.assert_array_equal(np.asarray(p_full), np.asarray(p_c))


def test_tp_decoder_matches_single_device():
    """Tensor-parallel serving (capacity mode): the dense XLA decode path
    jitted with the Megatron-style TP parameter shardings over a
    (data=2, model=4) mesh — GSPMD shards q/k/v/fc1 over heads/FFN and
    inserts the all-reduces — must reproduce the single-device dense
    decoder's tokens, greedy and beam. Verifies the weights are REALLY
    sharded (per-device shard shapes) so the capacity claim is structural,
    not just a sharding annotation."""
    from jax.sharding import PartitionSpec as P
    from robustsq_whisper_tpu.decode.sharded import build_tp_decoder
    from robustsq_whisper_tpu.parallel.mesh import MODEL_AXIS, make_mesh, tree_paths

    dims = WhisperDims(
        n_mels=80, n_vocab=64, n_audio_ctx=16, n_audio_state=128,
        n_audio_head=4, n_audio_layer=1, n_text_ctx=64, n_text_state=128,
        n_text_head=4, n_text_layer=2,
    )
    rng = np.random.default_rng(2)
    b = 4
    memory = jnp.asarray(rng.standard_normal((b, 10, 128)) * 0.3, jnp.float32)
    prompt = jnp.asarray(rng.standard_normal((b, 2, 128)) * 0.3, jnp.float32)
    ys = jnp.asarray(rng.integers(0, 64, (b, 4)))
    # dense XLA path: no flat cache (Pallas-free program under GSPMD)
    dec = TSDecoder(dims, startofprev_token=3, flat_self_cache=False)
    variables = dec.init(jax.random.PRNGKey(0), memory, ys, prompt)
    mesh = make_mesh(2, 4)

    g = dict(max_new_tokens=8, eot=2, init_tokens=(1,))
    for cfg in (DecodeConfig(**g), DecodeConfig(**g, beam_size=3)):
        builder = (
            build_beam_decoder if cfg.beam_size > 1 else build_greedy_decoder
        )
        t1, s1 = builder(dec, variables, cfg)(memory, prompt)
        run_tp = build_tp_decoder(dec, variables, cfg, mesh)
        tN, sN = run_tp(memory, prompt)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(tN))
        np.testing.assert_allclose(
            np.asarray(s1), np.asarray(sN), rtol=1e-4, atol=1e-4
        )

    # structural capacity check: at least the attention/mlp kernels and the
    # token embedding shard over the model axis (local shard < global shape)
    from robustsq_whisper_tpu.parallel.mesh import params_shardings

    shardings = params_shardings(mesh, variables)
    sharded_paths = [
        path
        for (path, leaf), (_, sh) in zip(
            tree_paths(variables), tree_paths(shardings)
        )
        if any(ax == MODEL_AXIS for ax in (sh.spec or ()) if ax)
    ]
    assert any("token_embedding" in p for p in sharded_paths), sharded_paths
    assert any("mlp_fc1/kernel" in p for p in sharded_paths), sharded_paths
    assert any("query/kernel" in p for p in sharded_paths), sharded_paths


def test_beam_shared_cross_kv_matches_dense_beam(dec_and_params):
    """Beam search with the shared quantized cross-KV (b-row tensors, the
    grouped kernel reading each utterance's K/V once for all beams) must
    reproduce the dense-beam tokens on well-conditioned inputs — same bar
    as the greedy int8-KV equality test above."""
    dec, variables, memory, prompt = dec_and_params
    cfg = DecodeConfig(max_new_tokens=8, eot=2, init_tokens=(1,), beam_size=3)
    cfg_q = DecodeConfig(
        max_new_tokens=8, eot=2, init_tokens=(1,), beam_size=3,
        quantize_cross_kv=True,
    )
    tb, sb = build_beam_decoder(dec, variables, cfg)(memory, prompt)
    tq, sq = build_beam_decoder(dec, variables, cfg_q)(memory, prompt)
    np.testing.assert_array_equal(np.asarray(tb), np.asarray(tq))
    np.testing.assert_allclose(np.asarray(sb), np.asarray(sq), rtol=0.05, atol=0.1)


def test_int4_vs_int8_attention_error():
    """Quantization-error sanity on realistic magnitudes: int8 output error
    is small, int4 stays within a usable bound and a clear ordering holds."""
    from robustsq_whisper_tpu.models.whisper.modules import MultiHeadAttention

    rng = np.random.default_rng(2)
    b, t, n_state, heads = 2, 600, 64, 4
    src = jnp.asarray(rng.standard_normal((b, t, n_state)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, 1, n_state)), jnp.float32)

    errs = {}
    for bits in (8, 4):
        mha = MultiHeadAttention(n_state, heads, kv_bits=bits)
        variables = mha.init(jax.random.PRNGKey(0), x, xa=src)
        ref = mha.apply(variables, x, xa=src)  # dense fp32
        quant = mha.apply(variables, src, method=MultiHeadAttention.kv_quant)
        out = mha.apply(
            variables, x, *quant, method=MultiHeadAttention.attend_quant
        )
        scale = float(jnp.max(jnp.abs(ref)))
        errs[bits] = float(jnp.max(jnp.abs(out - ref))) / scale
    assert errs[8] < 0.02, errs
    assert errs[4] < 0.15, errs
    assert errs[8] < errs[4]


@pytest.mark.slow
def test_zero_shot_whisper_greedy():
    """BASELINE config #1: plain (non-TS) Whisper greedy decode, CPU-runnable.
    Random weights — checks the full pad_or_trim -> mel -> encode -> KV-cache
    greedy path runs and emits well-formed token rows."""
    from robustsq_whisper_tpu.models.asr import WhisperASR

    asr = WhisperASR.from_random("dev", seed=0, n_vocab=512)
    audio = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 16000 * 2)) * 0.1,
        jnp.float32,
    )
    tokens, scores = asr.transcribe_batch(audio, max_new_tokens=6)
    assert tokens.shape == (2, 6)
    assert np.all(np.asarray(tokens) >= 0)
    assert np.all(np.isfinite(np.asarray(scores)))


def test_stop_early_matches_fixed_scan(dec_and_params):
    """while_loop early-exit decode == fixed-length scan decode."""
    dec, variables, memory, prompt = dec_and_params
    cfg_fixed = DecodeConfig(
        max_new_tokens=8, eot=2, init_tokens=(1,), stop_early=False
    )
    cfg_early = DecodeConfig(
        max_new_tokens=8, eot=2, init_tokens=(1,), stop_early=True
    )
    tf_, sf = build_greedy_decoder(dec, variables, cfg_fixed)(memory, prompt)
    te, se = build_greedy_decoder(dec, variables, cfg_early)(memory, prompt)
    np.testing.assert_array_equal(np.asarray(tf_), np.asarray(te))
    np.testing.assert_allclose(np.asarray(sf), np.asarray(se), rtol=1e-5)


def test_beam_stop_early_matches_fixed_scan():
    """Beam while_loop early-exit == fixed-length scan, on a SCRIPTED decoder
    whose every beam finishes well before max_new_tokens — so the early-exit
    tail it never writes (eot tokens, identity backpointers) must reproduce
    the scan's post-all-done steps. Random tiny transformers degenerate to
    repeating one token and rarely emit a chosen eot, so the script is built
    by construction: block output projections are zeroed (residual stream =
    token-emb + pos-emb only) and the position embedding at position p is a
    scaled copy of the embedding row of the token the schedule wants emitted
    from p, making logits position-driven and history-independent."""
    V, eot, d = 5, 4, 16
    dims = WhisperDims(
        n_mels=80, n_vocab=V, n_audio_ctx=8, n_audio_state=d,
        n_audio_head=2, n_audio_layer=1, n_text_ctx=64, n_text_state=d,
        n_text_head=2, n_text_layer=1,
    )
    dec = TSDecoder(dims, startofprev_token=3)
    rng = np.random.default_rng(7)
    memory = jnp.asarray(rng.standard_normal((2, 6, d)), jnp.float32)
    prompt = jnp.asarray(rng.standard_normal((2, 2, d)), jnp.float32)
    variables = dec.init(
        jax.random.PRNGKey(7), memory, jnp.zeros((2, 2), jnp.int32), prompt
    )

    # orthogonal zero-mean embedding rows: E[t] = e_{2t} - e_{2t+1}
    emb = np.zeros((V, d), np.float32)
    for t in range(V):
        emb[t, 2 * t], emb[t, 2 * t + 1] = 1.0, -1.0
    # schedule: a few distinct tokens, then eot forever (positions >= 6
    # all demand eot, so every beam is done regardless of prefix length)
    sched = [3, 0, 2, 1, 3, 2] + [eot] * (64 - 6)
    pos = 100.0 * emb[np.asarray(sched)]  # (64, d)

    p = jax.tree_util.tree_map(np.array, variables["params"])
    blk = p["decoder"]["block"]
    for mod in ("attn", "cross_attn"):
        blk[mod]["out"]["kernel"][:] = 0.0
        blk[mod]["out"]["bias"][:] = 0.0
    blk["mlp_fc2"]["kernel"][:] = 0.0
    blk["mlp_fc2"]["bias"][:] = 0.0
    p["decoder"]["ln"]["scale"][:] = 1.0
    p["decoder"]["ln"]["bias"][:] = 0.0
    p["decoder"]["token_embedding"]["embedding"] = 10.0 * emb
    p["decoder"]["positional_embedding"] = pos
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, p)}

    base = dict(max_new_tokens=16, eot=eot, init_tokens=(1,), beam_size=3)
    tf_, sf = build_beam_decoder(
        dec, variables, DecodeConfig(**base, stop_early=False)
    )(memory, prompt)
    te, se = build_beam_decoder(
        dec, variables, DecodeConfig(**base, stop_early=True)
    )(memory, prompt)
    # the construction must actually terminate every returned hypothesis
    # early, or the while/scan tails were never compared
    first_eot = [list(map(int, row)).index(eot) for row in np.asarray(tf_)]
    assert max(first_eot) <= 8, f"script failed to terminate: {first_eot}"
    np.testing.assert_array_equal(np.asarray(tf_), np.asarray(te))
    np.testing.assert_allclose(np.asarray(sf), np.asarray(se), rtol=1e-5)


@pytest.mark.slow
def test_beam_matches_exhaustive_search():
    """With beam width >= V^(L-1), beam search must find the globally best
    hypothesis; verify against explicit enumeration of every token sequence."""
    import itertools

    V, L = 5, 3
    dims = WhisperDims(
        n_mels=80, n_vocab=V, n_audio_ctx=8, n_audio_state=16,
        n_audio_head=2, n_audio_layer=1, n_text_ctx=32, n_text_state=16,
        n_text_head=2, n_text_layer=1,
    )
    eot = 4
    dec = TSDecoder(dims, startofprev_token=3)
    rng = np.random.default_rng(11)
    memory = jnp.asarray(rng.standard_normal((1, 6, 16)), jnp.float32)
    prompt = jnp.asarray(rng.standard_normal((1, 2, 16)), jnp.float32)
    variables = dec.init(
        jax.random.PRNGKey(11), memory, jnp.zeros((1, 2), jnp.int32), prompt
    )

    cfg = DecodeConfig(
        max_new_tokens=L, eot=eot, init_tokens=(1,), beam_size=V ** (L - 1)
    )
    toks, scores = build_beam_decoder(dec, variables, cfg)(memory, prompt)
    beam_seq = [int(t) for t in np.asarray(toks)[0]]
    beam_score = float(scores[0])

    # enumerate canonical sequences (everything after the first eot is eot)
    candidates = []
    for seq in itertools.product(range(V), repeat=L):
        canon, done = [], False
        for tok in seq:
            canon.append(eot if done else tok)
            done = done or tok == eot
        if canon == list(seq):
            candidates.append(canon)

    # one teacher-forced batched forward scores every candidate at once
    n = len(candidates)
    prefixes = np.asarray([[1] + c[:-1] for c in candidates], np.int32)
    logits = dec.apply(
        variables,
        jnp.tile(memory, (n, 1, 1)),
        jnp.asarray(prefixes),
        jnp.tile(prompt, (n, 1, 1)),
    )  # (n, L, V)
    logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    best_score, best_seq = -np.inf, None
    for ci, canon in enumerate(candidates):
        total, done = 0.0, False
        for i, tok in enumerate(canon):
            if not done:
                total += float(logp[ci, i, tok])
            done = done or tok == eot
        if total > best_score:
            best_score, best_seq = total, canon

    assert beam_seq == best_seq, (beam_seq, best_seq, beam_score, best_score)
    np.testing.assert_allclose(beam_score, best_score, rtol=1e-4, atol=1e-4)


def test_bpe_tokenizer_from_ranks():
    """The tiktoken-backed BPE path with offline-constructed byte-level
    ranks: lossless round-trip and eot-stripping decode."""
    import tiktoken

    from robustsq_whisper_tpu.tokenizer.whisper_tokenizer import BPETokenizer

    ranks = {bytes([i]): i for i in range(256)}
    ranks[b"he"] = 256
    ranks[b"ll"] = 257
    ranks[b"hell"] = 258
    tok = BPETokenizer(ranks)
    ids = tok.encode("hello hello")
    assert tok.decode(ids) == "hello hello"
    assert 258 in ids  # the merge actually applies
    assert tok.decode(ids + [tok.special.eot]) == "hello hello"
    assert tok.special.startofprev == 50361


def test_qmatmul_matches_dense():
    """W8A8 matmul (ops/quant.py) vs fp32 oracle: per-output-channel weight
    scales + dynamic activation scales keep relative error ~1e-2."""
    from robustsq_whisper_tpu.ops.quant import qmatmul, quantize_weight

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 1, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((64, 96)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((96,)), jnp.float32)
    w_q, w_s = quantize_weight(w)
    y = np.asarray(qmatmul(x, w_q, w_s, b))
    ref = np.asarray(x @ w + b)
    err = np.abs(y - ref).max() / np.abs(ref).std()
    assert err < 0.05, err


def test_quantized_weights_step_matches_dense(dec_and_params):
    """One decode step with int8 step weights stays close to the dense step
    (logits within a few percent of the logit scale) and decodes the same
    tokens end-to-end on the tiny model."""
    from robustsq_whisper_tpu.models.ts_decoder import quantize_step_weights

    dec, variables, memory, prompt = dec_and_params
    qw = quantize_step_weights(variables)
    # int8 kernels with per-output-channel scales, stacked per layer
    w_q, w_s, _ = qw["layers"]["attn"]["query"]
    assert w_q.dtype == jnp.int8 and w_q.shape[0] == DIMS.n_text_layer
    assert w_s.shape == w_q.shape[:1] + w_q.shape[2:]

    m = lambda method, *a, **kw: dec.apply(variables, *a, method=method, **kw)
    cross = m(TSDecoder.cross_kv, memory)
    total = 1 + prompt.shape[1] + 1 + CFG.max_new_tokens
    cache = m(TSDecoder.init_cache, memory.shape[0], total)
    init = jnp.ones((memory.shape[0], 1), jnp.int32)
    logits, cache = m(TSDecoder.prefill, init, prompt, cache, cross)
    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
    pos = 1 + prompt.shape[1] + 1
    dense_logits, _ = m(TSDecoder.step, tok, pos, cache, cross)
    q_logits, _ = m(TSDecoder.step, tok, pos, cache, cross, qw=qw)
    # ~6% of the logit std on this random-unit-variance tiny model (trained
    # whisper weights quantize tighter); a scale bug would be ~10x larger
    dev = np.abs(np.asarray(q_logits) - np.asarray(dense_logits)).max()
    assert dev < 0.1 * np.asarray(dense_logits).std(), dev


def test_quantized_weights_decode_matches_dense(dec_and_params):
    """End-to-end greedy decode with quantize_weights=True reproduces the
    dense tokens on well-conditioned inputs (same bar as the int8 cross-KV
    test above); composes with the quantized cross-KV path."""
    dec, variables, memory, prompt = dec_and_params
    g = build_greedy_decoder(dec, variables, CFG)
    t_dense, _ = g(memory, prompt)
    for quant_kv in (False, True):
        cfg_q = DecodeConfig(
            max_new_tokens=8, eot=2, init_tokens=(1,),
            quantize_weights=True, quantize_cross_kv=quant_kv,
        )
        gq = build_greedy_decoder(dec, variables, cfg_q)
        t_q, _ = gq(memory, prompt)
        np.testing.assert_array_equal(np.asarray(t_dense), np.asarray(t_q))


def test_quantized_weights_beam_close_to_dense_beam(dec_and_params):
    """Beam search passes the int8 step weights through the gathered-cache
    step exactly like greedy. Unlike greedy (exact-equality test above),
    beam top-k amplifies near-tie logit perturbations on this random tiny
    model, so the bar is high agreement + sane scores, not equality."""
    dec, variables, memory, prompt = dec_and_params
    cfg = DecodeConfig(max_new_tokens=8, eot=2, init_tokens=(1,), beam_size=3)
    cfg_q = DecodeConfig(
        max_new_tokens=8, eot=2, init_tokens=(1,), beam_size=3,
        quantize_weights=True, quantize_cross_kv=True,
    )
    tb, sb = build_beam_decoder(dec, variables, cfg)(memory, prompt)
    tq, sq = build_beam_decoder(dec, variables, cfg_q)(memory, prompt)
    agree = (np.asarray(tb) == np.asarray(tq)).mean()
    assert agree >= 0.75, (agree, np.asarray(tb), np.asarray(tq))
    np.testing.assert_allclose(np.asarray(sb), np.asarray(sq), rtol=0.2, atol=0.5)


def test_int8_self_cache_decode_matches_dense(dec_and_params):
    """int8 self-attention cache (per-position scales, native integer dots,
    V scales folded into the softmax weights before their own int8
    quantization) reproduces dense-cache greedy tokens; composes with the
    quantized cross-KV and W8A8 step weights."""
    dec, variables, memory, prompt = dec_and_params
    g = build_greedy_decoder(dec, variables, CFG)
    t_dense, _ = g(memory, prompt)
    dec8 = TSDecoder(DIMS, startofprev_token=3, self_kv_bits=8)
    for qkv, qwts in ((False, False), (True, True)):
        cfg_q = DecodeConfig(
            max_new_tokens=8, eot=2, init_tokens=(1,),
            quantize_cross_kv=qkv, quantize_weights=qwts,
        )
        gq = build_greedy_decoder(dec8, variables, cfg_q)
        t_q, s_q = gq(memory, prompt)
        np.testing.assert_array_equal(np.asarray(t_dense), np.asarray(t_q))
        assert np.all(np.isfinite(np.asarray(s_q)))


def test_special_tokens_large_v3_layout():
    """num_languages=100 (<|yue|>) shifts the post-language specials by +1
    and yields the 51866-token large-v3 vocab."""
    st = special_tokens(multilingual=True, num_languages=100)
    assert st.sot == 50258
    assert st.transcribe == 50360
    assert st.startofprev == 50362
    assert st.notimestamps == 50364
    assert st.n_vocab == 51866


def test_long_audio_chunked_decode(dec_and_params):
    """>30 s audio decodes as batched windows sharing one speaker prompt —
    the reference TRUNCATES past 30 s (whisper_encoder.py:141-146); here the
    spliced output covers every window, and chunk_waveform partitions the
    waveform exactly."""
    from robustsq_whisper_tpu.decode.long_audio import (
        chunk_waveform,
        decode_long_audio,
    )
    from robustsq_whisper_tpu.models import QFormerTSEncoder, TSEncoderConfig

    # chunking math: 75 s at 1 Hz "sample rate" stand-in
    wav = np.arange(75, dtype=np.float32)
    w, lens = chunk_waveform(wav, chunk_seconds=30, sample_rate=1)
    assert w.shape == (3, 30)
    np.testing.assert_array_equal(lens, [30, 30, 15])
    np.testing.assert_array_equal(np.concatenate([r[:n] for r, n in zip(w, lens)]), wav)
    # overlap slides by chunk - overlap
    w2, _ = chunk_waveform(wav, chunk_seconds=30, overlap_seconds=10, sample_rate=1)
    assert w2.shape[0] == 4 and w2[1][0] == 20

    # end-to-end on the tiny model: 2.5 windows of audio -> one token stream
    enc = QFormerTSEncoder(
        DIMS,
        TSEncoderConfig(num_query_tokens=2, num_hidden_layers=1,
                        qformer_hidden_size=48, qformer_heads=4,
                        qformer_intermediate_size=96),
    )
    rng = np.random.default_rng(3)
    chunk_s = (2 * DIMS.n_audio_ctx * 160) / 16000.0  # tiny ctx => short chunks
    long_wav = rng.standard_normal(int(2.5 * chunk_s * 16000)).astype(np.float32) * 0.1
    enroll = rng.standard_normal(int(0.5 * chunk_s * 16000)).astype(np.float32) * 0.1
    feats = jnp.zeros((1, 80, 2 * DIMS.n_audio_ctx), jnp.float32)
    efeats = jnp.zeros((1, 80, 20), jnp.float32)
    enc_vars = enc.init(jax.random.PRNGKey(0), feats, None, efeats, None)
    dec, dec_vars, _, _ = dec_and_params
    toks = decode_long_audio(
        enc, enc_vars, dec, dec_vars, long_wav, enroll,
        DecodeConfig(max_new_tokens=4, eot=2, init_tokens=(1,)),
        chunk_seconds=chunk_s,
    )
    assert isinstance(toks, list) and len(toks) <= 3 * 4


def test_special_tokens_for_vocab_and_yue():
    """Model vocab size implies the token layout; <|yue|> exists only in the
    100-language (large-v3) layout and is rejected by the 99-language one."""
    from robustsq_whisper_tpu.tokenizer.whisper_tokenizer import (
        special_tokens_for_vocab,
    )

    assert special_tokens_for_vocab(51864).eot == 50256  # English-only
    v2 = special_tokens_for_vocab(51865)
    assert (v2.transcribe, v2.n_vocab) == (50359, 51865)
    v3 = special_tokens_for_vocab(51866)
    assert (v3.transcribe, v3.n_vocab) == (50360, 51866)
    assert v3.lang("yue") == v3.lang_offset + 99
    with pytest.raises(ValueError):
        v2.lang("yue")  # v2 layout has no <|yue|> slot
    # expanded vocab (reference adapt_vocab) keeps the v2 layout
    assert special_tokens_for_vocab(52000).transcribe == 50359


def test_deferred_beam_reorder_matches_eager():
    """Deferred beam reorder (defer_reorder=R: settled prefix read through
    the row-indirected kernel, window mini-reorders, periodic flush) ==
    the eager per-step full reorder, token for token, across flush
    periods — including R larger than the emitted length (flush never
    fires) and R=1 (flush every step)."""
    dims = WhisperDims(
        n_mels=80, n_vocab=64, n_audio_ctx=16, n_audio_state=128,
        n_audio_head=2, n_audio_layer=1, n_text_ctx=64, n_text_state=128,
        n_text_head=2, n_text_layer=2,
    )
    rng = np.random.default_rng(5)
    memory = jnp.asarray(rng.standard_normal((2, 10, 128)) * 0.3, jnp.float32)
    prompt = jnp.asarray(rng.standard_normal((2, 2, 128)) * 0.3, jnp.float32)
    ys = jnp.asarray(rng.integers(0, 64, (2, 4)))
    dec = TSDecoder(dims, startofprev_token=3)
    variables = dec.init(jax.random.PRNGKey(5), memory, ys, prompt)

    base = dict(max_new_tokens=10, eot=2, init_tokens=(1,), beam_size=3)
    t_ref, s_ref = build_beam_decoder(
        dec, variables, DecodeConfig(**base, beam_reorder="take")
    )(memory, prompt)
    for period in (1, 4, 16):
        t_d, s_d = build_beam_decoder(
            dec, variables,
            DecodeConfig(**base, defer_reorder=period),
        )(memory, prompt)
        np.testing.assert_array_equal(
            np.asarray(t_ref), np.asarray(t_d), err_msg=f"R={period}"
        )
        np.testing.assert_allclose(
            np.asarray(s_ref), np.asarray(s_d), rtol=1e-4, atol=1e-4,
            err_msg=f"R={period}",
        )


def test_deferred_beam_with_quantized_cross_and_weights():
    """defer_reorder composes with the quantized cross-KV (grouped kernel)
    and W8A8 step weights — the headline beam serving knobs."""
    dims = WhisperDims(
        n_mels=80, n_vocab=64, n_audio_ctx=16, n_audio_state=128,
        n_audio_head=2, n_audio_layer=1, n_text_ctx=64, n_text_state=128,
        n_text_head=2, n_text_layer=2,
    )
    rng = np.random.default_rng(6)
    memory = jnp.asarray(rng.standard_normal((2, 10, 128)) * 0.3, jnp.float32)
    prompt = jnp.asarray(rng.standard_normal((2, 2, 128)) * 0.3, jnp.float32)
    ys = jnp.asarray(rng.integers(0, 64, (2, 4)))
    dec = TSDecoder(dims, startofprev_token=3, cross_kv_bits=8)
    variables = dec.init(jax.random.PRNGKey(6), memory, ys, prompt)

    base = dict(
        max_new_tokens=8, eot=2, init_tokens=(1,), beam_size=3,
        quantize_cross_kv=True, quantize_weights=True,
    )
    t_ref, s_ref = build_beam_decoder(
        dec, variables, DecodeConfig(**base)
    )(memory, prompt)
    t_d, s_d = build_beam_decoder(
        dec, variables, DecodeConfig(**base, defer_reorder=4)
    )(memory, prompt)
    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_d))
    np.testing.assert_allclose(
        np.asarray(s_ref), np.asarray(s_d), rtol=1e-4, atol=1e-4
    )


def test_deferred_beam_rejects_nonflat_dims():
    """defer_reorder's window/flush math is written against the flat
    (L, b*k, T, n_state) cache leaves; dims that auto-disable the flat
    layout (n_state not a 128 multiple) must raise the scope guard, not
    fail downstream with a shape error."""
    dims = WhisperDims(
        n_mels=80, n_vocab=64, n_audio_ctx=16, n_audio_state=64,
        n_audio_head=2, n_audio_layer=1, n_text_ctx=64, n_text_state=64,
        n_text_head=2, n_text_layer=2,
    )
    rng = np.random.default_rng(7)
    memory = jnp.asarray(rng.standard_normal((2, 10, 64)) * 0.3, jnp.float32)
    prompt = jnp.asarray(rng.standard_normal((2, 2, 64)) * 0.3, jnp.float32)
    ys = jnp.asarray(rng.integers(0, 64, (2, 4)))
    dec = TSDecoder(dims, startofprev_token=3)
    variables = dec.init(jax.random.PRNGKey(7), memory, ys, prompt)
    run = build_beam_decoder(
        dec, variables,
        DecodeConfig(
            max_new_tokens=8, eot=2, init_tokens=(1,), beam_size=2,
            defer_reorder=8,
        ),
    )
    with pytest.raises(ValueError, match="dense flat self cache"):
        run(memory, prompt)
