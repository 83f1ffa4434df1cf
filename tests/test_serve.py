"""Serving daemon tests: engine output equals the offline serving program
on the same packed batch, the HTTP surface works end-to-end with
concurrent requests, and the audio decoding round-trips.

The reference has no online serving (decode is the offline stage-12 job,
/root/reference/run_tswhisper.sh:67-90); serve/ is beyond-parity."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robustsq_whisper_tpu.audio.frontend import log_mel_spectrogram
from robustsq_whisper_tpu.decode.search import (
    DecodeConfig,
    build_beam_decoder,
    strip_eot,
)
from robustsq_whisper_tpu.models import (
    QFormerTSEncoder,
    TSDecoder,
    TSEncoderConfig,
    WhisperDims,
)
from robustsq_whisper_tpu.serve import (
    EngineConfig,
    TranscriptionEngine,
    make_server,
)
from robustsq_whisper_tpu.serve.server import audio_from_bytes
from robustsq_whisper_tpu.tokenizer.whisper_tokenizer import load_tokenizer

DIMS = WhisperDims(
    n_mels=80, n_vocab=50, n_audio_ctx=16, n_audio_state=32,
    n_audio_head=2, n_audio_layer=1, n_text_ctx=64, n_text_state=32,
    n_text_head=2, n_text_layer=2,
)
TS = TSEncoderConfig(
    num_query_tokens=2, num_hidden_layers=1, qformer_hidden_size=48,
    qformer_heads=4, qformer_intermediate_size=96,
)
DCFG = DecodeConfig(max_new_tokens=6, eot=2, init_tokens=(1,), beam_size=1)
# speech window = the tiny model's full context; enroll shorter
ECFG = EngineConfig(batch_size=4, speech_seconds=0.32, enroll_seconds=0.20)
SR = 16000


def _wav(seed, seconds):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(int(seconds * SR)) * 0.1).astype(np.float32)


@pytest.fixture(scope="module")
def engine():
    enc = QFormerTSEncoder(DIMS, TS)
    feats = jnp.zeros((1, 80, 2 * DIMS.n_audio_ctx), jnp.float32)
    efeats = jnp.zeros((1, 80, 20), jnp.float32)
    enc_vars = enc.init(jax.random.PRNGKey(0), feats, None, efeats, None)
    dec = TSDecoder(DIMS, startofprev_token=3)
    rng = np.random.default_rng(0)
    memory = jnp.asarray(rng.standard_normal((2, 18, 32)), jnp.float32)
    prompt = jnp.asarray(rng.standard_normal((2, 2, 32)), jnp.float32)
    ys = jnp.asarray(rng.integers(0, 50, (2, 4)))
    dec_vars = dec.init(jax.random.PRNGKey(1), memory, ys, prompt)
    tok = load_tokenizer(None)
    return (
        TranscriptionEngine(enc, enc_vars, dec, dec_vars, tok, DCFG, ECFG),
        enc, enc_vars, dec, dec_vars, tok,
    )


def test_engine_matches_offline_program(engine):
    """transcribe() == the offline serving program on the identically
    packed batch (same executables underneath)."""
    eng, enc, enc_vars, dec, dec_vars, tok = engine
    items = [
        (_wav(1, 0.30), _wav(2, 0.15)),
        (_wav(3, 0.10), _wav(4, 0.20)),  # short speech: zero-padded
    ]
    got = eng.transcribe(items)
    assert len(got) == 2

    speech, slens, enroll, elens = eng._pack(items)
    # the engine stages int16 rows (wire transport) and dequantizes on
    # device; the offline comparison dequantizes identically
    assert speech.dtype == np.int16
    feats, flens = log_mel_spectrogram(
        jnp.asarray(speech, jnp.float32) / 32768.0,
        jnp.asarray(slens), n_mels=80,
    )
    efeats, eflens = log_mel_spectrogram(
        jnp.asarray(enroll, jnp.float32) / 32768.0,
        jnp.asarray(elens), n_mels=80,
    )
    encode = jax.jit(lambda v, *a: enc.apply(v, *a))
    memory, _, spk_prompt, _ = encode(enc_vars, feats, flens, efeats, eflens)
    run = build_beam_decoder(dec, dec_vars, DCFG)
    tokens = np.asarray(run(memory, spk_prompt)[0])
    want = [
        tok.decode(strip_eot(tokens[i : i + 1], DCFG.eot)[0]).strip()
        for i in range(2)
    ]
    assert got == want
    # pad rows repeat row 0: single-item call returns the same row-0 text
    assert eng.transcribe(items[:1]) == want[:1]


def test_engine_speculative_draft_matches_greedy(engine):
    """The daemon's speculative path (cli.serve --speculative_gamma
    [--draft_path]): an engine built with a draft head serves transcripts
    identical to the plain greedy engine — speculation affects speed only,
    never content (decode/speculative.py greedy-exactness)."""
    import dataclasses

    from robustsq_whisper_tpu.decode.speculative import draft_variables

    eng, enc, enc_vars, dec, dec_vars, tok = engine
    spec_dec = TSDecoder(DIMS, startofprev_token=3, flat_self_cache=False)
    dcfg = dataclasses.replace(DCFG, speculative_gamma=2, draft_layers=1)
    items = [
        (_wav(21, 0.30), _wav(22, 0.15)),
        (_wav(23, 0.12), _wav(24, 0.20)),
    ]
    want = eng.transcribe(items)
    # separate-draft mode (a "distilled" draft: any TSDecoder variables at
    # n_text_layer=draft_layers — here a slice of the target's own weights)
    eng_draft = TranscriptionEngine(
        enc, enc_vars, spec_dec, dec_vars, tok, dcfg, ECFG,
        draft_vars=draft_variables(dec_vars, 1),
    )
    assert eng_draft.transcribe(items) == want
    # self-draft mode (no draft weights) through the same engine surface
    eng_self = TranscriptionEngine(
        enc, enc_vars, spec_dec, dec_vars, tok, dcfg, ECFG
    )
    assert eng_self.transcribe(items) == want


def test_serve_cli_speculative_flag_validation():
    """cli.serve refuses inconsistent speculative flags with actionable
    parser errors before touching the model (mirrors cli.decode's guards)."""
    import pytest as _pytest

    from robustsq_whisper_tpu.cli import serve as serve_cli

    import pathlib

    cfg = str(
        pathlib.Path(__file__).resolve().parents[1]
        / "conf/tswhisper/train_tsasr_whisper_dev_smoke.yaml"
    )
    with _pytest.raises(SystemExit):
        serve_cli.main([
            "--config", cfg, "--draft_path", "/nonexistent",
        ])  # draft without --speculative_gamma
    with _pytest.raises(SystemExit):
        serve_cli.main([
            "--config", cfg, "--speculative_gamma", "2",
            "--model_parallel", "2",
        ])  # speculative is single-chip/DP only


def test_engine_rejects_bad_sizes(engine):
    eng = engine[0]
    with pytest.raises(ValueError):
        eng.transcribe([])
    with pytest.raises(ValueError):
        eng.transcribe([(_wav(1, 0.1), _wav(2, 0.1))] * 5)  # > batch_size


def test_http_server_end_to_end(engine):
    """Concurrent requests through the HTTP daemon: 200s, text identical to
    the direct engine call, micro-batcher coalesces, stats/health report."""
    eng = engine[0]
    server, batcher = make_server(
        eng, "127.0.0.1", 0, max_wait_ms=200.0, info={"model": "test"}
    )
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        items = [
            (_wav(10, 0.25), _wav(11, 0.18)),
            (_wav(12, 0.30), _wav(13, 0.12)),
        ]
        want = eng.transcribe(items)

        def post(item, out, idx):
            body = json.dumps({
                "speech_pcm": item[0].tolist(),
                "enroll_pcm": item[1].tolist(),
            }).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/transcribe", data=body,
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=120) as resp:
                out[idx] = json.loads(resp.read())

        out = [None, None]
        threads = [
            threading.Thread(target=post, args=(items[i], out, i))
            for i in range(2)
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=120)
        assert out[0] is not None and out[1] is not None
        assert [out[0]["text"], out[1]["text"]] == want
        assert out[0]["latency_ms"] >= 0

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as resp:
            health = json.loads(resp.read())
        assert health["status"] == "ok" and health["compiled"]
        assert health["batch_size"] == ECFG.batch_size
        assert health["model"] == "test"

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=30
        ) as resp:
            stats = json.loads(resp.read())
        assert stats["requests"] == 2 and stats["errors"] == 0
        assert 1 <= stats["batches"] <= 2  # coalesced when both queued in time

        # bad request: missing enrollment
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/transcribe",
            data=json.dumps({"speech_pcm": [0.0]}).encode(),
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400
    finally:
        server.shutdown()
        batcher.close()
        server.server_close()


def test_microbatcher_pipeline_multiple_batches(engine):
    """The two-stage (stage/run) pipeline: > batch_size concurrent
    submissions drain through multiple device batches, every future
    resolves to the same text the plain engine call produces, and close()
    terminates both worker threads."""
    from robustsq_whisper_tpu.serve.server import MicroBatcher

    eng = engine[0]
    items = [
        (_wav(100 + i, 0.2 + 0.01 * (i % 3)), _wav(200 + i, 0.15))
        for i in range(ECFG.batch_size * 2 + 1)  # 3 batches: 4 + 4 + 1
    ]
    # expected: per-item singleton transcribe (padding-row invariance is
    # pinned by test_engine_matches_offline_program)
    want = [eng.transcribe([it])[0] for it in items]

    batcher = MicroBatcher(eng, max_wait_ms=50.0)
    try:
        futs = [batcher.submit(s, e) for s, e in items]
        got = [f.result(timeout=120) for f in futs]
        assert got == want
        assert batcher.requests == len(items)
        assert batcher.batches >= 2  # must have spanned several device runs
        assert batcher.errors == 0
    finally:
        batcher.close()
    assert not batcher._stager.is_alive()
    assert not batcher._runner.is_alive()


def test_audio_from_bytes_wav_roundtrip():
    from scipy.io import wavfile

    wav = _wav(42, 0.1)
    buf = io.BytesIO()
    wavfile.write(buf, SR, (wav * 32767).astype(np.int16))
    back = audio_from_bytes(buf.getvalue(), SR)
    np.testing.assert_allclose(back, wav, atol=2 / 32768)
    with pytest.raises(ValueError):
        audio_from_bytes(buf.getvalue(), 8000)  # sample-rate mismatch


def test_microbatcher_sheds_when_full(engine):
    """Bounded admission: beyond max_queue, submit raises queue.Full (the
    HTTP layer turns it into 503 + Retry-After)."""
    import queue as _queue

    from robustsq_whisper_tpu.serve.server import MicroBatcher

    eng = engine[0]

    class SlowEngine:
        cfg = eng.cfg

        def stage(self, items):
            import time as _t

            _t.sleep(0.5)  # hold the stager so the queue backs up
            return eng.stage(items)

        def infer_staged(self, staged, n):
            return eng.infer_staged(staged, n)

    batcher = MicroBatcher(SlowEngine(), max_wait_ms=1.0, max_queue=2)
    try:
        futs = []
        shed = 0
        for i in range(12):
            try:
                futs.append(batcher.submit(_wav(i, 0.2), _wav(i + 50, 0.15)))
            except _queue.Full:
                shed += 1
        assert shed > 0 and batcher.shed == shed
        for f in futs:  # admitted requests still complete
            assert isinstance(f.result(timeout=120), str)
    finally:
        batcher.close()


def test_microbatcher_close_fails_pending(engine):
    """close() must not strand submitted futures (ADVICE r2): anything still
    queued resolves with an error instead of blocking to the timeout."""
    from robustsq_whisper_tpu.serve.server import MicroBatcher

    eng = engine[0]

    class BlockingEngine:
        cfg = eng.cfg

        def __init__(self):
            import threading as _th

            self.release = _th.Event()

        def stage(self, items):
            self.release.wait(timeout=30)
            return eng.stage(items)

        def infer_staged(self, staged, n):
            return eng.infer_staged(staged, n)

    slow = BlockingEngine()
    batcher = MicroBatcher(slow, max_wait_ms=1.0, max_queue=8)
    futs = [batcher.submit(_wav(i, 0.2), _wav(i + 9, 0.15)) for i in range(6)]
    import time as _t

    _t.sleep(0.1)  # let the stager pick up the first batch and block
    slow.release.set()  # avoid a 5s join timeout inside close()
    batcher.close()
    for f in futs:
        assert f.done()  # resolved: either a result or "server closing"
    with pytest.raises(RuntimeError, match="closing"):
        batcher.submit(_wav(0, 0.2), _wav(1, 0.15))


def test_http_request_size_cap(engine):
    """Bodies over max_body_bytes get 413 without being read."""
    eng = engine[0]
    server, batcher = make_server(
        eng, "127.0.0.1", 0, max_wait_ms=20.0, max_body_bytes=1024
    )
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        body = json.dumps({
            "speech_pcm": [0.0] * 4096, "enroll_pcm": [0.0] * 1024,
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/transcribe", data=body
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 413
    finally:
        server.shutdown()
        batcher.close()
        server.server_close()


def test_microbatcher_admission_bound_is_exact(engine):
    """The admission bound is exactly max_queue: the +1 queue slot is
    RESERVED for the close() sentinel and can never be taken by a request
    (review r3: put_nowait alone let request max_queue+1 slip in, making
    shedding start one late and close() block on a full queue)."""
    import queue as _queue
    import threading as _th

    from robustsq_whisper_tpu.serve.server import MicroBatcher

    eng = engine[0]

    class BlockingEngine:
        cfg = eng.cfg

        def __init__(self):
            self.release = _th.Event()

        def stage(self, items):
            self.release.wait(timeout=30)
            return eng.stage(items)

        def infer_staged(self, staged, n):
            return eng.infer_staged(staged, n)

    slow = BlockingEngine()
    batcher = MicroBatcher(slow, max_wait_ms=1.0, max_queue=3)
    import time as _t

    try:
        futs = [batcher.submit(_wav(0, 0.2), _wav(9, 0.15))]
        # wait until the stager has TAKEN the first item and is blocked in
        # stage() (a fixed sleep flakes on loaded hosts)
        deadline = _t.time() + 10
        while batcher._q.qsize() > 0 and _t.time() < deadline:
            _t.sleep(0.01)
        assert batcher._q.qsize() == 0
        admitted, shed = 0, 0
        for i in range(10):
            try:
                futs.append(batcher.submit(_wav(i, 0.2), _wav(i + 9, 0.15)))
                admitted += 1
            except _queue.Full:
                shed += 1
            # with the stager blocked, the queue never drains mid-loop
            assert batcher._q.qsize() <= batcher.max_queue
        assert admitted == 3 and shed == 7
        # the sentinel slot is free: close() must not block on the full queue
        t0 = _t.time()
        slow.release.set()
        batcher.close()
        assert _t.time() - t0 < 5.0
        for f in futs:
            assert f.done()
    finally:
        slow.release.set()
