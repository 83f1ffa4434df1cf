"""Whisper timestamp-token decoding (decode/timestamps.py).

The reference decodes `<|notimestamps|>` so this is a completeness feature
(SURVEY §2.1 encoder/decoder rows; VERDICT r2 missing #4). The rule filter
is pinned against an independent numpy port of the published Whisper
timestamp sampling semantics, and the greedy integration against the
structural invariants every valid timestamped transcript satisfies.
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
    strip_eot,
)
from robustsq_whisper_tpu.decode.timestamps import (
    apply_timestamp_rules,
    segments_from_tokens,
    update_timestamp_state,
)
from robustsq_whisper_tpu.models import TSDecoder, WhisperDims

TS_BEGIN = 20
EOT = 2
VOCAB = 30  # text 0..19 (minus eot), timestamps 20..29


def _np_rules(logits, seq, ts_begin, eot, max_initial):
    """Independent numpy port of the Whisper timestamp rules for ONE row
    given the full emitted sequence so far."""
    out = logits.astype(np.float64).copy()
    NEG = -1e30
    last_ts = len(seq) >= 1 and seq[-1] >= ts_begin
    penult_ts = len(seq) < 2 or seq[-2] >= ts_begin
    if last_ts:
        if penult_ts:
            out[ts_begin:] = NEG  # pair complete: text next
        else:
            out[: eot] = NEG  # lone timestamp: timestamp or eot
            out[eot + 1 : ts_begin] = NEG
    ts_seen = [t for t in seq if t >= ts_begin]
    if ts_seen:
        bound = ts_seen[-1] if (last_ts and not penult_ts) else ts_seen[-1] + 1
        out[ts_begin:bound] = NEG
    if len(seq) == 0:
        out[:ts_begin] = NEG
        out[ts_begin + max_initial + 1 :] = NEG
    logp = out - np.log(np.exp(out - out.max()).sum()) - out.max()
    ts_mass = np.logaddexp.reduce(logp[ts_begin:])
    text = logp[:ts_begin].copy()
    text[eot] = -np.inf
    if ts_mass > text.max():
        out[:ts_begin][np.arange(ts_begin) != eot] = NEG
    return out


def _jax_state(seq, ts_begin):
    last = seq[-1] if len(seq) >= 1 else -1
    penult = seq[-2] if len(seq) >= 2 else -1
    ts_seen = [t for t in seq if t >= ts_begin]
    max_ts = max(ts_seen) if ts_seen else ts_begin
    return (
        jnp.asarray([last], jnp.int32),
        jnp.asarray([penult], jnp.int32),
        jnp.asarray([max_ts], jnp.int32),
    )


def test_rules_match_numpy_reference():
    rng = np.random.default_rng(0)
    seqs = [
        [],  # first token
        [22],  # lone opening timestamp... then text required
        [22, 5],  # open + text: close must be >= 22... strictly per rule
        [22, 5, 24],  # lone close: ts or eot next
        [22, 5, 24, 24],  # pair: text next
        [22, 5, 24, 24, 7, 9],  # inside a segment
        [21, 21],  # degenerate immediate pair
    ]
    for seq in seqs:
        logits = rng.standard_normal(VOCAB) * 2.0
        want = _np_rules(logits, seq, TS_BEGIN, EOT, max_initial=5)
        last, penult, max_ts = _jax_state(seq, TS_BEGIN)
        got = np.asarray(
            apply_timestamp_rules(
                jnp.asarray(logits, jnp.float32)[None],
                last, penult, max_ts, TS_BEGIN, EOT, max_initial_index=5,
            )
        )[0]
        # compare which candidates survive and the argmax (absolute values
        # differ by the f32/f64 mass computation)
        np.testing.assert_array_equal(got < -1e29, want < -1e29, err_msg=str(seq))
        assert int(np.argmax(got)) == int(np.argmax(want)), seq


def test_update_state_tracks_max_timestamp():
    last, penult, max_ts = _jax_state([22, 5], TS_BEGIN)
    tok = jnp.asarray([24], jnp.int32)
    nlast, npenult, nmax = update_timestamp_state(tok, last, max_ts, TS_BEGIN)
    assert int(nlast[0]) == 24 and int(npenult[0]) == 5
    assert int(nmax[0]) == 24
    # text token leaves max_ts alone
    nlast2, _, nmax2 = update_timestamp_state(
        jnp.asarray([7], jnp.int32), nlast, nmax, TS_BEGIN
    )
    assert int(nmax2[0]) == 24


def test_segments_from_tokens():
    class Tok:
        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    row = [22, 5, 6, 24, 24, 7, 26]  # [0.04s: "5 6" :0.08s][0.08s: "7" :...]
    segs = segments_from_tokens(row, Tok(), TS_BEGIN)
    assert segs[0] == (pytest.approx(0.04), pytest.approx(0.08), "5 6")
    assert segs[1] == (pytest.approx(0.08), pytest.approx(0.12), "7")


def test_greedy_with_timestamps_emits_valid_structure():
    """End-to-end greedy with the rules on a tiny random decoder: the output
    must satisfy every structural invariant — first token a timestamp within
    the initial window, timestamps in pairs, monotonic, text inside
    segments."""
    dims = WhisperDims(
        n_mels=80, n_vocab=VOCAB, n_audio_ctx=16, n_audio_state=32,
        n_audio_head=2, n_audio_layer=1, n_text_ctx=64, n_text_state=32,
        n_text_head=2, n_text_layer=2,
    )
    rng = np.random.default_rng(3)
    dec = TSDecoder(dims, startofprev_token=3)
    memory = jnp.asarray(rng.standard_normal((3, 10, 32)), jnp.float32)
    prompt = jnp.asarray(rng.standard_normal((3, 2, 32)), jnp.float32)
    ys = jnp.asarray(rng.integers(0, VOCAB, (3, 4)))
    variables = dec.init(jax.random.PRNGKey(3), memory, ys, prompt)
    cfg = DecodeConfig(
        max_new_tokens=12, eot=EOT, init_tokens=(1,), beam_size=1,
        with_timestamps=True, timestamp_begin=TS_BEGIN,
        max_initial_timestamp_index=4,
    )
    for stop_early in (True, False):
        run = build_greedy_decoder(
            dec, variables, dataclasses.replace(cfg, stop_early=stop_early)
        )
        tokens, _ = run(memory, prompt)
        for row in strip_eot(np.asarray(tokens), EOT):
            assert row, "empty row"
            assert row[0] >= TS_BEGIN and row[0] <= TS_BEGIN + 4, row
            ts_seen = [t for t in row if t >= TS_BEGIN]
            assert ts_seen == sorted(ts_seen), row  # monotonic
            # pair structure: scan states — outside/inside segment
            state = "closed"
            prev_was_ts = False
            for t in row:
                if t >= TS_BEGIN:
                    state = "closed" if (state == "open" and prev_was_ts is False) else "open"
                    prev_was_ts = True
                else:
                    assert state == "open", row  # text only inside a segment
                    prev_was_ts = False


def test_timestamps_rejected_for_beam_and_speculative():
    dims = WhisperDims(
        n_mels=80, n_vocab=VOCAB, n_audio_ctx=16, n_audio_state=32,
        n_audio_head=2, n_audio_layer=1, n_text_ctx=64, n_text_state=32,
        n_text_head=2, n_text_layer=2,
    )
    dec = TSDecoder(dims, startofprev_token=3)
    cfg = DecodeConfig(
        max_new_tokens=4, eot=EOT, init_tokens=(1,), beam_size=3,
        with_timestamps=True, timestamp_begin=TS_BEGIN,
    )
    with pytest.raises(ValueError, match="greedy-only"):
        build_beam_decoder(dec, {}, cfg)
    with pytest.raises(ValueError, match="greedy"):
        build_greedy_decoder(
            dec, {}, dataclasses.replace(cfg, beam_size=1, speculative_gamma=2)
        )


def test_segments_unclosed_trailing_segment_flushes():
    """A row that ends mid-segment (decode hit max_new_tokens) must still
    emit the trailing text, ending at its opening timestamp (docstring
    contract; review r3: it was silently dropped)."""
    class Tok:
        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    row = [22, 5, 6, 24, 26, 7, 8]  # closed seg, then open seg w/ text
    segs = segments_from_tokens(row, Tok(), TS_BEGIN)
    assert segs[0] == (pytest.approx(0.04), pytest.approx(0.08), "5 6")
    assert segs[1] == (pytest.approx(0.12), pytest.approx(0.12), "7 8")
    # an open segment with NO text is still dropped
    segs2 = segments_from_tokens([22, 5, 24, 26], Tok(), TS_BEGIN)
    assert len(segs2) == 1
