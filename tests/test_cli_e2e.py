"""End-to-end CLI test: simulate data -> train (dev-scale) -> decode.

Exercises the full stage-101 -> stage-11 -> stage-12 path the reference
recipe drives through run_tswhisper.sh, hermetically on CPU with a dev-size
model and synthetic audio.
"""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robustsq_whisper_tpu.data import kaldi_io, simulate
from robustsq_whisper_tpu.data.dataset import KaldiTSDataset
from robustsq_whisper_tpu.decode.pipeline import decode_dataset
from robustsq_whisper_tpu.decode.search import DecodeConfig
from robustsq_whisper_tpu.models import (
    QFormerTSEncoder,
    TSASRModel,
    TSDecoder,
    TSEncoderConfig,
    TSModelConfig,
    WhisperDims,
)
from robustsq_whisper_tpu.tokenizer.whisper_tokenizer import ByteTokenizer
from robustsq_whisper_tpu.train.loop import LoopConfig, run_training
from robustsq_whisper_tpu.train.optim import OptimConfig
from robustsq_whisper_tpu.train.step import TrainConfig

from tests.test_pipeline import _make_clean_dir

SR = 16000

DIMS = WhisperDims(
    n_mels=80, n_vocab=300, n_audio_ctx=32, n_audio_state=32,
    n_audio_head=2, n_audio_layer=1, n_text_ctx=64, n_text_state=32,
    n_text_head=2, n_text_layer=1,
)
TS = TSEncoderConfig(
    num_query_tokens=2, num_hidden_layers=1, qformer_hidden_size=32,
    qformer_heads=2, qformer_intermediate_size=64,
)


@pytest.mark.slow
def test_simulate_train_decode(tmp_path):
    # stage 101: simulate overlapped data from a synthetic clean dir
    src = _make_clean_dir(tmp_path, n_speakers=4, utts_per_spk=2)
    data_dir = str(tmp_path / "mix")
    simulate.generate_overlap_enrollment(
        src, data_dir, simulate.OverlapConfig(num_mixtures=6, seed=0)
    )
    assert kaldi_io.validate_data_dir(data_dir) == []

    tok = ByteTokenizer()
    cfg = TSModelConfig(
        vocab_size=300, sos=257, eos=258, startofprev=259, num_speakers=8,
        num_negatives=2, ctc_weight=0.3,
    )
    speech_sec = (DIMS.n_audio_ctx * 2 * 160) / SR  # ~0.64 s windows
    dataset = KaldiTSDataset(
        data_dir, tok,
        speech_seconds=speech_sec, enroll_seconds=speech_sec / 2,
        text_len=48, num_speakers=8, seed=0,
    )
    assert len(dataset) == 12

    # stage 11: a few training steps + checkpointing
    model = TSASRModel(DIMS, TS, cfg)
    rng = jax.random.PRNGKey(0)
    first = next(dataset.batches(4, shuffle=False))
    first.pop("utt_ids")
    variables = model.init(rng, first, rng, 0, train=False)
    tcfg = TrainConfig(optim=OptimConfig(lr=1e-3, schedule="constant"))
    lcfg = LoopConfig(
        num_epochs=2, batch_size=4, log_every=2,
        ckpt_every_steps=0, ckpt_dir=str(tmp_path / "ckpt"),
    )
    # valid set enables the per-epoch eval pass, n-best tracking and the
    # averaged checkpoint (ESPnet --valid_set / valid.acc.ave semantics)
    state = run_training(
        model, dataset, variables, tcfg, lcfg, rng=rng, valid_dataset=dataset
    )
    assert int(state.step) == 2 * (12 // 4) * 1  # 3 batches x 2 epochs

    # n-best registry + averaged checkpoint written
    import json

    from robustsq_whisper_tpu.train.checkpoint import latest_step
    from robustsq_whisper_tpu.train.eval import AVE_SUBDIR, NBEST_FILE

    nbest_path = os.path.join(lcfg.ckpt_dir, NBEST_FILE)
    assert os.path.isfile(nbest_path)
    nbest = json.load(open(nbest_path))
    assert nbest["metric"] == "acc" and len(nbest["entries"]) == 2
    ave_dir = os.path.join(lcfg.ckpt_dir, AVE_SUBDIR)
    assert latest_step(ave_dir) == 2  # 2 checkpoints averaged

    # resume: restarting continues from epoch 2 (no extra epochs to run)
    state2 = run_training(model, dataset, variables, tcfg, lcfg, rng=rng)
    assert int(state2.step) == int(state.step)

    # stage 12: batched decode + WER scoring on the training data
    encoder = QFormerTSEncoder(DIMS, TS)
    decoder = TSDecoder(DIMS.replace(n_vocab=300), startofprev_token=259)
    enc_vars = {
        "params": state.params["encoder"],
        "buffers": state.buffers["buffers"]["encoder"]
        if "buffers" in state.buffers
        else state.buffers["encoder"],
    }
    dec_vars = {"params": state.params["decoder"]}
    dcfg = DecodeConfig(
        max_new_tokens=8, eot=258, init_tokens=(257,), beam_size=2
    )
    out_dir = str(tmp_path / "decode")
    result = decode_dataset(
        encoder, enc_vars, decoder, dec_vars, dataset, tok, dcfg,
        batch_size=4, output_dir=out_dir,
    )
    assert len(result.hyps) == 12
    assert "wer" in result.metrics
    assert os.path.exists(os.path.join(out_dir, "text"))
    assert os.path.exists(os.path.join(out_dir, "score.txt"))
    assert result.rtf > 0


@pytest.mark.slow
def test_decode_dataset_data_parallel_matches_single(tmp_path):
    """decode_dataset over a 4-device mesh (cli --data_parallel path) emits
    the same hypotheses as the single-device pipeline — the shard_map serving
    path (decode/sharded.py) end-to-end through frontend+encoder+decoder."""
    from robustsq_whisper_tpu.parallel.mesh import make_mesh

    src = _make_clean_dir(tmp_path, n_speakers=4, utts_per_spk=2)
    data_dir = str(tmp_path / "mix_dp")
    simulate.generate_overlap_enrollment(
        src, data_dir, simulate.OverlapConfig(num_mixtures=6, seed=0)
    )
    tok = ByteTokenizer()
    speech_sec = (DIMS.n_audio_ctx * 2 * 160) / SR
    dataset = KaldiTSDataset(
        data_dir, tok,
        speech_seconds=speech_sec, enroll_seconds=speech_sec / 2,
        text_len=48, num_speakers=8, seed=0,
    )

    rng = jax.random.PRNGKey(0)
    encoder = QFormerTSEncoder(DIMS, TS)
    decoder = TSDecoder(DIMS.replace(n_vocab=300), startofprev_token=259)
    b = next(dataset.batches(4, shuffle=False))
    from robustsq_whisper_tpu.audio.frontend import log_mel_spectrogram

    feats, fl = log_mel_spectrogram(
        jnp.asarray(b["speech"]), jnp.asarray(b["speech_lens"])
    )
    efeats, el = log_mel_spectrogram(
        jnp.asarray(b["enroll"]), jnp.asarray(b["enroll_lens"])
    )
    enc_vars = encoder.init(rng, feats, fl, efeats, el)
    memory, _, prompt, _ = encoder.apply(enc_vars, feats, fl, efeats, el)
    dec_vars = decoder.init(
        rng, memory, jnp.zeros((4, 4), jnp.int32), prompt
    )
    dcfg = DecodeConfig(
        max_new_tokens=8, eot=258, init_tokens=(257,), beam_size=2
    )

    r1 = decode_dataset(
        encoder, enc_vars, decoder, dec_vars, dataset, tok, dcfg,
        batch_size=4,
    )
    # enc_chunk=2 exercises sub-batched encoding + the data-axis rounding
    rN = decode_dataset(
        encoder, enc_vars, decoder, dec_vars, dataset, tok, dcfg,
        batch_size=4, mesh=make_mesh(4, 1), enc_chunk=2,
    )
    assert r1.hyps == rN.hyps

    # tensor-parallel capacity mode (data=2, model=2): dense XLA path under
    # GSPMD with TP-sharded weights must emit the same hypotheses
    dec_dense = TSDecoder(
        DIMS.replace(n_vocab=300), startofprev_token=259,
        flat_self_cache=False,
    )
    rT = decode_dataset(
        encoder, enc_vars, dec_dense, dec_vars, dataset, tok, dcfg,
        batch_size=4, mesh=make_mesh(2, 2),
    )
    assert r1.hyps == rT.hyps


@pytest.mark.slow
def test_decode_dataset_distilled_draft_matches_greedy(tmp_path):
    """Distilled-draft serving end-to-end (cli --draft_path path): a draft
    head round-trips through save_draft/load_draft and decode_dataset with
    draft_vars emits EXACTLY the greedy hypotheses — for an arbitrary
    (here: re-initialized) draft, since drafting never changes content."""
    from robustsq_whisper_tpu.audio.frontend import log_mel_spectrogram
    from robustsq_whisper_tpu.train.distill import load_draft, save_draft

    src = _make_clean_dir(tmp_path, n_speakers=4, utts_per_spk=2)
    data_dir = str(tmp_path / "mix_draft")
    simulate.generate_overlap_enrollment(
        src, data_dir, simulate.OverlapConfig(num_mixtures=6, seed=0)
    )
    tok = ByteTokenizer()
    speech_sec = (DIMS.n_audio_ctx * 2 * 160) / SR
    dataset = KaldiTSDataset(
        data_dir, tok,
        speech_seconds=speech_sec, enroll_seconds=speech_sec / 2,
        text_len=48, num_speakers=8, seed=0,
    )
    rng = jax.random.PRNGKey(0)
    encoder = QFormerTSEncoder(DIMS, TS)
    decoder = TSDecoder(
        DIMS.replace(n_vocab=300), startofprev_token=259,
        flat_self_cache=False,
    )
    b = next(dataset.batches(4, shuffle=False))
    feats, fl = log_mel_spectrogram(
        jnp.asarray(b["speech"]), jnp.asarray(b["speech_lens"])
    )
    efeats, el = log_mel_spectrogram(
        jnp.asarray(b["enroll"]), jnp.asarray(b["enroll_lens"])
    )
    enc_vars = encoder.init(rng, feats, fl, efeats, el)
    memory, _, prompt, _ = encoder.apply(enc_vars, feats, fl, efeats, el)
    dec_vars = decoder.init(
        rng, memory, jnp.zeros((4, 4), jnp.int32), prompt
    )
    # a DIFFERENT-init draft (not the teacher's slice): exercises the
    # separate-draft cross/prefill/cache machinery, and exactness must hold
    draft = TSDecoder(
        DIMS.replace(n_vocab=300, n_text_layer=1), startofprev_token=259,
        flat_self_cache=False,
    )
    draft_raw = draft.init(
        jax.random.PRNGKey(7), memory, jnp.zeros((4, 4), jnp.int32), prompt
    )
    out = save_draft(
        str(tmp_path / "draft_ckpt"), draft_raw,
        {"draft_layers": 1, "teacher_step": 0},
    )
    loaded, meta = load_draft(out)
    assert meta["draft_layers"] == 1
    for a, c in zip(
        jax.tree_util.tree_leaves(draft_raw),
        jax.tree_util.tree_leaves(loaded),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))

    greedy_cfg = DecodeConfig(
        max_new_tokens=8, eot=258, init_tokens=(257,), beam_size=1
    )
    spec_cfg = dataclasses.replace(
        greedy_cfg, speculative_gamma=2, draft_layers=1
    )
    r_greedy = decode_dataset(
        encoder, enc_vars, decoder, dec_vars, dataset, tok, greedy_cfg,
        batch_size=4,
    )
    r_draft = decode_dataset(
        encoder, enc_vars, decoder, dec_vars, dataset, tok, spec_cfg,
        batch_size=4, draft_vars=loaded,
    )
    assert r_greedy.hyps == r_draft.hyps
    assert "spec_acceptance_rate" in r_draft.metrics

    # guard: draft_vars demands the single-device speculative path
    from robustsq_whisper_tpu.decode.pipeline import build_decode_fns

    with pytest.raises(ValueError, match="single-device speculative"):
        build_decode_fns(
            encoder, enc_vars, decoder, dec_vars, greedy_cfg,
            draft_vars=loaded,
        )


@pytest.mark.slow
def test_decode_dataset_long_audio(tmp_path):
    """--long_audio dataset pass: full-length utterances decoded as batched
    windows with one shared speaker prompt per utterance; outputs written
    like the fixed-window pipeline (decode/long_audio.py)."""
    from robustsq_whisper_tpu.decode.long_audio import decode_dataset_long

    src = _make_clean_dir(tmp_path, n_speakers=2, utts_per_spk=2)
    data_dir = str(tmp_path / "mix_long")
    simulate.generate_overlap_enrollment(
        src, data_dir, simulate.OverlapConfig(num_mixtures=3, seed=0)
    )
    tok = ByteTokenizer()
    speech_sec = (DIMS.n_audio_ctx * 2 * 160) / SR
    dataset = KaldiTSDataset(
        data_dir, tok,
        speech_seconds=speech_sec, enroll_seconds=speech_sec / 2,
        text_len=48, num_speakers=8, seed=0,
    )
    rng = jax.random.PRNGKey(0)
    encoder = QFormerTSEncoder(DIMS, TS)
    decoder = TSDecoder(DIMS.replace(n_vocab=300), startofprev_token=259)
    from robustsq_whisper_tpu.audio.frontend import log_mel_spectrogram

    b = next(dataset.batches(2, shuffle=False))
    feats, fl = log_mel_spectrogram(
        jnp.asarray(b["speech"]), jnp.asarray(b["speech_lens"])
    )
    efeats, el = log_mel_spectrogram(
        jnp.asarray(b["enroll"]), jnp.asarray(b["enroll_lens"])
    )
    enc_vars = encoder.init(rng, feats, fl, efeats, el)
    memory, _, prompt, _ = encoder.apply(enc_vars, feats, fl, efeats, el)
    dec_vars = decoder.init(rng, memory, jnp.zeros((2, 4), jnp.int32), prompt)

    out_dir = str(tmp_path / "decoded_long")
    result = decode_dataset_long(
        encoder, enc_vars, decoder, dec_vars, dataset, tok,
        DecodeConfig(max_new_tokens=6, eot=258, init_tokens=(257,)),
        chunk_seconds=speech_sec, output_dir=out_dir,
    )
    assert len(result.hyps) == len(dataset.utt_ids)
    assert os.path.exists(os.path.join(out_dir, "text"))
    assert result.audio_seconds > 0 and result.rtf > 0
