"""The actual CLI entry points (cli.train / cli.decode / cli.datapre mains)
driven end-to-end on synthetic data with the dev smoke config — the stage
11/12 surface of run_tswhisper.sh."""

import json
import os

import numpy as np
import pytest

from robustsq_whisper_tpu.data import kaldi_io

from tests.test_pipeline import _make_clean_dir


def test_cli_synth_clean_feeds_overlap(tmp_path, capsys):
    """synth-clean (the hermetic recipe input, examples/recipe_e2e.sh
    stage 0) produces a valid clean dir the overlap simulator consumes;
    transcripts flow through to the per-target mixture rows."""
    from robustsq_whisper_tpu.cli import datapre

    clean = str(tmp_path / "clean")
    rc = datapre.main([
        "synth-clean", "--out_dir", clean, "--n_speakers", "3",
        "--utts_per_spk", "2", "--seconds", "1",
    ])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats == {"num_utts": 6, "num_speakers": 3}
    text = kaldi_io.read_scp(os.path.join(clean, "text"))
    assert len(set(text.values())) == 6  # distinct word transcripts
    a, sr = kaldi_io.read_wav(
        kaldi_io.read_scp(os.path.join(clean, "wav.scp"))["100-0-0000"]
    )
    assert sr == 16000 and len(a) == 16000

    mix = str(tmp_path / "mix")
    rc = datapre.main([
        "overlap", "--src_dir", clean, "--out_dir", mix,
        "--num_mixtures", "4", "--seed", "0",
    ])
    assert rc == 0
    assert kaldi_io.validate_data_dir(mix) == []
    mtext = kaldi_io.read_scp(os.path.join(mix, "text"))
    assert len(mtext) == 8 and all(t.strip() for t in mtext.values())


@pytest.mark.slow
def test_cli_train_then_decode(tmp_path, capsys):
    from robustsq_whisper_tpu.cli import datapre, decode, train

    src = _make_clean_dir(tmp_path)
    data_dir = str(tmp_path / "dump" / "train")
    rc = datapre.main([
        "overlap", "--src_dir", src, "--out_dir", data_dir,
        "--num_mixtures", "4", "--seed", "0",
    ])
    assert rc == 0
    rc = datapre.main(["validate", data_dir])
    assert rc == 0

    # the dev dims use 0.64 s windows; patch wav lengths accordingly is not
    # needed — dataset pads/crops to the config's window.
    expdir = str(tmp_path / "exp")
    rc = train.main([
        "--config", "conf/tswhisper/train_tsasr_whisper_dev_smoke.yaml",
        "--train_dir", data_dir,
        "--expdir", expdir,
    ])
    assert rc == 0
    assert os.path.isdir(os.path.join(expdir, "checkpoints"))

    out_dir = str(tmp_path / "decoded")
    rc = decode.main([
        "--config", "conf/tswhisper/train_tsasr_whisper_dev_smoke.yaml",
        "--inference_config", "conf/tswhisper/decode_asr_whisper_beam1.yaml",
        "--data_dir", data_dir,
        "--expdir", expdir,
        "--output_dir", out_dir,
        "--batch_size", "4",
        # min_new_tokens: the ESPnet minlenratio analog — also forces the
        # smoke checkpoint (whose greedy argmax is eot at the prefill step)
        # to actually generate, so the speculative run below exercises
        # draft/verify chunks
        "--min_new_tokens", "3",
        # checked-in mini tiktoken ranks: the REAL BPE code path (tiktoken
        # Encoding + base64 ranks file), not the byte fallback
        "--tokenizer_assets", "tests/assets/mini_ranks.tiktoken",
    ])
    assert rc == 0
    hyps = kaldi_io.read_scp(os.path.join(out_dir, "text"))
    assert len(hyps) == 8
    assert os.path.exists(os.path.join(out_dir, "score.txt"))

    # speculative decode through the same CLI surface must reproduce the
    # plain greedy transcripts exactly (decode/speculative.py contract)
    spec_dir = str(tmp_path / "decoded_spec")
    rc = decode.main([
        "--config", "conf/tswhisper/train_tsasr_whisper_dev_smoke.yaml",
        "--inference_config", "conf/tswhisper/decode_asr_whisper_beam1.yaml",
        "--data_dir", data_dir,
        "--expdir", expdir,
        "--output_dir", spec_dir,
        "--batch_size", "4",
        "--speculative_gamma", "2",
        "--draft_layers", "1",
        "--min_new_tokens", "3",
        "--tokenizer_assets", "tests/assets/mini_ranks.tiktoken",
    ])
    assert rc == 0
    assert kaldi_io.read_scp(os.path.join(spec_dir, "text")) == hyps
    # single-device speculative decode reports draft acceptance in score.txt
    scores = dict(
        line.split(maxsplit=1)
        for line in open(os.path.join(spec_dir, "score.txt"))
    )
    assert 0.0 <= float(scores["spec_acceptance_rate"]) <= 1.0
    assert float(scores["spec_chunks"]) >= 1
    assert float(scores["spec_tokens_per_chunk"]) > 0


def test_load_tokenizer_mini_ranks_asset():
    """The checked-in mini ranks file exercises the tiktoken BPE path:
    merges fire, round-trips hold, specials are the Whisper layout."""
    from robustsq_whisper_tpu.tokenizer.whisper_tokenizer import (
        BPETokenizer,
        load_tokenizer,
    )

    tok = load_tokenizer("tests/assets/mini_ranks.tiktoken")
    assert isinstance(tok, BPETokenizer)
    s = "the cat is on the mat and then some"
    ids = tok.encode(s)
    assert tok.decode(ids) == s
    assert len(ids) < len(s.encode())  # multi-byte merges actually fire
    assert tok.special.eot == 50257 and tok.special.startofprev == 50361
    # specials pass through decode unharmed
    assert tok.decode(ids + [tok.special.eot]) == s
