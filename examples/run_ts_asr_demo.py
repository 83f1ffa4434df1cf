"""End-to-end TS-ASR demo on synthetic audio — the runnable-example
equivalent of the reference's datapre/run_*_example.py scripts.

Generates a tiny synthetic "LibriSpeech" (sine-coded speakers), simulates
SIR-mixed overlap + enrollment data, trains a dev-scale TS model for a few
steps, and decodes with the KV-cache beam search. Runs on CPU in ~2 minutes:

    python examples/run_ts_asr_demo.py [--workdir /tmp/ts_demo]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", default=None)
    parser.add_argument("--num_mixtures", type=int, default=8)
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument(
        "--platform", default="cpu",
        help="jax platform; the dev-scale demo is fastest on cpu",
    )
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    workdir = args.workdir or tempfile.mkdtemp(prefix="ts_demo_")

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
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

    sr = 16000
    # 1. synthetic clean corpus
    clean = os.path.join(workdir, "clean")
    os.makedirs(os.path.join(clean, "wavs"), exist_ok=True)
    rng = np.random.default_rng(0)
    wav, u2s, text = {}, {}, {}
    for s in range(4):
        spk = f"{100+s}"
        for u in range(2):
            utt = f"{spk}-0-{u:04d}"
            t = np.arange(sr) / sr
            audio = 0.3 * np.sin(2 * np.pi * (200 + 120 * s) * t)
            audio = (audio + 0.02 * rng.standard_normal(sr)).astype(np.float32)
            p = os.path.join(clean, "wavs", f"{utt}.wav")
            kaldi_io.write_wav(p, audio, sr)
            wav[utt], u2s[utt] = p, spk
            text[utt] = f"speaker {spk} utterance {u}"
    kaldi_io.write_scp(os.path.join(clean, "wav.scp"), wav)
    kaldi_io.write_scp(os.path.join(clean, "utt2spk"), u2s)
    kaldi_io.write_scp(os.path.join(clean, "text"), text)
    kaldi_io.write_spk2utt(
        os.path.join(clean, "spk2utt"), kaldi_io.utt2spk_to_spk2utt(u2s)
    )

    # 2. simulate overlapped + enrollment data (SIR in [-5, 5] dB)
    data_dir = os.path.join(workdir, "mix")
    stats = simulate.generate_overlap_enrollment(
        clean, data_dir,
        simulate.OverlapConfig(num_mixtures=args.num_mixtures, seed=0),
    )
    logging.info("simulated: %s -> %s", stats, data_dir)
    assert kaldi_io.validate_data_dir(data_dir) == []

    # 3. dev-scale TS model + short training run
    dims = WhisperDims(
        n_mels=80, n_vocab=300, n_audio_ctx=32, n_audio_state=32,
        n_audio_head=2, n_audio_layer=1, n_text_ctx=64, n_text_state=32,
        n_text_head=2, n_text_layer=1,
    )
    ts = TSEncoderConfig(
        num_query_tokens=2, num_hidden_layers=1, qformer_hidden_size=32,
        qformer_heads=2, qformer_intermediate_size=64,
    )
    cfg = TSModelConfig(
        vocab_size=300, sos=257, eos=258, startofprev=259,
        num_speakers=8, num_negatives=2,
    )
    tok = ByteTokenizer()
    window_sec = dims.n_audio_ctx * 2 * 160 / sr
    dataset = KaldiTSDataset(
        data_dir, tok, speech_seconds=window_sec,
        enroll_seconds=window_sec / 2, text_len=48, num_speakers=8,
    )
    model = TSASRModel(dims, ts, cfg)
    rng_j = jax.random.PRNGKey(0)
    first = next(dataset.batches(4, shuffle=False))
    first.pop("utt_ids")
    variables = model.init(rng_j, first, rng_j, 0, train=False)
    state = run_training(
        model, dataset, variables,
        TrainConfig(optim=OptimConfig(lr=1e-3, schedule="constant")),
        LoopConfig(num_epochs=args.epochs, batch_size=4, log_every=1,
                   ckpt_dir=os.path.join(workdir, "ckpt")),
        rng=rng_j,
    )
    logging.info("trained %d steps", int(state.step))

    # 4. decode + WER
    encoder = QFormerTSEncoder(dims, ts)
    decoder = TSDecoder(dims.replace(n_vocab=300), startofprev_token=259)
    enc_vars = {
        "params": state.params["encoder"],
        "buffers": state.buffers["buffers"]["encoder"],
    }
    dec_vars = {"params": state.params["decoder"]}
    result = decode_dataset(
        encoder, enc_vars, decoder, dec_vars, dataset, tok,
        DecodeConfig(max_new_tokens=16, eot=258, init_tokens=(257,),
                     beam_size=2),
        batch_size=4, output_dir=os.path.join(workdir, "decode"),
    )
    logging.info(
        "decoded %d utts, RTF %.1fx, metrics: %s",
        len(result.hyps), result.rtf,
        {k: round(v, 3) for k, v in result.metrics.items()},
    )
    logging.info("artifacts in %s", workdir)


if __name__ == "__main__":
    main()
