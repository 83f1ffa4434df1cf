"""Long-audio TS decoding by batched 30 s windows.

The reference hard-caps inputs at Whisper's 30 s positional budget and
TRUNCATES anything longer (whisper_encoder.py:141-146, 453-455; recipe-level
``--max_wav_duration 30`` at run_tswhisper.sh:53) — a >30 s utterance simply
loses its tail. SURVEY.md §2.4 notes the TPU-natural answer is chunked,
batched 30 s windows rather than sequence parallelism: static shapes, one
compiled graph, the window axis rides the batch dimension.

This module implements that: split the waveform into fixed windows (optional
overlap), run ALL windows through the encoder as one batch with the SAME
enrollment audio (the speaker prompt is a property of the target speaker,
not of the window), greedy/beam decode them together, and splice the
per-window token streams in order.
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..audio.frontend import SAMPLE_RATE, log_mel_spectrogram
from .search import DecodeConfig, build_beam_decoder, strip_eot


def chunk_waveform(
    wav: np.ndarray,  # (samples,) float32
    chunk_seconds: float = 30.0,
    overlap_seconds: float = 0.0,
    sample_rate: int = SAMPLE_RATE,
) -> Tuple[np.ndarray, np.ndarray]:
    """Split one waveform into fixed-size windows.

    Returns (windows (n, chunk_samples) zero-padded, lens (n,) true sample
    counts). ``overlap_seconds`` slides windows by chunk-overlap so chunk
    boundaries don't cut words; the caller deduplicates text downstream if
    it uses overlap (token-level splicing keeps overlap 0 by default).
    """
    chunk = int(round(chunk_seconds * sample_rate))
    stride = chunk - int(round(overlap_seconds * sample_rate))
    assert 0 < stride <= chunk, (chunk, stride)
    n = max(1, -(-max(len(wav) - chunk + stride, 1) // stride))
    windows = np.zeros((n, chunk), np.float32)
    lens = np.zeros((n,), np.int32)
    for i in range(n):
        start = i * stride
        piece = wav[start : start + chunk]
        windows[i, : len(piece)] = piece
        lens[i] = len(piece)
    return windows, lens


def decode_long_audio(
    encoder: Any,  # QFormerTSEncoder
    enc_vars: Any,
    decoder: Any,  # TSDecoder
    dec_vars: Any,
    wav: np.ndarray,  # (samples,) target-speaker mixture, any length
    enroll: np.ndarray,  # (samples,) enrollment audio of the target speaker
    dcfg: DecodeConfig = DecodeConfig(),
    chunk_seconds: float = 30.0,
    run: Optional[Callable] = None,
) -> List[int]:
    """Transcribe arbitrarily long audio: 30 s windows batched through one
    compiled encode+decode, per-window token streams spliced in order.

    The enrollment MEL features are computed once and broadcast across the
    window batch (the encoder's enrollment stem then runs batched over the
    identical rows — its output is the same speaker prompt per window).

    ``run``: a prebuilt decoder fn from ``build_beam_decoder(decoder,
    dec_vars, dcfg)``. Pass it when decoding many utterances — the builder
    jit-compiles (and quantizes the step weights) per call, so rebuilding
    per utterance pays a retrace each time; built here only as a
    convenience default.
    """
    windows, lens = chunk_waveform(wav, chunk_seconds=chunk_seconds)
    n = windows.shape[0]
    feats, feats_lens = log_mel_spectrogram(
        jnp.asarray(windows), jnp.asarray(lens), n_mels=encoder.dims.n_mels
    )
    e1, _ = log_mel_spectrogram(
        jnp.asarray(np.asarray(enroll, np.float32))[None],
        n_mels=encoder.dims.n_mels,
    )
    efeats = jnp.broadcast_to(e1, (n,) + e1.shape[1:])
    efeats_lens = jnp.full((n,), e1.shape[-1], jnp.int32)
    memory, _, spk_prompt, _ = encoder.apply(
        enc_vars, feats, feats_lens, efeats, efeats_lens
    )
    if run is None:
        run = build_beam_decoder(decoder, dec_vars, dcfg)
    tokens, _ = run(memory, spk_prompt)
    out: List[int] = []
    for row in strip_eot(np.asarray(tokens), dcfg.eot):
        out.extend(row)
    return out


def decode_dataset_long(
    encoder: Any,
    enc_vars: Any,
    decoder: Any,
    dec_vars: Any,
    dataset: Any,  # KaldiTSDataset
    tokenizer: Any,
    dcfg: DecodeConfig = DecodeConfig(),
    chunk_seconds: float = 30.0,
    output_dir: Optional[str] = None,
    pad_windows_to: int = 4,
):
    """Long-audio decode over a whole Kaldi data dir: every utterance is
    read at FULL length (the fixed-window dataset path crops to 30 s like
    the reference), windowed, and decoded as one batch per utterance.

    Encoder and decoder are jit-compiled once; the window-batch size is
    padded up to a multiple of ``pad_windows_to`` so utterances of similar
    length share a compiled shape instead of retracing per window count.
    Returns a ``DecodeResult`` like ``decode_dataset``.
    """
    import os as _os
    import time as _time

    import jax

    from ..data import kaldi_io
    from .pipeline import DecodeResult
    from .scorer import cer, wer

    encode = jax.jit(
        lambda v, f, fl, ef, el: encoder.apply(v, f, fl, ef, el)
    )
    run = build_beam_decoder(decoder, dec_vars, dcfg)
    hyps, refs = {}, {}
    audio_sec = 0.0
    t0 = _time.time()
    chunk = int(round(chunk_seconds * SAMPLE_RATE))
    for utt in dataset.utt_ids:
        wav = dataset._load_audio(dataset.wav[utt])
        # the no-enroll fallback returns the full mixture; cap it like the
        # fixed-window dataset path does
        enroll = dataset._enroll_audio(utt)[: dataset.enroll_samples]
        windows, lens = chunk_waveform(wav, chunk_seconds=chunk_seconds)
        n = windows.shape[0]
        n_pad = -(-n // pad_windows_to) * pad_windows_to
        if n_pad != n:  # padded windows decode silence; dropped below
            windows = np.concatenate(
                [windows, np.zeros((n_pad - n, chunk), np.float32)]
            )
            lens = np.concatenate(
                [lens, np.full((n_pad - n,), chunk, np.int32)]
            )
        feats, feats_lens = log_mel_spectrogram(
            jnp.asarray(windows), jnp.asarray(lens),
            n_mels=encoder.dims.n_mels,
        )
        e1, _ = log_mel_spectrogram(
            jnp.asarray(np.asarray(enroll, np.float32))[None],
            n_mels=encoder.dims.n_mels,
        )
        efeats = jnp.broadcast_to(e1, (n_pad,) + e1.shape[1:])
        efeats_lens = jnp.full((n_pad,), e1.shape[-1], jnp.int32)
        memory, _, spk_prompt, _ = encode(
            enc_vars, feats, feats_lens, efeats, efeats_lens
        )
        tokens, _ = run(memory, spk_prompt)
        ids: List[int] = []
        for row in strip_eot(np.asarray(tokens)[:n], dcfg.eot):
            ids.extend(row)
        hyps[utt] = tokenizer.decode(ids).strip()
        refs[utt] = dataset.text.get(utt, "")
        audio_sec += len(wav) / SAMPLE_RATE
    wall = _time.time() - t0

    pairs = [(refs[u], hyps[u]) for u in hyps if refs.get(u)]
    metrics = {}
    if pairs:
        r, h = zip(*pairs)
        metrics.update(wer(list(r), list(h)))
        metrics.update(cer(list(r), list(h)))
    metrics["rtf"] = audio_sec / max(wall, 1e-9)
    if output_dir:
        _os.makedirs(output_dir, exist_ok=True)
        kaldi_io.write_scp(_os.path.join(output_dir, "text"), hyps)
        with open(_os.path.join(output_dir, "score.txt"), "w") as f:
            for k, v in sorted(metrics.items()):
                f.write(f"{k} {v}\n")
    return DecodeResult(hyps, refs, metrics, audio_sec, wall)
