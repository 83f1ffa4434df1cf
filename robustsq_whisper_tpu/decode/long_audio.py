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

from ..audio.frontend import (
    SAMPLE_RATE,
    log_mel_spectrogram_jit,
    pcm16_to_float,
    to_pcm16,
)
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
    feats, feats_lens = log_mel_spectrogram_jit(
        pcm16_to_float(jnp.asarray(to_pcm16(windows))),
        jnp.asarray(lens), n_mels=encoder.dims.n_mels,
    )
    e1, _ = log_mel_spectrogram_jit(
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
    window_batch: int = 16,
    pad_windows_to: int = 4,
):
    """Long-audio decode over a whole Kaldi data dir: every utterance is
    read at FULL length (the fixed-window dataset path crops to 30 s like
    the reference), windowed, and decoded in window batches of at most
    ``window_batch`` rows — which bounds the encoder-activation and
    decode-session HBM peaks for arbitrarily long inputs.

    Encoder and decoder are jit-compiled once: enrollment features are
    padded to the dataset's fixed ``enroll_samples`` (true length rides as
    the mask) and window counts pad up to a multiple of ``pad_windows_to``,
    so utterances share compiled shapes instead of retracing.
    Returns a ``DecodeResult`` like ``decode_dataset``.
    """
    import time as _time

    import jax

    from .pipeline import score_and_write

    max_chunk_s = encoder.dims.n_audio_ctx * 2 * 160 / SAMPLE_RATE
    if chunk_seconds > max_chunk_s + 1e-9:
        raise ValueError(
            f"chunk_seconds {chunk_seconds} exceeds the model's positional "
            f"budget ({max_chunk_s:.2f} s = n_audio_ctx * 2 frames)"
        )
    encode = jax.jit(
        lambda v, f, fl, ef, el: encoder.apply(v, f, fl, ef, el)
    )
    run = build_beam_decoder(decoder, dec_vars, dcfg)
    hyps, refs = {}, {}
    audio_sec = 0.0
    t0 = _time.time()
    chunk = int(round(chunk_seconds * SAMPLE_RATE))
    window_batch = max(pad_windows_to, window_batch)
    for utt in dataset.utt_ids:
        # wav.scp rows may carry trailing fields; path is the first token
        wav = dataset._load_audio(dataset.wav[utt].split()[0])
        # pad/crop enrollment to the dataset's fixed window so every
        # utterance shares ONE compiled encode shape (true length masks)
        enroll = np.asarray(
            dataset._enroll_audio(utt), np.float32
        )[: dataset.enroll_samples]
        e_len = len(enroll)
        if e_len < dataset.enroll_samples:
            enroll = np.pad(enroll, (0, dataset.enroll_samples - e_len))
        e1, e1_lens = log_mel_spectrogram_jit(
            jnp.asarray(enroll)[None],
            jnp.asarray([e_len], jnp.int32),
            n_mels=encoder.dims.n_mels,
        )
        windows, lens = chunk_waveform(wav, chunk_seconds=chunk_seconds)
        ids: List[int] = []
        for s in range(0, windows.shape[0], window_batch):
            w = windows[s : s + window_batch]
            wl = lens[s : s + window_batch]
            n = w.shape[0]
            n_pad = -(-n // pad_windows_to) * pad_windows_to
            if n_pad != n:  # padded windows decode silence; dropped below
                w = np.concatenate(
                    [w, np.zeros((n_pad - n, chunk), np.float32)]
                )
                wl = np.concatenate(
                    [wl, np.full((n_pad - n,), chunk, np.int32)]
                )
            feats, feats_lens = log_mel_spectrogram_jit(
                pcm16_to_float(jnp.asarray(to_pcm16(w))),
                jnp.asarray(wl),
                n_mels=encoder.dims.n_mels,
            )
            efeats = jnp.broadcast_to(e1, (n_pad,) + e1.shape[1:])
            efeats_lens = jnp.broadcast_to(e1_lens, (n_pad,))
            memory, _, spk_prompt, _ = encode(
                enc_vars, feats, feats_lens, efeats, efeats_lens
            )
            tokens, _ = run(memory, spk_prompt)
            for row in strip_eot(np.asarray(tokens)[:n], dcfg.eot):
                ids.extend(row)
        hyps[utt] = tokenizer.decode(ids).strip()
        refs[utt] = dataset.text.get(utt, "")
        audio_sec += len(wav) / SAMPLE_RATE
    wall = _time.time() - t0
    return score_and_write(hyps, refs, audio_sec, wall, output_dir)
