"""Kaldi-style log-mel fbank in pure JAX — the torchaudio.compliance.kaldi
path the reference's speaker-embedding extractor uses
(/root/reference/datapre/extract_reset_embedding_onnx.py:64-88):
16 kHz, 25 ms/10 ms frames, hamming window, no dither, waveform scaled by
2^15, 80 mels, natural-log energies, snip-edges framing, then CMN (mean over
time, no variance norm).

Kaldi conventions implemented: DC-offset removal per frame, pre-emphasis
0.97 (reflected first sample), Kaldi mel scale (1127*ln(1+f/700)) with
low=20 Hz, high=Nyquist, energy floor via log(max(x, eps)).

Like the Whisper frontend, the windowed DFT is one dense matmul per frame so
the whole pipeline lands on the MXU under jit.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
FRAME_LENGTH = 400  # 25 ms
FRAME_SHIFT = 160  # 10 ms
EPS = 1.1920928955078125e-07  # torch float32 eps, kaldi's energy floor


def _hamming(n: int) -> np.ndarray:
    k = np.arange(n, dtype=np.float64)
    return 0.54 - 0.46 * np.cos(2.0 * np.pi * k / (n - 1))


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


@functools.lru_cache(maxsize=2)
def _dft_bank(frame_len: int = FRAME_LENGTH) -> np.ndarray:
    """(2*(nfft//2+1), frame_len) cos/sin banks, zero-padded to nfft."""
    nfft = _next_pow2(frame_len)
    n_bins = nfft // 2 + 1
    k = np.arange(n_bins, dtype=np.float64)[:, None]
    t = np.arange(frame_len, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * t / nfft
    return np.concatenate([np.cos(ang), -np.sin(ang)], axis=0).astype(
        np.float32
    )


def _mel(f: np.ndarray) -> np.ndarray:
    return 1127.0 * np.log(1.0 + f / 700.0)


@functools.lru_cache(maxsize=2)
def kaldi_mel_banks(
    num_bins: int = 80,
    frame_len: int = FRAME_LENGTH,
    sample_rate: int = SAMPLE_RATE,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> np.ndarray:
    """Kaldi triangular mel filters, shape (num_bins, nfft//2+1)."""
    nfft = _next_pow2(frame_len)
    n_bins = nfft // 2 + 1
    nyquist = sample_rate / 2.0
    high = nyquist + high_freq if high_freq <= 0 else high_freq
    mel_low, mel_high = _mel(np.asarray(low_freq)), _mel(np.asarray(high))
    mel_points = np.linspace(mel_low, mel_high, num_bins + 2)
    fft_freqs = np.arange(n_bins) * sample_rate / nfft
    fft_mels = _mel(fft_freqs)
    banks = np.zeros((num_bins, n_bins), dtype=np.float32)
    for i in range(num_bins):
        left, center, right = mel_points[i], mel_points[i + 1], mel_points[i + 2]
        up = (fft_mels - left) / (center - left)
        down = (right - fft_mels) / (right - center)
        banks[i] = np.maximum(0.0, np.minimum(up, down))
    return banks


def kaldi_fbank(
    audio: jax.Array,  # (batch, samples) float32 in [-1, 1]
    lengths: Optional[jax.Array] = None,
    num_mel_bins: int = 80,
    apply_cmn: bool = True,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Batched Kaldi fbank + CMN. Returns ((batch, frames, num_mel_bins),
    frame_lengths). snip-edges: frames = 1 + (samples - 400) // 160."""
    audio = audio.astype(jnp.float32) * 32768.0  # 1 << 15 (reference :75)
    b, n = audio.shape
    num_frames = 1 + (n - FRAME_LENGTH) // FRAME_SHIFT

    idx = (
        jnp.arange(num_frames)[:, None] * FRAME_SHIFT
        + jnp.arange(FRAME_LENGTH)[None, :]
    )
    frames = audio[:, idx]  # (b, frames, 400)

    # kaldi per-frame processing: DC removal, pre-emphasis, window
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
    frames = frames - 0.97 * prev
    frames = frames * jnp.asarray(_hamming(FRAME_LENGTH), jnp.float32)

    bank = jnp.asarray(_dft_bank(FRAME_LENGTH))
    n_bins = bank.shape[0] // 2
    proj = jnp.einsum("bfs,cs->bfc", frames, bank)
    power = proj[..., :n_bins] ** 2 + proj[..., n_bins:] ** 2

    mel = jnp.einsum(
        "bfc,mc->bfm", power, jnp.asarray(kaldi_mel_banks(num_mel_bins))
    )
    feats = jnp.log(jnp.maximum(mel, EPS))

    frame_lens = None
    if lengths is not None:
        frame_lens = jnp.maximum(
            1 + (lengths - FRAME_LENGTH) // FRAME_SHIFT, 0
        )
    if apply_cmn:
        if frame_lens is not None:
            mask = (
                jnp.arange(num_frames)[None, :] < frame_lens[:, None]
            )[..., None]
            mean = jnp.sum(jnp.where(mask, feats, 0.0), axis=1, keepdims=True)
            mean = mean / jnp.maximum(frame_lens[:, None, None], 1)
            feats = jnp.where(mask, feats - mean, 0.0)
        else:
            feats = feats - jnp.mean(feats, axis=1, keepdims=True)
    return feats, frame_lens
