"""Golden-numerics tests for the log-mel frontend.

Oracles:
- ``torch.stft`` (torch CPU) reproducing the exact reference computation at
  /root/reference/model/whisper_encoder.py:99-129.
- ``transformers.audio_utils.mel_filter_bank`` for the slaney filterbank
  (identical to the librosa filters Whisper ships).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from robustsq_whisper_tpu.audio.mel import mel_filter_bank
from robustsq_whisper_tpu.audio.frontend import (
    HOP_LENGTH,
    N_SAMPLES,
    log_mel_spectrogram,
    pad_or_trim,
    stft_power,
)


def _torch_log_mel(audio_np: np.ndarray):
    """Independent torch implementation of the reference frontend formula."""
    import torch

    audio = torch.from_numpy(audio_np)
    window = torch.hann_window(400)
    stft = torch.stft(audio, 400, 160, window=window, return_complex=True)
    magnitudes = stft[..., :-1].abs() ** 2
    filters = torch.from_numpy(mel_filter_bank())
    mel_spec = filters @ magnitudes
    log_spec = torch.clamp(mel_spec, min=1e-10).log10()
    log_spec = torch.maximum(
        log_spec,
        log_spec.view(audio.size(0), -1).max(dim=-1)[0][:, None, None] - 8.0,
    )
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec.numpy()


def test_mel_filter_bank_matches_transformers():
    from transformers.audio_utils import mel_filter_bank as hf_mel

    ours = mel_filter_bank(n_freqs=201, n_mels=80)
    theirs = hf_mel(
        num_frequency_bins=201,
        num_mel_filters=80,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=16000,
        norm="slaney",
        mel_scale="slaney",
    ).T.astype(np.float32)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-7)


def test_stft_power_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    ours = np.asarray(stft_power(jnp.asarray(audio)))

    window = torch.hann_window(400)
    ref = torch.stft(
        torch.from_numpy(audio), 400, 160, window=window, return_complex=True
    )
    ref_power = (ref.abs() ** 2).numpy()
    assert ours.shape == ref_power.shape
    np.testing.assert_allclose(ours, ref_power, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("samples", [16000, 48000])
def test_log_mel_matches_torch_reference(samples):
    rng = np.random.default_rng(1)
    audio = rng.standard_normal((3, samples)).astype(np.float32) * 0.1
    ref = _torch_log_mel(audio)
    ours, olens = log_mel_spectrogram(
        jnp.asarray(audio), ilens=jnp.array([samples] * 3)
    )
    ours = np.asarray(ours)
    assert ours.shape == ref.shape == (3, 80, samples // HOP_LENGTH)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-4)
    assert np.all(np.asarray(olens) == samples // HOP_LENGTH)


def test_pad_or_trim():
    x = jnp.ones((2, 1000))
    assert pad_or_trim(x).shape == (2, N_SAMPLES)
    y = jnp.ones((2, N_SAMPLES + 5))
    assert pad_or_trim(y).shape == (2, N_SAMPLES)
    z = np.asarray(pad_or_trim(jnp.ones((1, 10)), length=20))
    assert z[0, :10].sum() == 10 and z[0, 10:].sum() == 0
