"""Audio augmentation: SIR overlap mixing, WHAM!-style SNR noise, cropping.

Numerically matches the reference's offline simulators —
``mix_audio_with_sir`` (/root/reference/datapre/create_overlap_enrollment.py:
103-132), ``add_noise_with_snr`` / ``add_noise_with_lufs`` / peak clip
(/root/reference/datapre/add_wham_noise.py:98-171) — but implemented as pure
jnp so the same code serves two modes:

- **on-device path** (TPU-first, jit-compiled inside the input pipeline):
  batched mixing with per-example SIR/SNR drawn from ``jax.random``, length
  masks instead of truncation (static shapes);
- **offline CLI parity** (cli/create_overlap_enrollment.py etc.): the same
  functions on host numpy via jax's CPU backend, writing Kaldi dirs.

All power statistics honor valid lengths so zero-padding never biases
SIR/SNR (the reference operates on exact-length arrays; padded batches must
mask).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _masked_power(x: jax.Array, lens: Optional[jax.Array]) -> jax.Array:
    """Mean power over valid samples. x: (..., n); lens: (...,) or None."""
    if lens is None:
        return jnp.mean(x * x, axis=-1)
    n = x.shape[-1]
    mask = jnp.arange(n)[None, :] < lens[:, None]
    return jnp.sum(jnp.where(mask, x * x, 0.0), axis=-1) / jnp.maximum(
        lens, 1
    ).astype(x.dtype)


def mix_with_sir(
    target: jax.Array,  # (b, n)
    interferer: jax.Array,  # (b, n)
    sir_db: jax.Array,  # (b,) or scalar
    target_lens: Optional[jax.Array] = None,
    interferer_lens: Optional[jax.Array] = None,
) -> jax.Array:
    """Scale interferer so P_target / P_interferer == 10^(SIR/10), then add
    (reference mix_audio_with_sir). Zero-power interferer passes target
    through unchanged."""
    p1 = _masked_power(target, target_lens)  # (b,)
    p2 = _masked_power(interferer, interferer_lens)
    sir_linear = 10.0 ** (jnp.asarray(sir_db, jnp.float32) / 10.0)
    target_p2 = p1 / sir_linear
    scale = jnp.sqrt(target_p2 / jnp.maximum(p2, 1e-20))
    scale = jnp.where(p2 > 0, scale, 0.0)
    return target + interferer * scale[:, None]


def add_noise_with_snr(
    speech: jax.Array,  # (b, n)
    noise: jax.Array,  # (b, n)
    snr_db: jax.Array,  # (b,) or scalar
    speech_lens: Optional[jax.Array] = None,
    noise_lens: Optional[jax.Array] = None,
) -> jax.Array:
    """Reference add_noise_with_snr: noise scaled to P_speech/10^(SNR/10)."""
    ps = _masked_power(speech, speech_lens)
    pn = _masked_power(noise, noise_lens)
    snr_linear = 10.0 ** (jnp.asarray(snr_db, jnp.float32) / 10.0)
    target_pn = ps / snr_linear
    scale = jnp.sqrt(target_pn / jnp.maximum(pn, 1e-20))
    scale = jnp.where(pn > 0, scale, 0.0)
    return speech + noise * scale[:, None]


def lufs(audio: jax.Array, lens: Optional[jax.Array] = None) -> jax.Array:
    """Simplified LUFS = 20*log10(rms) - 0.691 (reference :103-115)."""
    rms = jnp.sqrt(_masked_power(audio, lens))
    return jnp.where(
        rms > 0, 20.0 * jnp.log10(jnp.maximum(rms, 1e-20)) - 0.691, -jnp.inf
    )


def add_noise_with_lufs(
    speech: jax.Array,
    noise: jax.Array,
    target_lufs: jax.Array,
    speech_lens: Optional[jax.Array] = None,
    noise_lens: Optional[jax.Array] = None,
) -> jax.Array:
    """Reference add_noise_with_lufs: scale noise to the target LUFS level."""
    cur = lufs(noise, noise_lens)
    scale = 10.0 ** ((jnp.asarray(target_lufs, jnp.float32) - cur) / 20.0)
    scale = jnp.where(jnp.isfinite(cur), scale, 0.0)
    return speech + noise * scale[:, None]


def peak_normalize(audio: jax.Array, max_value: float = 0.9) -> jax.Array:
    """Rescale rows whose peak exceeds ``max_value`` (reference :162-171)."""
    peak = jnp.max(jnp.abs(audio), axis=-1, keepdims=True)
    scale = jnp.where(peak > max_value, max_value / jnp.maximum(peak, 1e-20), 1.0)
    return audio * scale


def random_crop(
    rng: jax.Array,
    audio: jax.Array,  # (b, n)
    lens: jax.Array,  # (b,)
    crop_samples: int,
) -> Tuple[jax.Array, jax.Array]:
    """Random fixed-size crop within the valid region (enrollment ``crop10``
    in the reference config name, README.md:53). Static output shape; crops
    shorter than ``crop_samples`` keep their valid length."""
    b, n = audio.shape
    max_start = jnp.maximum(lens - crop_samples, 0)
    start = (
        jax.random.uniform(rng, (b,)) * (max_start + 1).astype(jnp.float32)
    ).astype(jnp.int32)
    idx = start[:, None] + jnp.arange(crop_samples)[None, :]
    cropped = jnp.take_along_axis(
        audio, jnp.minimum(idx, n - 1), axis=-1
    )
    valid = jnp.minimum(lens, crop_samples)
    mask = jnp.arange(crop_samples)[None, :] < valid[:, None]
    return jnp.where(mask, cropped, 0.0), valid


def tile_to_length(noise: jax.Array, length: int) -> jax.Array:
    """Repeat a (n,) noise clip to at least ``length`` samples then cut
    (reference WHAMNoiseLoader tiling for short noise, :56-91)."""
    n = noise.shape[-1]
    reps = -(-length // n)
    return jnp.tile(noise, reps)[..., :length]


def batch_augment(
    rng: jax.Array,
    speech: jax.Array,  # (b, n) target speaker audio
    speech_lens: jax.Array,
    interferer: jax.Array,  # (b, n) other speaker audio
    interferer_lens: jax.Array,
    noise: Optional[jax.Array] = None,  # (b, n) noise rows
    noise_lens: Optional[jax.Array] = None,
    sir_range: Tuple[float, float] = (-5.0, 5.0),
    snr_range: Tuple[float, float] = (10.0, 20.0),
    peak: float = 0.9,
) -> jax.Array:
    """The full on-device simulation pipeline, one fused jit region:
    SIR in U[-5,5] overlap mix + optional WHAM! noise at SNR in U[10,20] +
    peak normalization (reference pipeline defaults,
    create_overlap_enrollment.py:428-435, add_wham_noise.py:399-409)."""
    r_sir, r_snr = jax.random.split(rng)
    b = speech.shape[0]
    sir = jax.random.uniform(
        r_sir, (b,), minval=sir_range[0], maxval=sir_range[1]
    )
    mixed = mix_with_sir(speech, interferer, sir, speech_lens, interferer_lens)
    if noise is not None:
        snr = jax.random.uniform(
            r_snr, (b,), minval=snr_range[0], maxval=snr_range[1]
        )
        mixed = add_noise_with_snr(mixed, noise, snr, speech_lens, noise_lens)
    return peak_normalize(mixed, peak)
