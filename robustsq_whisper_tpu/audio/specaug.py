"""On-device SpecAugment, jit-safe with static shapes.

The reference applies ESPnet's SpecAug on transposed mel features during
training (/root/reference/model/whisper_encoder.py:185-188, 521-524). The
ESPnet default recipe config uses frequency masking + time masking (time-warp
optional). Here both masks are generated with ``jax.random`` inside the
compiled step: mask positions are drawn as (start, width) pairs and applied
via broadcasted comparisons — no dynamic shapes, no host round-trips.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SpecAugConfig:
    num_freq_masks: int = 2
    freq_mask_width: int = 27  # F
    num_time_masks: int = 2
    time_mask_width: int = 100  # T (frames)
    # ESPnet-style adaptive cap: each time mask <= ratio * utterance length
    time_mask_width_ratio: float = 0.05
    mask_value: float = 0.0


def _mask_axis(
    rng: jax.Array,
    batch: int,
    axis_len: int,
    num_masks: int,
    max_width: jax.Array,  # (batch,) or scalar int32
) -> jax.Array:
    """Boolean keep-mask (batch, axis_len): False where masked."""
    r_start, r_width = jax.random.split(rng)
    width = jax.random.randint(
        r_width, (batch, num_masks, 1), 0, jnp.asarray(max_width).max() + 1
    )
    width = jnp.minimum(width, jnp.reshape(max_width, (-1, 1, 1)))
    start = jax.random.randint(
        r_start, (batch, num_masks, 1), 0, max(axis_len - 1, 1)
    )
    idx = jnp.arange(axis_len)[None, None, :]
    masked = (idx >= start) & (idx < start + width)  # (b, num_masks, len)
    return ~jnp.any(masked, axis=1)


def apply_specaug(
    rng: jax.Array,
    feats: jax.Array,  # (batch, n_mels, frames)
    feat_lens: Optional[jax.Array] = None,  # (batch,) valid frames
    cfg: SpecAugConfig = SpecAugConfig(),
) -> jax.Array:
    """Apply frequency + time masking. Returns masked feats, same shape."""
    b, n_mels, frames = feats.shape
    r_f, r_t = jax.random.split(rng)

    keep_f = _mask_axis(
        r_f, b, n_mels, cfg.num_freq_masks, jnp.full((b,), cfg.freq_mask_width)
    )  # (b, n_mels)

    if feat_lens is not None:
        adaptive = jnp.minimum(
            jnp.full((b,), cfg.time_mask_width),
            (feat_lens * cfg.time_mask_width_ratio).astype(jnp.int32),
        )
        adaptive = jnp.maximum(adaptive, 1)
    else:
        adaptive = jnp.full((b,), cfg.time_mask_width)
    keep_t = _mask_axis(r_t, b, frames, cfg.num_time_masks, adaptive)  # (b, frames)

    keep = keep_f[:, :, None] & keep_t[:, None, :]
    return jnp.where(keep, feats, cfg.mask_value)
