"""ASR losses: label-smoothed attention CE, CTC, accuracy.

Equivalents of the external ESPnet pieces the reference model delegates to
(imports at /root/reference/model/ts_qformer_espnet_model.py:9-20):

- ``add_sos_eos`` — sos/eos framing of padded label sequences,
- ``LabelSmoothingLoss`` — KL(true_smoothed || log_softmax) summed over the
  vocab, pad-masked, normalized by batch size (default
  ``length_normalized_loss=False``) or token count,
- ``th_accuracy`` — argmax accuracy over non-pad positions,
- ESPnet ``CTC`` — Linear head + CTC loss with blank 0, batch-mean.

All are statically-shaped: padded label tensors plus int length vectors, no
dynamic trimming (the reference trims ``text`` to ``max(text_lengths)`` for
DataParallel at :203 — unnecessary and shape-unstable under XLA).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

IGNORE_ID = -1


def add_sos_eos(
    ys_pad: jax.Array,  # (batch, L) padded with ignore_id
    ys_lens: jax.Array,  # (batch,)
    sos: int,
    eos: int,
    ignore_id: int = IGNORE_ID,
    pad_in: int = 0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Static-shape sos/eos framing.

    Returns:
        ys_in:  (batch, L+1) = [sos, y_1..y_L, pad...]; pad positions hold
            ``pad_in`` (they are masked out of the loss, value is arbitrary —
            ESPnet uses eos there).
        ys_out: (batch, L+1) = [y_1..y_L, eos, ignore...]
        ys_in_lens: (batch,) = ys_lens + 1
    """
    b, l = ys_pad.shape
    idx = jnp.arange(l + 1)[None, :]
    valid_in = idx <= ys_lens[:, None]  # sos + L tokens
    tokens = jnp.where(ys_pad == ignore_id, pad_in, ys_pad)
    ys_in = jnp.concatenate(
        [jnp.full((b, 1), sos, dtype=ys_pad.dtype), tokens], axis=1
    )
    ys_in = jnp.where(valid_in, ys_in, pad_in)

    eos_pos = idx == ys_lens[:, None]
    ys_out = jnp.concatenate(
        [tokens, jnp.full((b, 1), ignore_id, dtype=ys_pad.dtype)], axis=1
    )
    ys_out = jnp.where(eos_pos, eos, ys_out)
    ys_out = jnp.where(idx > ys_lens[:, None], ignore_id, ys_out)
    return ys_in, ys_out, ys_lens + 1


def label_smoothing_loss(
    logits: jax.Array,  # (batch, L, vocab) fp32
    targets: jax.Array,  # (batch, L) with ignore_id padding
    smoothing: float = 0.0,
    ignore_id: int = IGNORE_ID,
    normalize_length: bool = False,
) -> jax.Array:
    """ESPnet LabelSmoothingLoss semantics: KL divergence against the smoothed
    target distribution, masked sum, divided by batch (or token count)."""
    vocab = logits.shape[-1]
    mask = targets != ignore_id
    safe_t = jnp.where(mask, targets, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    confidence = 1.0 - smoothing
    off_value = smoothing / (vocab - 1)
    # KL(true || pred) = sum true*(log true - logp); the log-true entropy term
    # is constant and kept for exact parity with torch.nn.KLDivLoss.
    true_on = confidence
    true_off = off_value

    def xlogx(v: float) -> float:
        return 0.0 if v == 0.0 else v * math.log(v)

    entropy_const = xlogx(true_on) + (vocab - 1) * xlogx(true_off)
    on_logp = jnp.take_along_axis(logp, safe_t[..., None], axis=-1)[..., 0]
    cross = true_on * on_logp + true_off * (
        jnp.sum(logp, axis=-1) - on_logp
    )
    kl = entropy_const - cross  # (batch, L)
    kl = jnp.where(mask, kl, 0.0)
    denom = jnp.where(
        normalize_length, jnp.sum(mask).astype(jnp.float32), logits.shape[0]
    )
    return jnp.sum(kl) / denom


def token_accuracy(
    logits: jax.Array,
    targets: jax.Array,
    ignore_id: int = IGNORE_ID,
) -> jax.Array:
    """th_accuracy equivalent: argmax accuracy over non-pad positions."""
    mask = targets != ignore_id
    pred = jnp.argmax(logits, axis=-1)
    correct = jnp.where(mask, pred == targets, False)
    return jnp.sum(correct) / jnp.maximum(jnp.sum(mask), 1)


class CTCHead(nn.Module):
    """Linear projection + CTC loss (ESPnet ``CTC`` equivalent; blank 0)."""

    vocab_size: int
    blank_id: int = 0

    def setup(self):
        self.ctc_lo = nn.Dense(self.vocab_size, dtype=jnp.float32, name="ctc_lo")

    def project(self, encoder_out: jax.Array) -> jax.Array:
        return self.ctc_lo(encoder_out.astype(jnp.float32))

    def __call__(
        self,
        encoder_out: jax.Array,  # (batch, T, dim) prompt-stripped
        encoder_out_lens: jax.Array,  # (batch,)
        labels: jax.Array,  # (batch, L) padded with ignore_id
        label_lens: jax.Array,  # (batch,)
        ignore_id: int = IGNORE_ID,
    ) -> jax.Array:
        logits = self.project(encoder_out)
        t = logits.shape[1]
        logit_pad = (
            jnp.arange(t)[None, :] >= encoder_out_lens[:, None]
        ).astype(jnp.float32)
        l = labels.shape[1]
        label_pad = (
            jnp.arange(l)[None, :] >= label_lens[:, None]
        ).astype(jnp.float32)
        safe_labels = jnp.where(labels == ignore_id, 0, labels)
        per_seq = optax.ctc_loss(
            logits, logit_pad, safe_labels, label_pad, blank_id=self.blank_id
        )
        return jnp.mean(per_seq)


def greedy_ctc_decode(
    logits: jax.Array, lengths: jax.Array, blank_id: int = 0
) -> jax.Array:
    """Best-path CTC decode to padded token ids (repeated/blank collapsed on
    host; this returns the raw argmax path masked by length)."""
    path = jnp.argmax(logits, axis=-1)
    t = path.shape[1]
    valid = jnp.arange(t)[None, :] < lengths[:, None]
    return jnp.where(valid, path, blank_id)
