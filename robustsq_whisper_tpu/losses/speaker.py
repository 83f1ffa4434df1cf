"""Speaker-discriminative losses: ASP pooling, Arc-InfoNCE, AAM-Softmax.

Behavior parity with /root/reference/model/ts_qformer_espnet_model.py:

- ``AttentiveStatisticsPooling`` (:753-857): query-free attentive pooling —
  L2-normalized mean vector as query, dot-product scores scaled by a
  temperature γ, length-masked softmax, weighted mean μ and std
  σ = sqrt(max(m2 − μ², 0) + 1e-8), concat [μ; σ] → Linear 2d→d (Xavier init)
  → L2 norm.
- ``arc_infonce_loss`` (:659-736): Arc-InfoNCE between the mean-pooled
  speaker prompt and the ASP-pooled enrollment embedding, with
  ``num_negatives`` in-batch negatives sampled from a same-speaker-masked
  categorical, and an angular margin of +0.15 added to the positive.
- ``aam_softmax_loss`` (:337-405): AAM-Softmax speaker classification with
  cos/acos additive angular margin on the target class and 1/temp scaling.

TPU redesign notes (SURVEY.md §7.4): the reference lazily constructs ASP and
the AAM classifier on the first forward and mutates ``gamma`` per epoch —
impossible under jit. Here ASP/AAM are config-time flax modules and the
warm-up-scheduled scalars (``gamma``, ``margin``) are *traced arguments*
threaded through the loss, so one compiled step serves every epoch.
``torch.multinomial`` negative sampling becomes ``jax.random.categorical``
keyed per step; the same-speaker mask logits come from the host collator
(string parsing of utt ids cannot live on device).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

_ACOS_EPS = 1e-7  # load-bearing clamp (reference :383, :715)


def _l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    # torch F.normalize semantics: x / max(||x||, eps)
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


class AttentiveStatisticsPooling(nn.Module):
    """ASP layer; ``gamma`` is a traced scalar to allow epoch warm-up."""

    input_dim: int
    use_projection: bool = True

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (batch, seq, dim)
        gamma: jax.Array | float = 6.0,
        lengths: Optional[jax.Array] = None,  # (batch,)
    ) -> jax.Array:
        x = x.astype(jnp.float32)
        b, seq_len, d = x.shape

        if lengths is not None:
            mask = (
                jnp.arange(seq_len)[None, :] < lengths[:, None]
            )  # (batch, seq)
            fmask = mask[..., None].astype(jnp.float32)
            p_tilde = jnp.sum(x * fmask, axis=1) / lengths[:, None].astype(
                jnp.float32
            )
        else:
            mask = None
            p_tilde = jnp.mean(x, axis=1)
        p_tilde = _l2_normalize(p_tilde)

        scores = jnp.einsum("bd,bsd->bs", p_tilde, x) * gamma
        if mask is not None:
            scores = jnp.where(mask, scores, -jnp.inf)
        alpha = jax.nn.softmax(scores, axis=-1)  # (batch, seq)

        mu = jnp.einsum("bs,bsd->bd", alpha, x)
        m2 = jnp.einsum("bs,bsd->bd", alpha, x * x)
        var = jnp.maximum(m2 - mu * mu, 0.0) + 1e-8
        sigma = jnp.sqrt(var)
        pooled = jnp.concatenate([mu, sigma], axis=-1)  # (batch, 2d)

        if self.use_projection:
            pooled = nn.Dense(
                self.input_dim,
                kernel_init=nn.initializers.xavier_uniform(),
                bias_init=nn.initializers.zeros,
                dtype=jnp.float32,
                name="projection",
            )(pooled)
            pooled = _l2_normalize(pooled)
        return pooled


def sample_negatives(
    rng: jax.Array,
    neg_logits: jax.Array,  # (batch, batch): 1.0 valid / -10000 same-speaker
    num_negatives: int,
) -> jax.Array:
    """Multinomial-with-replacement negative indices, (num_negatives, batch).

    Equivalent to the reference's per-row ``torch.multinomial(softmax(·))``
    (:694-699) — ``jax.random.categorical`` consumes the same pre-softmax
    logits directly.
    """
    return jax.random.categorical(
        rng, neg_logits.astype(jnp.float32), axis=-1,
        shape=(num_negatives, neg_logits.shape[0]),
    )


def arc_infonce_loss(
    spk_prompt: jax.Array,  # (batch, n_q, dim) query embeddings
    pooled_enroll: jax.Array,  # (batch, dim), ASP-pooled + normalized
    neg_logits: jax.Array,  # (batch, batch) same-speaker-masked logits
    rng: jax.Array,
    num_negatives: int = 10,
    temperature: float = 0.1,
    margin: float = 0.15,
) -> Tuple[jax.Array, jax.Array]:
    """Arc-InfoNCE contrastive loss. Returns (loss, accuracy)."""
    pooled_prompt = _l2_normalize(
        jnp.mean(spk_prompt.astype(jnp.float32), axis=1)
    )  # (batch, dim)

    neg_idx = sample_negatives(rng, neg_logits, num_negatives)  # (K, batch)
    neg_emb = pooled_enroll[neg_idx]  # (K, batch, dim)
    targets = jnp.concatenate(
        [pooled_enroll[None], neg_emb], axis=0
    )  # (1+K, batch, dim)

    # cosine similarity — both sides already unit-norm but renormalize like
    # torch.cosine_similarity for exact parity on degenerate inputs.
    cos = jnp.einsum(
        "bd,kbd->kb", pooled_prompt, _l2_normalize(targets)
    )
    cos = jnp.clip(cos, -1.0 + _ACOS_EPS, 1.0 - _ACOS_EPS)
    theta = jnp.arccos(cos)
    theta = theta.at[0].add(margin)  # margin on the positive only (:718)
    logits = (jnp.cos(theta) / temperature).T  # (batch, 1+K)

    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.mean(logp[:, 0])
    acc = jnp.mean((jnp.argmax(logits, axis=-1) == 0).astype(jnp.float32))
    return loss, acc


class AAMSoftmaxHead(nn.Module):
    """Bias-free speaker classifier with additive angular margin (:337-405).

    ``margin`` is a traced scalar (0.0 during warm-up epochs, the configured
    value after — reference :377-380).
    """

    num_speakers: int
    input_dim: int
    temperature: float = 0.0333  # 1/s with s=30

    @nn.compact
    def __call__(
        self,
        pooled: jax.Array,  # (batch, dim) ASP-pooled embedding
        labels: jax.Array,  # (batch,) int speaker ids
        margin: jax.Array | float = 0.25,
    ) -> Tuple[jax.Array, jax.Array]:
        w = self.param(
            "classifier",
            nn.initializers.lecun_normal(),
            (self.num_speakers, self.input_dim),
        )
        feats = _l2_normalize(pooled.astype(jnp.float32))
        weights = _l2_normalize(w.astype(jnp.float32))
        cos = feats @ weights.T  # (batch, num_speakers)
        cos = jnp.clip(cos, -1.0 + _ACOS_EPS, 1.0 - _ACOS_EPS)
        theta = jnp.arccos(cos)
        one_hot = jax.nn.one_hot(labels, self.num_speakers, dtype=jnp.float32)
        theta = theta + one_hot * margin
        logits = jnp.cos(theta) / self.temperature

        logp = jax.nn.log_softmax(logits, axis=-1)
        loss = -jnp.mean(jnp.sum(one_hot * logp, axis=-1))
        acc = jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))
        return loss, acc


def asp_gamma_schedule(
    epoch: jax.Array | int,
    gamma_initial: float = 1.0,
    gamma_final: float = 6.0,
    warmup_epochs: int = 6,
) -> jax.Array:
    """Linear γ warm-up (reference get_current_asp_gamma, :742-750)."""
    epoch = jnp.asarray(epoch, jnp.float32)
    progress = jnp.minimum(epoch / warmup_epochs, 1.0)
    return gamma_initial + progress * (gamma_final - gamma_initial)


def aam_margin_schedule(
    epoch: jax.Array | int,
    margin: float = 0.25,
    warm_up_epochs: int = 5,
) -> jax.Array:
    """Margin gate: 0 before ``warm_up_epochs``, full margin after (:377-380)."""
    epoch = jnp.asarray(epoch, jnp.float32)
    return jnp.where(epoch < warm_up_epochs, 0.0, margin)
