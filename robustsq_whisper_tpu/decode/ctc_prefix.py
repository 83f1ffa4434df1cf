"""Batched incremental CTC prefix scoring for joint CTC/attention decode.

The reference decodes through ESPnet's ``espnet.nets.beam_search`` (SURVEY.md
§3.2), whose ``ctc`` scorer runs Graves-style CTC *prefix* scoring
(espnet/nets/ctc_prefix_score.py) as a partial scorer over the candidate set
the attention decoder pre-selects. This module is the TPU-native equivalent:
a statically-shaped, fully batched scorer usable inside ``lax.scan`` /
``lax.while_loop`` decode loops.

Math (log domain; blank = 0). For a prefix ``g`` the state holds, per frame
``t``, the forward log-probabilities ``r_nb[t]`` (paths whose collapsed
labelling is exactly ``g`` and end in a non-blank at ``t``) and ``r_b[t]``
(same, ending in blank). Extending ``g`` by candidate ``c``::

    phi[t]      = r_b[t]  ⊕  (c != last(g) ? r_nb[t] : -inf)
    r'_nb[t]    = (r'_nb[t-1] ⊕ phi[t-1]) + x[t, c]
    r'_b[t]     = (r'_b[t-1] ⊕ r'_nb[t-1]) + x[t, blank]
    psi(g+c)    = r'_nb[0] ⊕ (⊕_t phi[t-1] + x[t, c])

``psi`` is ``log p_ctc(g+c, ...)`` — the probability that the labelling
*begins with* ``g+c``; the eos score of ``g`` is the full labelling
probability ``r_nb[T-1] ⊕ r_b[T-1]``. The joint decoder uses the *delta*
``psi(g+c) − psi(g)`` as the CTC score of emitting ``c`` (ESPnet
CTCPrefixScoreTH semantics).

Frames beyond each utterance's CTC length are pre-masked to ``blank=0,
others=-inf`` (log p) so the recursion is length-exact with static shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30


def _lae(a: jax.Array, b: jax.Array) -> jax.Array:
    """logaddexp that treats NEG_INF as a true zero (jnp.logaddexp is fine
    with -inf but we keep large-negative finite values for TPU friendliness)."""
    return jnp.logaddexp(a, b)


def mask_ctc_logp(
    logp: jax.Array,  # (B, T, V) log-softmax CTC posteriors
    lens: jax.Array,  # (B,) valid frame counts
    blank: int = 0,
) -> jax.Array:
    """Frames at t >= lens become a deterministic blank (logp 0) so the
    static-T recursion reproduces exact-length scoring."""
    t = logp.shape[1]
    pad = jnp.arange(t)[None, :] >= lens[:, None]  # (B, T)
    masked = jnp.where(pad[..., None], NEG_INF, logp)
    blank_row = masked[..., blank]
    blank_row = jnp.where(pad, 0.0, blank_row)
    return masked.at[..., blank].set(blank_row)


def init_state(logp: jax.Array, blank: int = 0) -> jax.Array:
    """State of the EMPTY prefix: r_b[t] = cumulative blank logp, r_nb = -inf.

    Returns (B, T, 2) with [..., 0] = r_nb, [..., 1] = r_b. ``logp`` must be
    pre-masked (mask_ctc_logp)."""
    r_b = jnp.cumsum(logp[..., blank], axis=1)  # (B, T)
    r_nb = jnp.full_like(r_b, NEG_INF)
    return jnp.stack([r_nb, r_b], axis=-1)


def score_candidates(
    state: jax.Array,  # (N, T, 2) per-hypothesis forward vars
    last: jax.Array,  # (N,) last label of each prefix (-1 for empty)
    logp: jax.Array,  # (N, T, V) pre-masked CTC log-probs
    cands: jax.Array,  # (N, C) candidate token ids
    blank: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Score every (hypothesis, candidate) extension in one scan over T.

    Returns ``(psi, new_states)`` with ``psi`` (N, C) = log p_ctc(g+c, ...)
    and ``new_states`` (N, C, T, 2) — gather the chosen candidates' states
    after beam selection. Cost O(N·C·T); memory O(N·C·T·2).

    At real vocab sizes never materialize the (N, T, V) log-softmax — gather
    the candidate columns yourself and call
    :func:`score_candidate_columns` (what the joint decoder does)."""
    x_c = jnp.take_along_axis(
        logp, cands[:, None, :], axis=2
    )  # (N, T, C): logp of each candidate at each frame
    x_blank = logp[..., blank]  # (N, T)
    same = cands == last[:, None]  # (N, C)
    return score_candidate_columns(state, x_c, x_blank, same, last < 0)


def score_candidate_columns(
    state: jax.Array,  # (N, T, 2)
    x_c: jax.Array,  # (N, T, C) candidate-column log-probs (pre-masked)
    x_blank: jax.Array,  # (N, T) blank log-probs (pre-masked)
    same: jax.Array,  # (N, C) candidate == prefix's last label
    empty: jax.Array,  # (N,) prefix is empty
) -> Tuple[jax.Array, jax.Array]:
    """Core recursion over pre-gathered candidate columns."""
    n, _, c = x_c.shape
    r_nb, r_b = state[..., 0], state[..., 1]  # (N, T)

    phi = _lae(
        r_b[..., None],
        jnp.where(same[:, None, :], NEG_INF, r_nb[..., None]),
    )  # (N, T, C)

    r0_nb = jnp.where(empty[:, None], x_c[:, 0, :], NEG_INF)  # (N, C)
    r0_b = jnp.full((n, c), NEG_INF)

    def step(carry, inp):
        prev_nb, prev_b, psi = carry  # (N, C) each
        x_t_c, x_t_blank, phi_tm1 = inp  # (N, C), (N,), (N, C)
        new_nb = _lae(prev_nb, phi_tm1) + x_t_c
        new_b = _lae(prev_b, prev_nb) + x_t_blank[:, None]
        psi = _lae(psi, phi_tm1 + x_t_c)
        return (new_nb, new_b, psi), (new_nb, new_b)

    # time-major inputs for the scan over frames 1..T-1
    xs = (
        jnp.moveaxis(x_c[:, 1:, :], 1, 0),  # (T-1, N, C)
        jnp.moveaxis(x_blank[:, 1:], 1, 0),  # (T-1, N)
        jnp.moveaxis(phi[:, :-1, :], 1, 0),  # (T-1, N, C)
    )
    (fin_nb, fin_b, psi), (nb_seq, b_seq) = jax.lax.scan(
        step, (r0_nb, r0_b, r0_nb), xs
    )
    # assemble (N, C, T, 2) new states: frame 0 + scanned frames 1..T-1
    nb_all = jnp.concatenate(
        [r0_nb[None], nb_seq], axis=0
    )  # (T, N, C)
    b_all = jnp.concatenate([r0_b[None], b_seq], axis=0)
    new_states = jnp.stack(
        [jnp.transpose(nb_all, (1, 2, 0)), jnp.transpose(b_all, (1, 2, 0))],
        axis=-1,
    )  # (N, C, T, 2)
    return psi, new_states


def eos_score(state: jax.Array) -> jax.Array:
    """log p_ctc(labelling == g): total forward mass at the last frame.
    (Pre-masked frames make T-1 equivalent to each utterance's true end.)"""
    return _lae(state[:, -1, 0], state[:, -1, 1])


# ---------------- numpy reference (tests) ----------------


def ctc_prefix_score_np(logp, prefix, blank=0):
    """Slow numpy reference: log p(labelling begins with ``prefix``) for ONE
    utterance — the incremental scorer must match it for every prefix.
    ``logp`` (T, V) log-softmax; exact Graves recursion, O(T·len)."""
    import numpy as np

    t_frames = logp.shape[0]
    if len(prefix) == 0:
        return 0.0
    # forward vars for successive prefixes
    r_nb = np.full((t_frames,), -np.inf)
    r_b = np.cumsum(logp[:, blank])
    last = None
    for c in prefix:
        new_nb = np.full((t_frames,), -np.inf)
        new_b = np.full((t_frames,), -np.inf)
        phi = np.logaddexp(
            r_b, r_nb if c != last else np.full_like(r_nb, -np.inf)
        )
        new_nb[0] = logp[0, c] if last is None else -np.inf
        psi = new_nb[0]
        for t in range(1, t_frames):
            new_nb[t] = np.logaddexp(new_nb[t - 1], phi[t - 1]) + logp[t, c]
            new_b[t] = np.logaddexp(new_b[t - 1], new_nb[t - 1]) + logp[t, blank]
            psi = np.logaddexp(psi, phi[t - 1] + logp[t, c])
        r_nb, r_b, last = new_nb, new_b, c
    return float(psi)


def ctc_label_prob_np(logp, labels, blank=0):
    """Slow numpy reference: log p(labelling == labels) via the standard CTC
    forward algorithm (for the eos score)."""
    import numpy as np

    ext = [blank]
    for l in labels:
        ext += [l, blank]
    s = len(ext)
    t_frames = logp.shape[0]
    alpha = np.full((t_frames, s), -np.inf)
    alpha[0, 0] = logp[0, ext[0]]
    if s > 1:
        alpha[0, 1] = logp[0, ext[1]]
    for t in range(1, t_frames):
        for j in range(s):
            terms = [alpha[t - 1, j]]
            if j > 0:
                terms.append(alpha[t - 1, j - 1])
            if j > 1 and ext[j] != blank and ext[j] != ext[j - 2]:
                terms.append(alpha[t - 1, j - 2])
            alpha[t, j] = np.logaddexp.reduce(terms) + logp[t, ext[j]]
    return float(np.logaddexp(alpha[-1, -1], alpha[-1, -2] if s > 1 else -np.inf))
