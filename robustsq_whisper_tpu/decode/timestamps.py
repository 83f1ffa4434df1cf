"""Whisper timestamp-token decoding rules + host-side segmentation.

The reference decodes `<|notimestamps|>` (its eval config), so this is a
completeness feature: with ``DecodeConfig.with_timestamps`` the greedy
decoder drops `<|notimestamps|>` from the init sequence and constrains
sampling with the published Whisper inference rules (the semantics of
openai-whisper's ApplyTimestampRules logit filter):

1. timestamp tokens come in pairs — after a LONE timestamp (the previous
   token was text) the next token must be a timestamp or eot; after a
   timestamp PAIR the next token must be non-timestamp;
2. timestamps are monotonic: after a LONE timestamp the next may repeat
   it (a new segment can open at the previous close), otherwise
   candidates must be strictly greater than the largest seen;
3. the FIRST sampled token must be a timestamp, bounded by
   ``max_initial_timestamp_index``;
4. when the total probability mass on timestamp tokens exceeds the best
   single text token's, text is masked (the model "wants" a timestamp).

Everything is a pure jittable function of per-row state
``(last, penult, max_ts)`` threaded through the decode loop's carry;
``segments_from_tokens`` converts a decoded row into
``[(start_s, end_s, text), ...]`` on host (0.02 s per timestamp step).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

NEG = jnp.float32(-1e30)
TIME_PRECISION = 0.02  # seconds per timestamp token step


def apply_timestamp_rules(
    logits: jax.Array,  # (rows, vocab) raw logits
    last: jax.Array,  # (rows,) previous token (-1 before any emission)
    penult: jax.Array,  # (rows,) token before that (-1 if none)
    max_ts: jax.Array,  # (rows,) largest timestamp token seen (init ts_begin)
    ts_begin: int,
    eot: int,
    max_initial_index: int = 50,
) -> jax.Array:
    """Mask ``logits`` per the Whisper timestamp sampling rules."""
    rows, vocab = logits.shape
    ids = jnp.arange(vocab)
    is_ts_col = (ids >= ts_begin)[None, :]  # (1, vocab)
    is_text_col = (ids < ts_begin) & (ids != eot)

    last_was_ts = last >= ts_begin  # (rows,)
    penult_was_ts = (penult >= ts_begin) | (penult < 0)
    first = last < 0

    # 1. pair structure
    after_pair = last_was_ts & penult_was_ts & ~first
    lone = last_was_ts & ~penult_was_ts
    mask = jnp.where(after_pair[:, None] & is_ts_col, NEG, 0.0)
    mask = mask + jnp.where(lone[:, None] & is_text_col[None, :], NEG, 0.0)

    # 2. monotonic timestamps: a lone timestamp (segment close just
    # happened / about to open) may be repeated; otherwise strictly greater
    bound = jnp.where(first | lone, max_ts, max_ts + 1)  # (rows,)
    below = is_ts_col & (ids[None, :] < bound[:, None])
    mask = mask + jnp.where(below, NEG, 0.0)

    # 3. first token: timestamps only, bounded by the initial window
    first_bad = (~is_ts_col) | (ids[None, :] > ts_begin + max_initial_index)
    mask = mask + jnp.where(first[:, None] & first_bad, NEG, 0.0)

    masked = logits + mask

    # 4. timestamp-mass rule on the MASKED distribution
    logp = jax.nn.log_softmax(masked, axis=-1)
    ts_mass = jax.nn.logsumexp(
        jnp.where(is_ts_col, logp, NEG), axis=-1
    )  # (rows,)
    best_text = jnp.max(jnp.where(is_text_col[None, :], logp, NEG), axis=-1)
    force_ts = ts_mass > best_text
    masked = masked + jnp.where(
        force_ts[:, None] & is_text_col[None, :], NEG, 0.0
    )  # eot stays available even when a timestamp is forced
    return masked


def update_timestamp_state(
    tok: jax.Array,  # (rows,) the token just emitted
    last: jax.Array,
    max_ts: jax.Array,
    ts_begin: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """New ``(last, penult, max_ts)`` after emitting ``tok``."""
    new_max = jnp.where(tok >= ts_begin, jnp.maximum(max_ts, tok), max_ts)
    return tok, last, new_max


def segments_from_tokens(
    row: List[int],  # one utterance's tokens (eot-stripped)
    tokenizer,
    ts_begin: int,
) -> List[Tuple[float, float, str]]:
    """Host-side: split a timestamped token row into
    ``(start_s, end_s, text)`` segments. An unclosed trailing segment ends
    at the last timestamp seen (or is dropped if it has no text)."""
    segments: List[Tuple[float, float, str]] = []
    start = None
    text_ids: List[int] = []
    for t in row:
        if t >= ts_begin:
            ts = (t - ts_begin) * TIME_PRECISION
            if start is None:
                start = ts
            elif text_ids:
                segments.append(
                    (start, ts, tokenizer.decode(text_ids).strip())
                )
                start = None
                text_ids = []
            else:  # consecutive timestamps: a new segment start
                start = ts
        elif start is not None:
            text_ids.append(t)
    if start is not None and text_ids:
        # unclosed trailing segment (decode hit max_new_tokens mid-segment):
        # the last timestamp seen is its opening one, so it ends there too
        segments.append((start, start, tokenizer.decode(text_ids).strip()))
    return segments
