"""WER/CER scoring (host-side numpy), ESPnet error-calculator equivalent.

The reference delegates scoring to ESPnet's recipe stages (SURVEY.md §3.2);
the metric itself is standard Levenshtein WER/CER over hypothesis/reference
pairs.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def edit_distance(ref: Sequence, hyp: Sequence) -> Tuple[int, int, int, int]:
    """Return (substitutions, deletions, insertions, ref_len) via DP."""
    n, m = len(ref), len(hyp)
    # dp[i][j] = (cost, subs, dels, ins)
    dp = np.zeros((n + 1, m + 1), dtype=np.int32)
    dp[:, 0] = np.arange(n + 1)
    dp[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            cost = 0 if ref[i - 1] == hyp[j - 1] else 1
            dp[i, j] = min(
                dp[i - 1, j - 1] + cost, dp[i - 1, j] + 1, dp[i, j - 1] + 1
            )
    # backtrace for s/d/i counts
    i, j = n, m
    subs = dels = ins = 0
    while i > 0 or j > 0:
        if i > 0 and j > 0 and dp[i, j] == dp[i - 1, j - 1] + (
            0 if ref[i - 1] == hyp[j - 1] else 1
        ):
            if ref[i - 1] != hyp[j - 1]:
                subs += 1
            i, j = i - 1, j - 1
        elif i > 0 and dp[i, j] == dp[i - 1, j] + 1:
            dels += 1
            i -= 1
        else:
            ins += 1
            j -= 1
    return subs, dels, ins, n


def wer(refs: List[str], hyps: List[str]) -> Dict[str, float]:
    """Corpus word error rate. Returns dict with wer/sub/del/ins rates."""
    S = D = I = N = 0
    for r, h in zip(refs, hyps):
        s, d, i, n = edit_distance(r.split(), h.split())
        S, D, I, N = S + s, D + d, I + i, N + n
    denom = max(N, 1)
    return {
        "wer": (S + D + I) / denom,
        "sub": S / denom,
        "del": D / denom,
        "ins": I / denom,
        "n_words": N,
    }


def cer(refs: List[str], hyps: List[str]) -> Dict[str, float]:
    """Corpus character error rate (whitespace collapsed)."""
    S = D = I = N = 0
    for r, h in zip(refs, hyps):
        rc = list(" ".join(r.split()))
        hc = list(" ".join(h.split()))
        s, d, i, n = edit_distance(rc, hc)
        S, D, I, N = S + s, D + d, I + i, N + n
    denom = max(N, 1)
    return {"cer": (S + D + I) / denom, "n_chars": N}
