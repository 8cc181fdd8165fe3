"""Gotoh affine-gap alignment (validation scoring only).

The reference carries a jaligner SmithWatermanGotoh / NeedlemanWunschGotoh
pair used exclusively by EstimateROC's disputed-pair arbitration
(main/EstimateROC.java:770-786, align/* — disabled in the product path,
impl/SequenceSketch.java:54). This is the numpy analog: affine-gap
global alignment with the reference's scoring constants (match +2,
mismatch -2, gap open 2, gap extend 1 — EstimateROC.java:303-306,
:772) and the same identity definition, matches / alignment_length
(EstimateROC.getScore, :665-691).

Row-vectorized DP: the in-row horizontal-gap dependency
``Iy[j] = max(Iy[j-1]-e, M[j-1]-o-e)`` is solved per row with the
max-accumulate transform ``Iy[j] = max_{k<=j}(cand[k] + e*k) - e*j``
instead of a per-cell Python loop.
"""

from __future__ import annotations

import numpy as np

NEG = -10 ** 9


def gotoh_align(a: str, b: str, match: int = 2, mismatch: int = -2,
                gap_open: int = 2, gap_extend: int = 1):
    """Global affine-gap alignment of ``a`` vs ``b``.

    Returns (score, matches, alignment_length). ``gap_open`` is the
    cost of the FIRST gap position (open+extend combined, jaligner
    semantics: first gap char costs open, later chars cost extend).
    """
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return (-(gap_open + gap_extend * max(0, n + m - 1)) if n + m else 0,
                0, n + m)
    A = np.frombuffer(a.encode("utf-16-le"), "<u2")
    B = np.frombuffer(b.encode("utf-16-le"), "<u2")
    o, e = gap_open, gap_extend

    # M[i,j]: best ending in a match/mismatch; Ix: gap in b (vertical,
    # consumes a[i]); Iy: gap in a (horizontal, consumes b[j])
    M = np.full((n + 1, m + 1), NEG, dtype=np.int64)
    Ix = np.full((n + 1, m + 1), NEG, dtype=np.int64)
    Iy = np.full((n + 1, m + 1), NEG, dtype=np.int64)
    M[0, 0] = 0
    for j in range(1, m + 1):
        Iy[0, j] = -o - e * (j - 1)
    for i in range(1, n + 1):
        Ix[i, 0] = -o - e * (i - 1)

    ks = np.arange(1, m + 1, dtype=np.int64)  # gap-open column index
    sub = np.where(B[None, :] == A[:, None], match, mismatch)
    for i in range(1, n + 1):
        prevM, prevIx, prevIy = M[i - 1], Ix[i - 1], Iy[i - 1]
        best_prev = np.maximum(prevM, np.maximum(prevIx, prevIy))
        M[i, 1:] = best_prev[:-1] + sub[i - 1]
        M[i, 0] = NEG
        Ix[i, 1:] = np.maximum(prevM[1:] - o, prevIx[1:] - e)
        Ix[i, 0] = -o - e * (i - 1)
        # Iy[i,j] = max(M[i,j-1]-o, Iy[i,j-1]-e); unrolled over the gap
        # open column k: Iy[i,j] = max_{k<=j}(M[i,k-1] - o + e*k) - e*j
        c = M[i, :-1] - o + e * ks
        Iy[i, 1:] = np.maximum.accumulate(c) - e * ks
        Iy[i, 0] = NEG
    score = int(max(M[n, m], Ix[n, m], Iy[n, m]))

    # traceback for matches / alignment length
    i, j = n, m
    state = int(np.argmax([M[n, m], Ix[n, m], Iy[n, m]]))
    matches = 0
    length = 0
    while i > 0 or j > 0:
        length += 1
        if state == 0 and i > 0 and j > 0:
            if A[i - 1] == B[j - 1]:
                matches += 1
            prev = [M[i - 1, j - 1], Ix[i - 1, j - 1], Iy[i - 1, j - 1]]
            i, j = i - 1, j - 1
            state = int(np.argmax(prev))
        elif state == 1 and i > 0:  # gap in b, consume a[i]
            if Ix[i, j] == M[i - 1, j] - gap_open:
                state = 0
            i -= 1
        elif state == 2 and j > 0:  # gap in a, consume b[j]
            if Iy[i, j] == M[i, j - 1] - gap_open:
                state = 0
            j -= 1
        else:  # boundary: forced gaps
            if i > 0:
                i -= 1
            else:
                j -= 1
    return score, matches, length


def gotoh_identity(a: str, b: str, **kw) -> float:
    """matches / alignment_length — EstimateROC.getScore(jaligner)
    semantics (:665-691)."""
    if not a and not b:
        return 1.0
    _, matches, length = gotoh_align(a, b, **kw)
    return matches / length if length else 0.0
