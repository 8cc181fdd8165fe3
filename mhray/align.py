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


# ---------------------------------------------------------------------------
# One-skip local sketch alignment — align/Aligner.java:226-341
# (localAlignOneSkip) + align/AlignElementDoubleSketch.java:47-158,
# the alignment-sketch overlap path the reference demos in
# main/AlignmentTry.java:73 (Aligner(true, 0.0, 0.0, -0.52))
# ---------------------------------------------------------------------------


def local_align_one_skip(sim: np.ndarray, gap_open: float = 0.0,
                         score_offset: float = -0.52):
    """Free-end-gap local DP over a precomputed (A, B) element
    similarity matrix, float32-faithful to Aligner.localAlignOneSkip
    (align/Aligner.java:226-341):

    - ``D[i,j] = S[i-1,j-1] + sim[i-1,j-1] + score_offset``
    - ``P[i,j] = max(D[i-1,j], D[i,j-1]) + gap_open``
    - ``S[i,j] = max(P, D)``, and on the LAST row/column S also takes
      the running max along that edge (the "skip" — end gaps are free)
    - the best cell is the max S restricted to the last row/column
      (:277), backtraced with the storePath D-equality rule (:269-307)
      to (a1, b1).

    Returns (score, a1, a2, b1, b2) in ELEMENT indices, with
    a2 = max(0, maxI-1) / b2 = max(0, maxJ-1) exactly like :260-264.
    """
    A, B = sim.shape
    if A == 0 or B == 0:
        return 0.0, 0, 0, 0, 0
    go = np.float32(gap_open)
    # cast-first then float32 add — Java casts the similarity to float
    # BEFORE adding the (float) offset, so matching the rounding ORDER
    # avoids last-ulp divergence that could flip a max-cell tie
    simf = sim.astype(np.float32) + np.float32(score_offset)
    D = np.zeros((A + 1, B + 1), dtype=np.float32)
    P = np.zeros((A + 1, B + 1), dtype=np.float32)
    S = np.zeros((A + 1, B + 1), dtype=np.float32)
    for i in range(1, A + 1):
        D[i, 1:] = S[i - 1, :-1] + simf[i - 1]
        # P's in-row D[i, j-1] dependency: D row is already complete
        P[i, 1:] = np.maximum(D[i - 1, 1:], D[i, :-1]) + go
        S[i, 1:] = np.maximum(P[i, 1:], D[i, 1:])
        if i == A:
            np.maximum.accumulate(S[i], out=S[i])
        S[i, B] = max(S[i, B], S[i - 1, B])
    # best cell restricted to the last row or column (:275-281); the
    # strict `>` in the reference's row-major scan keeps the FIRST
    # maximum in visit order (1..A-1, B) then (A, 1..B), so the scan
    # sequence is materialized in that exact order before argmax
    edge = np.concatenate((S[1:A, B], S[A, 1:]))
    k = int(np.argmax(edge))
    max_i, max_j, best = 0, 0, np.float32(0.0)
    if edge.size and edge[k] > best:
        best = edge[k]
        if k < A - 1:
            max_i, max_j = k + 1, B
        else:
            max_i, max_j = A, k - (A - 1) + 1
    score = float(best)
    a2 = max(0, max_i - 1)
    b2 = max(0, max_j - 1)

    i, j = max_i, max_j
    while i > 0 and j > 0:
        if S[i, j] == D[i - 1, j] + go:
            i -= 1
        elif S[i, j] == D[i, j - 1] + go:
            j -= 1
        else:
            i -= 1
            j -= 1
    return score, i, a2, j, b2


def sketch_overlap_info(J: np.ndarray, len_a: int, len_b: int,
                        step: int, gap_open: float = 0.0,
                        score_offset: float = -0.52) -> dict:
    """Overlap coordinates from a (na, nb) window-Jaccard matrix —
    AlignElementDoubleSketch.getOverlapInfo (:47-89) plus its paired
    element similarity (:120-131) and offset refinement (:133-158).

    Elements pair consecutive windows (length = ceil(n/2), :105-111);
    element similarity is the max over the three in-reach window
    combos; after the DP the half-window offset test shifts each
    endpoint by one window before scaling to UTF-16 units. Returns
    ``{score, raw_score, a1, a2, b1, b2}`` with score =
    raw/100000.0 (:88; kept verbatim — a demo-scale normalization).
    Out-of-range paired-window indexes are clamped to the last window
    (the reference would throw; its demo never exercises odd tails).
    """
    na, nb = J.shape
    A = (na + 1) // 2
    B = (nb + 1) // 2
    if A == 0 or B == 0:
        return {"score": 0.0, "raw_score": 0.0,
                "a1": 0, "a2": 0, "b1": 0, "b2": 0}

    def _el(i):
        return min(2 * i, na - 1), min(2 * i + 1, na - 1)

    def _er(j):
        return min(2 * j, nb - 1), min(2 * j + 1, nb - 1)

    # element sim matrix: max(J[2i,2j], J[2i+1,2j], J[2i,2j+1])
    ii = np.minimum(2 * np.arange(A), na - 1)
    jj = np.minimum(2 * np.arange(B), nb - 1)
    base = J[np.ix_(ii, jj)]
    sim = base.copy()
    ii1 = 2 * np.arange(A) + 1
    ok_i = ii1 < na
    if ok_i.any():
        sim[ok_i] = np.maximum(sim[ok_i], J[np.ix_(ii1[ok_i], jj)])
    jj1 = 2 * np.arange(B) + 1
    ok_j = jj1 < nb
    if ok_j.any():
        sim[:, ok_j] = np.maximum(sim[:, ok_j], J[np.ix_(ii, jj1[ok_j])])

    raw, A1, A2, B1, B2 = local_align_one_skip(sim, gap_open, score_offset)

    a1, a2, b1, b2 = A1 * 2, A2 * 2, B1 * 2, B2 * 2
    if raw <= 0.0:
        # the reference's `score < 0.0` guard (:56) is dead — its DP
        # initializes best to 0.0 with a strict `>`, so raw is never
        # negative. `<=` makes the no-alignment path REACHABLE: a zero
        # score means no positive-scoring window chain exists, and
        # returning raw_score 0 here (coords in the reference's
        # unscaled element units, like its early return) lets callers
        # drop the pair instead of reading a fake [0, step) overlap.
        return {"score": 0.0, "raw_score": 0.0,
                "a1": a1, "a2": a2, "b1": b1, "b2": b2}

    def _offset(i, j):
        # similarityOffset (:133-158): which neighbor window wins
        i0, i1 = _el(i)
        j0, j1 = _er(j)
        mx, diff = J[i0, j0], 0
        if 2 * i + 1 < na and J[i1, j0] > mx:
            mx, diff = J[i1, j0], 1
        if 2 * j + 1 < nb and J[i0, j1] > mx:
            diff = -1
        return diff

    off_s = _offset(min(A1, A - 1), min(B1, B - 1))
    off_e = _offset(A2, B2)
    if off_s > 0:
        a1 += 1
    elif off_s < 0:
        b1 += 1
    if off_e > 0:
        a2 += 1
    elif off_e < 0:
        b2 += 1

    a1 *= step
    a2 = min(len_a - 1, a2 * step + step - 1)
    b1 *= step
    b2 = min(len_b - 1, b2 * step + step - 1)
    return {"score": raw / 100000.0, "raw_score": raw,
            "a1": a1, "a2": a2, "b1": b1, "b2": b2}
