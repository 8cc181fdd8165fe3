"""Sampled sensitivity/specificity/PPV estimation — the EstimateROC
analog (main/EstimateROC.java:173-263; sampling :355-365, estimates
:802-886; ~1% precision at 10 000 trials, docs/source/utilities.rst:19).

Estimates, against a ground-truth pair set:
- sensitivity (recall): P(found | true pair), sampled from truth pairs
- PPV (precision): P(true | found pair), sampled from found pairs
- specificity: P(not found | non-pair), sampled from random non-pairs

Alignment arbitration (EstimateROC.computeDP :746-798, used by
estimatePPV :871 and fullEstimate :904): when the ground truth is
fuzzy (real corpora, interval-based truth), a found pair that is NOT
in the truth set is re-checked by an actual alignment of the two
texts restricted to the reported overlap region; it counts as a true
positive if alignment identity > ``min_identity``, aligned length >
``min_ovl_len``, and the aligned length is within 30% of the reported
overlap (MIN_OVERLAP_DIFFERENCE :71). Enable by passing ``texts`` (and
optionally per-pair ``edges``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _pair_set(tbl: pa.Table) -> set[tuple[str, str]]:
    return set(zip(tbl.column("lo_id").to_pylist(),
                   tbl.column("hi_id").to_pylist()))


def range_overlap(start_a, end_a, start_b, end_b):
    """Utils.getRangeOverlap (Utils.java:307-318): inclusive-range
    overlap length, order-insensitive endpoints; vectorized."""
    min_a = np.minimum(start_a, end_a)
    max_a = np.maximum(start_a, end_a)
    min_b = np.minimum(start_b, end_b)
    max_b = np.maximum(start_b, end_b)
    return np.minimum(max_a, max_b) - np.maximum(min_a, min_b) + 1


def truth_from_intervals(ids: list[str], source: list[str],
                         start: np.ndarray, end: np.ndarray,
                         min_ovl: int = 1) -> pa.Table:
    """Interval-derived ground-truth pairs — EstimateROC's truth model
    (seqToPosition + per-chromosome IntervalTree,
    EstimateROC.java:347-372,:600-620): two records are a true pair iff
    they map to the same source and their reference intervals overlap
    by >= ``min_ovl``. The per-source interval lookup is a sorted-start
    array + searchsorted window probe (the IntervalTree analog, J4).

    Returns (lo_id, hi_id) canonical by id string order.
    """
    ids_a = np.asarray(ids)
    src = np.asarray(source)
    start = np.asarray(start, dtype=np.int64)
    end = np.asarray(end, dtype=np.int64)
    lo_s = np.minimum(start, end)
    hi_s = np.maximum(start, end)

    out_lo, out_hi = [], []
    order = np.lexsort((lo_s, src))
    src_o, lo_o, hi_o, id_o = src[order], lo_s[order], hi_s[order], ids_a[order]
    bounds = np.flatnonzero(
        np.concatenate(([True], src_o[1:] != src_o[:-1], [True])))
    for b in range(len(bounds) - 1):
        s, e = bounds[b], bounds[b + 1]
        ls, hs, nm = lo_o[s:e], hi_o[s:e], id_o[s:e]
        for i in range(len(ls)):
            # candidates: intervals starting before this one ends
            # (inclusive overlap >= min_ovl  <=>  start_j <= hi_i - min_ovl + 1)
            j_hi = np.searchsorted(ls, hs[i] - min_ovl + 1, side="right")
            for j in range(i + 1, j_hi):
                if min(hs[i], hs[j]) - max(ls[i], ls[j]) + 1 >= min_ovl:
                    a, b2 = (nm[i], nm[j]) if nm[i] <= nm[j] else (nm[j], nm[i])
                    out_lo.append(a)
                    out_hi.append(b2)
    return pa.table({
        "lo_id": pa.array(out_lo, pa.string()),
        "hi_id": pa.array(out_hi, pa.string()),
    })


def _levenshtein(a: str, b: str) -> int:
    """Unit-cost edit distance, row-vectorized (the accumulate trick
    resolves the in-row gap dependency)."""
    if not a:
        return len(b)
    if not b:
        return len(a)
    A = np.frombuffer(a.encode("utf-16-le"), "<u2")
    B = np.frombuffer(b.encode("utf-16-le"), "<u2")
    prev = np.arange(len(B) + 1, dtype=np.int64)
    idx = np.arange(len(B) + 1, dtype=np.int64)
    for i in range(1, len(A) + 1):
        cur = np.empty(len(B) + 1, dtype=np.int64)
        cur[0] = i
        cur[1:] = np.minimum(prev[:-1] + (B != A[i - 1]), prev[1:] + 1)
        cur = np.minimum.accumulate(cur - idx) + idx
        prev = cur
    return int(prev[-1])


def alignment_identity(s1: str, s2: str) -> tuple[float, int]:
    """(identity, alignment_length): matches/length of a global
    alignment — the getScore semantics (EstimateROC.java:665-716) with
    unit gap costs; length = max(len) lower-bounds the alignment.
    Length is measured in UTF-16 code units — the SAME coordinate
    space _levenshtein edits in (and Java String.length()) — so
    identity stays in [0, 1] for astral (non-BMP) text; counting code
    points here while editing code units deflated identity below 0
    for emoji-bearing pairs."""
    l1 = len(s1.encode("utf-16-le")) // 2
    l2 = len(s2.encode("utf-16-le")) // 2
    length = max(l1, l2)
    if length == 0:
        return 1.0, 0
    d = _levenshtein(s1, s2)
    return 1.0 - d / length, length


def arbitrate_pair(lo_text: str, hi_text: str,
                   edge: tuple[int, int, int, int] | None,
                   min_identity: float, min_ovl_len: int,
                   method: str = "levenshtein") -> bool:
    """computeDP (:746-798): align the reported overlap regions (whole
    texts when no edge was reported) and apply the identity + length +
    30%-overlap-difference acceptance rule. ``method='gotoh'`` uses
    the affine-gap aligner (mhray.align — the jaligner
    SmithWatermanGotoh analog with the reference's +2/-2/2/1 scoring,
    EstimateROC.java:772); 'levenshtein' is the cheap unit-cost
    default."""
    if edge is not None:
        a1, a2, b1, b2 = edge
        s1 = lo_text[a1:a2]
        s2 = hi_text[b1:b2]
    else:
        s1, s2 = lo_text, hi_text
    ovl_len = min(len(s1), len(s2))
    if ovl_len == 0:
        return False
    if method == "gotoh":
        from mhray.align import gotoh_align

        _, matches, length = gotoh_align(s1, s2)
        score = matches / length if length else 0.0
    else:
        score, length = alignment_identity(s1, s2)
    # two-sided: the aligned length must be WITHIN 30% of the
    # reported overlap (length >= ovl_len always, so the unsigned form
    # `1.0 - length/ovl_len < 0.30` was vacuously true)
    return (score > min_identity and length > min_ovl_len
            and abs(1.0 - length / ovl_len) < 0.30)


def full_estimate(truth_pairs: pa.Table, found_pairs: pa.Table,
                  all_ids: list[str], texts: dict[str, str] | None = None,
                  edges: dict[tuple[str, str], tuple] | None = None,
                  min_identity: float = 0.65, min_ovl_len: int = 16,
                  truth_ovl: dict[tuple[str, str], int] | None = None,
                  ) -> dict:
    """Exhaustive O(N^2) confusion matrix — EstimateROC's fullEstimate
    mode (EstimateROC.java:886-913, triggered by --num-trials 0;
    metrics formulas :256-262):

    - pair in found and in truth -> tp; in found, not in truth ->
      alignment arbitration (computeDP) decides tp vs fp
    - pair not found, not truth -> tn
    - pair not found, in truth with overlap > min_ovl_len -> fn
      (small-overlap truth pairs count neither way, matching
      getOverlapSize(id, id2) > minOvlLen at :897; without
      ``truth_ovl`` every missed truth pair is an fn, and a pair
      ABSENT from a partial ``truth_ovl`` dict is conservatively an
      fn too — only an explicit small overlap excuses a miss)

    sensitivity = tp/(tp+fn), specificity = tn/(fp+tn),
    ppv = tp/(tp+fp). Set membership makes this O(N^2) only in the
    tn arithmetic (closed form), so the real cost is |found| +
    |truth| — exhaustive semantics without the exhaustive loop.
    """
    truth = _pair_set(truth_pairs)
    found = _pair_set(found_pairs)

    tp = fp = 0
    n_arbitrated = 0
    for pair in found:
        if pair in truth:
            tp += 1
        elif texts is not None:
            lo, hi = pair
            if lo in texts and hi in texts and arbitrate_pair(
                    texts[lo], texts[hi],
                    edges.get(pair) if edges else None,
                    min_identity, min_ovl_len):
                tp += 1
                n_arbitrated += 1
            else:
                fp += 1
        else:
            fp += 1

    missed = truth - found
    if truth_ovl is not None:
        fn = sum(1 for p in missed
                 if p not in truth_ovl or truth_ovl[p] > min_ovl_len)
    else:
        fn = len(missed)
    n = len(set(all_ids))
    total_pairs = n * (n - 1) // 2
    tn = total_pairs - len(found | truth)

    return {
        "sensitivity": round(tp / max(1, tp + fn), 4),
        "specificity": round(tn / max(1, fp + tn), 4),
        "ppv": round(tp / max(1, tp + fp), 4),
        "tp": tp, "fp": fp, "tn": tn, "fn": fn,
        "n_trials": 0,
        "n_truth": len(truth),
        "n_found": len(found),
        "n_arbitrated": n_arbitrated,
    }


def estimate_roc(truth_pairs: pa.Table, found_pairs: pa.Table,
                 all_ids: list[str], n_trials: int = 10_000,
                 seed: int = 42, texts: dict[str, str] | None = None,
                 edges: dict[tuple[str, str], tuple] | None = None,
                 min_identity: float = 0.65,
                 min_ovl_len: int = 16) -> dict:
    # --num-trials 0 selects the exhaustive mode, exactly like the
    # reference CLI (EstimateROC.java:230-234)
    if n_trials == 0:
        return full_estimate(truth_pairs, found_pairs, all_ids,
                             texts=texts, edges=edges,
                             min_identity=min_identity,
                             min_ovl_len=min_ovl_len)
    rng = np.random.default_rng(seed)
    truth = _pair_set(truth_pairs)
    found = _pair_set(found_pairs)

    # sensitivity: sample truth pairs, check membership in found
    tl = list(truth)
    if tl:
        idx = rng.integers(0, len(tl), size=min(n_trials, 10 * len(tl)))
        sens = float(np.mean([tl[i] in found for i in idx]))
    else:
        sens = 1.0

    # PPV: sample found pairs, check membership in truth; disputed
    # pairs go to alignment arbitration when texts are available
    fl = list(found)
    n_arbitrated = 0
    if fl:
        idx = rng.integers(0, len(fl), size=min(n_trials, 10 * len(fl)))
        hits = 0
        for i in idx:
            pair = fl[i]
            if pair in truth:
                hits += 1
            elif texts is not None:
                lo, hi = pair
                if lo in texts and hi in texts and arbitrate_pair(
                        texts[lo], texts[hi],
                        edges.get(pair) if edges else None,
                        min_identity, min_ovl_len):
                    hits += 1
                    n_arbitrated += 1
        ppv = hits / len(idx)
    else:
        ppv = 1.0

    # specificity: random id pairs not in truth must not be in found.
    # Attempts are BOUNDED: with <2 distinct ids, or when every cross
    # pair is in the truth set, the rejection branches would otherwise
    # spin forever
    ids = np.asarray(all_ids)
    hits = 0
    trials = 0
    attempts = 0
    max_attempts = 50 * n_trials
    while trials < n_trials and attempts < max_attempts and len(ids) >= 2:
        attempts += 1
        a, b = rng.integers(0, len(ids), size=2)
        if a == b:
            continue
        lo, hi = sorted((ids[a], ids[b]))
        if (lo, hi) in truth:
            continue
        trials += 1
        if (lo, hi) in found:
            hits += 1
    spec = 1.0 - hits / max(1, trials)

    return {
        "sensitivity": round(sens, 4),
        "ppv": round(ppv, 4),
        "specificity": round(spec, 4),
        "n_trials": n_trials,
        "n_truth": len(truth),
        "n_found": len(found),
        "n_arbitrated": n_arbitrated,
    }
