"""Fuzz the vectorized verify kernel against a direct line-by-line
transcription of the reference's recordMatchingKmers merge
(sketch/BottomOverlapSketch.java:397-516) — the one place the
vectorized path intentionally simplifies (in-run pointer walks when
the FIRST pair of an equal-hash run fails the shift gate).
"""

import numpy as np

from mhray import kernels as K


def _valid_windows(median, abs_max, len1, len2):
    v1l = max(0, -median - abs_max)
    v1u = min(len1, len2 - median + abs_max)
    v2l = max(0, median - abs_max)
    v2u = min(len2, len1 + median + abs_max)
    return v1l, v1u, v2l, v2u


def record_matching_kmers_java(h1, p1, h2, p2, median, abs_max, len1, len2):
    """Faithful transcription of the Java merge."""
    v1l, v1u, v2l, v2u = _valid_windows(median, abs_max, len1, len2)
    m1, m2 = [], []
    i1 = i2 = 0
    n1, n2 = len(h1), len(h2)
    while i1 < n1 and i2 < n2:
        hash1, pos1 = int(h1[i1]), int(p1[i1])
        hash2, pos2 = int(h2[i2]), int(p2[i2])
        if hash1 < hash2 or pos1 < v1l or pos1 >= v1u:
            i1 += 1
        elif hash2 < hash1 or pos2 < v2l or pos2 >= v2u:
            i2 += 1
        else:
            shift = pos2 - pos1
            diff = shift - median
            if diff > abs_max:
                i1 += 1
            elif diff < -abs_max:
                i2 += 1
            else:
                m1.append(pos1)
                m2.append(pos2)
                i1_last, i1_try = i1, i1 + 1
                while i1_try < n1 and int(h1[i1_try]) == hash1 \
                        and v1l <= int(p1[i1_try]) < v1u:
                    i1_last = i1_try
                    i1_try += 1
                i2_last, i2_try = i2, i2 + 1
                while i2_try < n2 and int(h2[i2_try]) == hash2 \
                        and v2l <= int(p2[i2_try]) < v2u:
                    i2_last = i2_try
                    i2_try += 1
                if i1_last != i1 or i2_last != i2:
                    m1.append(int(p1[i1_last]))
                    m2.append(int(p2[i2_last]))
                    i1, i2 = i1_last + 1, i2_last + 1
                else:
                    i1 += 1
                    i2 += 1
    return np.asarray(m1, np.int64), np.asarray(m2, np.int64)


def _random_sketch(rng, n_kmers, sketch_size, dup_rate=0.1):
    h = rng.integers(-(2**31), 2**31, size=n_kmers).astype(np.int32)
    ndup = int(n_kmers * dup_rate)
    if ndup:
        src = rng.integers(0, n_kmers, size=ndup)
        dst = rng.integers(0, n_kmers, size=ndup)
        h[dst] = h[src]
    return K.bottom_sketch(h, sketch_size) + (n_kmers,)


def test_merge_matches_java_on_random_sketches():
    rng = np.random.default_rng(12)
    agree = total = 0
    for trial in range(200):
        n1 = int(rng.integers(30, 200))
        n2 = int(rng.integers(30, 200))
        h1, p1, l1 = _random_sketch(rng, n1, 128)
        h2, p2, l2 = _random_sketch(rng, n2, 128)
        # make some shared content
        share = int(rng.integers(0, min(len(h1), len(h2)) // 2))
        if share:
            h2 = np.sort(np.concatenate([h1[:share], h2[share:]]))
        median, abs_max = 0, max(l1, l2) + 1
        jm1, jm2 = record_matching_kmers_java(h1, p1, h2, p2, median, abs_max, l1, l2)
        vm1, vm2 = K._record_matching_kmers(h1, p1, h2, p2, median, abs_max, l1, l2)
        total += 1
        if np.array_equal(np.sort(jm1), np.sort(vm1)) and \
           np.array_equal(np.sort(jm2), np.sort(vm2)):
            agree += 1
    # divergence only on pathological in-run tie patterns; must be rare
    assert agree / total >= 0.97, f"merge agreement {agree}/{total}"


def test_verify_scores_match_java_merge():
    """End-to-end score agreement using the Java merge inside the same
    downstream (optimize/edges/jaccard) pipeline."""
    rng = np.random.default_rng(21)
    diffs = []
    for trial in range(100):
        base = rng.integers(0, 26, size=int(rng.integers(60, 160)))
        edit = base.copy()
        nmut = int(len(edit) * 0.05)
        idx = rng.integers(0, len(edit), size=nmut)
        edit[idx] = rng.integers(0, 26, size=nmut)
        a = "".join(chr(97 + c) for c in base)
        b = "".join(chr(97 + c) for c in edit)
        h, off = K.shingle_hashes32([a, b], 8)
        s1 = K.bottom_sketch(h[off[0]:off[1]], 256)
        s2 = K.bottom_sketch(h[off[1]:off[2]], 256)
        l1, l2 = off[1] - off[0], off[2] - off[1]
        res = K.verify_pair(s1[0], s1[1], l1, s2[0], s2[1], l2, 8, 0.2)
        assert res is not None
        diffs.append(res.score)
    assert np.mean(diffs) > 0.8  # 5% edits at k=8 stay well above threshold
