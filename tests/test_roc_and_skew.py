"""EstimateROC-analog harness + skew stress (hot boilerplate caption)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mhray.config import PRESETS
from mhray.roc import estimate_roc


def test_roc_harness_perfect_detector(small_corpus):
    truth = pq.read_table(small_corpus["truth_pairs"])
    images = pq.read_table(small_corpus["images"])
    ids = images.column("image_id").to_pylist()
    r = estimate_roc(truth, truth, ids, n_trials=2000)
    assert r["sensitivity"] == 1.0
    assert r["ppv"] == 1.0
    assert r["specificity"] == 1.0


def test_roc_harness_detects_misses(small_corpus):
    truth = pq.read_table(small_corpus["truth_pairs"])
    half = truth.slice(0, truth.num_rows // 2)
    images = pq.read_table(small_corpus["images"])
    ids = images.column("image_id").to_pylist()
    r = estimate_roc(truth, half, ids, n_trials=2000)
    assert 0.3 < r["sensitivity"] < 0.7
    assert r["ppv"] == 1.0


@pytest.fixture(scope="module")
def skew_corpus(tmp_path_factory):
    """20% of rows share ONE boilerplate caption (distinct images)."""
    from mhray.synth import SynthSpec, write_corpus

    out = tmp_path_factory.mktemp("skew")
    spec = SynthSpec(n_rows=2000, boilerplate_fraction=0.2,
                     dup_fraction=0.2, seed=555)
    return write_corpus(str(out), spec, n_files=4)


def test_skew_boilerplate_does_not_explode(skew_corpus, ray_session,
                                           tmp_path_factory):
    """A hot caption shared by 400 non-dup rows must neither blow up the
    LSH shuffle (rep collapsing) nor leak false-positive pairs (pHash
    gate), and recall on true dups must hold."""
    import time

    from mhray import oracle as O
    from mhray.pipelines.dedup import pairs_with_ids, run_dedup

    out = str(tmp_path_factory.mktemp("skewrun"))
    cfg = PRESETS["captions"]
    t0 = time.time()
    res = run_dedup(skew_corpus["images"], out, cfg, num_parts=4)
    pairs = pairs_with_ids(res, 4).take_all()
    elapsed = time.time() - t0
    assert elapsed < 120, f"skew run took {elapsed:.0f}s"

    truth = pq.read_table(skew_corpus["truth_pairs"])
    got = pa.table({
        "lo_id": [p["lo_id"] for p in pairs],
        "hi_id": [p["hi_id"] for p in pairs],
    })
    assert O.recall_against(truth, got) >= 0.99
    # no boilerplate explosion: found pairs bounded by ~truth size
    assert len(pairs) <= truth.num_rows * 1.2 + 10

    # precision: boilerplate rows must not pair with each other
    images = pq.read_table(skew_corpus["images"])
    caps = images.column("caption").to_pylist()
    ids = images.column("image_id").to_pylist()
    from collections import Counter

    hot_caption = Counter(caps).most_common(1)[0][0]
    hot_ids = {i for i, c in zip(ids, caps) if c == hot_caption}
    boiler_pairs = [p for p in pairs
                    if p["lo_id"] in hot_ids and p["hi_id"] in hot_ids]
    assert not boiler_pairs, boiler_pairs[:5]


def test_levenshtein_matches_bruteforce():
    import random

    from mhray.roc import _levenshtein

    def brute(a, b):
        m, n = len(a), len(b)
        d = [[0] * (n + 1) for _ in range(m + 1)]
        for i in range(m + 1):
            d[i][0] = i
        for j in range(n + 1):
            d[0][j] = j
        for i in range(1, m + 1):
            for j in range(1, n + 1):
                d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                              d[i - 1][j - 1] + (a[i - 1] != b[j - 1]))
        return d[m][n]

    rng = random.Random(9)
    for _ in range(100):
        a = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 30)))
        b = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 30)))
        assert _levenshtein(a, b) == brute(a, b), (a, b)


def test_ppv_alignment_arbitration():
    """computeDP semantics (EstimateROC.java:746-798 + :871): a found
    pair absent from the fuzzy truth but genuinely near-identical is
    arbitrated TRUE by alignment; a junk pair stays false."""
    base = "the quick brown fox jumps over the lazy dog " * 3
    near = base.replace("quick", "quik")  # ~1% edits
    junk = "completely unrelated text about something else entirely ok"

    texts = {"a": base, "b": near, "c": junk, "d": base}
    truth = pa.table({"lo_id": ["a"], "hi_id": ["d"]})
    found = pa.table({"lo_id": ["a", "a", "a"],
                      "hi_id": ["d", "b", "c"]})

    no_arb = estimate_roc(truth, found, list(texts), n_trials=3000)
    arb = estimate_roc(truth, found, list(texts), n_trials=3000,
                       texts=texts)
    # (a,b) flips to TP under arbitration; (a,c) must not
    assert arb["ppv"] > no_arb["ppv"]
    assert arb["n_arbitrated"] > 0
    assert arb["ppv"] < 1.0  # the junk pair stays a false positive


def test_gotoh_affine_alignment():
    """Affine-gap Gotoh (align/* + EstimateROC:772 analog): score
    parity vs a scalar DP transcription and known identities."""
    import random

    from mhray.align import gotoh_align, gotoh_identity
    from mhray.roc import arbitrate_pair

    def brute_score(a, b, match=2, mismatch=-2, o=2, e=1):
        NEG = -10**9
        n, m = len(a), len(b)
        M = [[NEG] * (m + 1) for _ in range(n + 1)]
        Ix = [[NEG] * (m + 1) for _ in range(n + 1)]
        Iy = [[NEG] * (m + 1) for _ in range(n + 1)]
        M[0][0] = 0
        for j in range(1, m + 1):
            Iy[0][j] = -o - e * (j - 1)
        for i in range(1, n + 1):
            Ix[i][0] = -o - e * (i - 1)
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                s = match if a[i - 1] == b[j - 1] else mismatch
                M[i][j] = max(M[i - 1][j - 1], Ix[i - 1][j - 1],
                              Iy[i - 1][j - 1]) + s
                Ix[i][j] = max(M[i - 1][j] - o, Ix[i - 1][j] - e)
                Iy[i][j] = max(M[i][j - 1] - o, Iy[i][j - 1] - e)
        return max(M[n][m], Ix[n][m], Iy[n][m])

    rng = random.Random(5)
    for _ in range(150):
        a = "".join(rng.choice("abcd") for _ in range(rng.randint(1, 25)))
        b = "".join(rng.choice("abcd") for _ in range(rng.randint(1, 25)))
        assert gotoh_align(a, b)[0] == brute_score(a, b), (a, b)

    # substitution: 5 matches over a 6-long alignment
    _, matches, length = gotoh_align("abcdef", "abXdef")
    assert (matches, length) == (5, 6)
    # single insertion: 6 matches over a 7-long alignment
    _, matches, length = gotoh_align("abcdef", "abcZdef")
    assert (matches, length) == (6, 7)
    assert gotoh_identity("same text", "same text") == 1.0

    base = "the quick brown fox jumps over the lazy dog " * 2
    near = base.replace("jumps", "jmps")
    assert arbitrate_pair(base, near, None, 0.65, 16, method="gotoh")
    assert not arbitrate_pair(base, "zzz " * 22, None, 0.65, 16,
                              method="gotoh")


def test_interval_truth_and_range_overlap():
    """F9 range math (Utils.getRangeOverlap :307-318) + J4 interval
    lookup (EstimateROC per-chromosome IntervalTree truth,
    :347-372)."""
    from mhray.roc import range_overlap, truth_from_intervals

    # inclusive-range semantics, order-insensitive endpoints
    assert range_overlap(0, 10, 5, 20) == 6
    assert range_overlap(10, 0, 20, 5) == 6
    assert range_overlap(0, 4, 5, 9) == 0
    assert range_overlap(0, 4, 4, 9) == 1
    assert np.array_equal(
        range_overlap(np.array([0, 0]), np.array([10, 4]),
                      np.array([5, 5]), np.array([20, 9])),
        np.array([6, 0]))

    ids = ["r1", "r2", "r3", "r4", "r5"]
    source = ["chrA", "chrA", "chrA", "chrB", "chrB"]
    start = np.array([0, 50, 200, 0, 90])
    end = np.array([100, 150, 300, 100, 120])
    t = truth_from_intervals(ids, source, start, end, min_ovl=20)
    got = set(zip(t.column("lo_id").to_pylist(),
                  t.column("hi_id").to_pylist()))
    # r1-r2 overlap 51 on chrA; r4-r5 overlap 11 < 20 on chrB;
    # r3 overlaps nothing; cross-source never pairs
    assert got == {("r1", "r2")}, got
    t2 = truth_from_intervals(ids, source, start, end, min_ovl=5)
    got2 = set(zip(t2.column("lo_id").to_pylist(),
                   t2.column("hi_id").to_pylist()))
    assert got2 == {("r1", "r2"), ("r4", "r5")}, got2

    # brute-force cross-check on random intervals
    rng = np.random.default_rng(11)
    n = 60
    ids = [f"s{i:02d}" for i in range(n)]
    source = [rng.choice(["a", "b"]) for _ in range(n)]
    start = rng.integers(0, 500, n)
    end = start + rng.integers(1, 200, n)
    for mo in (1, 30):
        t = truth_from_intervals(ids, source, start, end, min_ovl=mo)
        got = set(zip(t.column("lo_id").to_pylist(),
                      t.column("hi_id").to_pylist()))
        exp = set()
        for i in range(n):
            for j in range(i + 1, n):
                if source[i] == source[j] and \
                        min(end[i], end[j]) - max(start[i], start[j]) + 1 >= mo:
                    exp.add(tuple(sorted((ids[i], ids[j]))))
        assert got == exp, mo


def test_full_estimate_exact_confusion_matrix():
    """fullEstimate mode (EstimateROC.java:886-913): exhaustive
    tp/fp/tn/fn over all C(N,2) pairs, hand-computed expectations."""
    import pyarrow as pa

    from mhray.roc import estimate_roc, full_estimate

    ids = ["a", "b", "c", "d", "e"]          # 10 possible pairs
    truth = pa.table({"lo_id": ["a", "a", "b"],
                      "hi_id": ["b", "c", "c"]})
    # found: (a,b) tp; (a,d) fp (arbitration fails: different texts);
    # (b,e) arbitrated tp (identical texts); misses (a,c),(b,c) -> fn
    found = pa.table({"lo_id": ["a", "a", "b"],
                      "hi_id": ["b", "d", "e"]})
    texts = {"a": "the quick brown fox jumps over the lazy dog",
             "d": "completely unrelated content here that differs",
             "b": "shared identical caption body for this pair!",
             "e": "shared identical caption body for this pair!"}
    r = full_estimate(truth, found, ids, texts=texts, min_ovl_len=16)
    assert (r["tp"], r["fp"], r["fn"]) == (2, 1, 2)
    # tn = 10 - |found ∪ truth| = 10 - 5 = 5
    assert r["tn"] == 5
    assert r["sensitivity"] == round(2 / 4, 4)
    assert r["specificity"] == round(5 / 6, 4)
    assert r["ppv"] == round(2 / 3, 4)
    assert r["n_arbitrated"] == 1

    # n_trials=0 routes estimate_roc to the exhaustive mode (the
    # reference CLI convention)
    r2 = estimate_roc(truth, found, ids, n_trials=0, texts=texts)
    assert r2 == r

    # truth overlap sizes gate fn exactly like getOverlapSize > minOvl
    r3 = full_estimate(truth, found, ids, texts=texts,
                       truth_ovl={("a", "c"): 10, ("b", "c"): 40},
                       min_ovl_len=16)
    assert r3["fn"] == 1 and r3["sensitivity"] == round(2 / 3, 4)

    # a missed pair ABSENT from a partial truth_ovl dict must count as
    # fn (conservative) — only an explicit small overlap excuses a miss
    r4 = full_estimate(truth, found, ids, texts=texts,
                       truth_ovl={("a", "c"): 10}, min_ovl_len=16)
    assert r4["fn"] == 1          # (b,c) missing from dict -> still fn
    r5 = full_estimate(truth, found, ids, texts=texts,
                       truth_ovl={}, min_ovl_len=16)
    assert r5["fn"] == 2          # empty dict == no excusals at all
