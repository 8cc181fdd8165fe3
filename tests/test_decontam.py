"""Decontamination + repetition-stats operators: brute-force parity,
broadcast vs partition-path equality, degenerate inputs."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from mhray.stages.decontam import (_doc_distinct, decontaminate,
                                   word_shingle_keys)
from mhray.stages.text import repetition_stats


def _brute_shingles(text: str, n: int) -> set:
    toks = [w for w in text.split() if w]
    return {tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)}


CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "a completely different sentence with no overlap at all",
    "quick brown fox appears here too with extra words",
    "the quick brown cat sat still",
    "",
    "one",
    "two words",
]
BENCH = [
    "watch the quick brown fox run",
    "unrelated benchmark text entirely",
]


def test_word_shingle_keys_matches_brute():
    n = 3
    keys, didx = word_shingle_keys(CORPUS, n)
    for i, t in enumerate(CORPUS):
        got = len(np.unique(keys[didx == i]))
        want = len(_brute_shingles(t, n))
        assert got == want, (i, got, want)
    # cross-doc identity: same shingle string -> same key
    k1, _ = word_shingle_keys(["x quick brown fox y"], 3)
    k2, _ = word_shingle_keys(["quick brown fox"], 3)
    assert set(k2.tolist()) <= set(k1.tolist())


def _expected_hits(corpus, bench, n):
    bset = set()
    for t in bench:
        bset |= _brute_shingles(t, n)
    return [len(_brute_shingles(t, n) & bset) for t in corpus]


@pytest.mark.parametrize("threshold", [10**6, 0])
def test_decontaminate_both_paths(ray_session, threshold):
    n = 3
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(CORPUS)), pa.int64()),
        "text": pa.array(CORPUS, pa.string())}))
    bench = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(100, 100 + len(BENCH)), pa.int64()),
        "text": pa.array(BENCH, pa.string())}))
    out = decontaminate(docs, bench, n=n, broadcast_threshold=threshold,
                        num_parts=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = _expected_hits(CORPUS, BENCH, n)
    assert len(out) == len(CORPUS)
    assert out["n_hits"].tolist() == want
    assert out["contaminated"].tolist() == [int(h > 0) for h in want]


def test_decontaminate_empty_bench(ray_session):
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(CORPUS)), pa.int64()),
        "text": pa.array(CORPUS, pa.string())}))
    bench = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    out = decontaminate(docs, bench, n=2).to_pandas()
    assert len(out) == len(CORPUS)
    assert out["n_hits"].sum() == 0


def test_repetition_stats_brute():
    texts = [
        "a a a a",                      # one word repeated
        "a b a b a b",                  # top 2-gram 'a b' x3 of 5
        "x y z x y z x y z",            # heavy 3-gram repetition
        "all distinct words here now",
        "",
        "solo",
    ]
    batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
    out = repetition_stats(batch).to_pandas().set_index("doc_id")

    for i, t in enumerate(texts):
        toks = [w for w in t.split() if w]
        nw = len(toks)
        assert out.loc[i, "n_words"] == nw
        dup_word = 0.0 if nw == 0 else 1.0 - len(set(toks)) / nw
        assert out.loc[i, "dup_word_pm"] == int(np.floor(dup_word * 10000 + 0.5))
        g2 = [tuple(toks[j:j + 2]) for j in range(nw - 1)]
        top2 = 0.0 if not g2 else max(g2.count(g) for g in set(g2)) / len(g2)
        assert out.loc[i, "top2_pm"] == int(np.floor(top2 * 10000 + 0.5))
        g3 = [tuple(toks[j:j + 3]) for j in range(nw - 2)]
        dup3 = 0.0 if not g3 else sum(
            g3.count(g) for g in set(g3) if g3.count(g) > 1) / len(g3)
        assert out.loc[i, "dup3_pm"] == int(np.floor(dup3 * 10000 + 0.5))


def test_dedup_keep_best(ray_session):
    from mhray.stages.dedup import dedup_keep_best

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "text": pa.array(["aa", "aa", "bb", "aa", "cc", "cc"], pa.string()),
        "score": pa.array([1.0, 5.0, 2.0, 5.0, 3.0, 3.0], pa.float64()),
    })
    out = dedup_keep_best(ray.data.from_arrow(tbl), "score", num_parts=2) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # 'aa': max score 5.0 tie between ids 2 and 4 -> lowest id 2
    # 'bb': only id 3; 'cc': tie 5/6 -> 5
    assert out["doc_id"].tolist() == [2, 3, 5]
    assert out["group_size"].tolist() == [3, 1, 2]
    assert out["score"].tolist() == [5.0, 2.0, 3.0]


def test_top_terms_brute(ray_session):
    from collections import Counter

    from mhray.stages.text import top_terms

    texts = [
        "b b b a a c",
        "z z y a a a",
        "a a a a",
        "q r s t",
        "",
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    out = top_terms(ds, k=2, num_parts=2).to_pandas() \
        .sort_values(["doc_id", "rank"]).reset_index(drop=True)

    df_global = Counter()
    tfs = []
    for t in texts:
        c = Counter(t.split())
        tfs.append(c)
        df_global.update(c.keys())
    expect = []
    for i, c in enumerate(tfs):
        ranked = sorted(c, key=lambda w: (-c[w], df_global[w], w))[:2]
        expect += [(i, w, r + 1) for r, w in enumerate(ranked)]
    got = list(out.itertuples(index=False, name=None))
    assert got == expect


def test_doc_distinct():
    keys = np.array([5, 5, 3, 3, 5], np.int64)
    didx = np.array([0, 0, 0, 1, 1], np.int64)
    k, d = _doc_distinct(keys, didx)
    assert sorted(zip(d.tolist(), k.tolist())) == [(0, 3), (0, 5), (1, 3), (1, 5)]
