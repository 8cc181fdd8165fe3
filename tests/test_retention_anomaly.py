"""Unit semantics for the session's new operators: cohort retention,
z-score outliers, shingle containment, and weighted sampling — brute-
force replicas on handcrafted inputs plus degenerate-input coverage.
(Oracle parity at sf0.001 is covered by test_queries.py.)"""

import numpy as np
import pyarrow as pa


US_DAY = 86_400_000_000


def _ev(user, day):
    return {"user_id": user, "ts": day * US_DAY + 1234}


def test_cohort_retention_handcrafted(ray_session):
    import ray.data

    from mhray.stages.events import cohort_retention

    # user 1: days 0,1,3 (two events day 0 -> still one day-0 row)
    # user 2: days 0,1    user 3: day 3 only (its own cohort)
    rows = [_ev(1, 0), _ev(1, 0), _ev(1, 1), _ev(1, 3),
            _ev(2, 0), _ev(2, 1), _ev(3, 3)]
    tbl = pa.table({
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "ts": pa.array([r["ts"] for r in rows],
                       pa.timestamp("us")),
    })
    out = cohort_retention(ray.data.from_arrow(tbl), "user_id", "ts") \
        .to_pandas()
    got = sorted(map(tuple, out.to_numpy()))
    assert got == [(0, 0, 2), (0, 1, 2), (0, 3, 1), (3, 0, 1)]


def test_cohort_retention_batch_split_dedup(ray_session):
    """The same (user, day) arriving in different blocks must still
    count once — per-partition re-dedup after the batch-local one."""
    import ray.data

    from mhray.stages.events import cohort_retention

    a = pa.table({"user_id": pa.array([7], pa.int64()),
                  "ts": pa.array([5 * US_DAY], pa.timestamp("us"))})
    b = pa.table({"user_id": pa.array([7], pa.int64()),
                  "ts": pa.array([5 * US_DAY + 42], pa.timestamp("us"))})
    ds = ray.data.from_arrow(a).union(ray.data.from_arrow(b))
    out = cohort_retention(ds, "user_id", "ts").to_pandas()
    assert sorted(map(tuple, out.to_numpy())) == [(5, 0, 1)]


def test_zscore_outliers_bruteforce(ray_session):
    import ray.data

    from mhray.stages.events import zscore_outliers

    rng = np.random.default_rng(3)
    key = rng.integers(0, 5, size=400)
    val = rng.normal(size=400)
    val[7] = 50.0  # guaranteed outlier in its key
    ids = np.arange(400)
    tbl = pa.table({"user_id": pa.array(key, pa.int64()),
                    "event_id": pa.array(ids, pa.int64()),
                    "value": pa.array(val, pa.float64())})
    out = zscore_outliers(ray.data.from_arrow(tbl), "user_id", "value",
                          "event_id", z=3.0).to_pandas()
    expect = {}
    for k in np.unique(key):
        m = key == k
        mu, sd = val[m].mean(), val[m].std()
        if sd > 0:
            zv = (val[m] - mu) / sd
            for i, z in zip(ids[m][np.abs(zv) >= 3.0], zv[np.abs(zv) >= 3.0]):
                expect[int(i)] = z
    got = dict(zip(out["event_id"], out["z"]))
    assert set(got) == set(expect) and 7 in got
    for i in got:
        np.testing.assert_allclose(got[i], expect[i], rtol=1e-12)


def test_zscore_outliers_constant_key_emits_nothing(ray_session):
    import ray.data

    from mhray.stages.events import zscore_outliers

    tbl = pa.table({"user_id": pa.array([1, 1, 1], pa.int64()),
                    "event_id": pa.array([1, 2, 3], pa.int64()),
                    "value": pa.array([5.0, 5.0, 5.0], pa.float64())})
    out = zscore_outliers(ray.data.from_arrow(tbl), "user_id", "value",
                          "event_id").to_pandas()
    assert len(out) == 0


def test_shingle_containment_short_doc_in_long(ray_session):
    """The op's reason to exist: a short doc fully embedded in a long
    one scores containment 1.0 even though Jaccard is far below tau."""
    import ray.data

    from mhray.stages.dedup import shingle_containment_pairs

    short = "alpha beta gamma delta epsilon"
    long = ("prefix words here " + short + " and a very long tail "
            "of completely unrelated filler content words " * 3)
    tbl = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                    "text": pa.array([short, long, "nothing shared zzz"])})
    out = shingle_containment_pairs(
        ray.data.from_arrow(tbl), tau_bp=9000, shingle_words=4).to_pandas()
    got = sorted(map(tuple, out[["lo_id", "hi_id", "cont_bp"]].to_numpy()))
    assert got == [(1, 2, 10000)]


def test_shingle_containment_degenerate(ray_session):
    import ray.data

    from mhray.stages.dedup import shingle_containment_pairs

    # empty text, sub-shingle-length doc, no shared shingles -> empty
    tbl = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                    "text": pa.array(["", "a b c", "x y z w v u"])})
    out = shingle_containment_pairs(
        ray.data.from_arrow(tbl), tau_bp=5000, shingle_words=4).to_pandas()
    assert len(out) == 0


def test_weighted_sample_favors_heavy_weights(ray_session):
    """Statistical property of the A-ES keys themselves: among 1000
    rows where 100 carry 50x weight, the top-50 keys must be mostly
    heavy rows (an unweighted sample would pick ~5). Then the catalog
    query sanity: 50 unique selections."""
    from mhray.kernels import weighted_sample_keys

    keys = np.arange(1000, dtype=np.int64)
    w = np.ones(1000)
    heavy = keys % 10 == 0  # 100 heavy rows
    w[heavy] = 50.0
    top = np.argsort(-weighted_sample_keys(keys, w))[:50]
    assert heavy[top].sum() >= 35  # overwhelmingly heavy, not ~5
    # and inverting the weights must flip the preference
    top_inv = np.argsort(-weighted_sample_keys(keys, 1.0 / w))[:50]
    assert heavy[top_inv].sum() <= 5

    sf = "/root/testdata/sf0.001"
    from mhray.pipelines.queries import q_weighted_sample

    out = q_weighted_sample(sf).to_pandas()
    assert len(out) == 50 and out["o_orderkey"].is_unique


def test_shingle_containment_vs_bruteforce_random_corpus(ray_session):
    """Exactness on a seeded random corpus with planted containments:
    the distributed full-inverted-index pipeline must equal the
    Python set-arithmetic brute force pair-for-pair, including cont_bp."""
    import ray.data

    from mhray.stages.dedup import shingle_containment_pairs

    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(4, 40)))
             for _ in range(50)]
    # planted: slices of existing docs (pure containment), with and
    # without extra tails
    texts.append(" ".join(texts[0].split(" ")[2:12]))
    texts.append(texts[3] + " " + " ".join(rng.choice(vocab, size=6)))
    ids = list(range(len(texts)))
    k, tau_bp = 4, 7000

    def shingles(t):
        toks = t.split(" ")
        return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}

    sets = [shingles(t) for t in texts]
    expect = {}
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            if not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            mn = min(len(sets[a]), len(sets[b]))
            if inter * 10000 >= tau_bp * mn:
                expect[(a, b)] = int(np.sign(inter * 10000.0 / mn)
                                     * np.floor(abs(inter * 10000.0 / mn)
                                                + 0.5))

    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts)})
    out = shingle_containment_pairs(
        ray.data.from_arrow(tbl).repartition(4), tau_bp=tau_bp,
        shingle_words=k).to_pandas()
    got = {(int(r.lo_id), int(r.hi_id)): int(r.cont_bp)
           for r in out.itertuples()}
    assert got == expect and expect  # non-vacuous: planted pairs exist


def test_ngram_novelty_semantics(ray_session):
    """A verbatim re-post scores 0; the original keeps 10000; a doc
    splicing half-old half-new text lands in between, exactly."""
    import ray.data

    from mhray.stages.dedup import ngram_novelty

    orig = "a b c d e f g h"          # 5 distinct 4-shingles
    new_tail = "p q r s t u v w"
    spliced = "a b c d " + new_tail    # shares shingle 'a b c d' only
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([orig, orig, spliced, "x y"]),  # 4: too short
    })
    out = ngram_novelty(ray.data.from_arrow(tbl).repartition(2),
                        shingle_words=4).to_pandas()
    got = {int(r.doc_id): (int(r.n_shingles), int(r.novel_bp))
           for r in out.itertuples()}
    assert got[1] == (5, 10000)
    assert got[2] == (5, 0)
    # spliced: 9 shingles, 'a b c d' owned by doc 1 -> 8/9 novel
    assert got[3] == (9, 8889)
    assert 4 not in got


def test_semi_anti_join_ids_shuffle_fallback(ray_session):
    """broadcast_threshold_rows=0 forces the tagged-union hash-
    partition merge; results must equal the broadcast path."""
    import ray.data

    from mhray.rayutil import anti_join_ids, semi_join_ids

    left = pa.table({"k": pa.array([1, 2, 3, 4, 5], pa.int64()),
                     "v": pa.array(list("abcde"))})
    ids = pa.table({"i": pa.array([2, 4, 9], pa.int64())})
    lds = ray.data.from_arrow(left).repartition(3)
    ids_ds = ray.data.from_arrow(ids).repartition(2)
    schema = pa.schema([("k", pa.int64()), ("v", pa.string())])

    for thresh in (0, 1000):
        semi = semi_join_ids(lds, ids_ds, "k", "i", ds_schema=schema,
                             broadcast_threshold_rows=thresh).to_pandas()
        anti = anti_join_ids(lds, ids_ds, "k", "i", ds_schema=schema,
                             broadcast_threshold_rows=thresh).to_pandas()
        assert sorted(semi["k"]) == [2, 4], thresh
        assert sorted(anti["k"]) == [1, 3, 5], thresh
        assert sorted(semi["v"]) == ["b", "d"], thresh

    # empty id side: semi keeps nothing, anti keeps everything
    empty = ray.data.from_arrow(pa.table({"i": pa.array([], pa.int64())}))
    assert semi_join_ids(lds, empty, "k", "i",
                         ds_schema=schema).count() == 0
    assert anti_join_ids(lds, empty, "k", "i",
                         ds_schema=schema).count() == 5


def test_write_documents_roundtrip(ray_session, tmp_path):
    """write_documents -> read_documents round-trips each format and
    writes one file per block (resumable layout, never a giant file)."""
    import os

    import ray.data

    from mhray.io import read_documents, write_documents

    tbl = pa.table({
        "doc_id": pa.array([3, 1, 2], pa.int64()),
        "text": pa.array(["gamma text here", "alpha", "beta beta"]),
    })
    src = ray.data.from_arrow(tbl).repartition(2)
    for fmt, name in (("parquet", "p"), ("jsonl", "j.jsonl"),
                      ("csv", "c.csv")):
        out = str(tmp_path / name)
        write_documents(src, out, fmt=fmt)
        assert len(os.listdir(out)) >= 2  # one file per block
        back = read_documents(out, fmt=fmt).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert list(back["doc_id"]) == [1, 2, 3]
        assert list(back["text"]) == ["alpha", "beta beta",
                                      "gamma text here"]


def test_compression_ratio_ordering(ray_session):
    """Repeated boilerplate compresses far below prose; random bytes
    barely compress — the tails the signal exists to catch."""
    import ray.data

    from mhray.stages.text import compression_ratio

    rng = np.random.default_rng(4)
    prose = ("the quick brown fox jumps over the lazy dog and then "
             "considers several rather different topics entirely " * 4)
    boiler = "click here to subscribe now " * 40
    noise = "".join(chr(rng.integers(0x21, 0x7F)) for _ in range(1000))
    tbl = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                    "text": pa.array([prose, boiler, noise, ""])})
    out = ray.data.from_arrow(tbl).map_batches(
        compression_ratio, batch_format="pyarrow").to_pandas() \
        .set_index("doc_id")["compress_bp"]
    assert out[2] < out[1] < out[3]
    assert out[4] == 0  # empty doc sentinel
    # random PRINTABLE chars carry ~6.5 bits/char -> ratio ~0.82+
    assert out[3] > 8000
    assert out[2] < 2000  # boilerplate collapses
