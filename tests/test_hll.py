"""HyperLogLog: error bounds vs exact cardinality, merge semantics,
and the distributed operator against DuckDB's exact count."""

import numpy as np
import pytest

from mhray.stages.freqjob import HyperLogLog

# 3-sigma bound for p=14: 3 * 1.04 / sqrt(2^14) ~ 2.4%
TOL = 0.025


@pytest.mark.parametrize("n", [100, 5_000, 300_000])
def test_hll_error_bound(n):
    rng = np.random.default_rng(n)
    keys = rng.integers(-2 ** 62, 2 ** 62, n * 2).astype(np.int64)
    keys = np.unique(keys)[:n]
    h = HyperLogLog(14)
    h.add(keys)
    est = h.estimate()
    assert abs(est - len(keys)) / len(keys) < TOL, (est, len(keys))


def test_hll_duplicates_do_not_inflate():
    keys = np.arange(1000, dtype=np.int64)
    h = HyperLogLog(14)
    for _ in range(5):
        h.add(keys)  # re-adding the same keys is idempotent
    assert abs(h.estimate() - 1000) / 1000 < TOL


def test_hll_merge_equals_single_shot():
    rng = np.random.default_rng(9)
    keys = rng.integers(-2 ** 62, 2 ** 62, 50_000).astype(np.int64)
    whole = HyperLogLog(12)
    whole.add(keys)
    a = HyperLogLog(12)
    a.add(keys[:20_000])
    b = HyperLogLog(12)
    b.add(keys[15_000:])  # overlapping halves
    merged = a.merge(b)
    assert (merged.reg == whole.reg).all()
    assert merged.estimate() == whole.estimate()


def test_hll_distinct_vs_exact(ray_session):
    import duckdb

    from mhray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    est = QUERIES["q_approx_distinct"](sf)["approx_distinct_parts"][0].as_py()
    exact = duckdb.sql(
        f"SELECT COUNT(DISTINCT l_partkey) FROM "
        f"read_parquet('{sf}/lineitem.parquet')").fetchone()[0]
    assert abs(est - exact) / exact < TOL, (est, exact)


def test_approx_percentiles_error_bound(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from mhray.stages.freqjob import approx_percentiles

    rng = np.random.default_rng(11)
    # skewed lognormal: rank-based summaries must still land close
    vals = rng.lognormal(mean=3.0, sigma=1.2, size=40_000)
    ds = ray.data.from_arrow(pa.table({"x": pa.array(vals, pa.float64())}))
    ds = ds.repartition(16)
    got = approx_percentiles(ds, "x", qs=(0.1, 0.5, 0.9),
                             samples_per_block=256)
    for q in (0.1, 0.5, 0.9):
        exact_rank = np.searchsorted(np.sort(vals), got[q]) / len(vals)
        # two compression levels at 256 points each -> rank error well
        # under 2/256; assert a 3x safety margin
        assert abs(exact_rank - q) < 3 * 2 / 256, (q, exact_rank)


def test_approx_percentiles_empty_and_exact_small(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from mhray.stages.freqjob import approx_percentiles

    e = ray.data.from_arrow(pa.table({"x": pa.array([], pa.float64())}))
    out = approx_percentiles(e, "x", qs=(0.5,))
    assert np.isnan(out[0.5])
    # fewer values than samples_per_block: summaries are lossless, the
    # returned quantile is an actual data value at the right rank
    small = ray.data.from_arrow(pa.table({
        "x": pa.array(np.arange(100, dtype=np.float64))}))
    out = approx_percentiles(small, "x", qs=(0.5,), samples_per_block=256)
    assert abs(out[0.5] - 50.0) <= 1.0


def test_sample_percentiles_layout_independent(ray_session):
    """The bottom-k-by-hash sample depends only on per-row keys, so
    the result must be BIT-identical across block layouts, partition
    counts, and duplicate-key tie orders — the property that makes
    q_sample_percentiles oracle-comparable where the equi-depth
    summary is not."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from mhray.stages.freqjob import sample_percentiles

    rng = np.random.default_rng(7)
    vals = rng.lognormal(mean=2.0, sigma=1.0, size=20_000)
    # duplicate keys on purpose (each key twice, arbitrary values):
    # boundary ties must not change the sampled value multiset
    keys = np.concatenate([np.arange(10_000)] * 2).astype(np.int64)
    t = pa.table({"x": pa.array(vals, pa.float64()),
                  "k": pa.array(keys, pa.int64())})
    outs = []
    for parts, nparts in ((2, 3), (16, 8), (64, 5)):
        ds = ray.data.from_arrow(t).repartition(parts)
        outs.append(sample_percentiles(ds, "x", "k",
                                       qs=(0.1, 0.5, 0.9), k=1024,
                                       num_parts=nparts))
    assert outs[0] == outs[1] == outs[2]
    # rank error within the uniform-sampling bound (~1/sqrt(k)),
    # 4x safety margin
    sv = np.sort(vals)
    for q in (0.1, 0.5, 0.9):
        rank = np.searchsorted(sv, outs[0][q]) / len(vals)
        assert abs(rank - q) < 4 / np.sqrt(1024), (q, rank)


def test_sample_percentiles_small_and_empty(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from mhray.stages.freqjob import sample_percentiles

    e = ray.data.from_arrow(pa.table({"x": pa.array([], pa.float64()),
                                      "k": pa.array([], pa.int64())}))
    out = sample_percentiles(e, "x", "k", qs=(0.5,))
    assert np.isnan(out[0.5])
    # corpus smaller than k: the sample is the whole corpus and the
    # percentile is exact (ceil(q*n)-th smallest)
    small = ray.data.from_arrow(pa.table({
        "x": pa.array(np.arange(100, dtype=np.float64)),
        "k": pa.array(np.arange(100), pa.int64())}))
    out = sample_percentiles(small, "x", "k", qs=(0.5,), k=4096)
    assert out[0.5] == 49.0  # ceil(0.5*100)=50 -> 50th smallest = 49.0


def test_bloom_no_false_negatives_and_bounded_fpr(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from mhray.stages.freqjob import bloom_build, bloom_filter_new

    rng = np.random.default_rng(31)
    seen_keys = rng.choice(10**9, size=20_000, replace=False)
    corpus = ray.data.from_arrow(pa.table({
        "k": pa.array(seen_keys, pa.int64())})).repartition(8)
    bloom = bloom_build(corpus, "k", n_bits=1 << 20, k=5)

    # no false negatives: every seen key hits
    assert bloom.contains(seen_keys).all()

    # new batch: half seen, half new
    new_keys = rng.choice(10**9, size=10_000, replace=False) + 10**9
    batch = ray.data.from_arrow(pa.table({
        "k": pa.array(np.concatenate([seen_keys[:5000], new_keys]),
                      pa.int64())}))
    out = np.array([r["k"] for r in
                    bloom_filter_new(batch, bloom, "k").take_all()])
    # every surviving key is genuinely new
    assert np.isin(out, new_keys).all()
    # false-positive loss is small: m/n = 52 bits/key -> fpr << 1%
    assert len(out) >= 0.99 * len(new_keys)
