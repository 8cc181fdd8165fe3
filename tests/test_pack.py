"""Sequence packing: kernel brute-force parity + distributed invariants."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import ray.data

from mhray.stages.pack import pack_next_fit, pack_sequences


def brute_next_fit(tokens, budget):
    seq, off, trunc = [], [], []
    s, used = 0, 0
    started = False
    for t in tokens:
        eff = min(t, budget)
        if started and used + eff > budget:
            s += 1
            used = 0
        off.append(used)
        seq.append(s)
        trunc.append(int(t > budget))
        used += eff
        started = True
    return seq, off, trunc


@given(st.lists(st.integers(min_value=0, max_value=40), max_size=60),
       st.integers(min_value=1, max_value=50))
@settings(max_examples=200, deadline=None)
def test_pack_next_fit_matches_brute(tokens, budget):
    seq, off, trunc = pack_next_fit(np.array(tokens, np.int64), budget)
    bs, bo, bt = brute_next_fit(tokens, budget)
    assert seq.tolist() == bs
    assert off.tolist() == bo
    assert trunc.tolist() == bt


def test_pack_next_fit_oversized_alone():
    seq, off, trunc = pack_next_fit(np.array([3, 100, 2], np.int64), 10)
    assert seq.tolist() == [0, 1, 2]  # oversized doc gets its own sequence
    assert trunc.tolist() == [0, 1, 0]
    assert off.tolist() == [0, 0, 0]


def test_pack_sequences_invariants(ray_session):
    rng = np.random.default_rng(5)
    n = 400
    texts = [" ".join(["w"] * int(k)) for k in rng.integers(0, 60, n)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    budget = 100
    out = pack_sequences(ds, budget, num_parts=4).to_pandas()
    # every doc exactly once
    assert sorted(out["doc_id"]) == list(range(n))
    # per-sequence: clipped token sums within budget, offsets consistent
    for _, g in out.groupby("seq_id"):
        g = g.sort_values("offset")
        eff = np.minimum(g["n_tokens"].to_numpy(), budget)
        assert eff.sum() <= budget
        assert g["offset"].tolist() == np.concatenate(
            [[0], np.cumsum(eff)[:-1]]).tolist()
    # deterministic across runs
    out2 = pack_sequences(ds, budget, num_parts=4).to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_pack_oracle_parity_above_2000_docs(ray_session):
    """The d_pack_sequences SQL oracle derives its partition count from
    the table itself (GREATEST(2, count // 2000 + 1)); at sf0.1 that is
    3 partitions, not the 2 the small SFs use — both sides must agree
    at any scale factor (regression: the oracle once hardcoded % 2)."""
    import duckdb

    from mhray.pipelines.queries import ORACLE_SQL, QUERIES, _pack_parts

    sf_dir = "/root/testdata/sf0.1"
    assert _pack_parts(sf_dir) == 3
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')")
    ray_df = QUERIES["d_pack_sequences"](sf_dir).to_pandas()
    sql_df = con.sql(ORACLE_SQL["d_pack_sequences"]).df()
    assert set(ray_df["seq_id"] // (1 << 40)) == {0, 1, 2}
    a = ray_df[sorted(ray_df.columns)].sort_values(
        by=sorted(ray_df.columns)).reset_index(drop=True)
    b = sql_df[sorted(sql_df.columns)].sort_values(
        by=sorted(sql_df.columns)).reset_index(drop=True)
    assert a.columns.tolist() == b.columns.tolist()
    assert len(a) == len(b) == 5000
    for col in a.columns:
        assert (a[col].to_numpy() == b[col].to_numpy()).all(), col
