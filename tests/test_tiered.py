"""Tiered dedup cascade: per-tier parity against sequentially-applied
single-tier operators, full-disposition invariants, and the
anti_join_ids helper's broadcast/shuffle path equivalence."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _docs_ds():
    import ray.data

    return ray.data.read_parquet(f"{SF_DIR}/documents.parquet",
                                 columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def tiered(ray_session):
    from mhray.stages.dedup import tiered_dedup

    res = tiered_dedup(_docs_ds())
    return {
        "survivors": res["survivors"].to_pandas(),
        "removed": res["removed"].to_pandas(),
        "stats": res["stats"].to_pandas(),
    }


def test_disposition_partitions_corpus(tiered):
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    all_ids = set(docs["doc_id"])
    kept = set(tiered["survivors"]["doc_id"])
    removed = set(tiered["removed"]["doc_id"])
    assert kept | removed == all_ids
    assert not (kept & removed)
    # stats account for every removal, tiers in cascade order
    st = tiered["stats"]
    assert list(st["tier"]) == ["exact", "simhash", "minhash"]
    assert st["rows_removed"].sum() == len(removed)
    # rows_in telescopes: each tier sees the previous tier's survivors
    assert st["rows_in"].iloc[0] == len(docs)
    for i in range(1, len(st)):
        assert st["rows_in"].iloc[i] == (
            st["rows_in"].iloc[i - 1] - st["rows_removed"].iloc[i - 1])


def test_exact_tier_matches_exact_dedup(tiered, ray_session):
    from mhray.stages.dedup import exact_dedup

    ex = exact_dedup(_docs_ds()).to_pandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    expected_removed = set(docs["doc_id"]) - set(ex["doc_id"])
    got = tiered["removed"]
    assert set(got[got["tier"] == "exact"]["doc_id"]) == expected_removed


def test_keepers_survive_their_tier(tiered):
    removed = tiered["removed"]
    removed_ids = set(removed["doc_id"])
    for _, row in removed.iterrows():
        # every dup_of is the min of its group -> it must not itself be
        # removed in the SAME tier (it may fall to a LATER tier)
        same_tier = removed[(removed["tier"] == row["tier"])
                            & (removed["doc_id"] == row["dup_of"])]
        assert len(same_tier) == 0, row
        assert row["dup_of"] < row["doc_id"]
    # survivors' dup_of is null, removed rows' dup_of is not
    assert tiered["removed"]["dup_of"].notna().all()


def test_cascade_matches_sequential_application(tiered, ray_session):
    """Re-run each tier standalone on the surviving set and check the
    cascade removed exactly the same ids per tier."""
    import ray.data

    from mhray.config import PRESETS
    from mhray.stages.cluster import cluster_edges
    from mhray.stages.dedup import (minhash_text_pairs, simhash_pairs,
                                    tiered_dedup)

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"])

    # tier 1 oracle: pandas exact-group min-id
    keep1 = docs.groupby("text")["doc_id"].transform("min")
    removed1 = set(docs[docs["doc_id"] != keep1]["doc_id"])
    s1 = docs[docs["doc_id"] == keep1]

    def pairs_to_removed(pairs_df):
        if not len(pairs_df):
            return set()
        parent = {}

        def find(x):
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for lo, hi in zip(pairs_df["lo"], pairs_df["hi"]):
            a, b = find(lo), find(hi)
            if a != b:
                parent[max(a, b)] = min(a, b)
        nodes = set(pairs_df["lo"]) | set(pairs_df["hi"])
        return {n for n in nodes if find(n) != n}

    # tier 2 oracle: simhash pairs on tier-1 survivors + driver UF
    p2 = simhash_pairs(ray.data.from_pandas(s1), max_hamming=3).to_pandas()
    removed2 = pairs_to_removed(p2)
    s2 = s1[~s1["doc_id"].isin(removed2)]

    # tier 3 oracle: minhash pairs on tier-2 survivors + driver UF
    cfg = PRESETS["captions"].with_(threshold=0.9)
    p3 = minhash_text_pairs(ray.data.from_pandas(s2), cfg).to_pandas()
    removed3 = pairs_to_removed(p3)

    got = tiered["removed"]
    assert set(got[got["tier"] == "exact"]["doc_id"]) == removed1
    assert set(got[got["tier"] == "simhash"]["doc_id"]) == removed2
    assert set(got[got["tier"] == "minhash"]["doc_id"]) == removed3


def test_anti_join_ids_paths_agree(ray_session):
    import ray.data

    from mhray.rayutil import anti_join_ids

    rng = np.random.default_rng(3)
    left = pa.table({
        "k": pa.array(rng.integers(0, 1000, 5000), pa.int64()),
        "v": pa.array(np.arange(5000), pa.int64()),
    })
    ids = pa.table({"k": pa.array(rng.integers(0, 1000, 300), pa.int64())})
    lds = ray.data.from_arrow(left)
    ids_ds = ray.data.from_arrow(ids)
    bcast = anti_join_ids(lds, ids_ds, "k",
                          broadcast_threshold_rows=10**9).to_pandas()
    shuf = anti_join_ids(lds, ids_ds, "k",
                         broadcast_threshold_rows=0).to_pandas()
    blocked = set(ids["k"].to_pylist())
    expect = left.to_pandas()
    expect = expect[~expect["k"].isin(blocked)]
    for got in (bcast, shuf):
        assert sorted(got["v"]) == sorted(expect["v"])
