"""Oracle vs planted ground truth: the EstimateROC analog
(main/EstimateROC.java:802-910) on the synthetic corpus."""

import numpy as np
import pyarrow.parquet as pq

from mhray.config import PRESETS
from mhray import oracle as O


def _load(small_corpus):
    images = pq.read_table(small_corpus["images"])
    return (
        images.column("image_id").to_pylist(),
        images.column("caption").to_pylist(),
        np.asarray(images.column("phash"), dtype=np.int64),
        pq.read_table(small_corpus["truth_pairs"]),
        pq.read_table(small_corpus["truth_clusters"]),
    )


def test_oracle_recall_and_precision(small_corpus):
    ids, caps, ph, truth_pairs, truth_clusters = _load(small_corpus)
    cfg = PRESETS["captions"]
    res = O.find_pairs(ids, caps, ph, cfg)
    recall = O.recall_against(truth_pairs, res.pairs)
    assert recall >= 0.99, f"recall {recall}"
    # precision: no pair outside truth (boilerplate/near-miss must not leak)
    t = set(zip(truth_pairs.column("lo_id").to_pylist(),
                truth_pairs.column("hi_id").to_pylist()))
    g = list(zip(res.pairs.column("lo_id").to_pylist(),
                 res.pairs.column("hi_id").to_pylist()))
    false_pos = [p for p in g if p not in t]
    assert len(false_pos) <= max(2, 0.02 * len(g)), false_pos[:10]


def test_oracle_cluster_recall(small_corpus):
    ids, caps, ph, truth_pairs, truth_clusters = _load(small_corpus)
    cfg = PRESETS["captions"]
    res = O.find_pairs(ids, caps, ph, cfg)
    assert O.cluster_pair_recall(truth_clusters, res.clusters) >= 0.99
    # every image appears exactly once in the cluster assignment
    assert res.clusters.num_rows == len(ids)


def test_oracle_rejects_short_captions(small_corpus):
    ids, caps, ph, *_ = _load(small_corpus)
    cfg = PRESETS["captions"]
    res = O.find_pairs(ids, caps, ph, cfg)
    short = {i for i, c in zip(ids, caps) if len(c) < cfg.min_olap_length}
    assert short.issubset(set(res.rejects))


def test_iid_stability():
    ids = ["img_000000000007", "img_000000000001", "weird-id"]
    iids = O.image_iid(ids)
    assert iids[0] == 7 and iids[1] == 1
    assert iids[2] not in (0, 1, 7)
