"""IVF approximate search recall vs the exact brute-force baseline."""


def test_ivf_recall_vs_brute(ray_session):
    import ray.data

    from mhray.stages.ann import ivf_knn, knn_brute

    ds = ray.data.read_parquet("/root/testdata/sf0.01/embeddings.parquet")
    qs = list(range(10))
    brute = {(r["query_id"], r["neighbor_id"])
             for r in knn_brute(ds, qs, k=5).take_all()}
    ivf = {(r["query_id"], r["neighbor_id"])
           for r in ivf_knn(ds, qs, k=5, n_cells=8, nprobe=4).take_all()}
    recall = len(brute & ivf) / len(brute)
    # random 64-dim vectors are a worst case for coarse quantization;
    # nprobe=4 of 8 cells must still recover most true neighbors
    assert recall >= 0.5, recall
    # every query answered
    assert len({q for q, _ in ivf}) == 10


def test_ivf_recall_on_clustered_sorted_corpus(ray_session):
    """Centroid seeding must survive a corpus SORTED by cluster: with
    order-biased seeding (first blocks) the coarse quantizer would
    collapse onto the first labels and recall degrades silently; the
    hash-based uniform sample must keep recall up."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from mhray.stages.ann import ivf_knn, knn_brute

    tbl = pq.read_table("/root/testdata/sf0.01/embeddings.parquet")
    order = pa.compute.sort_indices(
        tbl, sort_keys=[("label", "ascending"), ("vec_id", "ascending")])
    ds = ray.data.from_arrow(tbl.take(order)).repartition(8)

    qs = list(range(10))
    brute = {(r["query_id"], r["neighbor_id"])
             for r in knn_brute(ds, qs, k=5).take_all()}
    ivf = {(r["query_id"], r["neighbor_id"])
           for r in ivf_knn(ds, qs, k=5, n_cells=8, nprobe=4).take_all()}
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.5, recall
    assert len({q for q, _ in ivf}) == len(qs)


def test_knn_brute_many_query_ids(ray_session):
    """Thousands of query ids must work — the id selection is a
    broadcast np.isin semi-join, not a filter-expression string (which
    breaks on expression size at this scale)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from mhray.stages.ann import knn_brute

    rng = np.random.default_rng(2)
    n, d = 3000, 4
    m = rng.normal(size=(n, d))
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in m]),
    })
    qs = list(range(0, n, 2)) + [10 ** 9]  # 1500 ids + one absent
    out = knn_brute(ray.data.from_arrow(tbl).repartition(4),
                    qs, k=3).take_all()
    answered = {r["query_id"] for r in out}
    assert answered == set(range(0, n, 2))  # absent id silently empty
    assert all(r["rank"] in (1, 2, 3) for r in out)


def test_knn_graph_vs_bruteforce(ray_session):
    """knn_graph equals the numpy brute force for every row (rank
    order by -sim with id tie-break on a seeded corpus)."""
    import numpy as np
    import pyarrow as pa

    import ray.data
    from mhray.stages.ann import knn_graph

    rng = np.random.default_rng(5)
    n, d, k = 60, 8, 4
    m = rng.normal(size=(n, d))
    ids = np.arange(100, 100 + n, dtype=np.int64)
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in m]),
    })
    out = knn_graph(ray.data.from_arrow(tbl).repartition(3), k=k) \
        .to_pandas().sort_values(["query_id", "rank"])

    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn.T
    np.fill_diagonal(sims, -np.inf)
    for qi in range(n):
        o = np.lexsort((ids, -sims[qi]))[:k]
        got = out[out.query_id == ids[qi]]
        assert list(got["neighbor_id"]) == list(ids[o]), ids[qi]
        np.testing.assert_array_equal(
            got["sim_sc"].to_numpy(),
            (np.sign(sims[qi][o]) *
             np.floor(np.abs(sims[qi][o]) * 10000 + 0.5)).astype(np.int64))


def test_knn_graph_cap_routes_to_ivf(ray_session):
    """Past corpus_cap the exact baseline hands off to the IVF-cell
    graph (same schema) instead of raising."""
    import pyarrow as pa

    import ray.data
    from mhray.stages.ann import knn_graph

    tbl = pa.table({"vec_id": pa.array([1, 2, 3], pa.int64()),
                    "embedding": pa.array([[1.0, 0.0], [0.9, 0.1],
                                           [0.0, 1.0]])})
    rows = knn_graph(ray.data.from_arrow(tbl), k=2,
                     corpus_cap=2).take_all()
    assert rows and set(rows[0].keys()) == {"query_id", "neighbor_id",
                                            "rank", "sim_sc"}


def test_knn_graph_ivf_recall_and_routing(ray_session):
    """The IVF-cell graph (the >cap scale path) keeps high recall vs
    the exact graph on clustered data, and knn_graph routes to it —
    instead of raising — when the corpus exceeds corpus_cap."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from mhray.stages.ann import knn_graph, knn_graph_ivf

    # well-separated blobs: within-cell search should recover nearly
    # every exact neighbor
    rng = np.random.default_rng(11)
    n_blobs, per, d, k = 6, 80, 16, 5
    centers = rng.normal(size=(n_blobs, d)) * 6
    m = np.concatenate([c + rng.normal(size=(per, d)) * 0.3
                        for c in centers])
    ids = np.arange(len(m), dtype=np.int64)
    tbl = pa.table({"vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(list(map(list, m)))})
    ds = ray.data.from_arrow(tbl).repartition(4)

    exact = {(r["query_id"], r["neighbor_id"])
             for r in knn_graph(ds, k=k).take_all()}
    approx_rows = knn_graph_ivf(ds, k=k, n_cells=n_blobs,
                                seed=11).take_all()
    approx = {(r["query_id"], r["neighbor_id"]) for r in approx_rows}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall
    # every row got neighbors, ranks contiguous from 1
    by_q = {}
    for r in approx_rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert len(by_q) == len(m)
    assert all(sorted(v) == list(range(1, len(v) + 1))
               for v in by_q.values())

    # routing: a tiny corpus_cap must switch to the IVF path, not raise
    routed = knn_graph(ds, k=k, corpus_cap=100).take_all()
    assert len({r["query_id"] for r in routed}) == len(m)
    assert set(routed[0].keys()) == {"query_id", "neighbor_id",
                                     "rank", "sim_sc"}


def test_knn_graph_ivf_cell_cap_subsplit(ray_session):
    """A cell bigger than cell_cap is deterministically sub-split:
    output stays valid (unique (q, rank), self excluded) and is
    reproducible run-to-run."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from mhray.stages.ann import knn_graph_ivf

    rng = np.random.default_rng(3)
    m = rng.normal(size=(90, 8))
    tbl = pa.table({"vec_id": pa.array(np.arange(90), pa.int64()),
                    "embedding": pa.array(list(map(list, m)))})
    ds = ray.data.from_arrow(tbl)
    a = knn_graph_ivf(ds, k=3, n_cells=1, cell_cap=40, seed=3).take_all()
    b = knn_graph_ivf(ds, k=3, n_cells=1, cell_cap=40, seed=3).take_all()
    key = lambda rows: sorted((r["query_id"], r["rank"], r["neighbor_id"],
                               r["sim_sc"]) for r in rows)
    assert key(a) == key(b)
    assert all(r["query_id"] != r["neighbor_id"] for r in a)
    seen = {(r["query_id"], r["rank"]) for r in a}
    assert len(seen) == len(a)


def test_label_centroid_dist(ray_session):
    """Hand-computed centroids + the zero-norm guard."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from mhray.stages.ann import label_centroid_dist

    # label 0: (1,0) and (0,1) -> centroid (.5,.5); cos = 1/sqrt(2)
    # label 1: (2,0) and zero-vector -> centroid (1,0); cos = 1 and 0
    tbl = pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.0, 1.0],
                               [2.0, 0.0], [0.0, 0.0]],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 0, 1, 1], pa.int32()),
    })
    out = label_centroid_dist(ray.data.from_arrow(tbl)).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert out["label"].tolist() == [0, 0, 1, 1]
    r = int(round(1 / np.sqrt(2) * 10000))
    assert out["cos_sc"].tolist() == [r, r, 10000, 0]


def test_knn_label_agreement(ray_session):
    """Hand-built 2-D cluster pair: inliers agree with their cluster,
    the planted mislabeled point is outvoted (agree=0)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from mhray.stages.ann import knn_label_agreement

    # cluster A around (1,0): ids 0-3 labeled 0, id 4 MISLABELED 1;
    # cluster B around (0,1): ids 5-9 labeled 1
    rng = np.random.default_rng(0)
    a = np.array([1.0, 0.0]) + rng.normal(0, 0.01, (5, 2))
    b = np.array([0.0, 1.0]) + rng.normal(0, 0.01, (5, 2))
    emb = np.vstack([a, b])
    labels = [0, 0, 0, 0, 1, 1, 1, 1, 1, 1]
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(10), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in emb],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())}))
    out = knn_label_agreement(ds, k=4).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert len(out) == 10
    # every cluster-A point's 4 NNs are the other A points -> vote 0
    assert out.loc[0:4, "voted_label"].tolist() == [0] * 5
    assert out.loc[4, "agree"] == 0          # the planted error caught
    assert out.loc[0:3, "agree"].tolist() == [1] * 4
    assert out.loc[5:9, "agree"].tolist() == [1] * 5
