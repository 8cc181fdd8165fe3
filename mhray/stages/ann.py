"""Similarity search over an embedding column (list<float>).

- knn_brute: exact cosine top-k — the query matrix is broadcast ONCE via
  ``ray.put`` and every batch computes a float64 matmul against it
  (per-batch partial top-k = combiner; final rank per query after a
  small groupby). This is the correctness baseline.
- lsh_knn: random-hyperplane signed LSH (the CosineDistanceSketch
  family, sketch/CosineDistanceSketch.java:40-66 +
  HashUtils.randomGuassianVector :260-305) — bucket candidates then
  exact rescoring, the scale path when a broadcast query matrix or
  full matmul is too large.
- embedding_dup_pairs: near-duplicate pairs by cosine >= tau via the
  same LSH bucketing (self-join form).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _embedding_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col).combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.chunk(0)
    flat = np.asarray(arr.flatten(), dtype=np.float64)
    dim = len(flat) // len(arr)
    return flat.reshape(len(arr), dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def knn_brute(ds, query_ids: list[int], k: int = 5,
              id_col: str = "vec_id", emb_col: str = "embedding"):
    """Exact top-k cosine neighbors for the given query ids.

    Returns (query_id, neighbor_id, rank) with rank 1..k by descending
    cosine similarity (self excluded); ties broken by neighbor id.
    """
    q_rows = ds.filter(
        expr=f"{id_col} in {[int(q) for q in query_ids]}"
    ).take_all()
    qid = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    qm = _normalize(np.array([r[emb_col] for r in q_rows], dtype=np.float64))
    order = np.argsort(qid)
    qid, qm = qid[order], qm[order]
    q_ref = ray.put((qid, qm))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids, qmat = ray.get(q_ref)
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        m = _normalize(_embedding_matrix(batch, emb_col))
        sims = qmat @ m.T  # (Q, B)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qids)):
            s = sims[qi]
            mask = ids != qids[qi]
            cand_idx = np.flatnonzero(mask)
            if len(cand_idx) == 0:
                continue
            take = min(k, len(cand_idx))
            top = cand_idx[np.argpartition(-s[cand_idx], take - 1)[:take]]
            out_q.append(np.full(take, qids[qi]))
            out_n.append(ids[top])
            out_s.append(s[top])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
            "sim": pa.array(np.concatenate(out_s), pa.float64()),
        })

    partials = ds.map_batches(partial_topk, batch_format="pyarrow",
                              zero_copy_batch=True)

    def final_topk(group: pa.Table) -> pa.Table:
        sims = np.asarray(group.column("sim"))
        nbr = np.asarray(group.column("neighbor_id"))
        order = np.lexsort((nbr, -sims))[:k]
        return pa.table({
            "query_id": group.column("query_id").take(order),
            "neighbor_id": pa.array(nbr[order], pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
        })

    return partials.groupby("query_id").map_groups(final_topk,
                                                   batch_format="pyarrow")


def _hyperplanes(dim: int, n_bits: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    h = rng.standard_normal((n_bits, dim))
    return h / np.linalg.norm(h, axis=1, keepdims=True)


def lsh_buckets(ds, n_bits: int = 12, seed: int = 7,
                id_col: str = "vec_id", emb_col: str = "embedding"):
    """(iid, bucket) via random-hyperplane sign LSH."""
    planes_ref = None

    def bucketize(batch: pa.Table) -> pa.Table:
        nonlocal planes_ref
        m = _embedding_matrix(batch, emb_col)
        planes = _hyperplanes(m.shape[1], n_bits, seed)
        signs = (m @ planes.T) > 0  # (B, n_bits)
        buckets = np.zeros(len(m), dtype=np.int64)
        for b in range(n_bits):
            buckets |= signs[:, b].astype(np.int64) << b
        return pa.table({
            "iid": batch.column(id_col).cast(pa.int64()),
            "bucket": pa.array(buckets, pa.int64()),
        })

    return ds.map_batches(bucketize, batch_format="pyarrow",
                          zero_copy_batch=True)


def ivf_knn(ds, query_ids: list[int], k: int = 5, n_cells: int = 16,
            nprobe: int = 4, lloyd_iters: int = 2, seed: int = 13,
            id_col: str = "vec_id", emb_col: str = "embedding"):
    """IVF (inverted-file) approximate top-k: coarse centroids from a
    seeded sample (a few Lloyd iterations), vectors assigned to their
    nearest cell, queries probe the ``nprobe`` nearest cells only.
    The scale path when neither the corpus nor a cell fits one node:
    cells are the partition key; only probed cells move.
    """
    import ray

    # deterministic coarse centroids from a driver-side sample
    sample = ds.limit(max(512, n_cells * 16)).take_all()
    sm = _normalize(np.array([r[emb_col] for r in sample], dtype=np.float64))
    rng = np.random.default_rng(seed)
    cent = sm[rng.choice(len(sm), size=n_cells, replace=False)]
    for _ in range(lloyd_iters):
        assign = np.argmax(sm @ cent.T, axis=1)
        for c in range(n_cells):
            members = sm[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    cent_ref = ray.put(cent)

    q_rows = ds.filter(expr=f"{id_col} in {[int(q) for q in query_ids]}").take_all()
    qid = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    qm = _normalize(np.array([r[emb_col] for r in q_rows], dtype=np.float64))
    q_cells = np.argsort(-(qm @ cent.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    q_ref = ray.put((qid, qm, q_cells))

    def partial(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        qids, qmat, qcells = ray.get(q_ref)
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        m = _normalize(_embedding_matrix(batch, emb_col))
        cell = np.argmax(m @ c.T, axis=1)
        sims = qmat @ m.T
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qids)):
            probe = np.isin(cell, qcells[qi]) & (ids != qids[qi])
            cand = np.flatnonzero(probe)
            if len(cand) == 0:
                continue
            take = min(k, len(cand))
            s = sims[qi]
            top = cand[np.argpartition(-s[cand], take - 1)[:take]]
            out_q.append(np.full(take, qids[qi]))
            out_n.append(ids[top])
            out_s.append(s[top])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
            "sim": pa.array(np.concatenate(out_s), pa.float64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def final_topk(group: pa.Table) -> pa.Table:
        sims = np.asarray(group.column("sim"))
        nbr = np.asarray(group.column("neighbor_id"))
        order = np.lexsort((nbr, -sims))[:k]
        return pa.table({
            "query_id": group.column("query_id").take(order),
            "neighbor_id": pa.array(nbr[order], pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
        })

    return partials.groupby("query_id").map_groups(final_topk,
                                                   batch_format="pyarrow")


def embedding_dup_pairs(ds, tau: float = 0.99, n_bits: int = 10,
                        n_tables: int = 4,
                        id_col: str = "vec_id", emb_col: str = "embedding",
                        num_parts: int = 8, group_cap: int = 5000):
    """(lo, hi) pairs with cosine >= tau; candidates = same bucket in
    ANY of ``n_tables`` independent sign-LSH tables (multi-table
    probing: per-table hit prob p = (1 - theta/pi)^n_bits, union
    recall 1-(1-p)^L). Probabilistic recall by design — the scale path
    for the exact broadcast variant.
    """
    from mhray.stages.candidates import _part_of, make_emit_pairs

    def to_parts(batch: pa.Table) -> pa.Table:
        m = _embedding_matrix(batch, emb_col)
        iid = np.asarray(batch.column(id_col), dtype=np.int64)
        keys, iids = [], []
        for t in range(n_tables):
            planes = _hyperplanes(m.shape[1], n_bits, seed=7 + 101 * t)
            signs = (m @ planes.T) > 0
            b = np.zeros(len(m), dtype=np.int64)
            for j in range(n_bits):
                b |= signs[:, j].astype(np.int64) << j
            keys.append(b | (np.int64(t) << 48))  # table id in high bits
            iids.append(iid)
        key = np.concatenate(keys)
        return pa.table({
            "part": pa.array(_part_of(key, num_parts), pa.int32()),
            "key": pa.array(key, pa.int64()),
            "iid": pa.array(np.concatenate(iids), pa.int64()),
        })

    cands = ds.map_batches(to_parts, batch_format="pyarrow",
                           zero_copy_batch=True) \
        .groupby("part", num_partitions=num_parts).map_groups(make_emit_pairs(group_cap),
                                    batch_format="pyarrow") \
        .groupby(["lo", "hi"]).count()

    # rescore exactly: broadcast id->vector map (small side) per batch
    vecs = ds.map_batches(
        lambda b: pa.table({
            "iid": b.column(id_col).cast(pa.int64()),
            "emb": b.column(emb_col),
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    ).take_all()
    vid = np.array([r["iid"] for r in vecs], dtype=np.int64)
    vm = _normalize(np.array([r["emb"] for r in vecs], dtype=np.float64))
    order = np.argsort(vid)
    vec_ref = ray.put((vid[order], vm[order]))

    def rescore(batch: pa.Table) -> pa.Table:
        ids_sorted, mat = ray.get(vec_ref)
        lo = np.asarray(batch.column("lo"), dtype=np.int64)
        hi = np.asarray(batch.column("hi"), dtype=np.int64)
        a = mat[np.searchsorted(ids_sorted, lo)]
        b = mat[np.searchsorted(ids_sorted, hi)]
        sim = np.sum(a * b, axis=1)
        keep = pa.array(sim >= tau)
        return pa.table({
            "lo": batch.column("lo").filter(keep),
            "hi": batch.column("hi").filter(keep),
        })

    return cands.map_batches(rescore, batch_format="pyarrow",
                             zero_copy_batch=True)
