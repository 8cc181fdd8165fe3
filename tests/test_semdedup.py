"""SemDeDup invariants: the keep/prune decision is fully characterized
given the cluster assignment —

  1. no two KEPT members of one cluster have cosine >= tau,
  2. every PRUNED member has cosine >= tau with some kept member of
     its cluster that precedes it in (centroid-sim asc, id) order,
  3. exact duplicate vectors always collapse to one kept row (they
     deterministically land in the same cluster),
  4. the output covers every input row exactly once, deterministically.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data


def _corpus(seed=5, n_groups=6, dup_sizes=(1, 1, 2, 3, 4, 5), dim=16):
    """Well-separated gaussian groups; within group g, ``dup_sizes[g]``
    exact copies of the group anchor plus independent noise points."""
    rng = np.random.default_rng(seed)
    anchors = rng.standard_normal((n_groups, dim)) * 10
    rows = []
    vid = 0
    for g in range(n_groups):
        for _ in range(dup_sizes[g]):
            rows.append((vid, anchors[g].copy()))
            vid += 1
        for _ in range(3):  # noise points near the anchor, not dups
            rows.append((vid, anchors[g] + rng.standard_normal(dim) * 3.0))
            vid += 1
    ids = [r[0] for r in rows]
    vecs = np.stack([r[1] for r in rows])
    return ids, vecs


def _run(ids, vecs, tau=0.999, n_clusters=4):
    from mhray.stages.ann import semdedup

    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    }))
    out = semdedup(ds, n_clusters=n_clusters, tau=tau, iters=3).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def test_semdedup_invariants(ray_session):
    ids, vecs = _corpus()
    tau = 0.999
    out = _run(ids, vecs, tau=tau)

    assert sorted(out["vec_id"]) == sorted(ids)  # full coverage, no dups

    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    by_id = {int(r.vec_id): (int(r.cluster), bool(r.keep))
             for r in out.itertuples()}
    for cl in out["cluster"].unique():
        members = out[out["cluster"] == cl]
        kept = members[members["keep"]]["vec_id"].to_numpy()
        pruned = members[~members["keep"]]["vec_id"].to_numpy()
        km = norm[kept]
        # (1) kept set is tau-separated
        if len(kept) > 1:
            sims = km @ km.T
            np.fill_diagonal(sims, 0)
            assert sims.max() < tau
        # (2) every pruned row has a kept witness in its cluster
        for p in pruned:
            assert (norm[kept] @ norm[p] >= tau).any()

    # (3) every exact-duplicate vector group collapses to one kept row
    vals, counts = np.unique(vecs, axis=0, return_counts=True)
    for v, c in zip(vals, counts):
        if c < 2:
            continue
        rows = [i for i in ids if np.array_equal(vecs[i], v)]
        kept = [i for i in rows if by_id[i][1]]
        assert len(kept) == 1, f"exact-dup group kept {kept}"


def test_semdedup_deterministic(ray_session):
    ids, vecs = _corpus(seed=11)
    a = _run(ids, vecs)
    b = _run(ids, vecs)
    assert a.equals(b)


def test_semdedup_tau_one_keeps_everything_distinct(ray_session):
    """At tau just above any non-identical cosine, only exact dups (and
    colinear vectors) are pruned."""
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((30, 8))
    ids = list(range(30))
    out = _run(ids, vecs, tau=1.0 - 1e-12, n_clusters=2)
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    pruned = out[~out["keep"]]["vec_id"].to_numpy()
    for p in pruned:  # any pruned row must be (near-)identical to another
        sims = norm @ norm[p]
        sims[p] = -1
        assert sims.max() >= 1.0 - 1e-12
    # random gaussians are almost surely not colinear
    assert len(pruned) == 0


@pytest.mark.parametrize("seed,n,dim,tau,chunk", [
    (1, 700, 8, 0.9, 64), (2, 300, 4, 0.5, 50), (3, 120, 6, 0.99, 7),
])
def test_greedy_leader_chunked_matches_naive(seed, n, dim, tau, chunk):
    from mhray.stages.ann import _greedy_leader_keep, _normalize

    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n // 3, dim))
    m = _normalize(np.concatenate([
        base, base + rng.standard_normal((n // 3, dim)) * 0.05,
        rng.standard_normal((n - 2 * (n // 3), dim))]))
    rng.shuffle(m)

    naive = np.zeros(n, dtype=bool)
    for i in range(n):
        sims = m[:i][naive[:i]] @ m[i]
        naive[i] = not (sims >= tau).any()
    got = _greedy_leader_keep(m, tau, chunk=chunk)
    assert (got == naive).all()
