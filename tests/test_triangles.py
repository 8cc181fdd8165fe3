"""triangle_counts: exact per-node counts on planted graphs."""

import itertools
import random

import pyarrow as pa


def _expected(edges):
    es = set(map(tuple, edges))
    nodes = sorted({v for e in edges for v in e})
    cnt = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            for v in (a, b, c):
                cnt[v] = cnt.get(v, 0) + 1
    return cnt


def _run(edges, ray_session):
    import ray.data

    from mhray.stages.cluster import triangle_counts

    ds = ray.data.from_arrow(pa.table({
        "lo": pa.array([e[0] for e in edges], pa.int64()),
        "hi": pa.array([e[1] for e in edges], pa.int64()),
    }))
    out = triangle_counts(ds, num_parts=4).to_pandas()
    return {int(r.doc_id): int(r.n_tri) for r in out.itertuples()}


def test_triangle_counts_shapes(ray_session):
    # 4-clique (every node in C(3,2)=3 triangles) + a chain (none)
    # + a separate single triangle
    clique = [(a, b) for a, b in itertools.combinations([1, 2, 3, 4], 2)]
    chain = [(10, 11), (11, 12), (12, 13)]
    tri = [(20, 21), (21, 22), (20, 22)]
    got = _run(clique + chain + tri, ray_session)
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 20: 1, 21: 1, 22: 1}


def test_triangle_counts_random_graph(ray_session):
    rng = random.Random(9)
    nodes = list(range(30))
    edges = sorted({tuple(sorted(rng.sample(nodes, 2)))
                    for _ in range(120)})
    got = _run(edges, ray_session)
    assert got == _expected(edges)
