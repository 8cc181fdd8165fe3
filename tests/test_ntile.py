"""Distributed exact NTILE vs a single-process reference."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from mhray.stages.quantile import ntile


def _brute_ntile(vals, ids, k):
    order = np.lexsort((ids, vals))
    n = len(vals)
    q, rem = divmod(n, k)
    out = np.empty(n, np.int64)
    r = 0
    for b in range(1, k + 1):
        size = q + 1 if b <= rem else q
        out[order[r:r + size]] = b
        r += size
    return out


@pytest.mark.parametrize("n,k,blocks", [(100, 10, 1), (103, 10, 7),
                                        (7, 10, 3), (64, 3, 5), (1, 4, 1)])
def test_ntile_matches_bruteforce(n, k, blocks, ray_session):
    rng = np.random.default_rng(n * 31 + k)
    vals = rng.integers(0, 12, size=n)  # heavy ties -> id tiebreak matters
    ids = rng.permutation(n).astype(np.int64)
    want = _brute_ntile(vals, ids, k)
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(ids, pa.int64()),
        "v": pa.array(vals, pa.int64()),
    })).repartition(blocks)
    got = {r["id"]: r["bucket"] for r in ntile(ds, k, "v", "id").take_all()}
    assert got == {int(i): int(b) for i, b in zip(ids, want)}


def test_ntile_empty(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}))
    assert ntile(ds, 4, "v", "id").take_all() == []
