"""Edit-distance join: banded kernel exactness + prefix-filter
completeness on a planted corpus."""

import random

import numpy as np
import pyarrow as pa
import pytest

from mhray.stages.editjoin import banded_levenshtein


def _ref_lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    d = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, d[0] = d[0], i
        for j in range(1, lb + 1):
            cur = min(d[j] + 1, d[j - 1] + 1,
                      prev + (a[i - 1] != b[j - 1]))
            prev, d[j] = d[j], cur
    return d[lb]


def _mutate(rng, s: str, n_ops: int) -> str:
    b = list(s)
    for _ in range(n_ops):
        op = rng.choice("sid")
        if not b and op != "i":
            continue
        p = rng.randrange(len(b) + 1 if op == "i" else len(b))
        if op == "s":
            b[p] = rng.choice("abcdef ")
        elif op == "i":
            b.insert(p, rng.choice("abcdef "))
        else:
            del b[p]
    return "".join(b)


def test_banded_levenshtein_fuzz_vs_reference():
    rng = random.Random(11)
    for _ in range(200):
        a = "".join(rng.choice("abcde") for _ in range(rng.randint(0, 40)))
        b = _mutate(rng, a, rng.randint(0, 6))
        true = _ref_lev(a, b)
        for k in (1, 2, 4, 7):
            got = banded_levenshtein(a, b, k)
            if true <= k:
                assert got == true, (a, b, k, got, true)
            else:
                assert got > k, (a, b, k, got, true)


def test_banded_levenshtein_edges():
    assert banded_levenshtein("", "", 2) == 0
    assert banded_levenshtein("", "ab", 2) == 2
    assert banded_levenshtein("", "abc", 2) > 2
    assert banded_levenshtein("same text", "same text", 0) == 0
    # unicode code points, not bytes
    assert banded_levenshtein("café", "cafe", 1) == 1


def test_edit_distance_pairs_complete_on_planted(ray_session):
    """Planted near-identical docs must all surface with exact
    distances; unrelated docs must not pair."""
    import ray.data

    from mhray.stages.editjoin import edit_distance_pairs

    rng = random.Random(5)
    base = ["".join(rng.choice("abcdefgh ") for _ in range(160))
            for _ in range(12)]
    rows, truth = [], {}
    did = 0
    for b in base:
        rows.append({"doc_id": did, "text": b})
        keeper = did
        did += 1
        n_ops = rng.randint(1, 4)
        mut = _mutate(rng, b, n_ops)
        d = _ref_lev(b, mut)
        rows.append({"doc_id": did, "text": mut})
        if d <= 4 and len(mut) >= 104:
            truth[(keeper, did)] = d
        did += 1
    ds = ray.data.from_items(rows)
    out = edit_distance_pairs(ds, k=4, q=8, min_len=104,
                              num_parts=4).to_pandas()
    got = {(int(r.lo), int(r.hi)): int(r.dist)
           for r in out.itertuples()}
    # every planted pair found with the exact distance
    for pair, d in truth.items():
        assert got.get(pair) == d, (pair, d, got.get(pair))
    # nothing else: random 160-char strings are nowhere near 4 edits
    extra = set(got) - set(truth)
    assert not extra, extra
