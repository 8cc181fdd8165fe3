"""Suffix-array exact-substring pass: kernel-vs-brute-force checks,
table-for-table parity with the independent winnowing+LCS engine, and
a brute-force all-pairs oracle for the full distributed pipeline."""

import numpy as np
import pyarrow as pa
import pytest

from mhray.stages.suffixarray import (_group_candidate_pairs, adjacent_lcp,
                                      suffix_array)


def _brute_lcs(a: str, b: str) -> int:
    ua = np.frombuffer(a.encode("utf-16-le"), dtype="<u2")
    ub = np.frombuffer(b.encode("utf-16-le"), dtype="<u2")
    best = 0
    for i in range(len(ua)):
        for j in range(len(ub)):
            m = 0
            while i + m < len(ua) and j + m < len(ub) and ua[i + m] == ub[j + m]:
                m += 1
            if m > best:
                best = m
    return best


def test_suffix_array_vs_brute():
    rng = np.random.default_rng(0)
    for _ in range(150):
        n = int(rng.integers(1, 80))
        arr = rng.integers(-3, 5, n).astype(np.int64)
        sa = suffix_array(arr)
        want = sorted(range(n), key=lambda i: tuple(arr[i:]))
        assert list(sa) == want


def test_adjacent_lcp_vs_brute():
    rng = np.random.default_rng(1)
    for _ in range(150):
        n = int(rng.integers(2, 80))
        arr = rng.integers(0, 4, n).astype(np.int64)
        sa = suffix_array(arr)
        lcp = adjacent_lcp(arr, sa)
        for i in range(n - 1):
            a, b = arr[sa[i]:], arr[sa[i + 1]:]
            m = 0
            while m < len(a) and m < len(b) and a[m] == b[m]:
                m += 1
            assert lcp[i] == m


def _concat_group(texts):
    units = [np.frombuffer(t.encode("utf-16-le"), dtype="<u2").astype(np.int64)
             for t in texts]
    total = sum(len(u) for u in units) + len(units)
    concat = np.empty(total, np.int64)
    doc_of = np.empty(total, np.int64)
    pos = 0
    for i, u in enumerate(units):
        concat[pos:pos + len(u)] = u
        doc_of[pos:pos + len(u)] = i
        pos += len(u)
        concat[pos] = -(i + 1)
        doc_of[pos] = i
        pos += 1
    return concat, doc_of


def test_group_candidate_pairs_vs_brute():
    rng = np.random.default_rng(2)
    for trial in range(60):
        nd = int(rng.integers(2, 6))
        texts = ["".join(rng.choice(list("abc"), int(rng.integers(0, 30))))
                 for _ in range(nd)]
        if trial % 3 == 0:
            seg = "".join(rng.choice(list("xyz"), 9))
            texts[0] += seg
            texts[1] = seg + texts[1]
        min_len = 6
        concat, doc_of = _concat_group(texts)
        lo, hi = _group_candidate_pairs(concat, doc_of, min_len, pair_cap=100)
        got = set(zip(lo.tolist(), hi.tolist()))
        want = {(i, j) for i in range(nd) for j in range(i + 1, nd)
                if _brute_lcs(texts[i], texts[j]) >= min_len}
        assert got == want, (trial, texts)


def _quote_corpus(n_rows=300, seed=7):
    rng = np.random.default_rng(seed)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "fox", "golf",
             "hotel", "india", "juliet"]
    quote = ("the quick brown fox jumps over the lazy dog near the "
             "riverbank at dawn")
    texts = []
    for i in range(n_rows):
        t = " ".join(rng.choice(words, int(rng.integers(3, 20))))
        if i % 7 == 0:
            t = t + " " + quote[: int(rng.integers(45, len(quote)))]
        texts.append(t)
    return pa.table({"doc_id": pa.array(range(n_rows), pa.int64()),
                     "text": pa.array(texts)})


def test_suffix_vs_winnow_engine_parity(ray_session):
    """The two independent exact-substring engines (winnow fingerprints
    + per-pair LCS probes vs suffix array + LCP run-sweep) must emit
    the IDENTICAL (lo, hi, lcs_len) table."""
    import ray

    from mhray.stages.substring import substring_pairs
    from mhray.stages.suffixarray import suffix_array_pairs

    ds = ray.data.from_arrow(_quote_corpus())
    a = substring_pairs(ds, min_len=40, num_parts=4).take_all()
    b = suffix_array_pairs(ds, min_len=40, num_parts=4).take_all()
    sa_ = {(r["lo"], r["hi"], r["lcs_len"]) for r in a}
    sb_ = {(r["lo"], r["hi"], r["lcs_len"]) for r in b}
    assert len(sa_) > 0
    assert sa_ == sb_


def test_suffix_pairs_brute_oracle(ray_session):
    """Full-pipeline output vs a brute-force all-pairs LCS oracle on a
    small corpus (completeness for >= min_len AND zero false
    positives AND exact lcs_len)."""
    import ray

    tbl = _quote_corpus(n_rows=60, seed=11)
    from mhray.stages.suffixarray import suffix_array_pairs

    min_len = 40
    out = suffix_array_pairs(ray.data.from_arrow(tbl), min_len=min_len,
                             num_parts=2).take_all()
    got = {(r["lo"], r["hi"]): r["lcs_len"] for r in out}
    texts = tbl.column("text").to_pylist()
    want = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            L = _brute_lcs(texts[i], texts[j])
            if L >= min_len:
                want[(i, j)] = L
    assert got == want
    assert len(want) > 0


def test_suffix_pairs_no_candidates(ray_session):
    """All-distinct corpus: the pipeline must survive an empty
    candidate set end-to-end."""
    import ray

    from mhray.stages.suffixarray import suffix_array_pairs

    tbl = pa.table({
        "doc_id": pa.array(range(20), pa.int64()),
        "text": pa.array([f"unique short text {i}" for i in range(20)]),
    })
    out = suffix_array_pairs(ray.data.from_arrow(tbl), min_len=40,
                             num_parts=2).take_all()
    assert out == []


def test_suffix_pairs_min_len_guard(ray_session):
    import ray

    from mhray.stages.suffixarray import suffix_array_pairs

    tbl = pa.table({"doc_id": pa.array([0], pa.int64()),
                    "text": pa.array(["abc"])})
    with pytest.raises(ValueError):
        suffix_array_pairs(ray.data.from_arrow(tbl), min_len=3)


def test_dedupe_member_sets_collision_safe():
    """A set-hash collision between DIFFERENT member sets must keep
    both groups (dropping one silently loses pairs the verify stage
    can never recover); identical sets must still collapse. Collisions
    are forced by feeding equal hashes directly."""
    import numpy as np

    from mhray.stages.suffixarray import dedupe_member_sets

    # groups: {1,2}, {3,4}, {1,2}, {1,5} — all "colliding" (seth=0)
    seth = np.zeros(4, np.uint64)
    sizes = np.array([2, 2, 2, 2], np.int64)
    members = np.array([1, 2, 3, 4, 1, 2, 1, 5], np.int64)
    keep = dedupe_member_sets(seth, sizes, members)
    # exactly one of the two {1,2} copies dropped, everything else kept
    assert keep.sum() == 3
    assert keep[1] and keep[3]          # distinct sets survive
    assert bool(keep[0]) != bool(keep[2])  # one {1,2} representative

    # mixed sizes on one hash never compare across sizes
    seth = np.zeros(2, np.uint64)
    sizes = np.array([2, 3], np.int64)
    members = np.array([1, 2, 1, 2, 3], np.int64)
    assert dedupe_member_sets(seth, sizes, members).all()

    # distinct hashes: no comparisons, all kept
    seth = np.array([1, 2, 3], np.uint64)
    sizes = np.array([2, 2, 2], np.int64)
    members = np.array([1, 2, 1, 2, 1, 2], np.int64)
    assert dedupe_member_sets(seth, sizes, members).all()


def test_dedupe_member_sets_fuzz_exact():
    """Property: keep-mask collapses EXACTLY the duplicate member
    sets — one representative per distinct set, no distinct set lost —
    under random sizes/members and adversarially colliding hashes."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mhray.stages.suffixarray import dedupe_member_sets

    @settings(max_examples=80, deadline=None)
    @given(st.integers(0, 40), st.integers(0, 2**31 - 1),
           st.integers(1, 3))
    def check(n_groups, seed, hash_mode):
        rng = np.random.default_rng(seed)
        sizes = rng.integers(2, 6, n_groups).astype(np.int64)
        members = np.concatenate(
            [np.sort(rng.choice(20, s, replace=False))
             for s in sizes]) if n_groups else np.zeros(0, np.int64)
        vstart = np.cumsum(sizes) - sizes
        tups = [tuple(members[s:s + z])
                for s, z in zip(vstart, sizes)]
        if hash_mode == 1:    # all collide
            seth = np.zeros(n_groups, np.uint64)
        elif hash_mode == 2:  # honest set hash
            seth = np.array([hash(t) & 0xFFFF for t in tups],
                            np.uint64)
        else:                 # collide within size classes only
            seth = sizes.astype(np.uint64)
        keep = dedupe_member_sets(seth, sizes, members)
        kept = [t for t, k in zip(tups, keep) if k]
        # the contract: NO distinct set is ever lost (a lost set is an
        # unrecoverable false negative). Redundant copies MAY survive
        # when adversarial collisions interleave equal sets with a
        # same-(hash, size, first-member) distinct set — the safe,
        # work-only direction — so exactly-once is NOT asserted here
        # (the deterministic adjacent-run collapse is covered below
        # and in test_dedupe_member_sets_collision_safe).
        assert set(kept) == set(tups)
        assert len(kept) <= len(tups)
        # all-copies-of-one-set always collapses to exactly one:
        # every group ties on every sort key, so the run is adjacent
        if n_groups:
            one = np.tile(members[:sizes[0]], n_groups)
            keep1 = dedupe_member_sets(
                np.zeros(n_groups, np.uint64),
                np.full(n_groups, sizes[0], np.int64), one)
            assert keep1.sum() == 1

    check()
