"""Sketch-alignment path: window bounds, one-skip DP parity vs a direct
transcription of Aligner.localAlignOneSkip, blob roundtrip, and
coordinate recovery on planted overlaps."""

import numpy as np
import pyarrow as pa
import pytest

from mhray.align import local_align_one_skip, sketch_overlap_info
from mhray.kernels import (bit_subsketches, bit_words_jaccard_matrix,
                           subsketch_window_bounds)
from mhray.stages.sketch_align import (pack_subsketch, sketch_align_pairs,
                                       unpack_subsketch)


def ref_windows(L, step, k):
    """Direct transcription of computeSequencesDouble's bounds
    (MinHashBitSequenceSubSketches.java:76-91)."""
    rem = L % step
    num = (L - rem) // step - 1
    if rem >= step // 2 and rem >= k:
        num += 1
    out, start = [], 0
    for _ in range(max(num, 0)):
        end = min(L, start + 2 * step)
        out.append((max(0, end - 2 * step), end))
        start += step
    return out


def test_window_bounds_match_reference_rule():
    for L in range(0, 400):
        for step, k in [(50, 7), (16, 7), (10, 4)]:
            wo, cs, en = subsketch_window_bounds(np.array([L]), step, k)
            assert list(zip(cs.tolist(), en.tolist())) == \
                ref_windows(L, step, k), (L, step)
    # batched = per-doc concatenation
    Ls = np.array([0, 49, 75, 100, 353])
    wo, cs, en = subsketch_window_bounds(Ls, 50, 7)
    flat = [w for L in Ls for w in ref_windows(int(L), 50, 7)]
    assert list(zip(cs.tolist(), en.tolist())) == flat
    assert wo.tolist() == np.cumsum(
        [0] + [len(ref_windows(int(L), 50, 7)) for L in Ls]).tolist()


def brute_one_skip(sim, go=0.0, off=-0.52):
    """Cell-by-cell float32 transcription of localAlignOneSkip
    (align/Aligner.java:226-341, storePath backtrace)."""
    A, B = sim.shape
    D = np.zeros((A + 1, B + 1), np.float32)
    P = np.zeros_like(D)
    S = np.zeros_like(D)
    maxv = np.float32(0.0)
    mi = mj = 0
    for i in range(1, A + 1):
        for j in range(1, B + 1):
            s = np.float32(sim[i - 1, j - 1]) + np.float32(off)
            P[i, j] = max(D[i - 1, j] + np.float32(go),
                          D[i, j - 1] + np.float32(go))
            D[i, j] = S[i - 1, j - 1] + s
            S[i, j] = max(P[i, j], D[i, j])
            if i == A:
                S[i, j] = max(S[i, j], S[i, j - 1])
            if j == B:
                S[i, j] = max(S[i, j], S[i - 1, j])
            if S[i, j] > maxv and (i == A or j == B):
                maxv, mi, mj = S[i, j], i, j
    i, j = mi, mj
    while i > 0 and j > 0:
        if S[i, j] == D[i - 1, j] + np.float32(go):
            i -= 1
        elif S[i, j] == D[i, j - 1] + np.float32(go):
            j -= 1
        else:
            i -= 1
            j -= 1
    return float(maxv), i, max(0, mi - 1), j, max(0, mj - 1)


def test_one_skip_dp_matches_transcription():
    rng = np.random.default_rng(0)
    for t in range(600):
        A = int(rng.integers(1, 10))
        B = int(rng.integers(1, 10))
        sim = rng.random((A, B))
        if t % 3 == 0:      # negative-heavy exercises the score<=0 path
            sim = sim - 0.8
        for go in (0.0, -0.1):
            assert local_align_one_skip(sim, go) == brute_one_skip(sim, go)
    assert local_align_one_skip(np.empty((0, 3))) == (0.0, 0, 0, 0, 0)


def test_subsketch_blob_roundtrip():
    w = np.arange(12, dtype=np.int64).reshape(3, 4)
    w2, L = unpack_subsketch(pack_subsketch(w, 123))
    assert (w2 == w).all() and L == 123
    w0, L0 = unpack_subsketch(pack_subsketch(np.empty((0, 4), np.int64), 7))
    assert w0.shape[0] == 0 and L0 == 7


def test_identical_texts_full_overlap():
    text = "the quick brown fox jumps over the lazy dog " * 8  # 352 units
    words, offs, lens, valid = bit_subsketches([text, text], k=7, step=50,
                                               num_words=20)
    assert valid.all()
    a = words[offs[0]:offs[1]]
    b = words[offs[1]:offs[2]]
    assert (a == b).all()
    J = bit_words_jaccard_matrix(a, b)
    assert np.allclose(np.diag(J), 1.0)
    info = sketch_overlap_info(J, int(lens[0]), int(lens[1]), 50)
    assert info["raw_score"] > 0
    # overlap spans from unit 0 to within 3*step of the end on both
    # sides (the reference maps the end ELEMENT — a window pair — to
    # its first window's step slot, AlignElementDoubleSketch.java:73,
    # so the tail is coarse by up to ~2 windows + the sub-step tail)
    assert info["a1"] == 0 and info["b1"] == 0
    assert info["a2"] >= int(lens[0]) - 1 - 3 * 50
    assert info["b2"] == info["a2"]


def test_shifted_overlap_coordinates(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    alpha = list("abcdefghijklmnopqrstuvwxyz ")

    def rnd(n):
        return "".join(rng.choice(alpha, n))

    shared = ("the quick brown fox jumps over the lazy dog and runs far "
              "away into the night while nobody watches the fields ") * 4
    t0 = rnd(200) + shared + rnd(100)
    t1 = shared + rnd(350)
    t2 = rnd(len(t0))
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([t0, t1, t2], pa.string())}))
    pairs = ray.data.from_arrow(pa.table({
        "lo": pa.array([0, 0], pa.int64()),
        "hi": pa.array([1, 2], pa.int64())}))
    out = sketch_align_pairs(docs, pairs, k=7, step=50,
                             num_words=20).to_pandas()
    # the unrelated pair (0,2) has no positive alignment -> dropped
    assert len(out) == 1 and out.iloc[0]["hi"] == 1
    dup = out.iloc[0]
    # shared block sits at unit 200 in t0 / unit 0 in t1 — recovered at
    # window (step) granularity
    assert dup["raw_sc"] > 0
    assert abs(dup["a1"] - 200) <= 50
    assert dup["b1"] <= 50
    assert dup["a2"] >= 200 + len(shared) - 100
    assert dup["b2"] >= len(shared) - 100


def test_short_docs_dropped(ray_session):
    import ray.data

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["tiny", "x" * 200], pa.string())}))
    pairs = ray.data.from_arrow(pa.table({
        "lo": pa.array([0], pa.int64()),
        "hi": pa.array([1], pa.int64())}))
    out = sketch_align_pairs(docs, pairs, k=7, step=50,
                             num_words=8).to_pandas()
    assert len(out) == 0  # doc 0 has no alignable windows -> pair dropped


def test_attach_payload_both_paths(ray_session):
    """Broadcast (one prepared side) and shuffle-fallback paths of
    attach_payload_both produce the same inner-join result."""
    import ray.data

    from mhray.rayutil import attach_payload_both

    side = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["a", "b", "c", "d"], pa.string())})).materialize()
    pairs = ray.data.from_arrow(pa.table({
        "lo": pa.array([1, 2, 9], pa.int64()),      # 9 matches nothing
        "hi": pa.array([3, 9, 4], pa.int64())}))    # -> only (1,3) kept
    kw = dict(
        pairs_schema=pa.schema([("lo", pa.int64()), ("hi", pa.int64())]),
        side_schema=pa.schema([("doc_id", pa.int64()),
                               ("text", pa.string())]))
    want = [(1, 3, "a", "c")]
    for thresh in (1_000_000, 0):    # broadcast, then shuffle fallback
        out = attach_payload_both(pairs, side, "doc_id", ("text",),
                                  num_parts=4,
                                  broadcast_threshold_rows=thresh,
                                  **kw).to_pandas()
        got = sorted(map(tuple,
                         out[["lo", "hi", "text_lo", "text_hi"]]
                         .values.tolist()))
        assert got == want, thresh


def test_degenerate_empty_inputs(ray_session):
    """Zero-row corpora/pair sets flow through (regression: a zero-
    block broadcast side raised KeyError in the payload/semi joins)."""
    import ray.data

    from mhray.stages.ann import knn_label_agreement, label_centroid_dist

    empty_docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    empty_pairs = ray.data.from_arrow(pa.table({
        "lo": pa.array([], pa.int64()), "hi": pa.array([], pa.int64())}))
    assert sketch_align_pairs(empty_docs, empty_pairs).count() == 0

    empty_emb = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32())),
        "label": pa.array([], pa.int32())}))
    assert label_centroid_dist(empty_emb).count() == 0
    assert knn_label_agreement(empty_emb).count() == 0

    # pairs referencing docs absent from the corpus are dropped
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["x" * 200], pa.string())}))
    pairs = ray.data.from_arrow(pa.table({
        "lo": pa.array([8], pa.int64()), "hi": pa.array([9], pa.int64())}))
    assert sketch_align_pairs(docs, pairs).count() == 0
