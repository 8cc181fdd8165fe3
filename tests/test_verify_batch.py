"""verify_pairs_batch must be bit-identical to looping verify_pair —
on real candidate pairs from the pipeline AND on adversarial fuzz
(heavy hash collisions, tiny sketches, disjoint sketches)."""

import numpy as np
import pyarrow as pa
import pytest

from mhray.kernels import (pack_bottom_sketch, verify_pair,
                           verify_pairs_batch)


def _batch_inputs(sketches):
    """sketches: list of (h, p, seq_len) -> concatenated arrays."""
    hs = [np.asarray(s[0], np.int32) for s in sketches]
    ps = [np.asarray(s[1], np.int32) for s in sketches]
    k = np.array([len(h) for h in hs], np.int64)
    off = np.zeros(len(k) + 1, np.int64)
    np.cumsum(k, out=off[1:])
    h = np.concatenate(hs) if hs else np.empty(0, np.int32)
    p = np.concatenate(ps) if ps else np.empty(0, np.int32)
    lens = np.array([s[2] for s in sketches], np.int64)
    return h, p, off, lens


def _assert_parity(lo_sk, hi_sk, kmer_size=12, max_shift=0.2):
    h1, p1, off1, l1 = _batch_inputs(lo_sk)
    h2, p2, off2, l2 = _batch_inputs(hi_sk)
    ok, score, raw, a1, a2, b1, b2 = verify_pairs_batch(
        h1, p1, off1, l1, h2, p2, off2, l2, kmer_size, max_shift)
    for i, (a, b) in enumerate(zip(lo_sk, hi_sk)):
        res = verify_pair(np.asarray(a[0], np.int32),
                          np.asarray(a[1], np.int32), a[2],
                          np.asarray(b[0], np.int32),
                          np.asarray(b[1], np.int32), b[2],
                          kmer_size, max_shift)
        if res is None:
            assert not ok[i], f"pair {i}: batch ok, scalar None"
        else:
            assert ok[i], f"pair {i}: scalar ok, batch dropped"
            assert score[i] == res.score, f"pair {i} score"
            assert raw[i] == res.raw_score, f"pair {i} raw"
            assert (a1[i], a2[i], b1[i], b2[i]) == (
                res.a1, res.a2, res.b1, res.b2), f"pair {i} edges"


def _rand_sketch(rng, n_kmers, sketch_size, vocab):
    """Random bottom sketch with realistic collision density."""
    hashes = rng.integers(-vocab, vocab, n_kmers).astype(np.int32)
    perm = np.argsort(hashes, kind="stable")[:sketch_size]
    return hashes[perm], perm.astype(np.int32), n_kmers


def _derived_sketch(rng, base, edit_rate, vocab):
    """Mutated copy of a base hash stream = a plausible near-dup."""
    h = base.copy()
    flips = rng.random(len(h)) < edit_rate
    h[flips] = rng.integers(-vocab, vocab, int(flips.sum())).astype(np.int32)
    perm = np.argsort(h, kind="stable")[:min(512, len(h))]
    return h[perm], perm.astype(np.int32), len(h)


def test_parity_fuzz_near_dups():
    rng = np.random.default_rng(11)
    lo_sk, hi_sk = [], []
    for _ in range(300):
        n = int(rng.integers(8, 400))
        vocab = int(rng.choice([50, 1000, 2 ** 30]))  # heavy..no collisions
        base = rng.integers(-vocab, vocab, n).astype(np.int32)
        perm = np.argsort(base, kind="stable")[:min(512, n)]
        lo_sk.append((base[perm], perm.astype(np.int32), n))
        hi_sk.append(_derived_sketch(rng, base, float(rng.choice(
            [0.0, 0.05, 0.3, 0.9])), vocab))
    _assert_parity(lo_sk, hi_sk)


def test_parity_fuzz_random_pairs():
    rng = np.random.default_rng(12)
    lo_sk, hi_sk = [], []
    for _ in range(300):
        vocab = int(rng.choice([20, 300, 10 ** 6]))
        lo_sk.append(_rand_sketch(rng, int(rng.integers(4, 200)), 128, vocab))
        hi_sk.append(_rand_sketch(rng, int(rng.integers(4, 200)), 128, vocab))
    _assert_parity(lo_sk, hi_sk)


def test_parity_edge_shapes():
    rng = np.random.default_rng(13)
    # tiny sketches, identical sketches, all-equal hashes
    same = _rand_sketch(rng, 50, 32, 1000)
    allsame_h = np.zeros(20, np.int32)
    allsame = (allsame_h, np.arange(20, dtype=np.int32), 20)
    tiny = (np.array([5], np.int32), np.array([0], np.int32), 1)
    lo_sk = [same, allsame, tiny, same]
    hi_sk = [same, allsame, same, tiny]
    _assert_parity(lo_sk, hi_sk)


def test_parity_on_pipeline_candidates(ray_session):
    """Every candidate pair of the sf0.001 documents corpus must get
    the identical verdict from both kernels."""
    import ray

    from mhray.config import PRESETS
    from mhray.pipelines.queries import _read
    from mhray.stages.candidates import minhash_candidates
    from mhray.stages.dedup import docs_as_images
    from mhray.stages.sketch import sketch_dataset
    from mhray.stages.verify import _sketch_concat, attach_sketches

    cfg = PRESETS["captions"].with_(threshold=0.9)
    docs = _read("/root/testdata/sf0.001", "documents", ["doc_id", "text"])
    sk = sketch_dataset(docs_as_images(docs), cfg, decode_pixels=False)
    valid = sk.filter(expr="valid == True").materialize()
    cands = minhash_candidates(valid, cfg, 4).materialize()
    j = attach_sketches(cands, valid, 4).materialize()
    tbl = pa.concat_tables([ray.get(r) for r in j.to_arrow_refs()],
                           promote_options="default")
    assert tbl.num_rows > 50  # the corpus must actually produce candidates
    h1, p1, off1, l1 = _sketch_concat(tbl.column("bs_blob_lo"))
    h2, p2, off2, l2 = _sketch_concat(tbl.column("bs_blob_hi"))
    lo_sk = [(h1[off1[i]:off1[i + 1]], p1[off1[i]:off1[i + 1]], int(l1[i]))
             for i in range(tbl.num_rows)]
    hi_sk = [(h2[off2[i]:off2[i + 1]], p2[off2[i]:off2[i + 1]], int(l2[i]))
             for i in range(tbl.num_rows)]
    _assert_parity(lo_sk, hi_sk,
                   kmer_size=cfg.ordered_kmer_size, max_shift=cfg.max_shift)
