"""Synthetic corpus generator invariants."""

import numpy as np
import pyarrow.parquet as pq

from mhray.imageops import decode_image, psnr
from mhray.synth import SynthSpec, generate_corpus


def test_corpus_deterministic():
    spec = SynthSpec(n_rows=200, seed=99)
    a, _, _ = generate_corpus(spec)
    b, _, _ = generate_corpus(spec)
    assert a.equals(b)


def test_corpus_schema_and_truth(small_corpus):
    images = pq.read_table(small_corpus["images"])
    assert images.column_names == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    assert images.num_rows == 1000
    clusters = pq.read_table(small_corpus["truth_clusters"])
    pairs = pq.read_table(small_corpus["truth_pairs"])
    assert clusters.num_rows == 1000
    assert pairs.num_rows > 100
    # ids unique
    ids = images.column("image_id").to_pylist()
    assert len(set(ids)) == len(ids)


def test_cluster_invariant_psnr_and_caption(small_corpus):
    """Every planted dup pair satisfies the per-row invariant family:
    decoded-pixel PSNR >= 40 dB and caption within edit distance."""
    images = pq.read_table(small_corpus["images"])
    pairs = pq.read_table(small_corpus["truth_pairs"]).to_pydict()
    by_id = {
        r["image_id"]: r
        for r in images.to_pylist()
    }
    checked = 0
    for lo, hi in list(zip(pairs["lo_id"], pairs["hi_id"]))[:100]:
        a, b = by_id[lo], by_id[hi]
        ia = decode_image(a["bytes"], a["fmt"])
        ib = decode_image(b["bytes"], b["fmt"])
        assert psnr(ia, ib) >= 40.0, (lo, hi)
        checked += 1
    assert checked > 0


def test_adversarial_rows_present(small_corpus):
    images = pq.read_table(small_corpus["images"])
    caps = images.column("caption").to_pylist()
    # short/empty captions exist
    assert any(len(c) < 12 for c in caps)
    # a hot boilerplate caption is shared by many rows
    from collections import Counter

    common = Counter(caps).most_common(1)[0]
    assert common[1] >= 10
