"""Parity at the REFERENCE configuration (the north-rule condition:
'at the reference's shingle/signature config'): default preset =
k=16, 512 hashes, m=3, θ=0.78, ordered 12/1536, min-olap 116
(main/MhapMain.java:60-91), run on long captions that pass the
116-char minimum — pipeline must reproduce the oracle exactly."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from mhray import oracle as O
from mhray.config import PRESETS, MhapConfig


def test_preset_constants_match_reference():
    d = PRESETS["default"]
    assert d.kmer_size == 16                # MhapMain.java:75
    assert d.num_hashes == 512              # :87
    assert d.num_min_matches == 3           # :83
    assert d.threshold == 0.78              # :67
    assert d.ordered_kmer_size == 12        # :89
    assert d.ordered_sketch_size == 1536    # :91
    assert d.max_shift == 0.2               # :77
    assert d.min_olap_length == 116         # :81 (k + 100)
    assert d.repeat_weight == 0.9           # :69
    assert d.repeat_idf_scale == 3.0        # :71
    assert d.filter_cutoff == 1.0e-5        # :73
    f = PRESETS["fast"]
    assert f.threshold == 0.80
    s = PRESETS["sensitive"]
    assert s.threshold == 0.73


def test_pack_unpack_roundtrip():
    from mhray.kernels import pack_bottom_sketch, unpack_bottom_sketch

    rng = np.random.default_rng(0)
    h = np.sort(rng.integers(-(2**31), 2**31, 100, dtype=np.int64).astype(np.int32))
    p = rng.permutation(100).astype(np.int32)
    blob = pack_bottom_sketch(h, p, 1234)
    h2, p2, l2 = unpack_bottom_sketch(blob)
    np.testing.assert_array_equal(h, h2)
    np.testing.assert_array_equal(p, p2)
    assert l2 == 1234


@pytest.fixture(scope="module")
def long_corpus(tmp_path_factory):
    """Corpus with captions long enough for the reference min-olap=116."""
    from mhray.synth import SynthSpec, write_corpus

    out = tmp_path_factory.mktemp("longcorpus")
    spec = SynthSpec(n_rows=400, caption_words=(25, 40), edit_rate=0.02,
                     seed=333)
    return write_corpus(str(out), spec, n_files=2)


def test_default_preset_pipeline_matches_oracle(long_corpus, ray_session,
                                                tmp_path_factory):
    from mhray.pipelines.dedup import pairs_with_ids, run_dedup

    cfg = PRESETS["default"]
    out = str(tmp_path_factory.mktemp("refrun"))
    res = run_dedup(long_corpus["images"], out, cfg, num_parts=4)
    pairs = pairs_with_ids(res, 4).take_all()

    imgs = pq.read_table(long_corpus["images"])
    orc = O.find_pairs(
        imgs.column("image_id").to_pylist(),
        imgs.column("caption").to_pylist(),
        np.asarray(imgs.column("phash"), dtype=np.int64),
        cfg,
    )
    oset = set(zip(orc.pairs.column("lo_id").to_pylist(),
                   orc.pairs.column("hi_id").to_pylist()))
    pset = {(p["lo_id"], p["hi_id"]) for p in pairs}
    assert oset == pset, (sorted(oset - pset)[:5], sorted(pset - oset)[:5])

    truth = pq.read_table(long_corpus["truth_pairs"])
    assert O.recall_against(truth, orc.pairs) >= 0.99
