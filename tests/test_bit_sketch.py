"""F5 MinHash bit-sketch (sketch/MinHashBitSketch.java:38-90): kernel
bit-exactness vs a scalar transcription, estimator sanity, and the
opt-in pre-filter leaving flagship pairs unchanged."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _get_as_bits_scalar(minhashes):
    """Line-by-line transcription of MinHashBitSketch.getAsBits."""
    num_words = len(minhashes) // 64
    bits = []
    bit_count = 0
    for _ in range(num_words):
        curr = 0
        for _ in range(64):
            curr = ((curr << 1) | (int(minhashes[bit_count]) & 1)) & (2**64 - 1)
            bit_count += 1
        if curr >= 2**63:
            curr -= 2**64
        bits.append(curr)
    return bits


def test_bit_sketch_matches_scalar_transcription():
    from mhray.kernels import minhash_bit_sketch

    rng = np.random.default_rng(5)
    sig = rng.integers(-2**31, 2**31, size=(20, 256)).astype(np.int32)
    words = minhash_bit_sketch(sig)
    assert words.shape == (20, 4)
    for r in range(20):
        assert list(words[r]) == _get_as_bits_scalar(sig[r]), r


def test_bit_sketch_jaccard_estimator():
    from mhray.kernels import bit_sketch_jaccard, minhash_bit_sketch

    rng = np.random.default_rng(6)
    # identical signatures -> estimate 1.0; independent -> ~0.0
    a = rng.integers(-2**31, 2**31, size=(1, 1024)).astype(np.int32)
    b = rng.integers(-2**31, 2**31, size=(1, 1024)).astype(np.int32)
    wa, wb = minhash_bit_sketch(a), minhash_bit_sketch(b)
    assert bit_sketch_jaccard(wa, wa)[0] == 1.0
    assert bit_sketch_jaccard(wa, wb)[0] < 0.15
    # half-shared slots -> estimate ~0.5
    c = a.copy()
    c[0, ::2] = b[0, ::2]
    wc = minhash_bit_sketch(c)
    est = bit_sketch_jaccard(wa, wc)[0]
    assert 0.35 < est < 0.65, est


def test_bit_prefilter_preserves_flagship_pairs(ray_session, small_corpus):
    import ray.data

    from mhray.config import PRESETS
    from mhray.stages.dedup import minhash_text_pairs

    imgs = pq.read_table(small_corpus["images"])
    captions = imgs.column("caption").to_pylist()[:300]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(captions)), pa.int64()),
        "text": pa.array(captions),
    }))

    base_cfg = PRESETS["captions"]
    base = {(r["lo"], r["hi"]) for r in minhash_text_pairs(ds, base_cfg).take_all()}
    # floor below the weakest accepted pair's signature jaccard (~0.086
    # on this fixture): the filter must kill junk candidates only
    filt_cfg = base_cfg.with_(bit_prefilter=True, bit_prefilter_min=0.05)
    filt = {(r["lo"], r["hi"]) for r in minhash_text_pairs(ds, filt_cfg).take_all()}
    assert base, "fixture produced no pairs; test is vacuous"
    assert filt == base
