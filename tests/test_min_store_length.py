"""min_store_length pair rules (MinHashSearch.java:210-225): the
distributed gate must reproduce the oracle exactly when short/long
asymmetric rules are active — a pair survives only if at least one
side is >= min_store_length."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _doc_pairs(res_rows):
    return {(r["lo"], r["hi"]) for r in res_rows}


def test_min_store_length_matches_oracle(ray_session, small_corpus):
    import ray.data

    from mhray import oracle as O
    from mhray.config import PRESETS
    from mhray.stages.dedup import minhash_text_pairs

    imgs = pq.read_table(small_corpus["images"])
    captions = imgs.column("caption").to_pylist()[:400]
    lens = np.array([len(c) for c in captions])
    msl = int(np.percentile(lens, 60))  # both shorts and longs exist
    cfg = PRESETS["captions"].with_(min_store_length=msl)

    ids = [f"doc_{i:012d}" for i in range(len(captions))]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(captions)), pa.int64()),
        "text": pa.array(captions),
    }))

    got = _doc_pairs(minhash_text_pairs(ds, cfg).take_all())
    orc = O.find_pairs(ids, captions, np.zeros(len(captions), np.int64),
                       cfg, require_phash=False)
    exp = {(int(l.rsplit("_", 1)[1]), int(h.rsplit("_", 1)[1]))
           for l, h in zip(orc.pairs.column("lo_id").to_pylist(),
                           orc.pairs.column("hi_id").to_pylist())}
    assert got == exp, (sorted(got - exp)[:5], sorted(exp - got)[:5])

    # the rule must actually bite: without it there are MORE pairs,
    # and every dropped pair is short-short
    cfg0 = cfg.with_(min_store_length=0)
    base = _doc_pairs(minhash_text_pairs(ds, cfg0).take_all())
    dropped = base - got
    assert dropped, "no short-short pairs in fixture; test is vacuous"
    for lo, hi in dropped:
        assert lens[lo] < msl and lens[hi] < msl
    assert got <= base
