"""EstimateROC-analog harness + skew stress (hot boilerplate caption)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mhray.config import PRESETS
from mhray.roc import estimate_roc


def test_roc_harness_perfect_detector(small_corpus):
    truth = pq.read_table(small_corpus["truth_pairs"])
    images = pq.read_table(small_corpus["images"])
    ids = images.column("image_id").to_pylist()
    r = estimate_roc(truth, truth, ids, n_trials=2000)
    assert r["sensitivity"] == 1.0
    assert r["ppv"] == 1.0
    assert r["specificity"] == 1.0


def test_roc_harness_detects_misses(small_corpus):
    truth = pq.read_table(small_corpus["truth_pairs"])
    half = truth.slice(0, truth.num_rows // 2)
    images = pq.read_table(small_corpus["images"])
    ids = images.column("image_id").to_pylist()
    r = estimate_roc(truth, half, ids, n_trials=2000)
    assert 0.3 < r["sensitivity"] < 0.7
    assert r["ppv"] == 1.0


@pytest.fixture(scope="module")
def skew_corpus(tmp_path_factory):
    """20% of rows share ONE boilerplate caption (distinct images)."""
    from mhray.synth import SynthSpec, write_corpus

    out = tmp_path_factory.mktemp("skew")
    spec = SynthSpec(n_rows=2000, boilerplate_fraction=0.2,
                     dup_fraction=0.2, seed=555)
    return write_corpus(str(out), spec, n_files=4)


def test_skew_boilerplate_does_not_explode(skew_corpus, ray_session,
                                           tmp_path_factory):
    """A hot caption shared by 400 non-dup rows must neither blow up the
    LSH shuffle (rep collapsing) nor leak false-positive pairs (pHash
    gate), and recall on true dups must hold."""
    import time

    from mhray import oracle as O
    from mhray.pipelines.dedup import pairs_with_ids, run_dedup

    out = str(tmp_path_factory.mktemp("skewrun"))
    cfg = PRESETS["captions"]
    t0 = time.time()
    res = run_dedup(skew_corpus["images"], out, cfg, num_parts=4)
    pairs = pairs_with_ids(res, 4).take_all()
    elapsed = time.time() - t0
    assert elapsed < 120, f"skew run took {elapsed:.0f}s"

    truth = pq.read_table(skew_corpus["truth_pairs"])
    got = pa.table({
        "lo_id": [p["lo_id"] for p in pairs],
        "hi_id": [p["hi_id"] for p in pairs],
    })
    assert O.recall_against(truth, got) >= 0.99
    # no boilerplate explosion: found pairs bounded by ~truth size
    assert len(pairs) <= truth.num_rows * 1.2 + 10

    # precision: boilerplate rows must not pair with each other
    images = pq.read_table(skew_corpus["images"])
    caps = images.column("caption").to_pylist()
    ids = images.column("image_id").to_pylist()
    from collections import Counter

    hot_caption = Counter(caps).most_common(1)[0][0]
    hot_ids = {i for i, c in zip(ids, caps) if c == hot_caption}
    boiler_pairs = [p for p in pairs
                    if p["lo_id"] in hot_ids and p["hi_id"] in hot_ids]
    assert not boiler_pairs, boiler_pairs[:5]
