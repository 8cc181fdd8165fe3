"""Calibration harness (KmerStatSimulator analog) + the cluster
PSNR-invariant validation operator over real pipeline output."""

import numpy as np
import pytest

from mhray.config import PRESETS


def test_calibration_estimator_quality():
    """MinHash estimates must track exact Jaccard (the reference's
    calibration claim) and separate related from random pairs."""
    from mhray.calibrate import calibrate

    cfg = PRESETS["captions"].with_(num_hashes=256)
    r = calibrate(cfg, n_pairs=30, text_len=250, edit_rate=0.05, seed=5)
    assert r["minhash_abs_err_mean"] < 0.05
    assert r["separation"] > 0.2
    assert r["related_score_mean"] > 0.8        # verify-score on 5% edits
    assert r["random_minhash_mean"] < 0.05


def test_calibration_rate_sweep():
    from mhray.calibrate import calibrate

    cfg = PRESETS["captions"].with_(num_hashes=128)
    means = []
    for rate in (0.01, 0.10, 0.30):
        r = calibrate(cfg, n_pairs=15, text_len=200, edit_rate=rate, seed=7)
        means.append(r["related_minhash_mean"])
    assert means[0] > means[1] > means[2]       # monotone in edit rate


def test_cluster_invariant_on_pipeline_output(pipeline_run, small_corpus,
                                              ray_session):
    """Every multi-member cluster the flagship emits satisfies the
    decoded-pixel PSNR >= 40 dB invariant vs its representative."""
    import ray.data

    from mhray.stages.validate import validate_clusters

    images = ray.data.read_parquet(small_corpus["images"])
    clusters = pipeline_run["res"]["clusters"]
    out = validate_clusters(images, clusters, num_parts=4).take_all()
    assert len(out) > 50                         # clusters actually formed
    bad = [r for r in out if not r["psnr_ok"]]
    assert not bad, bad[:5]
