"""The --settings sensitive preset must recover recall the captions
preset loses in the edit-noise band between their gates — the
actionable claim CALIBRATION.md publishes (reference preset deltas:
threshold 0.73, 768 hashes, min matches 2, main/MhapMain.java:137-198).
"""

import numpy as np


def test_sensitive_recovers_missed_pairs():
    from mhray.calibrate import threshold_recall_curve
    from mhray.config import PRESETS

    curve = threshold_recall_curve(
        {"captions": PRESETS["captions"],
         "sensitive": PRESETS["captions_sensitive"]},
        rates=(0.05, 0.15, 0.20), n_pairs=40, seed=5)

    by_rate = {r["edit_rate"]: r for r in curve}
    # sensitive never loses a pair captions found (paired texts, wider
    # candidate gate + lower threshold -> acceptance is monotone)
    for r in curve:
        assert r["sensitive_accept_rate"] >= r["captions_accept_rate"], r
    # light noise: both presets near-perfect
    assert by_rate[0.05]["captions_accept_rate"] >= 0.95
    # the tuning band: sensitive recovers a real fraction of the
    # captions misses (pinned seed; measured gap ~0.11 at rate 0.20)
    mid = by_rate[0.20]
    missed = 1.0 - mid["captions_accept_rate"]
    recovered = (mid["sensitive_accept_rate"]
                 - mid["captions_accept_rate"])
    assert missed > 0.3                      # the band genuinely hurts
    assert recovered / missed >= 0.10, (missed, recovered)


def test_curve_is_deterministic():
    from mhray.calibrate import threshold_recall_curve
    from mhray.config import PRESETS

    kw = dict(cfgs={"c": PRESETS["captions"]}, rates=(0.12,),
              n_pairs=10, seed=9)
    a = threshold_recall_curve(**kw)
    b = threshold_recall_curve(**kw)
    assert a == b
    assert 0.0 <= a[0]["c_accept_rate"] <= 1.0
    assert np.isfinite(a[0]["exact_jaccard_mean"])
