"""Sampled sensitivity/specificity/PPV estimation — the EstimateROC
analog (main/EstimateROC.java:173-263; sampling :355-365, estimates
:802-886; ~1% precision at 10 000 trials, docs/source/utilities.rst:19).

Estimates, against a ground-truth pair set:
- sensitivity (recall): P(found | true pair), sampled from truth pairs
- PPV (precision): P(true | found pair), sampled from found pairs
- specificity: P(not found | non-pair), sampled from random non-pairs
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _pair_set(tbl: pa.Table) -> set[tuple[str, str]]:
    return set(zip(tbl.column("lo_id").to_pylist(),
                   tbl.column("hi_id").to_pylist()))


def estimate_roc(truth_pairs: pa.Table, found_pairs: pa.Table,
                 all_ids: list[str], n_trials: int = 10_000,
                 seed: int = 42) -> dict:
    rng = np.random.default_rng(seed)
    truth = _pair_set(truth_pairs)
    found = _pair_set(found_pairs)

    # sensitivity: sample truth pairs, check membership in found
    tl = list(truth)
    if tl:
        idx = rng.integers(0, len(tl), size=min(n_trials, 10 * len(tl)))
        sens = float(np.mean([tl[i] in found for i in idx]))
    else:
        sens = 1.0

    # PPV: sample found pairs, check membership in truth
    fl = list(found)
    if fl:
        idx = rng.integers(0, len(fl), size=min(n_trials, 10 * len(fl)))
        ppv = float(np.mean([fl[i] in truth for i in idx]))
    else:
        ppv = 1.0

    # specificity: random id pairs not in truth must not be in found
    ids = np.asarray(all_ids)
    hits = 0
    trials = 0
    while trials < n_trials:
        a, b = rng.integers(0, len(ids), size=2)
        if a == b:
            continue
        lo, hi = sorted((ids[a], ids[b]))
        if (lo, hi) in truth:
            continue
        trials += 1
        if (lo, hi) in found:
            hits += 1
    spec = 1.0 - hits / max(1, trials)

    return {
        "sensitivity": round(sens, 4),
        "ppv": round(ppv, 4),
        "specificity": round(spec, 4),
        "n_trials": n_trials,
        "n_truth": len(truth),
        "n_found": len(found),
    }
