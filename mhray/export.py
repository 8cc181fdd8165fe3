"""Output formatting / export utilities.

- m4_lines: the reference's human-readable M4-like overlap line format
  (impl/MatchResult.java:98-113; documented docs/source/quickstart.rst:60-70):
  ``fromId toId error sharedMinHashes a_fwd a_start a_end a_len b_fwd
  b_start b_end b_len``. We emit error = 1 - score and fwd flags 0
  (text has no strand).
- histogram_stats: streaming mean/std (Welford) + percentile over a
  value->count histogram (main/GetHistogramStats.java:63-90), as a Ray
  aggregate over any numeric column.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def m4_lines(batch: pa.Table) -> pa.Table:
    """pairs batch -> one formatted M4 text line per pair."""
    lo = np.asarray(batch.column("lo"))
    hi = np.asarray(batch.column("hi"))
    score = np.asarray(batch.column("score"), dtype=np.float64)
    shared = (np.asarray(batch.column("shared_slots"))
              if "shared_slots" in batch.column_names
              else np.zeros(len(lo), dtype=np.int64))
    a1 = np.asarray(batch.column("a1")) if "a1" in batch.column_names else np.zeros(len(lo), np.int64)
    a2 = np.asarray(batch.column("a2")) if "a2" in batch.column_names else np.zeros(len(lo), np.int64)
    b1 = np.asarray(batch.column("b1")) if "b1" in batch.column_names else np.zeros(len(lo), np.int64)
    b2 = np.asarray(batch.column("b2")) if "b2" in batch.column_names else np.zeros(len(lo), np.int64)
    lines = [
        f"{lo[i]} {hi[i]} {1.0 - score[i]:.6f} {shared[i]} "
        f"0 {a1[i]} {a2[i]} 0 0 {b1[i]} {b2[i]} 0"
        for i in range(len(lo))
    ]
    return pa.table({"line": pa.array(lines, pa.string())})


def write_m4(pairs_ds, path: str) -> None:
    """Write the pairs dataset as M4-like text (one shard per block)."""
    import os

    os.makedirs(path, exist_ok=True)
    lines_ds = pairs_ds.map_batches(m4_lines, batch_format="pyarrow",
                                    zero_copy_batch=True)
    for i, batch in enumerate(lines_ds.iter_batches(batch_format="pyarrow")):
        with open(os.path.join(path, f"part-{i:05d}.m4"), "w") as f:
            f.write("\n".join(batch.column("line").to_pylist()))
            if batch.num_rows:
                f.write("\n")


def histogram_stats(ds, col: str, percentile: float = 0.9) -> dict:
    """mean / std / percentile cut of a numeric column, computed from a
    value->count grouped histogram (GetHistogramStats analog) — one
    small groupby, no full materialization of the raw column."""
    hist = ds.groupby(col).count().rename_columns({"count()": "n"}).take_all()
    vals = np.array([r[col] for r in hist], dtype=np.float64)
    cnts = np.array([r["n"] for r in hist], dtype=np.int64)
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    total = cnts.sum()
    mean = float((vals * cnts).sum() / total)
    var = float((cnts * (vals - mean) ** 2).sum() / total)
    cum = np.cumsum(cnts)
    cut_idx = int(np.searchsorted(cum, percentile * total))
    return {
        "mean": mean,
        "std": float(np.sqrt(var)),
        "percentile": float(vals[min(cut_idx, len(vals) - 1)]),
        "n": int(total),
    }
