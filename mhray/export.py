"""Overlap-line formats: writer, parsers, and histogram export.

- m4_lines / write_m4: the reference's human-readable M4-like overlap
  line format (impl/MatchResult.java:98-113; documented
  docs/source/quickstart.rst:60-70): ``fromId toId error
  sharedMinHashes a_fwd a_start a_end a_len b_fwd b_start b_end
  b_len``. We emit error = 1 - score and fwd flags 0 (text has no
  strand).
- read_overlaps: the validation-side parsers
  (main/EstimateROC.java:375-476, getOverlapInfo) — auto-detects CA
  (6/7 fields), MHAP M4 (12), BLASR M4 (13) and bracketed
  layout-diff lines (13-18 with ``[a..b]`` ranges) per line, exactly
  as the reference does, and returns a canonical (lo_id, hi_id, ...)
  pair Dataset consumable by mhray.roc.estimate_roc.
- histogram_stats: streaming mean/std + percentile over a
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


def parse_overlap_line(line: str,
                       lengths: dict[str, int] | None = None) -> dict | None:
    """One overlap line -> dict, mirroring getOverlapInfo
    (EstimateROC.java:375-476). Returns None for unparseable lines
    (the reference warns and emits an empty Overlap).

    ``lengths`` (id -> sequence length) enables the coordinate
    arithmetic the reference only does when sequences are loaded:
    CA-format coordinate reconstruction and reverse-strand flips.
    """
    f = line.strip().split()
    try:
        if len(f) in (6, 7):
            # CA format (:381-396): id1 id2 orient a_off b_off score
            id1, id2 = f[0], f[1]
            fwd = f[2].upper() == "N"
            score = float(f[5]) * 5
            a1 = a2 = b1 = b2 = 0
            if lengths is not None and id1 in lengths and id2 in lengths:
                aoff, boff = int(f[3]), int(f[4])
                alen, blen = lengths[id1], lengths[id2]
                a1 = max(0, aoff)
                a2 = min(alen, alen + boff)
                b1 = -1 * min(0, aoff)
                b2 = min(blen, blen - boff)
        elif len(f) == 12:
            # MHAP M4 (:398-418): id1 id2 err shared a_fwd a1 a2 alen
            # b_fwd b1 b2 blen
            id1, id2 = f[0], f[1]
            score = float(f[2])
            fwd = int(f[8]) == 0
            a1, a2, b1, b2 = int(f[5]), int(f[6]), int(f[9]), int(f[10])
            if lengths is not None:
                if id1 in lengths:
                    a2 = min(a2, lengths[id1])
                if id2 in lengths:
                    b2 = min(b2, lengths[id2])
        elif len(f) == 13 and "[" not in line:
            # BLASR M4 (:420-452): ids may carry /suffix or csv prefix
            a1, a2 = int(f[5]), int(f[6])
            b1, b2 = int(f[9]), int(f[10])
            fwd = int(f[8]) == 0
            if not fwd:
                blen_col = int(f[11])
                b1, b2 = blen_col - int(f[10]), blen_col - int(f[9])
            id1 = f[0].split("/")[0]
            if "," in id1:
                id1 = id1.split(",")[1]
            id2 = f[1]
            if "," in id2:
                id2 = id2.split(",")[1]
            score = float(f[3])
            if lengths is not None:
                if id1 in lengths:
                    a2 = min(a2, lengths[id1])
                if id2 in lengths:
                    b2 = min(b2, lengths[id2])
        elif 13 <= len(f) <= 18 and "[" in line:
            # layout-diff lines (:454-469):
            #   1  1,182 n [4,746..8,108] x [0..3,896] : < 982 diffs ...
            id1 = f[0].replace(",", "")
            id2 = f[1].replace(",", "")
            fwd = f[2].lower() == "n"
            parts = line.split("[")
            a_info = parts[1][:parts[1].index("]")].replace(",", "")
            b_info = parts[2][:parts[2].index("]")].replace(",", "")
            a1, a2 = (int(x.strip()) for x in a_info.split(".."))
            b1, b2 = (int(x.strip()) for x in b_info.split(".."))
            if not fwd and lengths is not None and id2 in lengths:
                blen = lengths[id2]
                b1, b2 = blen - b2, blen - b1
            score = 0.0
        else:
            return None
    except (ValueError, IndexError):
        return None
    return {"id1": id1, "id2": id2, "score": score, "fwd": fwd,
            "a1": a1, "a2": a2, "b1": b1, "b2": b2}


_OVL_SCHEMA = {
    "lo_id": pa.string(), "hi_id": pa.string(), "score": pa.float64(),
    "fwd": pa.bool_(),
    "a1": pa.int64(), "a2": pa.int64(), "b1": pa.int64(), "b2": pa.int64(),
}


def parse_overlap_batch(batch: pa.Table,
                        lengths: dict[str, int] | None = None) -> pa.Table:
    """Batch of raw text lines -> canonical pair rows. The pair key is
    canonicalized to (lo_id, hi_id) by string order with the overlap
    edge swapped to match, so downstream set logic (estimate_roc) is
    orientation-free; self-pairs and unparseable lines are dropped."""
    cols: dict[str, list] = {k: [] for k in _OVL_SCHEMA}
    for line in batch.column("text").to_pylist():
        o = parse_overlap_line(line, lengths)
        if o is None or o["id1"] == o["id2"]:
            continue
        if o["id1"] <= o["id2"]:
            lo, hi = o["id1"], o["id2"]
            a1, a2, b1, b2 = o["a1"], o["a2"], o["b1"], o["b2"]
        else:
            lo, hi = o["id2"], o["id1"]
            a1, a2, b1, b2 = o["b1"], o["b2"], o["a1"], o["a2"]
        cols["lo_id"].append(lo)
        cols["hi_id"].append(hi)
        cols["score"].append(o["score"])
        cols["fwd"].append(o["fwd"])
        cols["a1"].append(a1)
        cols["a2"].append(a2)
        cols["b1"].append(b1)
        cols["b2"].append(b2)
    return pa.table({k: pa.array(v, t) for (k, t), v
                     in zip(_OVL_SCHEMA.items(), cols.values())})


def read_overlaps(path: str, lengths: dict[str, int] | None = None):
    """Distributed overlap-file reader: text shards stream through the
    per-line format sniffer; nothing is materialized on the driver.
    ``lengths`` is a small id->len dict (broadcast in the task
    closure) enabling CA coordinate reconstruction and reverse-strand
    flips, as when the reference loads the FASTA alongside."""
    import ray.data

    return ray.data.read_text(path).map_batches(
        lambda b: parse_overlap_batch(b, lengths),
        batch_format="pyarrow", zero_copy_batch=True)


def edges_from_overlaps(tbl: pa.Table) -> dict[tuple[str, str], tuple]:
    """Pair table -> {(lo_id, hi_id): (a1, a2, b1, b2)} for
    estimate_roc's alignment arbitration (small validation-side
    sample, driver-resident by design)."""
    return {
        (lo, hi): (a1, a2, b1, b2)
        for lo, hi, a1, a2, b1, b2 in zip(
            tbl.column("lo_id").to_pylist(), tbl.column("hi_id").to_pylist(),
            tbl.column("a1").to_pylist(), tbl.column("a2").to_pylist(),
            tbl.column("b1").to_pylist(), tbl.column("b2").to_pylist())
    }


def histogram_stats(ds, col: str, percentile: float = 0.9) -> dict:
    """mean / std / percentile cut of a numeric column, computed from a
    value->count grouped histogram (GetHistogramStats analog) — one
    small groupby, no full materialization of the raw column."""
    hist = ds.groupby(col).count().rename_columns({"count()": "n"}).take_all()
    if not hist:  # empty dataset: zeroed stats, not 0/0 + vals[-1]
        return {"mean": 0.0, "std": 0.0, "percentile": 0.0, "n": 0}
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
