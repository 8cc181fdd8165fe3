"""The flagship pipeline: near-duplicate detection + clustering over an
image+caption table (the MhapMain computeMain lifecycle,
main/MhapMain.java:377-552, re-expressed as streaming Ray Data stages;
SURVEY.md §3.4).

    images ─ sketch (actor pool; T1+T2+F4 fused) ──────────── [ckpt s1]
       ├─ exact-caption groups: rep = min iid per caption_hash  [ckpt s2]
       │    (collapses identical captions BEFORE the LSH explode —
       │     the structural fix for hot boilerplate skew)
       ├─ rep-level MinHash LSH -> slot-count gate -> verify    [ckpt s3]
       ├─ pHash band LSH -> Hamming gate (image axis)           [ckpt s4]
       ├─ final pairs = pHash pairs whose rep pair passes the
       │    caption condition (same rep => identical caption)   [ckpt s5]
       └─ union-find clusters + full assignment                 [ckpt s6]

Semantics (mirrored by mhray.oracle): a pair is a duplicate iff
  shared-slots(sig) >= num_min_matches  AND  verify score >= threshold
  AND  pHash band collision  AND  hamming(phash) <= phash_max_hamming.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from mhray.checkpoint import stage_checkpoint
from mhray.config import MhapConfig
from mhray.stages.candidates import minhash_candidates, phash_candidates
from mhray.stages.cluster import assign_clusters, cluster_edges
from mhray.stages.sketch import sketch_dataset
from mhray.stages.verify import verify_candidates


def run_dedup(images_path: str, out_dir: str, cfg: MhapConfig, *,
              freq_ref=None, decode_pixels: bool = True,
              num_parts: int = 32, resume: bool = True,
              concurrency=None) -> dict:
    """Run the full pipeline; returns dataset handles + output paths."""

    # s1: sketches ---------------------------------------------------------
    def compute_sketches():
        images = ray.data.read_parquet(images_path)
        return sketch_dataset(images, cfg, freq_ref=freq_ref,
                              decode_pixels=decode_pixels,
                              concurrency=concurrency)

    sketches = stage_checkpoint("s1_sketches", out_dir, compute_sketches, cfg,
                                resume=resume)
    valid = sketches.filter(expr="valid == True")

    # s2: exact-caption representatives -----------------------------------
    def compute_reps():
        return valid.groupby("caption_hash").min("iid").rename_columns(
            {"min(iid)": "rep_iid"}
        )

    reps = stage_checkpoint("s2_reps", out_dir, compute_reps, cfg, resume=resume)

    def compute_with_rep():
        return valid.join(
            reps, join_type="inner", num_partitions=num_parts,
            on=("caption_hash",), right_on=("caption_hash",),
        )

    with_rep = stage_checkpoint("s2b_with_rep", out_dir, compute_with_rep, cfg,
                                resume=resume)

    # s3: caption axis at rep level ---------------------------------------
    def compute_rep_pairs():
        rep_rows = with_rep.filter(expr="iid == rep_iid")
        cands = minhash_candidates(rep_rows, cfg, num_parts)
        return verify_candidates(cands, rep_rows, cfg, num_parts)

    rep_pairs = stage_checkpoint("s3_rep_pairs", out_dir, compute_rep_pairs,
                                 cfg, resume=resume)

    # s4: image axis (pHash banding) over all valid rows ------------------
    def compute_phash_pairs():
        return phash_candidates(with_rep, cfg, num_parts)

    phash_pairs = stage_checkpoint("s4_phash_pairs", out_dir,
                                   compute_phash_pairs, cfg, resume=resume)

    # s5: final pairs = image pairs whose caption condition holds ---------
    def compute_final_pairs():
        id_rep = with_rep.select_columns(["iid", "rep_iid"])
        p = phash_pairs.join(
            id_rep.rename_columns({"iid": "_ilo", "rep_iid": "rep_lo"}),
            join_type="inner", num_partitions=num_parts,
            on=("lo",), right_on=("_ilo",),
        ).join(
            id_rep.rename_columns({"iid": "_ihi", "rep_iid": "rep_hi"}),
            join_type="inner", num_partitions=num_parts,
            on=("hi",), right_on=("_ihi",),
        )

        def canon(batch: pa.Table) -> pa.Table:
            rl = np.asarray(batch.column("rep_lo"), dtype=np.int64)
            rh = np.asarray(batch.column("rep_hi"), dtype=np.int64)
            return pa.table({
                "lo": batch.column("lo"), "hi": batch.column("hi"),
                "hamming": batch.column("hamming"),
                "same_rep": pa.array(rl == rh),
                "rlo": pa.array(np.minimum(rl, rh), pa.int64()),
                "rhi": pa.array(np.maximum(rl, rh), pa.int64()),
            })

        p = p.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)
        same = p.filter(expr="same_rep == True").map_batches(
            lambda b: b.select(["lo", "hi", "hamming"]).append_column(
                "score", pa.array(np.ones(b.num_rows), pa.float64())),
            batch_format="pyarrow",
        )
        rp = rep_pairs.select_columns(["lo", "hi", "score"]).rename_columns(
            {"lo": "rlo", "hi": "rhi", "score": "rep_score"}
        )
        diff = p.filter(expr="same_rep == False").join(
            rp, join_type="inner", num_partitions=num_parts,
            on=("rlo", "rhi"), right_on=("rlo", "rhi"),
        ).map_batches(
            lambda b: pa.table({
                "lo": b.column("lo"), "hi": b.column("hi"),
                "hamming": b.column("hamming"),
                "score": b.column("rep_score"),
            }),
            batch_format="pyarrow",
        )
        return same.union(diff)

    final_pairs = stage_checkpoint("s5_pairs", out_dir, compute_final_pairs,
                                   cfg, resume=resume)

    # s6: clusters ---------------------------------------------------------
    def compute_clusters():
        pair_clusters = cluster_edges(final_pairs,
                                      max_rounds=cfg.cluster_max_rounds,
                                      num_partitions=num_parts)
        return assign_clusters(sketches, pair_clusters, num_parts)

    clusters = stage_checkpoint("s6_clusters", out_dir, compute_clusters, cfg,
                                resume=resume)

    return {
        "sketches": sketches,
        "rep_pairs": rep_pairs,
        "phash_pairs": phash_pairs,
        "pairs": final_pairs,
        "clusters": clusters,
        "out_dir": out_dir,
    }


def pairs_with_ids(result: dict, num_parts: int = 16) -> "ray.data.Dataset":
    """(lo, hi, ...) iid pairs -> (lo_id, hi_id, ...) string-id pairs."""
    ids = result["sketches"].select_columns(["iid", "image_id"])
    p = result["pairs"].join(
        ids.rename_columns({"iid": "_ilo", "image_id": "lo_id"}),
        join_type="inner", num_partitions=num_parts, on=("lo",), right_on=("_ilo",),
    ).join(
        ids.rename_columns({"iid": "_ihi", "image_id": "hi_id"}),
        join_type="inner", num_partitions=num_parts, on=("hi",), right_on=("_ihi",),
    )
    return p.select_columns(["lo_id", "hi_id", "score", "hamming"])
