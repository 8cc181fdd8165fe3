"""The flagship pipeline: near-duplicate detection + clustering over an
image+caption table (the MhapMain computeMain lifecycle,
main/MhapMain.java:377-552, re-expressed as streaming Ray Data stages;
SURVEY.md §3.4).

    images ─ s1: sketch actors (T1+T2+F4 fused) -> ONE caption_hash
       │        shuffle assigning exact-caption representatives
       │        (rep = min iid per identical caption — collapses hot
       │        boilerplate BEFORE any LSH explode)        [ckpt s1]
       ├─ s2: rep-level MinHash LSH -> slot-count gate ->
       │        sketch-attach joins -> positional verify   [ckpt s2]
       ├─ s3: pHash band LSH over all rows, Hamming gate,
       │        + final caption gate (same rep, or rep pair
       │        verified >= threshold) — fused             [ckpt s3]
       └─ s4: union-find clusters + full assignment        [ckpt s4]

Semantics (mirrored by mhray.oracle): a pair is a duplicate iff
  shared-slots(sig) >= num_min_matches  AND  verify score >= threshold
  AND  pHash band collision  AND  hamming(phash) <= phash_max_hamming.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from mhray.checkpoint import input_fingerprint, stage_checkpoint, stage_digest
from mhray.config import MhapConfig
from mhray.stages.candidates import (_part_of, explode_phash_bands,
                                     minhash_candidates)
from mhray.stages.cluster import assign_clusters, cluster_edges
from mhray.stages.sketch import sketch_dataset
from mhray.stages.verify import verify_candidates


def _assign_reps(part: pa.Table) -> pa.Table:
    """Within a caption_hash partition: rep_iid = min iid per caption
    group (vectorized; one call per partition)."""
    ch = np.asarray(part.column("caption_hash"), dtype=np.int64)
    iid = np.asarray(part.column("iid"), dtype=np.int64)
    order = np.lexsort((iid, ch))
    ch_s = ch[order]
    starts = np.flatnonzero(np.diff(ch_s, prepend=ch_s[0] - 1)) if len(ch_s) \
        else np.empty(0, np.int64)
    sizes = np.diff(np.append(starts, len(ch_s)))
    rep_sorted = np.repeat(iid[order][starts], sizes)
    rep = np.empty(len(iid), dtype=np.int64)
    rep[order] = rep_sorted
    return part.append_column("rep_iid", pa.array(rep, pa.int64()))


def run_dedup(images_path: str, out_dir: str, cfg: MhapConfig, *,
              freq_ref=None, decode_pixels: bool = True,
              num_parts: int = 32, resume: bool = True,
              persist: bool = True,
              concurrency=None,
              rep_broadcast_threshold: int = 2_000_000,
              rep_pairs_broadcast_threshold: int = 2_000_000) -> dict:
    """Run the full pipeline; returns dataset handles + output paths."""

    # s1: sketches + exact-caption rep assignment -------------------------
    # Small corpora: a NARROW (caption_hash, iid) aggregate is broadcast
    # and looked up per batch — the wide sketch rows never shuffle.
    # Above the threshold: one caption_hash-partitioned shuffle of the
    # sketch table (the scale path; rep map no longer driver-resident).
    def compute_sketches():
        import ray as _ray

        from mhray.checkpoint import parquet_num_rows

        n_rows = parquet_num_rows(images_path)
        conc = concurrency
        if conc is None:
            # fixed pool sized to the INPUT, capped below the CPU
            # count: a 30-actor pool on a 50k-row corpus spends longer
            # spinning actors than sketching (measured: 16 actors beat
            # 30 by 20% at 50k rows; 30 wins at 500k)
            cpus = int(_ray.cluster_resources().get("CPU", 4))
            hi = max(1, min(cpus - 2, n_rows // 3000))
            conc = (hi, hi)
        images = ray.data.read_parquet(images_path)
        sk = sketch_dataset(images, cfg, freq_ref=freq_ref,
                            decode_pixels=decode_pixels,
                            concurrency=conc)
        if n_rows <= rep_broadcast_threshold:
            # rep map via per-batch PARTIAL min-aggregates collected to
            # the driver (tiny) — a full Ray groupby has seconds of
            # fixed cost this path avoids; the wide rows never re-scan
            sk = sk.materialize()

            def partial_rep(batch: pa.Table) -> pa.Table:
                ch = np.asarray(batch.column("caption_hash"), dtype=np.int64)
                iid = np.asarray(batch.column("iid"), dtype=np.int64)
                order = np.lexsort((iid, ch))
                ch_s = ch[order]
                first = np.ones(len(ch_s), dtype=bool)
                first[1:] = np.diff(ch_s) != 0
                return pa.table({
                    "caption_hash": pa.array(ch_s[first], pa.int64()),
                    "iid": pa.array(iid[order][first], pa.int64()),
                })

            partials = sk.select_columns(["caption_hash", "iid"]).map_batches(
                partial_rep, batch_format="pyarrow", zero_copy_batch=True
            ).take_all()
            ch_all = np.array([r["caption_hash"] for r in partials], np.int64)
            iid_all = np.array([r["iid"] for r in partials], np.int64)
            order = np.lexsort((iid_all, ch_all))
            ch_s, iid_s = ch_all[order], iid_all[order]
            first = np.ones(len(ch_s), dtype=bool)
            if len(ch_s) > 1:
                first[1:] = np.diff(ch_s) != 0
            ref = _ray.put((ch_s[first], iid_s[first]))

            def lookup(batch: pa.Table) -> pa.Table:
                k, v = _ray.get(ref)
                ch = np.asarray(batch.column("caption_hash"), dtype=np.int64)
                pos = np.minimum(np.searchsorted(k, ch), max(0, len(k) - 1))
                rep = np.where(k[pos] == ch, v[pos],
                               np.asarray(batch.column("iid"), np.int64))
                return batch.append_column("rep_iid", pa.array(rep, pa.int64()))

            return sk.map_batches(lookup, batch_format="pyarrow",
                                  zero_copy_batch=True)

        def add_part(batch: pa.Table) -> pa.Table:
            ch = np.asarray(batch.column("caption_hash"), dtype=np.int64)
            return batch.append_column(
                "chpart", pa.array(_part_of(ch, num_parts), pa.int32()))

        with_part = sk.map_batches(add_part, batch_format="pyarrow",
                                   zero_copy_batch=True) \
            .groupby("chpart", num_partitions=num_parts).map_groups(_assign_reps, batch_format="pyarrow")
        return with_part.drop_columns(["chpart"])

    in_fp = input_fingerprint(images_path)
    sketches = stage_checkpoint("s1_sketches", out_dir, compute_sketches, cfg,
                                resume=resume, persist=persist,
                                parents=(in_fp,))
    d1 = stage_digest(out_dir, "s1_sketches")
    valid = sketches.filter(expr="valid == True")

    # s2: caption axis at rep level ---------------------------------------
    def compute_rep_pairs():
        rep_rows = valid.filter(expr="iid == rep_iid").materialize()
        cands = minhash_candidates(rep_rows, cfg, num_parts)
        return verify_candidates(cands, rep_rows, cfg, num_parts)

    s2_schema = pa.schema([
        ("lo", pa.int64()), ("hi", pa.int64()),
        ("shared_slots", pa.int64()), ("score", pa.float64()),
        ("raw_score", pa.float64()), ("a1", pa.int32()),
        ("a2", pa.int32()), ("b1", pa.int32()), ("b2", pa.int32())])
    rep_pairs = stage_checkpoint("s2_rep_pairs", out_dir, compute_rep_pairs,
                                 cfg, resume=resume, persist=persist,
                                 parents=(d1,), empty_schema=s2_schema)
    d2 = stage_digest(out_dir, "s2_rep_pairs")

    # s3: image axis (pHash banding) + final caption gate, fused ---------
    # Identical pHash values collapse to ONE group row before banding
    # (noise variants + re-encodes often hash identically), and the
    # Hamming gate runs at DISTINCT-pHash granularity BEFORE any row
    # expansion — random 16-bit band collisions (the quadratic cost at
    # scale) die without ever materializing row pairs.
    def compute_final_pairs():
        from mhray.rayutil import attach_payload
        from mhray.stages.candidates import _part_of, make_pair_min

        # --- pHash groups: (phash, members=packed (iid, rep_iid)) ----
        def add_ppart(batch: pa.Table) -> pa.Table:
            ph = np.asarray(batch.column("phash"), dtype=np.int64)
            return pa.table({
                "ppart": pa.array(_part_of(ph, num_parts), pa.int32()),
                "phash": pa.array(ph, pa.int64()),
                "iid": batch.column("iid"),
                "rep_iid": batch.column("rep_iid"),
            })

        def pack_groups(part: pa.Table) -> pa.Table:
            ph = np.asarray(part.column("phash"), dtype=np.int64)
            iid = np.asarray(part.column("iid"), dtype=np.int64)
            rep = np.asarray(part.column("rep_iid"), dtype=np.int64)
            order = np.lexsort((iid, ph))
            ph_s, iid_s, rep_s = ph[order], iid[order], rep[order]
            new_g = np.ones(len(ph_s), dtype=bool)
            if len(ph_s) > 1:
                new_g[1:] = np.diff(ph_s) != 0
            starts = np.flatnonzero(new_g)
            sizes = np.diff(np.append(starts, len(ph_s)))
            # one interleaved (iid, rep) buffer + offsets = the whole
            # binary column, no per-group tobytes loop
            flat = np.empty(2 * len(ph_s), dtype="<i8")
            flat[0::2] = iid_s
            flat[1::2] = rep_s
            offs = (np.append(starts, len(ph_s)) * 16).astype(np.int32)
            members = pa.Array.from_buffers(
                pa.binary(), len(starts),
                [None, pa.py_buffer(offs.tobytes()),
                 pa.py_buffer(flat.tobytes())])
            return pa.table({
                "phash": pa.array(ph_s[starts], pa.int64()),
                "members": members,
                "n": pa.array(sizes, pa.int32()),
            })

        groups = valid.select_columns(["phash", "iid", "rep_iid"]) \
            .map_batches(add_ppart, batch_format="pyarrow",
                         zero_copy_batch=True) \
            .groupby("ppart", num_partitions=num_parts).map_groups(pack_groups,
                                         batch_format="pyarrow").materialize()

        def _members_flat(col):
            """Whole-column zero-copy int64 views of a members column:
            (iids, reps, member offsets), members interleaved 16 B."""
            from mhray.rayutil import binary_flat_view

            flat, moffs = binary_flat_view(col, 16, "<i8")
            return flat[0::2], flat[1::2], moffs

        _EXP_EMPTY = pa.table({
            "lo": pa.array([], pa.int64()), "hi": pa.array([], pa.int64()),
            "rep_lo": pa.array([], pa.int64()),
            "rep_hi": pa.array([], pa.int64()),
            "hamming": pa.array([], pa.int32())})

        # --- same-pHash pairs (Hamming 0, bands trivially collide) ----
        def expand_same(batch: pa.Table) -> pa.Table:
            from mhray.stages.candidates import _pairs_within_groups

            iids, reps, moffs = _members_flat(batch.column("members"))
            if len(iids) == 0:
                return _EXP_EMPTY
            # group ordinal per member -> the tested ragged upper-
            # triangle emission (canonical lo<hi by iid, payload rides)
            keys = np.repeat(np.arange(batch.num_rows, dtype=np.int64),
                             np.diff(moffs))
            lo, hi, _, _, rlo, rhi = _pairs_within_groups(
                keys, iids, 1 << 62, payload=reps)
            return pa.table({
                "lo": pa.array(lo, pa.int64()),
                "hi": pa.array(hi, pa.int64()),
                "rep_lo": pa.array(rlo, pa.int64()),
                "rep_hi": pa.array(rhi, pa.int64()),
                "hamming": pa.array(np.zeros(len(lo), np.int32), pa.int32()),
            })

        same_p = groups.map_batches(expand_same, batch_format="pyarrow",
                                    zero_copy_batch=True)

        # --- distinct-pHash band LSH + Hamming gate, THEN expansion ---
        bands = groups.map_batches(
            lambda b: explode_phash_bands(
                pa.table({"phash": b.column("phash"),
                          "iid": b.column("phash")}),  # the value is its own id
                cfg.phash_bands, cfg.phash_band_bits, num_parts),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        # Hamming gate fused INTO the band-bucket emission: random
        # 16-bit band collisions (millions of junk pairs at scale) die
        # before any row leaves the partition; only gated distinct-
        # pHash pairs reach the dedupe shuffle
        from mhray.stages.candidates import make_emit_phash_pairs

        pp = bands.groupby("part", num_partitions=num_parts).map_groups(
            make_emit_phash_pairs(cfg.band_group_cap,
                                  cfg.phash_max_hamming, num_parts,
                                  exclude_equal=True),
            batch_format="pyarrow") \
            .groupby("pair_part", num_partitions=num_parts).map_groups(
                make_pair_min("hamming"), batch_format="pyarrow")

        g_schema = pa.schema([("phash", pa.int64()), ("members", pa.binary()),
                              ("n", pa.int32())])
        pp_schema = pa.schema([("lo", pa.int64()), ("hi", pa.int64()),
                               ("hamming", pa.int32())])
        pp = attach_payload(pp, "lo", groups, "phash", ("members",), "lo",
                            num_parts, pairs_schema=pp_schema,
                            side_schema=g_schema)
        mid = pa.schema(list(pp_schema) + [pa.field("members_lo", pa.binary())])
        pp = attach_payload(pp, "hi", groups, "phash", ("members",), "hi",
                            num_parts, pairs_schema=mid, side_schema=g_schema)

        def expand_cross(batch: pa.Table) -> pa.Table:
            """Ragged two-blob cartesian: every row pairs each lo-group
            member with each hi-group member, in ONE vectorized pass
            over the batch (pair ordinal t of row r maps to members
            (t // n2[r], t % n2[r]))."""
            il, rl_all, mo_l = _members_flat(batch.column("members_lo"))
            ih, rh_all, mo_h = _members_flat(batch.column("members_hi"))
            hams = np.asarray(batch.column("hamming"), dtype=np.int32)
            n1, n2 = np.diff(mo_l), np.diff(mo_h)
            tot = n1 * n2
            total = int(tot.sum())
            if total == 0:
                return _EXP_EMPTY
            ends = np.cumsum(tot)
            t = np.arange(total, dtype=np.int64) - np.repeat(ends - tot, tot)
            n2_rep = np.repeat(n2, tot)
            a = t // n2_rep
            b = t - a * n2_rep
            ga = np.repeat(mo_l[:-1], tot) + a
            gb = np.repeat(mo_h[:-1], tot) + b
            ia, ra = il[ga], rl_all[ga]
            ib, rb = ih[gb], rh_all[gb]
            swap = ia > ib
            return pa.table({
                "lo": pa.array(np.where(swap, ib, ia), pa.int64()),
                "hi": pa.array(np.where(swap, ia, ib), pa.int64()),
                "rep_lo": pa.array(np.where(swap, rb, ra), pa.int64()),
                "rep_hi": pa.array(np.where(swap, ra, rb), pa.int64()),
                "hamming": pa.array(np.repeat(hams, tot), pa.int32()),
            })

        cross = pp.map_batches(expand_cross, batch_format="pyarrow",
                               zero_copy_batch=True)
        phash_pairs = same_p.union(cross)

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

        # materialize before branching: `p` feeds BOTH the same-rep and
        # diff-rep branches — lazy, the whole pHash LSH would run twice
        p = phash_pairs.map_batches(canon, batch_format="pyarrow",
                                    zero_copy_batch=True).materialize()
        same = p.filter(expr="same_rep == True").map_batches(
            lambda b: b.select(["lo", "hi", "hamming"]).append_column(
                "score", pa.array(np.ones(b.num_rows), pa.float64())),
            batch_format="pyarrow",
        )
        n_rep_pairs = rep_pairs.count()
        if n_rep_pairs <= rep_pairs_broadcast_threshold:
            # broadcast the verified rep-pair scores (small side)
            import ray as _ray

            pair_dt = np.dtype([("lo", "<i8"), ("hi", "<i8")])
            if n_rep_pairs == 0:
                # a 0-row dataset comes back COLUMN-LESS from
                # to_pandas (Ray 2.49) — build the empty side directly
                side = np.empty(0, dtype=pair_dt)
                scores_arr = np.empty(0, np.float64)
            else:
                rows = rep_pairs.select_columns(
                    ["lo", "hi", "score"]).to_pandas()
                side = np.empty(len(rows), dtype=pair_dt)
                side["lo"] = rows["lo"].to_numpy(np.int64)
                side["hi"] = rows["hi"].to_numpy(np.int64)
                scores_arr = rows["score"].to_numpy(np.float64)
            order = np.argsort(side)
            ref = _ray.put((side[order], scores_arr[order]))

            def attach_score(batch: pa.Table) -> pa.Table:
                side_s, sc = _ray.get(ref)
                n = batch.num_rows
                q = np.empty(n, dtype=pair_dt)
                q["lo"] = np.asarray(batch.column("rlo"), np.int64)
                q["hi"] = np.asarray(batch.column("rhi"), np.int64)
                scores = np.full(n, -1.0)
                if len(side_s):
                    pos = np.minimum(np.searchsorted(side_s, q),
                                     len(side_s) - 1)
                    found = side_s[pos] == q
                    scores[found] = sc[pos[found]]
                keep = pa.array(scores >= 0)
                return pa.table({
                    "lo": batch.column("lo").filter(keep),
                    "hi": batch.column("hi").filter(keep),
                    "hamming": batch.column("hamming").filter(keep),
                    "score": pa.array(scores[scores >= 0], pa.float64()),
                })

            diff = p.filter(expr="same_rep == False").map_batches(
                attach_score, batch_format="pyarrow", zero_copy_batch=True)
            return _with_substring(same.union(diff))

        from mhray.rayutil import safe_join

        rp = rep_pairs.select_columns(["lo", "hi", "score"]).rename_columns(
            {"lo": "rlo", "hi": "rhi", "score": "rep_score"}
        )
        diff = safe_join(
            p.filter(expr="same_rep == False"), rp,
            join_type="inner", num_partitions=max(2, min(8, num_parts)),
            on=("rlo", "rhi"), right_on=("rlo", "rhi"),
            left_schema=pa.schema([
                ("lo", pa.int64()), ("hi", pa.int64()),
                ("hamming", pa.int32()), ("same_rep", pa.bool_()),
                ("rlo", pa.int64()), ("rhi", pa.int64())]),
            right_schema=pa.schema([
                ("rlo", pa.int64()), ("rhi", pa.int64()),
                ("rep_score", pa.float64())]),
        ).map_batches(
            lambda b: pa.table({
                "lo": b.column("lo"), "hi": b.column("hi"),
                "hamming": b.column("hamming"),
                "score": b.column("rep_score"),
            }),
            batch_format="pyarrow",
        )
        return _with_substring(same.union(diff))

    def _with_substring(pairs_so_far):
        """Optional north-star axis: exact long-substring caption pairs
        gated by the same image condition, unioned into the caption
        pairs and deduped. cfg.substr_engine picks the detection
        engine — winnowed fingerprints + per-pair LCS probes, or the
        generalized per-group suffix array (identical outputs,
        pytest-asserted)."""
        if not cfg.substr_pass:
            return pairs_so_far

        from mhray.kernels import hamming64, phash_band_keys
        from mhray.rayutil import attach_payload_both
        from mhray.stages.candidates import _pair_part, make_pair_min
        if cfg.substr_engine == "suffix_array":
            from mhray.stages.suffixarray import \
                suffix_array_pairs as substring_pairs
        else:
            from mhray.stages.substring import substring_pairs

        def to_doc(batch: pa.Table) -> pa.Table:
            from mhray.oracle import image_iid

            return pa.table({
                "doc_id": pa.array(
                    image_iid(batch.column("image_id").to_pylist()),
                    pa.int64()),
                "text": batch.column("caption"),
            })

        texts = ray.data.read_parquet(
            images_path, columns=["image_id", "caption"]
        ).map_batches(to_doc, batch_format="pyarrow", zero_copy_batch=True)
        sp = substring_pairs(texts, min_len=cfg.substr_min_length,
                             window=cfg.substr_window, num_parts=num_parts)
        ph_side = valid.select_columns(["iid", "phash"]).materialize()
        sp = attach_payload_both(
            sp, ph_side, "iid", ("phash",), num_parts=num_parts,
            pairs_schema=pa.schema([("lo", pa.int64()), ("hi", pa.int64()),
                                    ("lcs_len", pa.int64())]),
            side_schema=pa.schema([("iid", pa.int64()),
                                   ("phash", pa.int64())]))

        def substr_gate(batch: pa.Table) -> pa.Table:
            a = np.asarray(batch.column("phash_lo"), dtype=np.int64)
            b = np.asarray(batch.column("phash_hi"), dtype=np.int64)
            ham = hamming64(a, b).astype(np.int32)
            band_hit = (
                phash_band_keys(a, cfg.phash_bands, cfg.phash_band_bits)
                == phash_band_keys(b, cfg.phash_bands, cfg.phash_band_bits)
            ).any(axis=1)
            keep = (ham <= cfg.phash_max_hamming) & band_hit
            return pa.table({
                "lo": batch.column("lo").filter(pa.array(keep)),
                "hi": batch.column("hi").filter(pa.array(keep)),
                "hamming": pa.array(ham[keep], pa.int32()),
                "score": pa.array(np.ones(int(keep.sum())), pa.float64()),
            })

        sub = sp.map_batches(substr_gate, batch_format="pyarrow",
                             zero_copy_batch=True)

        # dedupe pairs found by both axes (keep the max score)
        def add_part(batch: pa.Table) -> pa.Table:
            lo = np.asarray(batch.column("lo"), np.int64)
            hi = np.asarray(batch.column("hi"), np.int64)
            neg = pa.array(-np.asarray(batch.column("score"), np.float64))
            return batch.append_column(
                "pair_part", pa.array(_pair_part(lo, hi, num_parts), pa.int32())
            ).append_column("neg_score", neg)

        merged = pairs_so_far.union(sub).map_batches(
            add_part, batch_format="pyarrow")
        deduped = merged.groupby("pair_part", num_partitions=num_parts).map_groups(
            make_pair_min("neg_score", payload_cols=("hamming", "score")),
            batch_format="pyarrow")
        return deduped.drop_columns(["neg_score"])

    s3_schema = pa.schema([
        ("lo", pa.int64()), ("hi", pa.int64()),
        ("hamming", pa.int32()), ("score", pa.float64())])
    final_pairs = stage_checkpoint("s3_pairs", out_dir, compute_final_pairs,
                                   cfg, resume=resume, persist=persist,
                                   parents=(d1, d2), empty_schema=s3_schema)
    d3 = stage_digest(out_dir, "s3_pairs")

    # s5: clusters ---------------------------------------------------------
    def compute_clusters():
        pair_clusters = cluster_edges(final_pairs,
                                      max_rounds=cfg.cluster_max_rounds,
                                      num_partitions=num_parts)
        return assign_clusters(sketches, pair_clusters, num_parts)

    clusters = stage_checkpoint("s4_clusters", out_dir, compute_clusters, cfg,
                                resume=resume, persist=persist,
                                parents=(d1, d3))

    _write_run_summary(out_dir)

    return {
        "sketches": sketches,
        "rep_pairs": rep_pairs,
        "pairs": final_pairs,
        "clusters": clusters,
        "out_dir": out_dir,
    }


def _write_run_summary(out_dir: str) -> None:
    """Run-level metrics record: row totals, reject/representative
    counts (from the checkpoint parquet footers/columns, no Ray ops),
    plus per-stage durations — alongside each stage's per-partition
    lineage manifest."""
    import json
    import os

    import duckdb

    from mhray.checkpoint import read_manifests

    s1 = os.path.join(out_dir, "s1_sketches", "data", "*.parquet")
    pairs = os.path.join(out_dir, "s3_pairs", "data", "*.parquet")
    try:
        n, rejects, reps = duckdb.sql(
            f"SELECT COUNT(*), SUM(CASE WHEN valid THEN 0 ELSE 1 END), "
            f"COUNT(DISTINCT rep_iid) FROM read_parquet('{s1}')"
        ).fetchone()
        n_pairs = duckdb.sql(
            f"SELECT COUNT(*) FROM read_parquet('{pairs}')").fetchone()[0]
    except Exception:
        return  # partial run; stage manifests still carry lineage
    summary = {
        "rows": int(n),
        "rejected_rows": int(rejects or 0),
        "distinct_captions": int(reps),
        "pairs": int(n_pairs),
        "stages": {m["stage"]: {"sec": m["duration_s"], "rows": m["rows"],
                                "partitions": len(m["partitions"])}
                   for m in read_manifests(out_dir)},
    }
    with open(os.path.join(out_dir, "run_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)


def pairs_with_ids(result: dict, num_parts: int = 16) -> "ray.data.Dataset":
    """(lo, hi, ...) iid pairs -> (lo_id, hi_id, ...) string-id pairs."""
    from mhray.rayutil import attach_payload

    ids = result["sketches"].select_columns(["iid", "image_id"]).materialize()
    ids_schema = pa.schema([("iid", pa.int64()), ("image_id", pa.string())])
    pair_schema = pa.schema([
        ("lo", pa.int64()), ("hi", pa.int64()),
        ("hamming", pa.int32()), ("score", pa.float64())])
    p = attach_payload(result["pairs"], "lo", ids, "iid", ("image_id",),
                       "lo", num_parts, pairs_schema=pair_schema,
                       side_schema=ids_schema)
    mid = pa.schema(list(pair_schema) + [pa.field("image_id_lo", pa.string())])
    p = attach_payload(p, "hi", ids, "iid", ("image_id",), "hi", num_parts,
                       pairs_schema=mid, side_schema=ids_schema)
    return p.map_batches(
        lambda b: pa.table({
            "lo_id": b.column("image_id_lo"),
            "hi_id": b.column("image_id_hi"),
            "score": b.column("score"),
            "hamming": b.column("hamming"),
        }),
        batch_format="pyarrow",
    )
