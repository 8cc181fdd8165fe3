"""Stage 2-4: LSH candidate generation (the primary shuffles).

Replaces the reference's resident inverted index
(impl/MinHashSearch.java:49-147 builds per-slot hash maps on one JVM's
heap — the 32 GB / 40K-sequence wall, docs/source/quickstart.rst:23)
with shuffles that never materialize a global index:

1. explode each signature into (key = slot<<32 | uint32(value), iid)
   rows — the distributed analog of the per-slot hash-map probe
   (MinHashSearch.java:164-181)
2. co-locate keys by hash partition (``part = hash(key) % P``) and emit
   intra-group candidate pairs PARTITION-WISE (one vectorized call per
   partition, not one Python call per group)
3. count shared slots per pair and gate on num_min_matches
   (MinHashSearch.java:204) — grouped count = the HitCounter aggregate
   (utils/HitCounter.java:31-54)

Skew handling (explicit, §4 of SURVEY.md): groups larger than
``band_group_cap`` are truncated to the cap (keeping the smallest iids,
deterministic) and flagged ``capped=True`` on every emitted pair — no
silent drops; the count of dropped ids is logged per batch. The
*structural* skew killer is upstream: identical captions are collapsed
to one representative before exploding (see pipelines/dedup.py), so a
hot boilerplate caption contributes ONE row here, not thousands.

The same machinery generates image-axis candidates from pHash band keys
(sketch/BitVectorIndex.java:85-162 banding analog).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from mhray.config import MhapConfig

INT32_MIN = np.iinfo(np.int32).min


def auto_parts(requested=None, lo: int = 2, hi: int = 32):
    """Shuffle/join partition count clamped to the cluster CPU count —
    more join partitions than CPUs stalls the local hash-shuffle
    aggregator pool."""
    if requested is not None:
        return requested
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4))
    return max(lo, min(hi, cpus))


# ---------------------------------------------------------------------------
# explode
# ---------------------------------------------------------------------------

def explode_minhash(batch: pa.Table, num_hashes: int, num_parts: int) -> pa.Table:
    """(minhash binary, iid) -> (part, key, iid) rows."""
    from mhray.kernels import binary_column_fixed_i32

    sig = binary_column_fixed_i32(batch.column("minhash"), num_hashes)
    iids = np.asarray(batch.column("iid"), dtype=np.int64)
    slots = np.arange(num_hashes, dtype=np.int64) << 32
    keys = (slots[None, :] | sig.astype(np.uint32).astype(np.int64)).ravel()
    out_iids = np.repeat(iids, num_hashes)
    part = _part_of(keys, num_parts)
    return pa.table({
        "part": pa.array(part, pa.int32()),
        "key": pa.array(keys, pa.int64()),
        "iid": pa.array(out_iids, pa.int64()),
    })


def explode_phash_bands(batch: pa.Table, n_bands: int, band_bits: int,
                        num_parts: int, extra_payload: tuple = ()) -> pa.Table:
    """(phash, iid[, extras]) -> (part, key, iid, phash[, extras]) band
    rows; phash (and any requested extra int64 columns, e.g. rep_iid)
    ride along so downstream gates need no joins."""
    from mhray.kernels import phash_band_keys

    ph = np.asarray(batch.column("phash"), dtype=np.int64)
    iids = np.asarray(batch.column("iid"), dtype=np.int64)
    keys = phash_band_keys(ph, n_bands, band_bits)  # (N, B)
    flat = keys.ravel()
    part = _part_of(flat, num_parts)
    cols = {
        "part": pa.array(part, pa.int32()),
        "key": pa.array(flat, pa.int64()),
        "iid": pa.array(np.repeat(iids, n_bands), pa.int64()),
        "phash": pa.array(np.repeat(ph, n_bands), pa.int64()),
    }
    for name in extra_payload:
        v = np.asarray(batch.column(name), dtype=np.int64)
        cols[name] = pa.array(np.repeat(v, n_bands), pa.int64())
    return pa.table(cols)


def explode_minhash_packed(batch: pa.Table, num_hashes: int,
                           num_parts: int) -> pa.Table:
    """(minhash binary, iid) -> per-partition PACKED entry blobs.

    The naive explode ships rows*num_hashes individual (part, key, iid)
    rows through the sort shuffle — at 512 hashes that is 512 20-byte
    rows per record, and the shuffle sort pays per-row cost on all of
    them. Here each batch pre-buckets its entries by partition and
    emits ONE row per partition: (part, kblob, iblob) where the blobs
    are the int64 key/iid arrays of that partition's entries. Identical
    information, 12 B/entry instead of 20, and the shuffle sorts
    ~num_parts rows per batch instead of rows*num_hashes.
    """
    from mhray.kernels import binary_column_fixed_i32

    sig = binary_column_fixed_i32(batch.column("minhash"), num_hashes)
    iids = np.asarray(batch.column("iid"), dtype=np.int64)
    slots = np.arange(num_hashes, dtype=np.int64) << 32
    keys = (slots[None, :] | sig.astype(np.uint32).astype(np.int64)).ravel()
    out_iids = np.repeat(iids, num_hashes)
    part = _part_of(keys, num_parts)
    order = np.argsort(part, kind="stable")
    part_s = part[order]
    keys_s = np.ascontiguousarray(keys[order], dtype="<i8")
    # ids that fit int32 ship at half width (per-batch decision,
    # recorded in ``iw``) — 25% less through the widest shuffle; any
    # 10^12-scale id falls back to int64 automatically
    narrow = bool(len(iids) == 0
                  or (iids.min() >= np.iinfo(np.int32).min
                      and iids.max() <= np.iinfo(np.int32).max))
    iid_dt = "<i4" if narrow else "<i8"
    iids_s = np.ascontiguousarray(out_iids[order], dtype=iid_dt)
    starts = np.flatnonzero(np.diff(part_s, prepend=part_s[0] - 1)) \
        if len(part_s) else np.empty(0, np.int64)
    ends = np.append(starts[1:], len(part_s))
    return pa.table({
        "part": pa.array(part_s[starts], pa.int32()),
        "kblob": pa.array([keys_s[s:e].tobytes() for s, e in zip(starts, ends)],
                          pa.binary()),
        "iblob": pa.array([iids_s[s:e].tobytes() for s, e in zip(starts, ends)],
                          pa.binary()),
        "iw": pa.array(np.full(len(starts), 4 if narrow else 8, np.int8),
                       pa.int8()),
    })


def _binary_concat(col, dtype) -> np.ndarray:
    """Concatenate every value of a binary column into one typed array
    (zero-copy per chunk: values are contiguous in the data buffer)."""
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    parts = []
    for ch in chunks:
        if len(ch) == 0:
            continue
        offs = np.frombuffer(ch.buffers()[1], dtype=np.int32)[
            ch.offset:ch.offset + len(ch) + 1]
        data = np.frombuffer(ch.buffers()[2], dtype=np.uint8)
        parts.append(data[offs[0]:offs[-1]].view(dtype))
    if not parts:
        return np.empty(0, dtype)
    return np.concatenate(parts) if len(parts) > 1 else parts[0]


def binary_concat_i64(col) -> np.ndarray:
    return _binary_concat(col, "<i8")


def unpack_entries(tbl: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Packed explode rows -> aligned (keys, iids) int64 arrays,
    honoring the per-row ``iw`` iid width (entry order is arbitrary —
    consumers re-sort by key)."""
    if "iw" not in tbl.column_names:
        return (binary_concat_i64(tbl.column("kblob")),
                binary_concat_i64(tbl.column("iblob")))
    iw = np.asarray(tbl.column("iw"), dtype=np.int8)
    ks, vs = [], []
    for w, dt in ((4, "<i4"), (8, "<i8")):
        sel = iw == w
        if not sel.any():
            continue
        sub = tbl.filter(pa.array(sel))
        ks.append(binary_concat_i64(sub.column("kblob")))
        vals = _binary_concat(sub.column("iblob"), dt)
        vs.append(vals.astype(np.int64) if w == 4 else vals)
    if not ks:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(ks), np.concatenate(vs)


def make_emit_pairs_packed(cap: int, num_parts: int | None = None):
    """map_groups(part) fn for the packed explode: unpack the entry
    blobs, then the same vectorized intra-group pair emission +
    partition-local partial counts as ``make_emit_pairs``."""

    def emit_pairs_packed(part: pa.Table) -> pa.Table:
        keys, iids = unpack_entries(part)
        lo, hi, capped, dropped = _pairs_within_groups(keys, iids, cap)
        if dropped:
            print(f"[mhray] candidate group cap: dropped {dropped} ids in one partition")
        return aggregate_pair_partials(lo, hi, capped, num_parts)

    return emit_pairs_packed


def _part_of(keys: np.ndarray, num_parts: int) -> np.ndarray:
    # cheap 64-bit mix so adjacent slot ids spread across partitions
    x = keys.view(np.uint64).copy()
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    return (x % np.uint64(num_parts)).astype(np.int32)


def _pair_part(lo: np.ndarray, hi: np.ndarray, num_parts: int) -> np.ndarray:
    """Partition id for an (lo, hi) pair key — multi-key groupbys are
    slow in Ray's sort shuffle, so pair aggregation re-partitions on a
    mixed single key and aggregates partition-locally."""
    x = lo.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    x ^= hi.view(np.uint64) + np.uint64(0x517CC1B727220A95)
    return _part_of(x.view(np.int64), num_parts)


# ---------------------------------------------------------------------------
# partition-wise pair emission
# ---------------------------------------------------------------------------

def _pairs_within_groups(keys: np.ndarray, iids: np.ndarray, cap: int,
                         payload: np.ndarray | None = None):
    """All intra-group (lo, hi) pairs for groups keyed by ``keys``.

    Vectorized: sorts by (key, iid), finds group boundaries, emits
    C(g,2) pairs per group. Groups over ``cap`` members keep the cap
    smallest iids and mark their pairs capped. Returns
    (lo, hi, capped, n_dropped_ids[, payload_lo, payload_hi]).
    """
    from mhray.kernels import _concat_aranges

    order = np.lexsort((iids, keys))
    k = keys[order]
    v = iids[order]
    p = payload[order] if payload is not None else None
    starts = np.flatnonzero(np.diff(k, prepend=k[0] - 1)) if len(k) else np.empty(0, np.int64)
    sizes = np.diff(np.append(starts, len(k)))

    # fully vectorized ragged upper-triangle emission (no per-group
    # Python — the LSH regime is hundreds of thousands of 2-member
    # groups per partition): capped groups keep their first (smallest-
    # iid) ``cap`` members; each kept row r of a g-member group pairs
    # with the g-1-r rows after it.
    gsz = np.minimum(sizes, cap)
    dropped = int((sizes - gsz).sum())
    row_local = _concat_aranges(gsz)                    # 0..g-1 per group
    row_global = np.repeat(starts, gsz) + row_local     # into v/p
    pairs_per_row = np.repeat(gsz, gsz) - 1 - row_local
    a_pair = np.repeat(row_global, pairs_per_row)
    b_pair = np.repeat(row_global + 1, pairs_per_row) \
        + _concat_aranges(pairs_per_row)
    lo, hi = v[a_pair], v[b_pair]
    capped = np.repeat(sizes > cap, gsz * (gsz - 1) // 2)
    if payload is not None:
        return lo, hi, capped, dropped, p[a_pair], p[b_pair]
    return lo, hi, capped, dropped


def aggregate_pair_partials(lo: np.ndarray, hi: np.ndarray,
                            capped: np.ndarray,
                            num_parts: int | None = None) -> pa.Table:
    """(lo, hi, capped) pair arrays -> grouped (lo, hi, partial_count,
    capped[, pair_part]) partial-count table. ONE definition for every
    pair emitter (minhash, packed, incremental cross): the positional
    rename after ``group_by().aggregate()`` is load-bearing — it
    assumes the pinned pyarrow emits group keys first — so a pyarrow
    ordering change must be fixed in exactly one place."""
    tbl = pa.table({
        "lo": pa.array(lo, pa.int64()), "hi": pa.array(hi, pa.int64()),
        "capped": pa.array(capped),
        "n": pa.array(np.ones(len(lo), np.int64)),
    })
    agg = tbl.group_by(["lo", "hi"]).aggregate([("n", "sum"),
                                                ("capped", "max")])
    agg = agg.rename_columns(["lo", "hi", "partial_count", "capped"])
    if num_parts is not None:
        agg = agg.append_column("pair_part", pa.array(_pair_part(
            np.asarray(agg.column("lo"), np.int64),
            np.asarray(agg.column("hi"), np.int64), num_parts),
            pa.int32()))
    return agg


def make_emit_pairs(cap: int, with_payload: bool = False,
                    payload_cols: tuple = ("phash",),
                    num_parts: int | None = None):
    """map_groups(part) fn: pairs within every key group of the
    partition, with per-pair partial counts (combiner before shuffle #2).
    With payload_cols, each named int64 column rides along as
    <name>_lo / <name>_hi on every pair."""

    def emit_pairs(part: pa.Table) -> pa.Table:
        keys = np.asarray(part.column("key"), dtype=np.int64)
        iids = np.asarray(part.column("iid"), dtype=np.int64)
        if with_payload:
            payload = np.stack([
                np.asarray(part.column(c), dtype=np.int64)
                for c in payload_cols], axis=1)
            lo, hi, capped, dropped, plo, phi = _pairs_within_groups(
                keys, iids, cap, payload)
        else:
            lo, hi, capped, dropped = _pairs_within_groups(keys, iids, cap)
        if dropped:
            print(f"[mhray] candidate group cap: dropped {dropped} ids in one partition")
        # partial pair-count within the partition (pre-aggregate):
        if with_payload:
            cols = {
                "lo": pa.array(lo, pa.int64()), "hi": pa.array(hi, pa.int64()),
                "capped": pa.array(capped),
            }
            names = []
            for ci, c in enumerate(payload_cols):
                cols[f"{c}_lo"] = pa.array(plo[:, ci], pa.int64())
                cols[f"{c}_hi"] = pa.array(phi[:, ci], pa.int64())
                names += [f"{c}_lo", f"{c}_hi"]
            cols["n"] = pa.array(np.ones(len(lo), np.int64))
            tbl = pa.table(cols)
            agg = tbl.group_by(["lo", "hi", *names]).aggregate(
                [("capped", "max"), ("n", "sum")])
            agg = agg.rename_columns(["lo", "hi", *names, "capped",
                                      "partial_count"])
            if num_parts is not None:
                agg = agg.append_column("pair_part", pa.array(_pair_part(
                    np.asarray(agg.column("lo"), np.int64),
                    np.asarray(agg.column("hi"), np.int64), num_parts),
                    pa.int32()))
            return agg
        return aggregate_pair_partials(lo, hi, capped, num_parts)

    return emit_pairs


def make_emit_phash_pairs(cap: int, max_hamming: int, num_parts: int,
                          exclude_equal: bool = False):
    """map_groups(part) fn for pHash band buckets: emit intra-group
    (lo, hi) pairs and apply the Hamming gate IN the same call —
    random band collisions (the quadratic term at scale) die before
    any row leaves the partition, instead of shipping millions of
    junk pairs into a dedupe shuffle. Output: gated unique-per-
    partition pairs with their hamming and a pair_part key."""
    from mhray.kernels import hamming64

    def emit_gated(part: pa.Table) -> pa.Table:
        keys = np.asarray(part.column("key"), dtype=np.int64)
        iids = np.asarray(part.column("iid"), dtype=np.int64)
        payload = np.stack([
            np.asarray(part.column("phash"), dtype=np.int64)], axis=1)
        lo, hi, capped, dropped, plo, phi = _pairs_within_groups(
            keys, iids, cap, payload)
        if dropped:
            print(f"[mhray] candidate group cap: dropped {dropped} ids in one partition")
        if len(lo) == 0:
            return pa.table({
                "lo": pa.array([], pa.int64()), "hi": pa.array([], pa.int64()),
                "hamming": pa.array([], pa.int32()),
                "pair_part": pa.array([], pa.int32()),
            })
        ham = hamming64(plo[:, 0], phi[:, 0]).astype(np.int32)
        keep = ham <= max_hamming
        if exclude_equal:  # distinct-pHash mode: equal handled upstream
            keep &= plo[:, 0] != phi[:, 0]
        lo, hi, ham = lo[keep], hi[keep], ham[keep]
        # partition-local dedupe (same pair via several bands)
        order = np.lexsort((ham, hi, lo))
        lo_s, hi_s, ham_s = lo[order], hi[order], ham[order]
        first = np.ones(len(lo_s), dtype=bool)
        if len(lo_s) > 1:
            first[1:] = (np.diff(lo_s) != 0) | (np.diff(hi_s) != 0)
        lo_s, hi_s, ham_s = lo_s[first], hi_s[first], ham_s[first]
        return pa.table({
            "lo": pa.array(lo_s, pa.int64()),
            "hi": pa.array(hi_s, pa.int64()),
            "hamming": pa.array(ham_s, pa.int32()),
            "pair_part": pa.array(_pair_part(lo_s, hi_s, num_parts),
                                  pa.int32()),
        })

    return emit_gated


def make_count_gate(min_matches: int):
    """groupby(pair_part).map_groups fn: total the per-partition partial
    counts of each (lo, hi) pair and gate on min_matches — the
    HitCounter threshold (MinHashSearch.java:204) without a slow
    multi-key sort shuffle."""

    def count_gate(part: pa.Table) -> pa.Table:
        lo = np.asarray(part.column("lo"), dtype=np.int64)
        hi = np.asarray(part.column("hi"), dtype=np.int64)
        cnt = np.asarray(part.column("partial_count"), dtype=np.int64)
        order = np.lexsort((hi, lo))
        lo_s, hi_s, cnt_s = lo[order], hi[order], cnt[order]
        new_grp = np.ones(len(lo_s), dtype=bool)
        if len(lo_s) > 1:
            new_grp[1:] = (np.diff(lo_s) != 0) | (np.diff(hi_s) != 0)
        starts = np.flatnonzero(new_grp)
        sums = np.add.reduceat(cnt_s, starts) if len(starts) else np.empty(0, np.int64)
        keep = sums >= min_matches
        if "capped" in part.column_names:
            # a truncated LSH group undercounts shared slots — surface
            # it per partition instead of dropping the flag silently
            capped = np.asarray(part.column("capped"))[order]
            n_capped = int(np.logical_or.reduceat(capped, starts)[keep]
                           .sum()) if len(starts) else 0
            if n_capped:
                print(f"[mhray] count gate: {n_capped} surviving pairs "
                      "have capped (undercounted) candidate groups")
        return pa.table({
            "lo": pa.array(lo_s[starts][keep], pa.int64()),
            "hi": pa.array(hi_s[starts][keep], pa.int64()),
            "shared_slots": pa.array(sums[keep], pa.int64()),
        })

    return count_gate


def make_pair_min(value_col: str, payload_cols: tuple = ()):
    """groupby(pair_part).map_groups fn: per-pair minimum of value_col
    (deduping a pair found via multiple bands), carrying payload columns
    (identical within a pair) from the first occurrence."""

    def pair_min(part: pa.Table) -> pa.Table:
        lo = np.asarray(part.column("lo"), dtype=np.int64)
        hi = np.asarray(part.column("hi"), dtype=np.int64)
        val = np.asarray(part.column(value_col))
        order = np.lexsort((val, hi, lo))
        lo_s, hi_s = lo[order], hi[order]
        new_grp = np.ones(len(lo_s), dtype=bool)
        if len(lo_s) > 1:
            new_grp[1:] = (np.diff(lo_s) != 0) | (np.diff(hi_s) != 0)
        starts = np.flatnonzero(new_grp)
        idx = order[starts]  # min value row per pair (val sorted first)
        cols = {
            "lo": pa.array(lo[idx], pa.int64()),
            "hi": pa.array(hi[idx], pa.int64()),
            value_col: part.column(value_col).take(pa.array(idx, pa.int64())),
        }
        for c in payload_cols:
            cols[c] = part.column(c).take(pa.array(idx, pa.int64()))
        return pa.table(cols)

    return pair_min


# ---------------------------------------------------------------------------
# dataset-level wiring
# ---------------------------------------------------------------------------

def minhash_candidates(sketches_ds, cfg: MhapConfig, num_parts: int = 64):
    """sketches -> gated candidate pairs (lo, hi, shared_slots).

    Two shuffles: groupby(part) to co-locate LSH keys, then
    groupby(lo,hi) to total the per-partition partial counts and apply
    the num_min_matches gate."""
    bands = sketches_ds.map_batches(
        explode_minhash_packed,
        fn_kwargs={"num_hashes": cfg.num_hashes, "num_parts": num_parts},
        batch_format="pyarrow", zero_copy_batch=True,
    )
    pairs = bands.groupby("part", num_partitions=num_parts).map_groups(
        make_emit_pairs_packed(cfg.band_group_cap, num_parts=num_parts),
        batch_format="pyarrow"
    )
    gated = pairs.groupby("pair_part", num_partitions=num_parts).map_groups(
        make_count_gate(cfg.num_min_matches), batch_format="pyarrow")
    if cfg.min_store_length > 0:
        # MinHashSearch.java:210-225: membership is "never short to
        # short" (the other two clauses only prevent double-processing
        # in the reference's probe loop). Applied between the count
        # gate and verify, where the pair table is smallest.
        side = sketches_ds.select_columns(["iid", "caption_len"])
        gated = apply_store_length_gate(gated, side, side,
                                        cfg.min_store_length, num_parts)
    return gated


def apply_store_length_gate(gated, lo_side, hi_side, msl: int,
                            num_parts: int):
    """The min_store_length membership rule shared by the self-join and
    the query-vs-index mode — "never short to short"
    (MinHashSearch.java:210-212): a (lo, hi, shared_slots) pair
    survives only if at least one side's caption_len >= ``msl``.
    ``lo_side`` / ``hi_side`` are (iid, caption_len) datasets (the same
    table twice for the self-join; query and index tables for the
    incremental cross mode)."""
    from mhray.rayutil import attach_payload

    side_schema = pa.schema([("iid", pa.int64()),
                             ("caption_len", pa.int32())])
    pair_schema = pa.schema([("lo", pa.int64()), ("hi", pa.int64()),
                             ("shared_slots", pa.int64())])
    g = attach_payload(gated, "lo", lo_side, "iid", ("caption_len",),
                       "lo", num_parts, pairs_schema=pair_schema,
                       side_schema=side_schema)
    mid = pa.schema(list(pair_schema) + [pa.field("caption_len_lo",
                                                  pa.int32())])
    g = attach_payload(g, "hi", hi_side, "iid", ("caption_len",),
                       "hi", num_parts, pairs_schema=mid,
                       side_schema=side_schema)

    def store_gate(batch: pa.Table) -> pa.Table:
        ll = np.asarray(batch.column("caption_len_lo"), np.int32)
        lh = np.asarray(batch.column("caption_len_hi"), np.int32)
        keep = pa.array(~((ll < msl) & (lh < msl)))
        return pa.table({
            "lo": batch.column("lo").filter(keep),
            "hi": batch.column("hi").filter(keep),
            "shared_slots": batch.column("shared_slots").filter(keep),
        })

    return g.map_batches(store_gate, batch_format="pyarrow",
                         zero_copy_batch=True)


def phash_candidates(sketches_ds, cfg: MhapConfig, num_parts: int = 64):
    """sketches -> image-axis pairs (lo, hi, hamming) gated on Hamming
    distance INSIDE the band partition (junk band collisions never
    leave it), deduplicated across bands by one pair-keyed shuffle."""
    bands = sketches_ds.map_batches(
        explode_phash_bands,
        fn_kwargs={"n_bands": cfg.phash_bands, "band_bits": cfg.phash_band_bits,
                   "num_parts": num_parts},
        batch_format="pyarrow", zero_copy_batch=True,
    )
    gated = bands.groupby("part", num_partitions=num_parts).map_groups(
        make_emit_phash_pairs(cfg.band_group_cap, cfg.phash_max_hamming,
                              num_parts),
        batch_format="pyarrow")
    # dedupe the same pair found via multiple bands
    return gated.groupby("pair_part", num_partitions=num_parts).map_groups(
        make_pair_min("hamming"), batch_format="pyarrow")
