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
                        num_parts: int) -> pa.Table:
    """(phash, iid) -> (part, key, iid, phash) band rows; phash is
    carried so the Hamming gate needs no extra join."""
    from mhray.kernels import phash_band_keys

    ph = np.asarray(batch.column("phash"), dtype=np.int64)
    iids = np.asarray(batch.column("iid"), dtype=np.int64)
    keys = phash_band_keys(ph, n_bands, band_bits)  # (N, B)
    flat = keys.ravel()
    out_iids = np.repeat(iids, n_bands)
    out_ph = np.repeat(ph, n_bands)
    part = _part_of(flat, num_parts)
    return pa.table({
        "part": pa.array(part, pa.int32()),
        "key": pa.array(flat, pa.int64()),
        "iid": pa.array(out_iids, pa.int64()),
        "phash": pa.array(out_ph, pa.int64()),
    })


def _part_of(keys: np.ndarray, num_parts: int) -> np.ndarray:
    # cheap 64-bit mix so adjacent slot ids spread across partitions
    x = keys.view(np.uint64).copy()
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    return (x % np.uint64(num_parts)).astype(np.int32)


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
    order = np.lexsort((iids, keys))
    k = keys[order]
    v = iids[order]
    p = payload[order] if payload is not None else None
    starts = np.flatnonzero(np.diff(k, prepend=k[0] - 1)) if len(k) else np.empty(0, np.int64)
    sizes = np.diff(np.append(starts, len(k)))

    lo_parts, hi_parts, cap_parts = [], [], []
    plo_parts, phi_parts = [], []
    dropped = 0
    multi = np.flatnonzero(sizes >= 2)
    for gi in multi:
        s = int(starts[gi])
        g = int(sizes[gi])
        if g > cap:
            dropped += g - cap
            g = cap
        ids = v[s : s + g]
        a_idx = np.repeat(np.arange(g), np.arange(g - 1, -1, -1))
        b_idx = _upper_triangle_cols(g)
        lo_parts.append(ids[a_idx])
        hi_parts.append(ids[b_idx])
        cap_parts.append(np.full(len(a_idx), sizes[gi] > cap, dtype=bool))
        if p is not None:
            plo_parts.append(p[s : s + g][a_idx])
            phi_parts.append(p[s : s + g][b_idx])

    if not lo_parts:
        empty = np.empty(0, np.int64)
        if payload is not None:
            return empty, empty, np.empty(0, bool), dropped, empty, empty
        return empty, empty, np.empty(0, bool), dropped
    lo = np.concatenate(lo_parts)
    hi = np.concatenate(hi_parts)
    capped = np.concatenate(cap_parts)
    if payload is not None:
        return lo, hi, capped, dropped, np.concatenate(plo_parts), np.concatenate(phi_parts)
    return lo, hi, capped, dropped


def _upper_triangle_cols(g: int) -> np.ndarray:
    """Column indices of the strict upper triangle, row-major:
    g=3 -> [1,2,2]."""
    reps = np.arange(g - 1, -1, -1)
    a = np.repeat(np.arange(g), reps)
    # position within each row block
    block_start = np.repeat(np.cumsum(np.concatenate(([0], reps[:-1]))), reps)
    offset = np.arange(len(a)) - block_start
    return a + 1 + offset


def make_emit_pairs(cap: int, with_payload: bool = False):
    """map_groups(part) fn: pairs within every key group of the
    partition, with per-pair partial counts (combiner before shuffle #2)."""

    def emit_pairs(part: pa.Table) -> pa.Table:
        keys = np.asarray(part.column("key"), dtype=np.int64)
        iids = np.asarray(part.column("iid"), dtype=np.int64)
        if with_payload:
            payload = np.asarray(part.column("phash"), dtype=np.int64)
            lo, hi, capped, dropped, plo, phi = _pairs_within_groups(
                keys, iids, cap, payload)
        else:
            lo, hi, capped, dropped = _pairs_within_groups(keys, iids, cap)
        if dropped:
            print(f"[mhray] candidate group cap: dropped {dropped} ids in one partition")
        # partial pair-count within the partition (pre-aggregate):
        if with_payload:
            tbl = pa.table({
                "lo": pa.array(lo, pa.int64()), "hi": pa.array(hi, pa.int64()),
                "capped": pa.array(capped),
                "phash_lo": pa.array(plo, pa.int64()),
                "phash_hi": pa.array(phi, pa.int64()),
            })
            return tbl.group_by(["lo", "hi", "phash_lo", "phash_hi"]).aggregate(
                [("capped", "max")]
            ).rename_columns(["lo", "hi", "phash_lo", "phash_hi", "capped"])
        tbl = pa.table({
            "lo": pa.array(lo, pa.int64()), "hi": pa.array(hi, pa.int64()),
            "capped": pa.array(capped),
            "n": pa.array(np.ones(len(lo), np.int64)),
        })
        agg = tbl.group_by(["lo", "hi"]).aggregate([("n", "sum"), ("capped", "max")])
        return agg.rename_columns(["lo", "hi", "partial_count", "capped"])

    return emit_pairs


# ---------------------------------------------------------------------------
# dataset-level wiring
# ---------------------------------------------------------------------------

def minhash_candidates(sketches_ds, cfg: MhapConfig, num_parts: int = 64):
    """sketches -> gated candidate pairs (lo, hi, shared_slots).

    Two shuffles: groupby(part) to co-locate LSH keys, then
    groupby(lo,hi) to total the per-partition partial counts and apply
    the num_min_matches gate."""
    bands = sketches_ds.map_batches(
        explode_minhash,
        fn_kwargs={"num_hashes": cfg.num_hashes, "num_parts": num_parts},
        batch_format="pyarrow", zero_copy_batch=True,
    )
    pairs = bands.groupby("part").map_groups(
        make_emit_pairs(cfg.band_group_cap), batch_format="pyarrow"
    )
    counted = pairs.groupby(["lo", "hi"]).sum("partial_count").rename_columns(
        {"sum(partial_count)": "shared_slots"}
    )
    return counted.filter(expr=f"shared_slots >= {cfg.num_min_matches}")


def phash_candidates(sketches_ds, cfg: MhapConfig, num_parts: int = 64):
    """sketches -> image-axis pairs (lo, hi, hamming) gated on Hamming
    distance, deduplicated across bands."""
    from mhray.kernels import hamming64

    bands = sketches_ds.map_batches(
        explode_phash_bands,
        fn_kwargs={"n_bands": cfg.phash_bands, "band_bits": cfg.phash_band_bits,
                   "num_parts": num_parts},
        batch_format="pyarrow", zero_copy_batch=True,
    )
    pairs = bands.groupby("part").map_groups(
        make_emit_pairs(cfg.band_group_cap, with_payload=True), batch_format="pyarrow"
    )

    def gate(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select(["lo", "hi"]).append_column(
                "hamming", pa.array([], pa.int32()))
        a = np.asarray(batch.column("phash_lo"), dtype=np.int64)
        b = np.asarray(batch.column("phash_hi"), dtype=np.int64)
        ham = hamming64(a, b).astype(np.int32)
        keep = ham <= cfg.phash_max_hamming
        return pa.table({
            "lo": pc.array_filter(batch.column("lo"), pa.array(keep)),
            "hi": pc.array_filter(batch.column("hi"), pa.array(keep)),
            "hamming": pa.array(ham[keep], pa.int32()),
        })

    gated = pairs.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)
    # dedupe the same pair found via multiple bands
    return gated.groupby(["lo", "hi"]).min("hamming").rename_columns(
        {"min(hamming)": "hamming"}
    )
