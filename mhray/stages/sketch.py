"""Stage 1: the sketch actor — T1 (weighted MinHash) + T2 (bottom-k
positional sketch) + F4 (SimHash) fused into one pass per batch,
mirroring SequenceSketch construction (impl/SequenceSketch.java:106-116,
impl/SequenceSketchStreamer.java:262-266).

Runs as an actor pool via ``map_batches(SketchStage, concurrency=...)``:
the FrequencyCounts side table is fetched from the object store ONCE per
actor in ``__init__`` (the kmerFilter load pattern,
main/MhapMain.java:339-373), batches stream through ``__call__``.

Output schema (the stage-1 checkpoint, FIXTURES.md §4; sketch payloads
are length-framed binary — the SequenceSketch serialization analog,
impl/SequenceSketch.java:123-148 — because Arrow joins cannot carry
nested list payload columns):
    image_id: string, iid: int64, minhash: binary (H x int32),
    bs_blob: binary ([seq_len][k][hashes][positions] int32),
    caption_len: int32, caption_hash: int64, phash: int64, valid: bool
    (+ simhash: int64 when SketchStage(with_simhash=True) — opt-in,
    not produced by the sketch_dataset default; + bitsig: binary when
    cfg.bit_prefilter)

Rows that yield zero shingles (the ZeroNGramsFoundException path,
sketch/MinHashSketch.java:84-85) or fail the min-length filter
(impl/SequenceSketchStreamer.java:130-133) are carried with
``valid=false`` instead of raising.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mhray import kernels as K
from mhray.config import MhapConfig
from mhray.freq import FreqTable, tfidf_weights
from mhray.imageops import UnsupportedFormatError, decode_image, phash64_batch
from mhray.oracle import image_iid

INT32_MIN = np.iinfo(np.int32).min


def _binary_from_matrix(mat: np.ndarray) -> pa.Array:
    """Equal-width binary column from an (n, w) int32 matrix, zero-copy."""
    n = mat.shape[0]
    flat = np.ascontiguousarray(mat.astype("<i4", copy=False))
    width = flat.shape[1] * 4
    off = np.arange(0, (n + 1) * width, width, dtype=np.int32)
    return pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(off.tobytes()), pa.py_buffer(flat.tobytes())],
    )


def _binary_from_matrix_i64(mat: np.ndarray) -> pa.Array:
    """Equal-width binary column from an (n, w) int64 matrix, zero-copy."""
    n = mat.shape[0]
    flat = np.ascontiguousarray(mat.astype("<i8", copy=False))
    width = flat.shape[1] * 8
    off = np.arange(0, (n + 1) * width, width, dtype=np.int32)
    return pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(off.tobytes()), pa.py_buffer(flat.tobytes())],
    )


class SketchStage:
    """Callable class for ``map_batches`` (actor pool when concurrency>1)."""

    def __init__(self, cfg: MhapConfig, freq_ref=None, decode_pixels: bool = False,
                 with_simhash: bool = False, simhash_kmer: int = 6):
        self.cfg = cfg
        self.decode_pixels = decode_pixels
        self.with_simhash = with_simhash  # opt-in: ~0.9 ms/row, unused
                                          # by the flagship gates
        self.simhash_kmer = simhash_kmer
        self.freq: FreqTable | None = None
        if freq_ref is not None:
            import ray

            table = freq_ref
            if isinstance(freq_ref, ray.ObjectRef):
                table = ray.get(freq_ref)  # zero-copy Arrow from object store
            self.freq = FreqTable.from_arrow(
                table,
                filter_cutoff=cfg.filter_cutoff,
                offset=cfg.idf_offset,
                idf_range=cfg.repeat_idf_scale,
                no_tf=cfg.no_tf,
                remove_unique=cfg.remove_unique,
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        caption_col = batch.column("caption")
        image_ids = batch.column("image_id").to_pylist()
        n = batch.num_rows
        iids = image_iid(image_ids)

        # stage-1 signature (weighted MinHash over k-shingles); the
        # Arrow column goes straight into the shingler (ASCII fast path)
        h64, off64 = K.shingle_hashes64(caption_col, cfg.kmer_size)
        keys, counts, uoff = K.unique_in_first_occurrence_order(h64, off64)
        weights = tfidf_weights(keys, counts, self.freq, cfg.repeat_weight)
        if self.freq is not None and cfg.remove_unique == 1:
            weights = np.where(self.freq.keep_kmer(keys), weights, 0)
        sig = K.weighted_minhash(keys, weights, uoff, cfg.num_hashes)

        # stage-2 positional bottom sketch, serialized to the binary
        # framing (SequenceSketch.java:123-148 analog) so joins can
        # carry it as a flat payload
        h32, off32 = K.shingle_hashes32(caption_col, cfg.ordered_kmer_size)
        bs_blob = K.bottom_sketch_batch_pack(
            h32, off32, cfg.ordered_sketch_size)

        caption_hash = K.hash_strings64(caption_col)

        caption_lens = pa.compute.utf8_length(caption_col).to_numpy(
            zero_copy_only=False).astype(np.int32)
        valid = (
            (sig[:, 0] != INT32_MIN)
            & (np.diff(off64) > 0)
            & (caption_lens >= cfg.min_olap_length)
        )

        # image axis: decode + recompute pHash (actor-pool CPU work);
        # falls back to the input phash column on unsupported formats
        phash = np.asarray(batch.column("phash"), dtype=np.int64).copy()
        if self.decode_pixels:
            raw = batch.column("bytes").to_pylist()
            fmts = batch.column("fmt").to_pylist()
            decoded, idx = [], []
            for i in range(n):
                try:
                    decoded.append(decode_image(raw[i], fmts[i]))
                    idx.append(i)
                except (UnsupportedFormatError, ValueError):
                    pass  # keep the provided phash
            if decoded:
                phash[np.asarray(idx)] = phash64_batch(decoded)

        out = {
            "image_id": pa.array(image_ids, pa.string()),
            "iid": pa.array(iids, pa.int64()),
            "minhash": _binary_from_matrix(sig),
            "bs_blob": bs_blob,
            "caption_len": pa.array(caption_lens, pa.int32()),
            "caption_hash": pa.array(caption_hash, pa.int64()),
            "phash": pa.array(phash, pa.int64()),
            "valid": pa.array(valid.astype(bool)),
        }
        if cfg.bit_prefilter:
            words = K.minhash_bit_sketch(sig)
            out["bitsig"] = _binary_from_matrix_i64(words)
        if self.with_simhash:
            out["simhash"] = pa.array(
                K.simhash64(caption_col.to_pylist(), self.simhash_kmer),
                pa.int64())
        return pa.table(out)


def sketch_dataset(images_ds, cfg: MhapConfig, freq_ref=None,
                   decode_pixels: bool = False, concurrency=None):
    """images Dataset -> sketches Dataset (actor pool, zero-copy Arrow)."""
    if concurrency is None:
        import ray

        # FIXED pool capped BELOW the cluster CPU count: 2 CPUs stay
        # free for downstream operators (write, shuffle aggregators) —
        # a fixed pool equal to the CPU count deadlocks the stream.
        # Fixed (hi, hi) beats autoscaling (hi//2, hi): measured 40%
        # faster on a 500k-row corpus — the ramp from the min never
        # reaches the cap before the stage drains
        cpus = int(ray.cluster_resources().get("CPU", 4))
        # floor 1, never the full CPU count: on a 2-CPU box max(2, ...)
        # would equal the cluster size — the deadlock this cap exists
        # to prevent
        hi = max(1, cpus - 2)
        concurrency = (hi, hi)
    return images_ds.map_batches(
        SketchStage,
        fn_constructor_kwargs={
            "cfg": cfg,
            "freq_ref": freq_ref,
            "decode_pixels": decode_pixels,
        },
        batch_size=cfg.sketch_batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )
