"""Multimodal payload stages: image / audio / video columns handled as
opaque binary + typed metadata, processed by actor-pool map_batches.

The container ships no media libraries, so decode paths beyond the
built-in ppm/png subset are STUBS (deterministic fakes or
NotImplementedError) — the Ray-side plumbing (schema, batch sizing,
actor signature, output layout) is real and tested, and a real codec
drops into the same seam on a production cluster.

Batch sizing note: media rows are wide (binary payloads), so these
stages default to SMALL batch sizes — batch_size * concurrency * row
bytes must fit the worker heap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from mhray.imageops import UnsupportedFormatError, decode_image, phash64


class ImageFeatureStage:
    """Actor-pool stage: decode -> (phash, mean_luma, w, h, decode_ok).

    Real decode for ppm/png; other formats keep the metadata columns
    and set decode_ok=false (stub path)."""

    def __init__(self, recompute_phash: bool = True):
        self.recompute_phash = recompute_phash

    def __call__(self, batch: pa.Table) -> pa.Table:
        raw = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        n = batch.num_rows
        ph = np.asarray(batch.column("phash"), dtype=np.int64).copy() \
            if "phash" in batch.column_names else np.zeros(n, np.int64)
        luma = np.zeros(n, dtype=np.float64)
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            try:
                img = decode_image(raw[i], fmts[i])
                ok[i] = True
                luma[i] = float(
                    (img.astype(np.float64)
                     @ np.array([0.299, 0.587, 0.114])).mean())
                if self.recompute_phash:
                    ph[i] = phash64(img)
            except (UnsupportedFormatError, ValueError):
                pass
        return pa.table({
            "image_id": batch.column("image_id"),
            "phash": pa.array(ph, pa.int64()),
            "mean_luma": pa.array(np.round(luma, 3), pa.float64()),
            "decode_ok": pa.array(ok),
        })


class ImageResizeStage:
    """Actor-pool stage: decode -> nearest-resample to (side, side) ->
    re-encode. Stub formats pass through unchanged with resized=false."""

    def __init__(self, side: int = 16, out_fmt: str = "ppm"):
        self.side = side
        self.out_fmt = out_fmt

    def __call__(self, batch: pa.Table) -> pa.Table:
        from mhray.imageops import _resample_nearest, encode_image

        raw = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        n = batch.num_rows
        out_bytes, out_fmt, resized = [], [], np.zeros(n, dtype=bool)
        for i in range(n):
            try:
                img = decode_image(raw[i], fmts[i])
                small = np.stack([
                    _resample_nearest(img[:, :, c], self.side)
                    for c in range(3)], axis=2).astype(np.uint8)
                out_bytes.append(encode_image(small, self.out_fmt))
                out_fmt.append(self.out_fmt)
                resized[i] = True
            except (UnsupportedFormatError, ValueError):
                out_bytes.append(raw[i])
                out_fmt.append(fmts[i])
        return pa.table({
            "image_id": batch.column("image_id"),
            "bytes": pa.array(out_bytes, pa.binary()),
            "fmt": pa.array(out_fmt, pa.string()),
            "w": pa.array(np.where(resized, self.side,
                                   np.asarray(batch.column("w"))), pa.int32()),
            "h": pa.array(np.where(resized, self.side,
                                   np.asarray(batch.column("h"))), pa.int32()),
            "resized": pa.array(resized),
        })


class AudioFeatureStage:
    """STUB: audio decode is unavailable in this container. The stage
    validates the schema contract (audio_id, bytes, fmt, sr) and emits a
    deterministic fake embedding derived from the payload hash so the
    downstream plumbing (schema, partitioning) is exercised."""

    def __init__(self, dim: int = 8, strict: bool = False):
        self.dim = dim
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "audio decode requires external libs not present here")
        raw = batch.column("bytes").to_pylist()
        ids = batch.column(batch.column_names[0])
        feats = np.zeros((len(raw), self.dim), dtype=np.float32)
        for i, b in enumerate(raw):
            h = np.frombuffer(
                np.uint64(abs(hash(bytes(b[:64])))).tobytes() * self.dim,
                dtype=np.uint8)[: self.dim]
            feats[i] = h.astype(np.float32) / 255.0
        return pa.table({
            "id": ids,
            "audio_embedding": pa.array(list(feats), pa.list_(pa.float32())),
            "stub": pa.array(np.ones(len(raw), dtype=bool)),
        })


class VideoFrameSampleStage:
    """STUB: frame sampling contract — emits (video_id, frame_index)
    rows for every requested sample position without decoding (the
    real implementation replaces ``_sample`` only)."""

    def __init__(self, n_frames: int = 4, strict: bool = False):
        self.n_frames = n_frames
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "video decode requires external libs not present here")
        ids = batch.column(batch.column_names[0]).to_pylist()
        out_id, out_frame = [], []
        for vid in ids:
            for f in range(self.n_frames):
                out_id.append(vid)
                out_frame.append(f)
        return pa.table({
            "video_id": pa.array(out_id),
            "frame_index": pa.array(out_frame, pa.int32()),
            "stub": pa.array([True] * len(out_id)),
        })


def image_features(images_ds, concurrency=None, batch_size: int = 64):
    """Dataset wiring for ImageFeatureStage (actor pool, small batches
    because rows carry encoded pixels)."""
    if concurrency is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4))
        concurrency = (1, max(2, cpus - 2))
    return images_ds.map_batches(
        ImageFeatureStage, fn_constructor_kwargs={},
        batch_size=batch_size, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency,
    )
