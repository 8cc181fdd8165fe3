"""Deterministic synthetic image+caption corpus with planted duplicates.

Generator analog of the reference's simulation tooling
(utils/RandomSequenceGenerator.java:99-150 edit-noise model,
main/KmerStatSimulator.java:328-490 calibration corpus), retargeted at
the BASELINE.json input_hint schema:

    images(image_id: string, bytes: binary, w: int32, h: int32,
           fmt: string, caption: string, phash: int64)

Plants duplicate clusters (caption edit-noise variants + re-encoded /
noised images with PSNR >= 40 dB inside a cluster) plus adversarial
rows: empty/short captions (the ZeroNGramsFound path,
sketch/MinHashSketch.java:84-85), a hot boilerplate caption shared by
many NON-duplicate rows (skew / salting test), and near-miss pairs just
below the accept threshold. Emits ground-truth pair + cluster tables.

Everything is seeded; same (seed, n_rows, ...) -> byte-identical corpus.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from mhray.imageops import encode_image, phash64

_LETTERS = np.array(list("abcdefghijklmnopqrstuvwxyz"))


@dataclass
class SynthSpec:
    n_rows: int = 1000
    dup_fraction: float = 0.4          # fraction of rows living in dup clusters
    max_cluster_size: int = 5
    edit_rate: float = 0.02            # per-char caption edit rate inside clusters
    near_miss_fraction: float = 0.02   # rows paired w/ high-edit captions (non-dup)
    substring_fraction: float = 0.0    # pairs sharing ONLY a long verbatim
                                       # segment inside long distinct captions
                                       # (stage-1 MinHash gate misses them)
    substring_seg_chars: int = 48
    boilerplate_fraction: float = 0.02 # rows sharing one hot caption (non-dup)
    short_caption_fraction: float = 0.01  # captions shorter than the shingle size
    img_size: int = 32
    vocab_size: int = 4000
    caption_words: tuple[int, int] = (9, 16)
    seed: int = 1234
    id_offset: int = 0                 # first image ordinal (parallel shards)
    cluster_offset: int = 0            # first cluster id (parallel shards)


def _make_vocab(rng: np.random.Generator, size: int) -> list[str]:
    lens = rng.integers(4, 10, size=size)
    return ["".join(_LETTERS[rng.integers(0, 26, size=n)]) for n in lens]


def _base_caption(rng: np.random.Generator, vocab: list[str], lo: int, hi: int) -> str:
    n = int(rng.integers(lo, hi + 1))
    return " ".join(vocab[i] for i in rng.integers(0, len(vocab), size=n))


def edit_text(rng: np.random.Generator, text: str, rate: float,
              alphabet) -> str:
    """Per-char substitution/insertion/deletion at ``rate`` each-third
    (the RandomSequenceGenerator error model, with uniform split) —
    the ONE copy of the reference error model, shared by the corpus
    generator and the calibration harness (alphabet differs)."""
    out = []
    n_alpha = len(alphabet)
    for ch in text:
        r = rng.random()
        if r < rate / 3:
            out.append(str(alphabet[rng.integers(0, n_alpha)]))  # substitute
        elif r < 2 * rate / 3:
            out.append(ch)
            out.append(str(alphabet[rng.integers(0, n_alpha)]))  # insert
        elif r < rate:
            pass                                                 # delete
        else:
            out.append(ch)
    return "".join(out)


def _edit_caption(rng: np.random.Generator, text: str, rate: float) -> str:
    return edit_text(rng, text, rate, _LETTERS[:26])


def _base_image(rng: np.random.Generator, n: int) -> np.ndarray:
    """Smooth random image (bilinear-upsampled coarse field) so pHash
    DCT coefficients sit away from their median -> stable under noise."""
    c = 8
    coarse = rng.integers(0, 256, size=(c, c, 3)).astype(np.float64)
    t = np.linspace(0, c - 1, n)
    i0 = np.clip(t.astype(np.int64), 0, c - 2)
    f = (t - i0)[:, None]
    rows = coarse[i0] * (1 - f[..., None]) + coarse[i0 + 1] * f[..., None]
    img = rows[:, i0] * (1 - f.T[..., None]) + rows[:, i0 + 1] * f.T[..., None]
    return np.clip(img, 0, 255).astype(np.uint8)


def _noise_variant(rng: np.random.Generator, img: np.ndarray) -> np.ndarray:
    """+-2 uniform noise: MSE <= 4 -> PSNR >= 42 dB, inside the invariant."""
    noise = rng.integers(-2, 3, size=img.shape).astype(np.int16)
    return np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)


def generate_corpus(spec: SynthSpec) -> tuple[pa.Table, pa.Table, pa.Table]:
    """Returns (images, truth_pairs, truth_clusters) Arrow tables."""
    rng = np.random.default_rng(spec.seed)
    vocab = _make_vocab(rng, spec.vocab_size)
    boilerplate = _base_caption(rng, vocab, 10, 14)

    rows_id: list[str] = []
    rows_bytes: list[bytes] = []
    rows_w: list[int] = []
    rows_h: list[int] = []
    rows_fmt: list[str] = []
    rows_caption: list[str] = []
    rows_phash: list[int] = []
    truth_cluster: list[tuple[str, int]] = []

    n = spec.n_rows
    n_dup_rows = int(n * spec.dup_fraction)
    n_boiler = int(n * spec.boilerplate_fraction)
    n_near = int(n * spec.near_miss_fraction)
    n_short = int(n * spec.short_caption_fraction)

    next_cluster = spec.cluster_offset
    i = 0

    def emit(caption: str, img: np.ndarray, fmt: str, cluster: int) -> None:
        nonlocal i
        image_id = f"img_{spec.id_offset + i:012d}"
        data = encode_image(img, fmt)
        rows_id.append(image_id)
        rows_bytes.append(data)
        rows_h.append(img.shape[0])
        rows_w.append(img.shape[1])
        rows_fmt.append(fmt)
        rows_caption.append(caption)
        rows_phash.append(phash64(img))
        truth_cluster.append((image_id, cluster))
        i += 1

    # --- duplicate clusters -------------------------------------------------
    while i < n_dup_rows:
        size = int(rng.integers(2, spec.max_cluster_size + 1))
        size = min(size, n_dup_rows - i)
        if size < 2:
            break
        cluster = next_cluster
        next_cluster += 1
        base_cap = _base_caption(rng, vocab, *spec.caption_words)
        base_img = _base_image(rng, spec.img_size)
        emit(base_cap, base_img, "ppm", cluster)
        for _ in range(size - 1):
            kind = rng.random()
            if kind < 0.3:   # re-encode only: identical caption + pixels
                emit(base_cap, base_img, "png", cluster)
            elif kind < 0.6: # noised pixels, identical caption
                emit(base_cap, _noise_variant(rng, base_img),
                     "ppm" if rng.random() < 0.5 else "png", cluster)
            else:            # edited caption + noised pixels
                emit(_edit_caption(rng, base_cap, spec.edit_rate),
                     _noise_variant(rng, base_img),
                     "ppm" if rng.random() < 0.5 else "png", cluster)

    # --- boilerplate (hot caption, distinct images -> NOT duplicates) -------
    for _ in range(n_boiler):
        cluster = next_cluster
        next_cluster += 1
        emit(boilerplate, _base_image(rng, spec.img_size), "ppm", cluster)

    # --- substring dups: long captions sharing one verbatim segment ---------
    n_substr = int(n * spec.substring_fraction)
    for _ in range(n_substr // 2):
        seg_words = []
        while sum(len(w) + 1 for w in seg_words) < spec.substring_seg_chars:
            seg_words.append(vocab[int(rng.integers(0, len(vocab)))])
        seg = " ".join(seg_words)
        base_img = _base_image(rng, spec.img_size)
        cluster = next_cluster
        next_cluster += 1
        for _ in range(2):
            body = _base_caption(rng, vocab, 90, 120)  # long: dilutes Jaccard
            cut = int(rng.integers(0, max(1, len(body) - 1)))
            cap = body[:cut] + " " + seg + " " + body[cut:]
            emit(cap, _noise_variant(rng, base_img), "ppm", cluster)

    # --- near misses: heavily edited caption pairs, distinct images ---------
    for _ in range(n_near // 2):
        base_cap = _base_caption(rng, vocab, *spec.caption_words)
        for _ in range(2):
            cluster = next_cluster
            next_cluster += 1
            emit(_edit_caption(rng, base_cap, 0.6),
                 _base_image(rng, spec.img_size), "ppm", cluster)

    # --- short / empty captions (ZeroNGramsFound path) ----------------------
    for j in range(n_short):
        cluster = next_cluster
        next_cluster += 1
        emit("" if j % 3 == 0 else "tiny cap"[: int(rng.integers(1, 9))],
             _base_image(rng, spec.img_size), "ppm", cluster)

    # --- singletons ---------------------------------------------------------
    while i < n:
        cluster = next_cluster
        next_cluster += 1
        emit(_base_caption(rng, vocab, *spec.caption_words),
             _base_image(rng, spec.img_size), "ppm", cluster)

    images = pa.table({
        "image_id": pa.array(rows_id, pa.string()),
        "bytes": pa.array(rows_bytes, pa.binary()),
        "w": pa.array(rows_w, pa.int32()),
        "h": pa.array(rows_h, pa.int32()),
        "fmt": pa.array(rows_fmt, pa.string()),
        "caption": pa.array(rows_caption, pa.string()),
        "phash": pa.array(rows_phash, pa.int64()),
    })

    # truth tables: clusters with >= 2 members are the dup clusters
    ids = np.asarray(rows_id)
    cl = np.asarray([c for _, c in truth_cluster], dtype=np.int64)
    order = np.argsort(cl, kind="stable")
    truth_clusters = pa.table({
        "image_id": pa.array(ids[order]),
        "cluster_id": pa.array(cl[order], pa.int64()),
    })
    pairs_lo, pairs_hi = [], []
    uniq, counts = np.unique(cl, return_counts=True)
    for c in uniq[counts >= 2]:
        members = sorted(ids[cl == c])
        for a in range(len(members)):
            for b in range(a + 1, len(members)):
                pairs_lo.append(members[a])
                pairs_hi.append(members[b])
    truth_pairs = pa.table({
        "lo_id": pa.array(pairs_lo, pa.string()),
        "hi_id": pa.array(pairs_hi, pa.string()),
    })
    return images, truth_pairs, truth_clusters


def write_corpus(out_dir: str, spec: SynthSpec, n_files: int = 8) -> dict[str, str]:
    """Write the corpus as partitioned parquet (resumable layout: one
    file per shard so distributed reads parallelize). Returns paths."""
    images, truth_pairs, truth_clusters = generate_corpus(spec)
    img_dir = os.path.join(out_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    n = images.num_rows
    shard = max(1, (n + n_files - 1) // n_files)
    for s, start in enumerate(range(0, n, shard)):
        pq.write_table(images.slice(start, shard),
                       os.path.join(img_dir, f"part-{s:05d}.parquet"))
    pq.write_table(truth_pairs, os.path.join(out_dir, "truth_pairs.parquet"))
    pq.write_table(truth_clusters, os.path.join(out_dir, "truth_clusters.parquet"))
    return {
        "images": img_dir,
        "truth_pairs": os.path.join(out_dir, "truth_pairs.parquet"),
        "truth_clusters": os.path.join(out_dir, "truth_clusters.parquet"),
    }


def _write_shard(args) -> tuple[str, str]:
    out_dir, spec, shard_idx = args
    img_dir = os.path.join(out_dir, "images")
    images, truth_pairs, truth_clusters = generate_corpus(spec)
    pq.write_table(images, os.path.join(img_dir, f"part-{shard_idx:05d}.parquet"))
    tp = os.path.join(out_dir, f"_tp_{shard_idx:05d}.parquet")
    tc = os.path.join(out_dir, f"_tc_{shard_idx:05d}.parquet")
    pq.write_table(truth_pairs, tp)
    pq.write_table(truth_clusters, tc)
    return tp, tc


def write_corpus_parallel(out_dir: str, spec: SynthSpec, n_shards: int = 16,
                          processes: int | None = None) -> dict[str, str]:
    """Multi-process deterministic generation: shard s gets its own
    seeded generator and disjoint id/cluster ranges, so output is
    byte-identical regardless of process count."""
    import multiprocessing as mp
    from dataclasses import replace

    os.makedirs(os.path.join(out_dir, "images"), exist_ok=True)
    per = (spec.n_rows + n_shards - 1) // n_shards
    shard_specs = []
    for s in range(n_shards):
        rows = min(per, spec.n_rows - s * per)
        if rows <= 0:
            break
        shard_specs.append((out_dir, replace(
            spec, n_rows=rows, seed=spec.seed + 7919 * s,
            id_offset=spec.id_offset + s * per,
            cluster_offset=spec.cluster_offset + s * per * 2,
        ), s))
    with mp.Pool(processes or min(16, len(shard_specs))) as pool:
        parts = pool.map(_write_shard, shard_specs)
    tp_all = pa.concat_tables([pq.read_table(tp) for tp, _ in parts])
    tc_all = pa.concat_tables([pq.read_table(tc) for _, tc in parts])
    pq.write_table(tp_all, os.path.join(out_dir, "truth_pairs.parquet"))
    pq.write_table(tc_all, os.path.join(out_dir, "truth_clusters.parquet"))
    for tp, tc in parts:
        os.remove(tp)
        os.remove(tc)
    return {
        "images": os.path.join(out_dir, "images"),
        "truth_pairs": os.path.join(out_dir, "truth_pairs.parquet"),
        "truth_clusters": os.path.join(out_dir, "truth_clusters.parquet"),
    }
