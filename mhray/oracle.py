"""Single-process reference oracle (no Ray).

Faithful brute-force implementation of the reference's search semantics
(impl/MinHashSearch.java:149-251) over the same kernels the distributed
pipeline uses: per-slot inverted index probe -> shared-slot count gate
(>= num_min_matches) -> pair-once id ordering rules (:199-225) ->
positional verify (>= threshold) -> optional pHash Hamming gate ->
union-find clusters.

Because the sandbox has no JVM, this oracle IS the stand-in for
"reference cluster assignments" (SURVEY.md §5c): the distributed Ray
pipeline must reproduce its pairs/clusters with dup-pair recall >= 0.99.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from mhray import kernels as K
from mhray.config import MhapConfig
from mhray.freq import FreqTable, tfidf_weights

INT32_MIN = np.iinfo(np.int32).min


def image_iid(image_ids: list[str]) -> np.ndarray:
    """Stable int64 id per image_id: parsed digits for 'img_NNN' style
    ids, murmur64 of the UTF-16LE string otherwise. The pipeline uses
    the same function so pair canonicalization agrees."""
    out = np.empty(len(image_ids), dtype=np.int64)
    fallback_idx = []
    for i, s in enumerate(image_ids):
        tail = s.rsplit("_", 1)[-1]
        if tail.isdigit():
            out[i] = int(tail)
        else:
            fallback_idx.append(i)
    if fallback_idx:
        from mhray.murmur import murmur3_x64_128_scalar

        for i in fallback_idx:
            out[i] = np.uint64(
                murmur3_x64_128_scalar(image_ids[i].encode("utf-16-le"))
            ).astype(np.int64)
    return out


@dataclass
class OracleResult:
    sketches: dict = field(repr=False, default=None)
    pairs: pa.Table = None       # lo_id, hi_id, score, raw_score, a1,a2,b1,b2, shared_slots, hamming
    clusters: pa.Table = None    # image_id, cluster_id
    rejects: list = field(default_factory=list)


def sketch_rows(captions: list[str], cfg: MhapConfig,
                freq: FreqTable | None = None):
    """Shared sketch computation: stage-1 signature + stage-2 sketch."""
    h64, off64 = K.shingle_hashes64(captions, cfg.kmer_size)
    keys, counts, uoff = K.unique_in_first_occurrence_order(h64, off64)
    weights = tfidf_weights(keys, counts, freq, cfg.repeat_weight)
    if freq is not None and cfg.remove_unique == 1:
        weights = np.where(freq.keep_kmer(keys), weights, 0)
    sig = K.weighted_minhash(keys, weights, uoff, cfg.num_hashes)
    h32, off32 = K.shingle_hashes32(captions, cfg.ordered_kmer_size)
    bs = []
    for i in range(len(captions)):
        seg = h32[off32[i]: off32[i + 1]]
        bh, bp = K.bottom_sketch(seg, cfg.ordered_sketch_size)
        bs.append((bh, bp, len(seg)))
    # valid = has a stage-1 signature, enough kmers, long enough caption
    n_k1 = np.diff(off64)
    caption_lens = np.asarray([len(c) for c in captions])
    valid = (
        (sig[:, 0] != INT32_MIN)
        & (n_k1 > 0)
        & (caption_lens >= cfg.min_olap_length)
    )
    return sig, bs, valid


def find_pairs(
    image_ids: list[str], captions: list[str], phash: np.ndarray,
    cfg: MhapConfig, freq: FreqTable | None = None,
    require_phash: bool = True,
) -> OracleResult:
    n = len(image_ids)
    iids = image_iid(image_ids)
    cap_lens = np.asarray([len(c) for c in captions])
    sig, bs, valid = sketch_rows(captions, cfg, freq)

    # inverted index: per slot, value -> row list (MinHashSearch.java:85-147)
    index: list[dict[int, list[int]]] = [defaultdict(list) for _ in range(cfg.num_hashes)]
    for r in range(n):
        if not valid[r]:
            continue
        for slot in range(cfg.num_hashes):
            index[slot][int(sig[r, slot])].append(r)

    out = defaultdict(list)
    phash = np.asarray(phash, dtype=np.int64)
    # image-axis candidate condition mirrors the pipeline's pHash banding
    # (BitVectorIndex analog): a pair must collide on >=1 band AND pass
    # the Hamming gate
    bands = K.phash_band_keys(phash, cfg.phash_bands, cfg.phash_band_bits)
    for q in range(n):
        if not valid[q]:
            continue
        hits: dict[int, int] = defaultdict(int)
        for slot in range(cfg.num_hashes):
            for r in index[slot].get(int(sig[q, slot]), ()):
                hits[r] += 1
        for r, count in hits.items():
            if r == q:
                continue  # self (MinHashSearch.java:200-201)
            if count < cfg.num_min_matches:
                continue
            # min_store_length pair rules (MinHashSearch.java:210-225):
            # never short-short; long-long processed once by the larger
            # query id; short query-long match processed by the short
            # side (no id order)
            short_q = cap_lens[q] < cfg.min_store_length
            short_r = cap_lens[r] < cfg.min_store_length
            if short_q and short_r:
                continue
            if not short_q and not short_r and iids[r] > iids[q]:
                continue
            if short_r and not short_q:
                continue  # never short(match) to long(query)
            if iids[r] == iids[q]:
                # distinct rows sharing an iid violate the unique-id
                # precondition every pair path assumes (the pipeline's
                # strict lo<hi canonicalization silently drops them;
                # processing here would emit the pair TWICE)
                continue
            lo, hi = (r, q) if iids[r] < iids[q] else (q, r)
            # verify in canonical (lo, hi) orientation — the kernel is
            # orientation-asymmetric near threshold (median tie-break,
            # window clamping), and the distributed VerifyPairs always
            # runs (lo, hi); the oracle must match it bit-for-bit, and
            # a1..b2 must be lo-oriented like the pipeline's
            res = K.verify_pair(
                bs[lo][0], bs[lo][1], bs[lo][2],
                bs[hi][0], bs[hi][1], bs[hi][2],
                cfg.ordered_kmer_size, cfg.max_shift,
            )
            if res is None or res.score < cfg.threshold:
                continue
            ham = int(K.hamming64(phash[q:q + 1], phash[r:r + 1])[0])
            if require_phash and (
                ham > cfg.phash_max_hamming
                or not (bands[q] == bands[r]).any()
            ):
                continue
            out["lo_id"].append(image_ids[lo])
            out["hi_id"].append(image_ids[hi])
            out["score"].append(res.score)
            out["raw_score"].append(res.raw_score)
            out["a1"].append(res.a1)
            out["a2"].append(res.a2)
            out["b1"].append(res.b1)
            out["b2"].append(res.b2)
            out["shared_slots"].append(count)
            out["hamming"].append(ham)

    pairs = pa.table({
        "lo_id": pa.array(out["lo_id"], pa.string()),
        "hi_id": pa.array(out["hi_id"], pa.string()),
        "score": pa.array(out["score"], pa.float64()),
        "raw_score": pa.array(out["raw_score"], pa.float64()),
        "a1": pa.array(out["a1"], pa.int32()),
        "a2": pa.array(out["a2"], pa.int32()),
        "b1": pa.array(out["b1"], pa.int32()),
        "b2": pa.array(out["b2"], pa.int32()),
        "shared_slots": pa.array(out["shared_slots"], pa.int32()),
        "hamming": pa.array(out["hamming"], pa.int32()),
    })
    clusters = cluster_pairs(image_ids, pairs)
    rejects = [image_ids[i] for i in range(n) if not valid[i]]
    return OracleResult(sketches=None, pairs=pairs, clusters=clusters, rejects=rejects)


def cluster_pairs(image_ids: list[str], pairs: pa.Table) -> pa.Table:
    """Union-find over accepted pairs; cluster id = min member iid.
    Singletons cluster with themselves."""
    iids = image_iid(image_ids)
    parent: dict[str, str] = {i: i for i in image_ids}
    order = {img: int(v) for img, v in zip(image_ids, iids)}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for lo, hi in zip(pairs.column("lo_id").to_pylist(), pairs.column("hi_id").to_pylist()):
        ra, rb = find(lo), find(hi)
        if ra != rb:
            if order[ra] <= order[rb]:
                parent[rb] = ra
            else:
                parent[ra] = rb

    roots = {i: find(i) for i in image_ids}
    return pa.table({
        "image_id": pa.array(image_ids, pa.string()),
        "cluster_id": pa.array([order[roots[i]] for i in image_ids], pa.int64()),
    })


def recall_against(truth_pairs: pa.Table, got_pairs: pa.Table) -> float:
    """Dup-pair recall: |truth ∩ got| / |truth| over canonical pair keys."""
    t = set(zip(truth_pairs.column("lo_id").to_pylist(),
                truth_pairs.column("hi_id").to_pylist()))
    g = set(zip(got_pairs.column("lo_id").to_pylist(),
                got_pairs.column("hi_id").to_pylist()))
    if not t:
        return 1.0
    return len(t & g) / len(t)


def cluster_pair_recall(truth_clusters: pa.Table, got_clusters: pa.Table) -> float:
    """Fraction of truth intra-cluster pairs that are intra-cluster in got."""
    def intra(tbl):
        by = defaultdict(list)
        for i, c in zip(tbl.column("image_id").to_pylist(), tbl.column("cluster_id").to_pylist()):
            by[c].append(i)
        s = set()
        for members in by.values():
            members.sort()
            for a in range(len(members)):
                for b in range(a + 1, len(members)):
                    s.add((members[a], members[b]))
        return s

    t, g = intra(truth_clusters), intra(got_clusters)
    if not t:
        return 1.0
    return len(t & g) / len(t)
