"""Skew torture: the 100-TB design claims, as a regression test.

A planted corpus with (1) one hot caption shared VERBATIM by hundreds
of non-duplicate rows (the million-identical-caption scenario scaled
down) and (2) a block of DISTINCT captions dominated by one shared
boilerplate segment (hot MinHash slots without identical captions —
the skew the reference's repeat-weighting targets,
sketch/MinHashSketch.java:101-124). Asserts the two structural skew
defenses the scale argument rests on:

  (a) rep-collapse: identical captions become ONE representative before
      any LSH explode, so the s2 explode volume is O(distinct captions)
      no matter how hot one caption gets;
  (b) group caps: with a tiny band_group_cap the hot (slot, value)
      groups are truncated (candidate volume collapses) while recall on
      the planted TRUE pairs stays 1.0 and the verified pair set is
      IDENTICAL to the uncapped run's — caps drop only junk.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mhray.config import PRESETS
from mhray.imageops import encode_image, phash64
from mhray.synth import SynthSpec, _base_image, _make_vocab, generate_corpus

N_SKEW = 160          # rows sharing the hot shingle segment
SEG_WORDS = 30        # ~225 shared shingles per caption (k=16)
TAIL_WORDS = 9        # ~87 unique shingles -> pairwise Jaccard ~0.56,
                      # far below threshold=0.78 (junk), while the
                      # shared segment wins ~72% of MinHash slots (hot)


@pytest.fixture(scope="module")
def skew_corpus(tmp_path_factory):
    # 700 synth rows: 210 in dup clusters (the planted TRUE pairs),
    # 350 sharing ONE verbatim boilerplate caption, 140 singletons
    spec = SynthSpec(n_rows=700, dup_fraction=0.3, boilerplate_fraction=0.5,
                     near_miss_fraction=0.0, substring_fraction=0.0,
                     short_caption_fraction=0.0, seed=99)
    images, truth_pairs, _ = generate_corpus(spec)

    rng = np.random.default_rng(4242)
    vocab = _make_vocab(rng, 800)
    seg = " ".join(vocab[i] for i in rng.integers(0, 800, SEG_WORDS))
    rows = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt",
                            "caption", "phash")}
    for j in range(N_SKEW):
        tail = " ".join(vocab[i] for i in rng.integers(0, 800, TAIL_WORDS))
        img = _base_image(rng, 32)
        rows["image_id"].append(f"img_{900000 + j:012d}")
        rows["bytes"].append(encode_image(img, "ppm"))
        rows["w"].append(32)
        rows["h"].append(32)
        rows["fmt"].append("ppm")
        rows["caption"].append(seg + " " + tail)
        rows["phash"].append(phash64(img))
    skew_tbl = pa.table({
        "image_id": pa.array(rows["image_id"], pa.string()),
        "bytes": pa.array(rows["bytes"], pa.binary()),
        "w": pa.array(rows["w"], pa.int32()),
        "h": pa.array(rows["h"], pa.int32()),
        "fmt": pa.array(rows["fmt"], pa.string()),
        "caption": pa.array(rows["caption"], pa.string()),
        "phash": pa.array(rows["phash"], pa.int64()),
    })
    all_images = pa.concat_tables([images, skew_tbl])

    out = tmp_path_factory.mktemp("skew_corpus")
    img_dir = str(out / "images")
    os.makedirs(img_dir)
    n = all_images.num_rows
    shard = (n + 3) // 4
    for s, start in enumerate(range(0, n, shard)):
        pq.write_table(all_images.slice(start, shard),
                       os.path.join(img_dir, f"part-{s:05d}.parquet"))
    return {
        "images": img_dir,
        "table": all_images,
        "truth_pairs": truth_pairs,
        "skew_ids": set(rows["image_id"]),
        "hot_caption": images.column("caption")
                             .to_pylist()[int(700 * 0.3)],  # first boiler row
    }


@pytest.fixture(scope="module")
def skew_run(skew_corpus, ray_session, tmp_path_factory):
    from mhray.pipelines.dedup import pairs_with_ids, run_dedup

    out = str(tmp_path_factory.mktemp("skew_run"))
    cfg = PRESETS["captions"].with_(band_group_cap=16)
    res = run_dedup(skew_corpus["images"], out, cfg, num_parts=4)
    pairs = pairs_with_ids(res, num_parts=4).take_all()
    return {"res": res, "out": out, "cfg": cfg, "pairs": pairs}


def test_rep_collapse_bounds_the_explode(skew_corpus, skew_run):
    """(a) The s2 LSH explode runs at representative granularity: every
    identical-caption group contributes exactly ONE row regardless of
    its size, so explode volume is O(distinct captions)."""
    s1 = pq.read_table(glob.glob(
        os.path.join(skew_run["out"], "s1_sketches", "data", "*.parquet")))
    caps = skew_corpus["table"].column("caption").to_pylist()
    n_distinct = len(set(caps))
    rep = np.asarray(s1.column("rep_iid"))
    iid = np.asarray(s1.column("iid"))
    assert len(np.unique(rep)) == n_distinct
    # s2's input (the explode base) is exactly the rep rows
    assert int((iid == rep).sum()) == n_distinct
    # the hot caption (350 identical rows) collapsed to ONE rep
    ids = s1.column("image_id").to_pylist()
    # caption order in s1 may differ from the input table: re-key by id
    cap_by_id = dict(zip(skew_corpus["table"].column("image_id").to_pylist(),
                         caps))
    hot_reps = {int(r) for r, img in zip(rep, ids)
                if cap_by_id[img] == skew_corpus["hot_caption"]}
    assert len(hot_reps) == 1


def test_recall_stays_perfect_under_caps(skew_corpus, skew_run):
    """(b) recall on the planted TRUE pairs is 1.0 with a 16-member
    group cap in force, and no skew-block junk pair leaks through."""
    from mhray.oracle import recall_against

    got = pa.table({
        "lo_id": [p["lo_id"] for p in skew_run["pairs"]],
        "hi_id": [p["hi_id"] for p in skew_run["pairs"]],
    })
    assert recall_against(skew_corpus["truth_pairs"], got) == 1.0
    skew_ids = skew_corpus["skew_ids"]
    leaked = [p for p in skew_run["pairs"]
              if p["lo_id"] in skew_ids and p["hi_id"] in skew_ids]
    assert not leaked, leaked[:5]


def test_caps_fire_and_only_remove(skew_corpus, skew_run, ray_session):
    """The tiny cap actually FIRED: candidate volume collapses vs the
    uncapped explode (the skew block alone contributes ~C(160,2)
    uncapped candidates; the cap keeps at most C(16,2) per surviving
    group), and capping is strictly subtractive at the s2 level.

    NOTE the semantics here: a long verbatim shared segment IS a
    legitimate s2 caption overlap (MHAP finds overlaps, not whole-text
    equality — impl/MinHashSearch.java second-stage score), so skew
    pairs among the kept group members legitimately pass s2 verify;
    it is the s3 image gate that rejects them. The end-to-end cap
    claim is therefore tested on the FINAL pair set
    (test_final_pairs_invariant_to_cap), not on s2."""
    import ray.data

    from mhray.stages.candidates import minhash_candidates
    from mhray.stages.verify import verify_candidates

    cfg = skew_run["cfg"]
    rep_rows = ray.data.read_parquet(
        os.path.join(skew_run["out"], "s1_sketches", "data")) \
        .filter(expr="valid == True") \
        .filter(expr="iid == rep_iid").materialize()

    n_capped = minhash_candidates(rep_rows, cfg, 4).count()
    uncapped = minhash_candidates(
        rep_rows, cfg.with_(band_group_cap=10 ** 6), 4).materialize()
    n_uncapped = uncapped.count()
    assert n_uncapped > 5 * n_capped, (n_uncapped, n_capped)
    assert n_capped > 0

    # capping only ever REMOVES candidates: the capped run's verified
    # s2 pairs are a subset of the uncapped verify
    v = verify_candidates(uncapped, rep_rows,
                          cfg.with_(band_group_cap=10 ** 6), 4)
    uncapped_pairs = {(r["lo"], r["hi"]) for r in v.take_all()}
    s2 = pq.read_table(glob.glob(
        os.path.join(skew_run["out"], "s2_rep_pairs", "data", "*.parquet")))
    capped_pairs = set(zip(s2.column("lo").to_pylist(),
                           s2.column("hi").to_pylist()))
    assert capped_pairs <= uncapped_pairs


def test_final_pairs_invariant_to_cap(skew_corpus, skew_run, ray_session,
                                      tmp_path_factory):
    """End-to-end: the effectively-uncapped pipeline produces the SAME
    final pair set as the cap=16 run — every candidate the cap dropped
    would have been rejected by the fused caption+image gate anyway."""
    from mhray.pipelines.dedup import pairs_with_ids, run_dedup

    out = str(tmp_path_factory.mktemp("skew_run_uncapped"))
    cfg = PRESETS["captions"].with_(band_group_cap=10 ** 6)
    res = run_dedup(skew_corpus["images"], out, cfg, num_parts=4)
    uncapped = {(p["lo_id"], p["hi_id"])
                for p in pairs_with_ids(res, num_parts=4).take_all()}
    capped = {(p["lo_id"], p["hi_id"]) for p in skew_run["pairs"]}
    assert capped == uncapped


def test_manifest_rows_account_for_the_skew(skew_corpus, skew_run):
    """Lineage manifests stay exact under skew: s1 rows == corpus rows,
    s2 rows == verified rep pairs, every stage's partition rows sum."""
    from mhray.checkpoint import read_manifests

    manifests = {m["stage"]: m for m in read_manifests(skew_run["out"])}
    assert manifests["s1_sketches"]["rows"] == skew_corpus["table"].num_rows
    s2 = pq.read_table(glob.glob(
        os.path.join(skew_run["out"], "s2_rep_pairs", "data", "*.parquet")))
    assert manifests["s2_rep_pairs"]["rows"] == s2.num_rows
    for m in manifests.values():
        assert m["rows"] == sum(p["rows"] for p in m["partitions"])
