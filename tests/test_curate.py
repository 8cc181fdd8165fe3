"""Curation-pipeline composition invariants on a planted corpus."""

import numpy as np
import pyarrow as pa

import ray.data

from mhray.pipelines.curate import curate


def _corpus():
    rng = np.random.default_rng(5)
    # a wide vocabulary so unrelated docs are NOT near-duplicates (the
    # minhash tier is supposed to fire only on the planted pairs)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    vocab = ["".join(rng.choice(letters, size=int(rng.integers(4, 9))))
             for _ in range(400)]
    docs = {}
    for did in range(60):
        docs[did] = " ".join(rng.choice(vocab, size=30))
    # planted exact duplicates of doc 0
    docs[60] = docs[0]
    docs[61] = docs[0]
    # planted junk: too short -> fails the quality length band
    docs[62] = "x"
    # planted PII
    docs[63] = ("please contact real.person@corp.example.com about the "
                + " ".join(rng.choice(vocab, size=25)))
    # planted repeated span across two otherwise-different docs
    span = " ".join(rng.choice(vocab, size=16))
    docs[64] = span + " " + " ".join(rng.choice(vocab, size=20))
    docs[65] = span + " " + " ".join(rng.choice(vocab, size=20))
    ids = sorted(docs)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([docs[i] for i in ids], pa.string()),
    })


def test_curate_composition(ray_session):
    tbl = _corpus()
    # floor 6000: the one-char junk doc scores 5000 pm (only the alpha
    # and distinct terms contribute); real docs score ~8000+
    res = curate(ray.data.from_arrow(tbl), min_quality_pm=6000,
                 chunk_words=8, pack_budget=64, num_parts=4)
    out = {r["doc_id"]: r["text"] for r in res["documents"].take_all()}

    # junk doc dropped by the quality floor
    assert 62 not in out
    # exact duplicates: only the min-id copy survives
    assert 0 in out and 60 not in out and 61 not in out
    # PII scrubbed from the surviving text
    assert 63 in out and "@" not in out[63] and "[EMAIL]" in out[63]
    # repeated span: the first doc keeps it, the second loses it
    assert 64 in out and 65 in out
    span_words = tbl.column("text")[64].as_py().split(" ")[:8]
    span8 = " ".join(span_words)
    assert span8 in out[64]
    assert span8 not in out[65]

    # packs cover every surviving doc exactly once, within budget
    packs = res["packs"].take_all()
    assert {p["doc_id"] for p in packs} == set(out)
    by_seq = {}
    for p in packs:
        if not p["truncated"]:
            by_seq.setdefault(p["seq_id"], 0)
            by_seq[p["seq_id"]] += p["n_tokens"]
    assert all(v <= 64 for v in by_seq.values())

    # stats ledger is consistent stage to stage
    stages = [s["stage"] for s in res["stats"]]
    assert stages == ["filter+scrub", "chunk_dedup", "tiered_dedup", "pack"]
    for prev, nxt in zip(res["stats"], res["stats"][1:]):
        assert nxt["rows_in"] == prev["rows_out"]


def test_curate_cli(tmp_path):
    """`python -m mhray.run --curate` (the ray job submit surface)."""
    import json
    import os
    import subprocess
    import sys

    import pyarrow.parquet as pq

    src = str(tmp_path / "docs.parquet")
    pq.write_table(_corpus(), src)
    env = dict(os.environ, RAY_ADDRESS="local", PYTHONPATH="/root/repo")
    p = subprocess.run(
        [sys.executable, "-m", "mhray.run", "--curate", "--input", src,
         "--out", str(tmp_path / "run"), "--min-quality-pm", "6000",
         "--chunk-words", "8", "--pack-budget", "64", "--num-parts", "4"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=280)
    assert p.returncode == 0, p.stderr[-800:]
    summary = json.loads([l for l in p.stdout.splitlines()
                          if l.startswith("{")][-1])
    assert summary["survivors"] > 0
    assert os.path.exists(str(tmp_path / "run" / "curated_documents"))
    assert os.path.exists(str(tmp_path / "run" / "packs"))
    assert os.path.exists(str(tmp_path / "run" / "curate_stats.json"))


def test_curate_language_allowlist(ray_session):
    """The langs gate reads lang_id's lang_pred column and drops
    out-of-allowlist docs."""
    en = ("the quick brown fox and the lazy dog went to the market "
          "for a basket of fresh apples and pears it is a fine day")
    de = ("der hund und die katze sind ein gutes team mit der maus "
          "und die sonne ist zu warm fuer ein langes spiel")
    tbl = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([en, de], pa.string()),
    })
    res = curate(ray.data.from_arrow(tbl), langs=("en",), num_parts=2)
    ids = {r["doc_id"] for r in res["documents"].take_all()}
    assert ids == {1}


def test_corpus_report(ray_session, tmp_path):
    """corpus_report rollup on a planted corpus: dup accounting per
    source, lang split, novelty of a verbatim re-post = 0."""
    import pyarrow as pa

    import ray.data
    from mhray.pipelines.report import corpus_report

    uniq = [f"unique document number {i} with plenty of english the and "
            f"is to of words here padding {i} more filler tokens {i}"
            for i in range(6)]
    texts = uniq + [uniq[0], uniq[1]]          # two verbatim re-posts
    srcs = ["feedA"] * 6 + ["feedB"] * 2       # both dups from feedB
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
        "source": pa.array(srcs),
    })
    res = corpus_report(ray.data.from_arrow(tbl).repartition(2),
                        num_parts=4)
    s = res["summary"]
    assert s["n_docs"] == 8 and s["novelty"]["n_scored"] == 8
    dup = {r["source"]: r for r in s["dup_by_source"]}
    assert dup["feedB"]["n_dups"] == 2 and dup["feedB"]["dup_bp"] == 10000
    assert dup["feedA"]["n_dups"] == 0
    assert s["exact_dup_bp"] == 2500  # 2 of 8
    # re-posts score 0 novelty; their originals keep full novelty
    nov = {int(r["doc_id"]): int(r["novel_bp"])
           for r in res["novelty"].take_all()}
    assert nov[6] == 0 and nov[7] == 0 and nov[0] == 10000
    scores = res["doc_scores"].to_pandas()
    assert set(scores.columns) == {"doc_id", "lang_pred", "quality_pm",
                                   "n_tokens"}
    assert len(scores) == 8
