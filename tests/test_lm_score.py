"""Char-trigram LM scoring: exact-count parity with a scalar model on
small corpora, ordering invariants (in-distribution text beats
gibberish), trigram extraction correctness at doc boundaries."""

import math

import numpy as np
import pyarrow as pa
import pytest

import ray.data


def _scalar_model(texts, top_k=200_000, floor_count=0.5):
    """Reference transcription of the documented semantics."""
    from collections import Counter

    counts = Counter()
    for t in texts:
        for i in range(len(t) - 2):
            counts[t[i:i + 3]] += 1
    total = sum(counts.values())
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    model = {k: math.log(max(c, floor_count) / max(total, 1.0))
             for k, c in top}
    floor_lp = math.log(floor_count / max(total, 1.0))
    out = []
    for t in texts:
        tris = [t[i:i + 3] for i in range(len(t) - 2)]
        if not tris:
            out.append((0, 0))
            continue
        mean = sum(model.get(x, floor_lp) for x in tris) / len(tris)
        pm = int(np.sign(mean) * np.floor(abs(mean) * 1000 + 0.5))
        out.append((len(tris), pm))
    return out


def test_trigram_keys_boundaries():
    from mhray.stages.text import _trigram_keys_batch

    keys, doc = _trigram_keys_batch(["abcd", "", "x", "yzw"])
    # doc0 has 2 trigrams, doc3 has 1; nothing spans boundaries
    assert list(doc) == [0, 0, 3]
    k2, d2 = _trigram_keys_batch(["abcdxyzw"])
    # the cross-boundary trigrams (cdx, dxy, ..., ) must NOT appear
    assert len(k2) == 6 and len(keys) == 3
    assert set(keys) <= set(k2.tolist()) - set()
    # identical trigram -> identical key across batches
    ka, _ = _trigram_keys_batch(["abc"])
    kb, _ = _trigram_keys_batch(["zzabczz"])
    assert ka[0] in kb


@pytest.mark.parametrize("seed", [1, 2])
def test_lm_score_matches_scalar(seed, ray_session):
    from mhray.stages.text import trigram_lm_score

    rng = np.random.default_rng(seed)
    vocab = ["the cat sat", "on the mat", "ray data streams",
             "shuffle and sort", "zqxj vwk bfg"]
    texts = ["" if i % 17 == 0 else
             " ".join(rng.choice(vocab, rng.integers(1, 5)))
             for i in range(60)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }))
    got = trigram_lm_score(ds).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    expect = _scalar_model(texts)
    assert list(got["n_trigrams"]) == [e[0] for e in expect]
    assert list(got["lm_logprob_pm"]) == [e[1] for e in expect]


def test_lm_score_orders_gibberish_below_natural(ray_session):
    from mhray.stages.text import trigram_lm_score

    natural = ["the quick brown fox jumps over the lazy dog"] * 20
    gibberish = ["zq xv jkw qzp vxk wjq kzq pvx"]
    texts = natural + gibberish
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }))
    df = trigram_lm_score(ds).to_pandas().set_index("doc_id")
    nat = df.loc[0, "lm_logprob_pm"]
    gib = df.loc[len(texts) - 1, "lm_logprob_pm"]
    assert gib < nat  # gibberish is out-of-distribution -> lower logprob


def test_lm_score_top_k_truncation(ray_session):
    """With top_k=1 only the single most frequent trigram keeps its
    probability; everything else floors — scores still deterministic
    and the frequent-trigram doc still wins."""
    from mhray.stages.text import trigram_lm_score

    texts = ["aaaaaa", "aaaaaa", "bcdefg"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "text": pa.array(texts),
    }))
    df = trigram_lm_score(ds, top_k=1).to_pandas().set_index("doc_id")
    assert df.loc[0, "lm_logprob_pm"] == df.loc[1, "lm_logprob_pm"]
    assert df.loc[2, "lm_logprob_pm"] < df.loc[0, "lm_logprob_pm"]
