"""chunk_dedup brute-force parity, json_extract_int path parity, and
PII scrubbing on planted data."""

import numpy as np
import pyarrow as pa

import ray.data

from mhray.stages.dedup import chunk_dedup
from mhray.stages.text import json_extract_int, scrub_pii


def _brute_chunk_dedup(docs: list[tuple[int, str]], W: int):
    """Single-process reference: global first-occurrence chunk dedup in
    (doc_id, chunk_idx) order, then per-doc reassembly."""
    chunks = []  # (doc_id, ci, chunk)
    for did, text in docs:
        words = text.split(" ")
        for ci in range(0, (len(words) + W - 1) // W):
            chunks.append((did, ci, " ".join(words[ci * W:(ci + 1) * W])))
    first = {}
    for did, ci, ch in sorted(chunks):
        first.setdefault(ch, (did, ci))
    out = {}
    for did, text in docs:
        mine = sorted((ci, ch) for d, ci, ch in chunks if d == did)
        kept = [ch for ci, ch in mine if first[ch] == (did, ci)]
        out[did] = (len(mine), len(kept), " ".join(kept) if kept else None)
    return out


def test_chunk_dedup_brute_parity(ray_session):
    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    docs = []
    span = " ".join(rng.choice(vocab, size=16))  # planted repeated span
    for did in range(40):
        words = list(rng.choice(vocab, size=int(rng.integers(5, 40))))
        text = " ".join(words)
        if did % 3 == 0:  # a third of docs start with the shared span
            text = span + " " + text
        if did % 7 == 0:  # and some docs are exact duplicates
            text = span
        docs.append((did, text))
    want = _brute_chunk_dedup(docs, W=4)

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string()),
    }))
    got = {r["doc_id"]: (r["n_chunks"], r["n_kept"], r["kept_text"])
           for r in chunk_dedup(ds, chunk_words=4, num_parts=4).take_all()}
    assert got == want
    # the planted exact-duplicate docs keep nothing after the first
    dups = [d for d, _ in docs if d % 7 == 0]
    assert got[dups[0]][1] > 0
    assert all(got[d][1] == 0 and got[d][2] is None for d in dups[1:])


def test_json_extract_paths_agree():
    props = ['{"k": 87}', '{"k": 0}', '{"k": -3}', '{"j": 5}', None,
             'not json', '{"k": 1, "m": 2}', '{ "k" :  42 }']
    batch = pa.table({"props": pa.array(props, pa.string())})
    fast = json_extract_int(batch, "props", "k").to_pylist()
    strict = json_extract_int(batch, "props", "k", strict=True).to_pylist()
    assert fast == strict == [87, 0, -3, None, None, None, 1, 42]


def test_json_extract_non_integer_values_null_on_both_paths():
    # floats / strings / bools are NOT integer fields: strict skips
    # them and the fast regex anchors on the JSON terminator so a
    # float never truncate-matches as its integer prefix
    props = ['{"k": 1.5}', '{"k": "9"}', '{"k": true}', '{"k": 7}']
    batch = pa.table({"props": pa.array(props, pa.string())})
    fast = json_extract_int(batch, "props", "k").to_pylist()
    strict = json_extract_int(batch, "props", "k", strict=True).to_pylist()
    assert fast == strict == [None, None, None, 7]


def test_scrub_pii_planted():
    texts = [
        "contact bob.smith+x@mail.example.org for details",
        "server at 10.0.255.3 answered",
        "call +1 (555) 123-4567 now",
        "order 123456789 shipped",
        "no pii here at all",
        "two mails a@b.co and c@d.io plus id 9876543",
    ]
    batch = pa.table({"doc_id": pa.array(range(6), pa.int64()),
                      "text": pa.array(texts, pa.string())})
    out = scrub_pii(batch)
    s = out.column("text_scrubbed").to_pylist()
    assert s[0] == "contact [EMAIL] for details"
    assert s[1] == "server at [IPV4] answered"
    assert s[2] == "call [PHONE] now"
    assert s[3] == "order [ID_NUMBER] shipped"
    assert s[4] == texts[4]
    assert s[5] == "two mails [EMAIL] and [EMAIL] plus id [ID_NUMBER]"
    assert out.column("n_email").to_pylist() == [1, 0, 0, 0, 0, 2]
    assert out.column("n_ipv4").to_pylist() == [0, 1, 0, 0, 0, 0]
    assert out.column("n_phone").to_pylist() == [0, 0, 1, 0, 0, 0]
    assert out.column("n_id_number").to_pylist() == [0, 0, 0, 1, 0, 1]


def test_scrub_pii_pattern_precedence():
    # an email's digits must be consumed by the email pattern, never
    # double-counted by the broader id_number pattern
    batch = pa.table({"text": pa.array(["id 1234567890@corp.example.com"])})
    out = scrub_pii(batch)
    assert out.column("text_scrubbed").to_pylist() == ["id [EMAIL]"]
    assert out.column("n_email").to_pylist() == [1]
    assert out.column("n_id_number").to_pylist() == [0]


def test_ngram_topk_bruteforce(ray_session):
    from mhray.stages.text import ngram_topk

    rng = np.random.default_rng(3)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(1, 30))))
             for _ in range(60)]
    texts += ["  aa   bb  aa bb ", ""]  # extra whitespace + empty doc
    import collections
    want = collections.Counter()
    for t in texts:
        toks = [w for w in t.split() if w]
        for i in range(len(toks) - 2):
            want[" ".join(toks[i:i + 3])] += 1
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:5]

    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts)}))
    got = [(r["ngram"], r["n"])
           for r in ngram_topk(ds, k=5, n=3, num_parts=4).take_all()]
    assert got == top
