"""Text-analysis operators for training-data pipelines: token/quality
stats, language ID, document fingerprinting.

These are engine-native additions beyond the reference's operator set
(the reference's only text transforms are uppercase + k-mer hashing,
impl/FastaData.java:194, sketch/HashUtils.java:213-258); they follow the
same batch-vectorized map_batches shape as the sketch stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Tiny multi-language stopword profiles for the n-gram/stopword-hit
# language heuristic. Deterministic; extend per deployment.
_LANG_STOPWORDS = {
    "en": {"the", "a", "and", "of", "to", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pour", "dans"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "para", "en"},
}

_STOPWORDS_EN = ("the", "a")  # the SQL-oracle-matched subset

# whitespace + BPE-ish token pattern: words, numbers, or single
# punctuation marks (compiled once at import = once per worker process)
import re

_TOKEN_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")


def token_stats(batch: pa.Table, text_col: str = "text",
                id_col: str = "doc_id") -> pa.Table:
    """Whitespace token counts + quality ratios, SQL-matched definitions:
    n_tokens = len(split(text,' ')), n_chars = length(text),
    stop_ratio = round(#tokens in ('the','a') / n_tokens, 4)."""
    split = pc.split_pattern(batch.column(text_col), " ")
    n_tokens = pc.list_value_length(split).cast(pa.int64())
    n_chars = pc.utf8_length(batch.column(text_col)).cast(pa.int64())
    texts = batch.column(text_col).to_pylist()
    stops = np.fromiter(
        (sum(1 for t in s.split(" ") if t in _STOPWORDS_EN) for s in texts),
        np.int64, len(texts),
    )
    nt = np.maximum(np.asarray(n_tokens), 1)
    return pa.table({
        id_col: batch.column(id_col),
        "n_tokens": n_tokens,
        "n_chars": n_chars,
        "stop_ratio": pa.array(  # floor(x+.5): DuckDB ROUND semantics
            np.floor(stops / nt * 10000 + 0.5).astype(np.int64), pa.int64()),
    })


def bpe_token_count(batch: pa.Table, text_col: str = "text",
                    id_col: str = "doc_id") -> pa.Table:
    """Regex 'BPE-ish' token counting (words / numbers / punctuation)."""
    texts = batch.column(text_col).to_pylist()
    counts = np.fromiter((len(_TOKEN_RE.findall(t)) for t in texts),
                         np.int64, len(texts))
    return pa.table({
        id_col: batch.column(id_col),
        "n_bpe_tokens": pa.array(counts, pa.int64()),
    })


# EXPLICIT ASCII whitespace on both sides of the DuckDB oracles:
# Python's \s / str.split() match Unicode whitespace, RE2's \s is
# ASCII-only — pin the exact class so the hash compare cannot diverge
# on non-ASCII-whitespace corpora.
_WS = " \t\n\r\f\v"
_WS_SPLIT_RE = re.compile(f"[{_WS}]+")


def lang_id(batch: pa.Table, text_col: str = "text",
            id_col: str = "doc_id") -> pa.Table:
    """Stopword-profile language heuristic; 'und' (undetermined) when no
    profile scores. Deterministic tie-break by language code."""
    texts = batch.column(text_col).to_pylist()
    preds = []
    for t in texts:
        words = set(w for w in _WS_SPLIT_RE.split(t.lower()) if w)
        best_lang, best_score = "und", 0
        for lang in sorted(_LANG_STOPWORDS):
            score = len(words & _LANG_STOPWORDS[lang])
            if score > best_score:
                best_lang, best_score = lang, score
        preds.append(best_lang)
    return pa.table({
        id_col: batch.column(id_col),
        "lang_pred": pa.array(preds, pa.string()),
    })


_NON_ALPHA_RE = re.compile(f"[^A-Za-z{_WS}]")


def quality_score(batch: pa.Table, text_col: str = "text",
                  id_col: str = "doc_id") -> pa.Table:
    """Composite quality heuristics: length band, alpha-or-space ratio,
    mean word length band, repetition (distinct-token ratio).

    SQL-matched definitions (the DuckDB oracle mirrors each term):
    tokens = ASCII-whitespace split dropping empties; alpha =
    len(re.sub('[^A-Za-z<ws>]', '', t)) / len(t) with the explicit
    ASCII class _WS; outputs are per-10000 scaled ints (round half
    away from zero) so the value hash is engine-independent."""
    texts = batch.column(text_col).to_pylist()
    n = len(texts)
    quality = np.zeros(n)
    alpha_ratio = np.zeros(n)
    distinct_ratio = np.zeros(n)
    for i, t in enumerate(texts):
        if not t:
            continue
        toks = [w for w in _WS_SPLIT_RE.split(t) if w]
        alpha = len(_NON_ALPHA_RE.sub("", t)) / len(t)
        distinct = len(set(toks)) / len(toks) if toks else 0.0
        len_ok = 1.0 if 20 <= len(t) <= 10000 else 0.0
        wl = sum(len(w) for w in toks) / len(toks) if toks else 0.0
        wl_ok = 1.0 if 3 <= wl <= 12 else 0.0
        alpha_ratio[i] = alpha
        distinct_ratio[i] = distinct
        quality[i] = 0.25 * (len_ok + wl_ok + alpha + distinct)

    def scale(x: np.ndarray) -> pa.Array:
        return pa.array(
            (np.sign(x) * np.floor(np.abs(x) * 10000 + 0.5)).astype(np.int64),
            pa.int64())

    return pa.table({
        id_col: batch.column(id_col),
        "alpha_pm": scale(alpha_ratio),
        "distinct_pm": scale(distinct_ratio),
        "quality_pm": scale(quality),
    })


def winnow_fingerprints(batch: pa.Table, k: int = 8, window: int = 4,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> pa.Table:
    """Winnowing document fingerprints (rolling k-gram hashes, min per
    window — the MOSS scheme): (doc_id, fingerprint) rows, deduped per
    doc. The distributed exact-substring pass groups on fingerprint."""
    from mhray.kernels import shingle_hashes64

    texts = batch.column(text_col).to_pylist()
    ids = np.asarray(batch.column(id_col))
    hashes, offs = shingle_hashes64(texts, k)
    out_ids, out_fps, out_pos = [], [], []
    for i in range(len(texts)):
        seg = hashes[offs[i]: offs[i + 1]]
        if len(seg) == 0:
            continue
        if len(seg) <= window:
            mins = np.array([seg.argmin()])
        else:
            w = np.lib.stride_tricks.sliding_window_view(seg, window)
            mins = np.unique(w.argmin(axis=1) + np.arange(len(seg) - window + 1))
        sel = np.unique(seg[mins])
        out_ids.append(np.full(len(sel), ids[i]))
        out_fps.append(sel)
        out_pos.append(mins[:len(sel)])
    if not out_ids:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "fingerprint": pa.array([], pa.int64())})
    return pa.table({
        id_col: pa.array(np.concatenate(out_ids), pa.int64()),
        "fingerprint": pa.array(
            np.concatenate(out_fps).view(np.int64), pa.int64()),
    })
