"""Estimator calibration — the KmerStatSimulator analog
(main/KmerStatSimulator.java:328-490; docs/source/utilities.rst:37-52):
generate edit-noised text pairs at controlled rates and compare EXACT
shingle-set Jaccard against (a) the MinHash signature estimate and
(b) the positional bottom-sketch identity score, for overlapping vs
random pairs.
"""

from __future__ import annotations

import numpy as np

from mhray import kernels as K
from mhray.config import MhapConfig

_LETTERS = "abcdefghijklmnopqrstuvwxyz "


def _rand_text(rng: np.random.Generator, n: int) -> str:
    return "".join(_LETTERS[i] for i in rng.integers(0, len(_LETTERS), n))


def _edit(rng: np.random.Generator, t: str, rate: float) -> str:
    from mhray.synth import edit_text

    return edit_text(rng, t, rate, _LETTERS)


def exact_jaccard(a: str, b: str, k: int) -> float:
    ha, _ = K.shingle_hashes64([a], k)
    hb, _ = K.shingle_hashes64([b], k)
    sa, sb = set(ha.tolist()), set(hb.tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def calibrate(cfg: MhapConfig, n_pairs: int = 50, text_len: int = 300,
              edit_rate: float = 0.05, seed: int = 5) -> dict:
    """Returns error statistics of both estimators over related pairs
    (edit-noised) and random pairs."""
    rng = np.random.default_rng(seed)
    rel_exact, rel_mh, rel_score = [], [], []
    rnd_exact, rnd_mh = [], []

    def sketch(t: str):
        h64, off = K.shingle_hashes64([t], cfg.kmer_size)
        keys, counts, uoff = K.unique_in_first_occurrence_order(h64, off)
        sig = K.weighted_minhash(keys, counts, uoff, cfg.num_hashes)[0]
        h32, off32 = K.shingle_hashes32([t], cfg.ordered_kmer_size)
        bh, bp = K.bottom_sketch(h32, cfg.ordered_sketch_size)
        return sig, (bh, bp, len(h32))

    for _ in range(n_pairs):
        a = _rand_text(rng, text_len)
        b = _edit(rng, a, edit_rate)
        c = _rand_text(rng, text_len)
        sa, ba = sketch(a)
        sb, bb = sketch(b)
        sc, _ = sketch(c)

        rel_exact.append(exact_jaccard(a, b, cfg.kmer_size))
        rel_mh.append(K.minhash_jaccard(sa, sb))
        res = K.verify_pair(*ba, *bb, cfg.ordered_kmer_size, cfg.max_shift)
        rel_score.append(res.score if res else 0.0)

        rnd_exact.append(exact_jaccard(a, c, cfg.kmer_size))
        rnd_mh.append(K.minhash_jaccard(sa, sc))

    rel_exact = np.asarray(rel_exact)
    rel_mh = np.asarray(rel_mh)
    return {
        "related_exact_jaccard_mean": float(rel_exact.mean()),
        "related_minhash_mean": float(rel_mh.mean()),
        "minhash_abs_err_mean": float(np.abs(rel_mh - rel_exact).mean()),
        "minhash_abs_err_max": float(np.abs(rel_mh - rel_exact).max()),
        "related_score_mean": float(np.mean(rel_score)),
        "random_exact_jaccard_mean": float(np.mean(rnd_exact)),
        "random_minhash_mean": float(np.mean(rnd_mh)),
        "separation": float(rel_mh.mean() - np.mean(rnd_mh)),
    }


def _pair_decision(a: str, b: str, cfg: MhapConfig) -> tuple[bool, bool, float]:
    """(candidate_pass, accept, score) of one text pair under ``cfg`` —
    the SAME two gates the pipeline applies: stage-1 MinHash slot
    matches >= num_min_matches (impl/MinHashSearch.java:204) and the
    stage-2 bottom-sketch verify score >= threshold."""
    def stage1(t: str):
        h64, off = K.shingle_hashes64([t], cfg.kmer_size)
        keys, counts, uoff = K.unique_in_first_occurrence_order(h64, off)
        return K.weighted_minhash(keys, counts, uoff, cfg.num_hashes)[0]

    sa, sb = stage1(a), stage1(b)
    cand = int(np.sum(sa == sb)) >= cfg.num_min_matches

    h32a, _ = K.shingle_hashes32([a], cfg.ordered_kmer_size)
    h32b, _ = K.shingle_hashes32([b], cfg.ordered_kmer_size)
    bha, bpa = K.bottom_sketch(h32a, cfg.ordered_sketch_size)
    bhb, bpb = K.bottom_sketch(h32b, cfg.ordered_sketch_size)
    res = K.verify_pair(bha, bpa, len(h32a), bhb, bpb, len(h32b),
                        cfg.ordered_kmer_size, cfg.max_shift)
    score = res.score if res else 0.0
    return cand, bool(cand and score >= cfg.threshold), score


def threshold_recall_curve(cfgs: dict[str, MhapConfig],
                           rates=(0.02, 0.05, 0.08, 0.12, 0.15,
                                  0.20, 0.25, 0.30),
                           n_pairs: int = 80,
                           caption_words: tuple[int, int] = (9, 16),
                           seed: int = 5) -> list[dict]:
    """Preset recall curve over edit-noise rates — the tuning table a
    user reads to pick --settings for a target recall (the
    KmerStatSimulator use, main/KmerStatSimulator.java:328-490,
    retargeted at caption text). For each rate, ``n_pairs``
    (base, edited) caption pairs are pushed through BOTH pipeline
    gates of every preset in ``cfgs``; a row reports the exact
    shingle-Jaccard mean and each preset's end-to-end accept rate.

    Deterministic in (rates, n_pairs, caption_words, seed) — pair
    texts are shared across presets so accept-rate deltas are
    paired-sample comparisons, not resampling noise."""
    from mhray.synth import _base_caption, _make_vocab, edit_text

    rng = np.random.default_rng(seed)
    vocab = _make_vocab(rng, 4000)
    any_cfg = next(iter(cfgs.values()))
    out = []
    for rate in rates:
        texts = []
        for _ in range(n_pairs):
            a = _base_caption(rng, vocab, *caption_words)
            texts.append((a, edit_text(rng, a, rate, _LETTERS[:26])))
        row: dict = {"edit_rate": rate,
                     "exact_jaccard_mean": float(np.mean(
                         [exact_jaccard(a, b, any_cfg.kmer_size)
                          for a, b in texts]))}
        for name, cfg in cfgs.items():
            dec = [_pair_decision(a, b, cfg) for a, b in texts]
            row[f"{name}_candidate_rate"] = float(
                np.mean([d[0] for d in dec]))
            row[f"{name}_accept_rate"] = float(
                np.mean([d[1] for d in dec]))
            row[f"{name}_score_mean"] = float(
                np.mean([d[2] for d in dec]))
        out.append(row)
    return out
