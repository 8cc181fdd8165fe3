"""Corpus analytics report — the read-only companion of the curation
pipeline: one pass over a documents table produces the metrics a data
owner checks BEFORE deciding curation thresholds (quality floor, dedup
tiers, language allowlist).

Artifacts (written under an output dir by ``mhray.run --report``):
  doc_scores/     per-doc (doc_id, lang_pred, quality_pm, n_tokens)
  novelty/        per-doc (doc_id, n_shingles, novel_bp)
  dup_by_source/  per-source exact-dup rates
  report.json     corpus-level rollup of all of the above

Every table streams; the driver holds only the rollup (a few dozen
numbers). All component operators are individually oracle- or
pytest-checked — this module only wires them."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def corpus_report(ds, *, shingle_words: int = 4, text_col: str = "text",
                  id_col: str = "doc_id", source_col: str | None = "source",
                  num_parts: int | None = None) -> dict:
    """Returns ``{"doc_scores", "novelty", "dup_by_source" (when the
    source column exists), "summary"}`` — the first three are streaming
    Datasets, summary a plain dict."""
    from ray.data.aggregate import Count, Max, Mean, Min, Sum

    from mhray.stages.dedup import dup_rate_by_source, ngram_novelty
    from mhray.stages.text import lang_id, quality_score, token_stats

    schema = ds.schema()
    names = getattr(schema, "names", schema)
    has_source = source_col is not None and source_col in names

    def annotate(batch: pa.Table) -> pa.Table:
        q = quality_score(batch, text_col=text_col, id_col=id_col)
        lg = lang_id(batch, text_col=text_col, id_col=id_col)
        tk = token_stats(batch, text_col=text_col, id_col=id_col)
        return pa.table({
            id_col: batch.column(id_col),
            "lang_pred": lg.column("lang_pred"),
            "quality_pm": q.column("quality_pm"),
            "n_tokens": tk.column("n_tokens"),
        })

    # materialize the pruned selection ONCE: three consumers (scores,
    # novelty, dup-by-source) would otherwise each re-run the source
    # read
    docs = ds.select_columns(
        [id_col, text_col] + ([source_col] if has_source else [])) \
        .materialize()
    scores = docs.map_batches(annotate, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    novelty = ngram_novelty(docs, shingle_words=shingle_words,
                            text_col=text_col, id_col=id_col,
                            num_parts=num_parts).materialize()

    out = {"doc_scores": scores, "novelty": novelty}

    # corpus-level rollup: tiny aggregates only. Degenerate corpora
    # (empty input; every doc shorter than a shingle) make the Mean/
    # Min/Max aggregates return None — the report must still come out
    roll = scores.aggregate(Count(alias_name="n_docs"),
                            Mean("quality_pm", alias_name="quality_mean"),
                            Min("quality_pm", alias_name="quality_min"),
                            Max("quality_pm", alias_name="quality_max"),
                            Sum("n_tokens", alias_name="total_tokens")) \
        or {}
    langs = {r["lang_pred"]: int(r["count()"]) for r in
             scores.groupby("lang_pred").count().take_all()}
    nov = novelty.aggregate(Mean("novel_bp", alias_name="novel_mean_bp"),
                            Count(alias_name="n_scored")) or {}

    def _num(d, key, cast, default=0):
        v = d.get(key)
        return cast(v) if v is not None else default

    summary = {
        "n_docs": _num(roll, "n_docs", int),
        "total_tokens": _num(roll, "total_tokens", int),
        "quality_pm": {"mean": round(_num(roll, "quality_mean", float,
                                          0.0), 1),
                       "min": _num(roll, "quality_min", int),
                       "max": _num(roll, "quality_max", int)},
        "lang_counts": dict(sorted(langs.items())),
        "novelty": {"mean_bp": round(_num(nov, "novel_mean_bp", float,
                                          0.0), 1),
                    "n_scored": _num(nov, "n_scored", int)},
    }

    if has_source:
        dup = dup_rate_by_source(docs, text_col=text_col, id_col=id_col,
                                 source_col=source_col,
                                 num_parts=num_parts).materialize()
        out["dup_by_source"] = dup
        rows = sorted(dup.take_all(), key=lambda r: -r["dup_bp"])
        summary["dup_by_source"] = [
            {"source": r[source_col], "n_docs": int(r["n_docs"]),
             "n_dups": int(r["n_dups"]), "dup_bp": int(r["dup_bp"])}
            for r in rows]
        total_dups = int(sum(r["n_dups"] for r in rows))
        summary["exact_dup_bp"] = int(np.floor(
            total_dups * 10000.0 / max(1, summary["n_docs"]) + 0.5))

    out["summary"] = summary
    return out
