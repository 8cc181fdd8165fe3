"""End-to-end text curation pipeline — the documents-table counterpart
of the image flagship (`pipelines/dedup.py`): compose the LLM-data
operators in the order a production corpus actually runs them, each
stage streaming into the next with only duplicate-mass-proportional
driver state.

    annotate (quality + lang, one map_batches)
      -> filter   (quality floor, language allowlist; Arrow filter)
      -> scrub    (PII redaction, in place)
      -> chunk    (repeated-span removal w/ reassembly; optional)
      -> dedup    (tiered exact -> SimHash -> MinHash cascade)
      -> pack     (token-budget sequence packing; optional)

Every stage is an existing tested operator; this module only wires
them and reports per-stage row counts. Nothing here materializes the
corpus to the driver — the tiered cascade's anti-joins broadcast only
removed-id sets, and packing is per-partition.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from mhray.config import MhapConfig


def curate(ds, cfg: MhapConfig | None = None, *,
           min_quality_pm: int = 0, langs: tuple[str, ...] | None = None,
           scrub: bool = True, chunk_words: int = 0,
           pack_budget: int = 0, text_col: str = "text",
           id_col: str = "doc_id", num_parts: int | None = None) -> dict:
    """Run the curation cascade over an (id, text) table. Returns
    ``{"documents", "packs" (when pack_budget > 0), "stats"}`` where
    stats is a list of per-stage dicts (stage, rows_in, rows_out).
    """
    from mhray.stages.dedup import chunk_dedup, tiered_dedup
    from mhray.stages.text import lang_id, quality_score, scrub_pii

    stats: list[dict] = []

    def _count(d):
        return d.count()

    # materialize once: the rows_in count would otherwise run a full
    # extra scan before the annotate pass re-reads everything
    docs = ds.select_columns([id_col, text_col]).materialize()
    n = _count(docs)

    # annotate + filter: quality floor and language allowlist in one
    # pass over the text; only (id, text) survive the stage
    def annotate(batch: pa.Table) -> pa.Table:
        q = quality_score(batch, text_col=text_col, id_col=id_col)
        keep = pc.greater_equal(q.column("quality_pm"),
                                pa.scalar(min_quality_pm, pa.int64()))
        if langs is not None:
            lg = lang_id(batch, text_col=text_col, id_col=id_col)
            keep = pc.and_(keep, pc.is_in(
                lg.column("lang_pred"), value_set=pa.array(list(langs))))
        return batch.filter(keep)

    filtered = docs.map_batches(annotate, batch_format="pyarrow",
                                zero_copy_batch=True)
    if scrub:
        def scrub_stage(batch: pa.Table) -> pa.Table:
            out = scrub_pii(batch, text_col=text_col)
            return pa.table({
                id_col: out.column(id_col),
                text_col: out.column(f"{text_col}_scrubbed"),
            })

        filtered = filtered.map_batches(scrub_stage, batch_format="pyarrow",
                                        zero_copy_batch=True)
    filtered = filtered.materialize()
    n_f = _count(filtered)
    stats.append({"stage": "filter+scrub", "rows_in": n, "rows_out": n_f})

    current = filtered
    if chunk_words > 0:
        chunked = chunk_dedup(current, chunk_words=chunk_words,
                              text_col=text_col, id_col=id_col,
                              num_parts=num_parts)
        # docs whose every chunk was seen elsewhere first disappear
        def keep_nonempty(b: pa.Table) -> pa.Table:
            b = b.filter(pc.is_valid(b.column("kept_text")))
            return pa.table({
                id_col: b.column(id_col),
                text_col: b.column("kept_text"),
            })

        current = chunked.map_batches(keep_nonempty, batch_format="pyarrow",
                                      zero_copy_batch=True).materialize()
        n_c = _count(current)
        stats.append({"stage": "chunk_dedup", "rows_in": n_f,
                      "rows_out": n_c})
        n_f = n_c

    tiers = tiered_dedup(current, cfg, text_col=text_col, id_col=id_col,
                         num_parts=num_parts)
    survivors = tiers["survivors"].materialize()
    n_s = _count(survivors)
    stats.append({"stage": "tiered_dedup", "rows_in": n_f,
                  "rows_out": n_s, "tiers": tiers["stats"].to_pylist()})

    out = {"documents": survivors, "stats": stats}
    if pack_budget > 0:
        from mhray.stages.pack import pack_sequences

        packs = pack_sequences(survivors.select_columns([id_col, text_col]),
                               budget=pack_budget, id_col=id_col,
                               text_col=text_col, num_parts=num_parts)
        out["packs"] = packs
        stats.append({"stage": "pack", "rows_in": n_s,
                      "rows_out": _count(packs)})
    return out
