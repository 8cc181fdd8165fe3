"""Replicates the driver's correctness gate locally: run each catalog
query through Ray AND its DuckDB oracle on the driver testdata, then
compare row counts, column names, and order-insensitive values."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _to_pandas(result) -> pd.DataFrame:
    import ray.data

    if isinstance(result, ray.data.Dataset):
        result = result.to_pandas()
    elif isinstance(result, pa.Table):
        result = result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def _compare(ray_df: pd.DataFrame, sql_df: pd.DataFrame, name: str):
    assert sorted(ray_df.columns) == sorted(sql_df.columns), (
        f"{name}: columns {sorted(ray_df.columns)} != {sorted(sql_df.columns)}")
    assert len(ray_df) == len(sql_df), (
        f"{name}: rows {len(ray_df)} != {len(sql_df)}")
    a, b = _canon(ray_df), _canon(sql_df)
    for col in a.columns:
        av, bv = a[col].to_numpy(), b[col].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            np.testing.assert_allclose(
                av.astype(np.float64), bv.astype(np.float64),
                rtol=0, atol=1e-9, err_msg=f"{name}.{col}")
        else:
            assert (av == bv).all() or (
                av.astype(str) == bv.astype(str)).all(), f"{name}.{col}"


ORACLE_CHECKED = [
    "q_pricing_summary", "q_filter_project", "q_topk_orders", "q_join_agg",
    "q_events_by_type", "q_events_hourly", "d_exact_dedup",
    "d_jaccard_pairs", "d_token_stats", "d_bpe_token_count", "d_lang_count",
    "e_knn_brute", "e_dup_cosine", "q_semi_join", "q_anti_join",
    "q_distinct_parts", "q_union_names", "ev_user_topk",
    "ev_sessionize", "ev_top_event_per_type",
    "q_percentiles", "q_corr", "q_histogram", "q_distinct_per_group",
    "ev_moving_avg", "ev_asof_prev", "ev_close_pairs", "q_rollup",
    "ev_gap_stats", "q_pivot_status", "d_lang_id", "d_quality",
    "q_hash_sample", "ev_range_count", "q_stratified_sample",
    "d_decontaminate", "d_repetition", "d_dedup_keep_best",
    "d_top_terms", "ev_json_extract", "d_chunk_dedup", "q_pii_scrub",
    "d_quality_buckets", "d_ngram_topk", "ev_funnel",
    "d_containment_pairs", "ev_retention", "ev_anomaly",
    "q_weighted_sample", "ev_user_mode", "ev_mad", "d_novelty",
    "ev_bursts", "d_dup_by_source", "ev_dau", "ev_running_total",
    "d_mixture_sample", "d_simhash_pairs", "d_fingerprints",
    "e_knn_graph", "d_pack_sequences", "d_lm_score", "d_bloom_new",
    "e_centroid_dist", "e_knn_label_vote",
    "d_substring_pairs", "d_suffix_pairs", "q_approx_distinct",
    "e_dup_lsh", "ev_motif", "e_kmeans", "e_knn_ivf", "e_semdedup",
    "q_sample_percentiles", "d_cluster_components", "q_ntile",
    "q_outer_join", "m_image_features", "m_audio_features",
    "m_video_frames", "m_image_resize", "q_rank_in_group",
    "d_edit_pairs", "d_dup_triangles", "d_cluster_stats",
]
ROWS_ONLY = ["q_approx_percentiles", "d_curate", "e_pca",
             "d_compression_ratio", "d_sketch_align",
             "d_dup_clusters",
             "d_minhash_pairs",
             "d_incremental_pairs", "d_tiered_dedup"]


def test_kmeans_oracle_preconditions(duck):
    """The unrolled-Lloyd oracle assumes the hash-bottom sample is
    full (corpus >= 256 rows, so the PCG64 positions drawn at import
    index the same ordering) and nonnegative vec_ids (the SQL mirrors
    numpy's signed view of the unsigned fingerprint)."""
    n, lo = duck.sql(
        "SELECT COUNT(*), MIN(vec_id) FROM embeddings").fetchone()
    assert n >= 256
    assert lo >= 0
    # e_knn_ivf additionally inlines init positions for exactly the
    # two reachable sample sizes min(512, n): n == 500 or n >= 512
    assert n == 500 or n >= 512


def test_lsh_oracle_preconditions(duck):
    """The inlined-hyperplane LSH oracle assumes dim-64 embeddings and
    a corpus smaller than the engine's 5000-id bucket cap (so the cap
    can never drop a pair the SQL would keep)."""
    n, lo, hi = duck.sql(
        "SELECT COUNT(*), MIN(len(embedding)), MAX(len(embedding)) "
        "FROM embeddings").fetchone()
    assert (lo, hi) == (64, 64)
    assert n < 5000


def test_lcs_oracle_ascii_precondition(duck):
    """The diagonal-run LCS oracle equates SQL code-point positions
    with the engines' UTF-16 code units; valid because the corpus is
    pure ASCII. Fails loudly if the testdata ever grows non-ASCII."""
    n = duck.sql(
        "SELECT COUNT(*) FROM documents "
        "WHERE regexp_matches(text, '[^\\x00-\\x7F]')").fetchone()[0]
    assert n == 0


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_query_vs_oracle(name, duck, ray_session):
    from mhray.pipelines.queries import ORACLE_SQL, QUERIES

    ray_df = _to_pandas(QUERIES[name](SF_DIR))
    sql_df = duck.sql(ORACLE_SQL[name]).df()
    _compare(ray_df, sql_df, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name, ray_session):
    from mhray.pipelines.queries import QUERIES

    df = _to_pandas(QUERIES[name](SF_DIR))
    assert df is not None and len(df) >= 0
    assert len(df.columns) >= 1


def test_registry_consistency():
    from mhray.pipelines.queries import ORACLE_SQL, QUERIES

    assert set(ORACLE_SQL) <= set(QUERIES)
    assert set(ORACLE_CHECKED) == set(ORACLE_SQL)
    assert set(ORACLE_CHECKED) | set(ROWS_ONLY) == set(QUERIES)
