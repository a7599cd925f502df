"""queries() vs oracle_sql() at sf0.001 — mirrors the driver compare
(row count + order-insensitive value equality) so regressions show up
in pytest before the driver runs."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_pandas(obj):
    from ray.data import Dataset

    if isinstance(obj, Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


SQL_CHECKED = [
    "q01_pricing_summary", "q02_top_orders", "q03_distinct_event_types",
    "q04_segment_revenue", "q05_daily_events", "q06_user_hourly_windows",
    "q07_lang_distribution", "q08_token_counts", "q09_doc_quality",
    "q10_exact_dedup", "q11_embedding_topk", "q12_filtered_export",
    "q13_region_customers", "q14_session_windows",
    "q15_customers_without_orders", "q24_langid",
    "q26_embedding_dup_pairs", "q28_ngram_jaccard_clusters",
    "q30_containment_pairs_exact", "q31_embedding_topk_batch",
    "q32_ivf_topk", "q33_decontaminate", "q34_length_quantiles",
    "q35_top_bigrams", "q36_pii_scrub", "q37_lang_cap",
    "q38_tfidf_topterms", "q39_repetition_filter",
    "q40_event_asof_anchor", "q41_rolling_user_window",
    "q43_chunk_dedup", "q44_quality_outliers", "q45_props_rollup",
    "q46_curation", "q47_distinct_users", "q49_funnel",
    "q50_shipping_priority", "q51_doc_sample", "q52_lang_source_rollup",
    "q53_big_spenders", "q55_regional_revenue", "q56_split_assign",
    "q57_len_token_corr", "q58_first_events", "q59_normalized_dedup",
    "q60_gap_quantiles", "q61_view_attribution", "q62_event_debounce",
    "q63_line_filter", "q64_bigram_lm", "q65_quantile_gate",
    "q67_head_dedup", "q68_global_rank", "q70_rolling_distinct",
    "q71_vocab", "q72_chunk_windows", "q74_order_count_histogram",
    "q75_priority_shipments", "q76_user_running_total",
    "q77_bpe_token_counts", "q78_line_dedup_rewrite", "q79_oov_rate",
    "q82_dsir_weights", "q83_value_quantiles", "q84_customer_order_counts",
    "q85_promo_revenue_share", "q86_top_orders_per_segment",
    "q87_retention_cohorts", "q88_event_type_cooccurrence",
    "q89_token_and_search", "q90_token_index_search",
    "q91_dup_cluster_sizes", "q92_centroid_confusion",
    "q93_gopher_rules", "q94_late_orders_by_priority",
    "q95_weighted_sample", "q97_length_drift_psi", "q98_embedding_audit",
    "q99_event_transitions", "q100_cross_source_dup_matrix",
    "q101_top_pmi_bigrams", "q102_nation_trade_volume",
    "q103_returned_item_revenue", "q104_small_qty_order_revenue",
    "q105_disjunctive_part_revenue", "q106_lone_late_supplier",
    "q107_rich_idle_customers", "q108_bm25_topk",
    "q109_lexical_diversity", "q110_quality_mix_sample",
    "q111_domain_mix_report", "q112_semantic_outliers",
    "q113_late_data_drop", "q114_lang_embedding_coherence",
    "q115_mixture_draw", "q118_forecast_revenue", "q119_market_share",
    "q120_dup_degree_histogram", "q121_user_entropy",
    "q122_length_percentile", "q124_cluster_labels",
    "q125_effective_tokens", "q127_quality_representatives",
    "q128_repetition_signals", "q129_exact_substring_spans",
    "q130_substring_dedup_rewrite", "q131_global_range_join",
    "q132_dup_triangles", "q134_event_rate_anomaly",
    "q136_hopping_windows", "q137_containment_directed",
    "q138_cross_label_nn", "q139_source_dup_rate",
    "q141_hashed_embedding", "q142_contract_audit",
    "q143_table_profile", "q145_phrase_search",
    "q146_crosslingual_dup_pairs", "q148_fd_audit",
    "q151_dedup_loss_weights", "q152_contamination_pairs",
    "q153_keep_n_dedup", "q154_readability_counts",
    "q157_ascii_ratio", "q158_leakfree_split", "q159_key_skew",
    "q165_editdist_dedup", "q166_novelty", "q167_template_dedup",
    "q168_overlap_stitch", "q169_stitch_rewrite", "q170_corpus_growth",
    "q171_source_uniqueness", "q173_boilerplate_lines",
]


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_sql_checked_query(name, sf_dir, con):
    from event_deduplication_ray.pipelines.queries import ORACLE_SQL, RAY_QUERIES

    got = _canon(_to_pandas(RAY_QUERIES[name](sf_dir)))
    want = _canon(con.execute(ORACLE_SQL[name]).fetchdf())
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-6)


ROWS_ONLY = [
    "q20_minhash_clusters", "q21_simhash_pairs", "q22_substring_pairs",
    "q23_doc_fingerprints", "q25_lsh_topk", "q27_flagship_dedup",
    "q29_media_dup_clusters", "q66_pack_sequences",
    "q69_top_bigrams_mg", "q73_mixed_media_dedup",
    "q42_semantic_dedup", "q48_distinct_users_hll",
    "q54_neardup_decontaminate", "q80_video_dup_clusters",
    "q81_top_bigrams_cms", "q96_value_quantiles_kll",
    "q116_packed_shards", "q117_bpe_merges", "q123_dup_pagerank",
    "q126_doc_neighbors", "q133_compression_gate",
    "q135_winnow_dedup", "q140_dup_kcore", "q144_join_size_cms",
    "q147_bpe_subword_counts", "q149_dbscan_clusters",
    "q150_ivfpq_topk", "q155_corpus_drift",
    "q156_source_similarity_sketch", "q160_quality_classifier",
    "q161_corpus_screen", "q162_hard_negatives",
    "q163_fragile_clusters", "q164_ann_recall",
    "q172_audience_overlap_hll",
]


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(name, sf_dir):
    from event_deduplication_ray.pipelines.queries import RAY_QUERIES

    got = _to_pandas(RAY_QUERIES[name](sf_dir))
    assert got is not None
    # empty results may surface with no schema (Ray map_groups on an
    # empty dataset); non-empty results must carry columns
    if len(got) > 0:
        assert len(got.columns) > 0


def test_battery_registry_consistent():
    """Every queries() entry is gated exactly once: SQL_CHECKED ∪
    ROWS_ONLY covers RAY_QUERIES with no overlap, every SQL-checked
    name has an oracle, and no oracle is orphaned — the registration
    drift this file would otherwise silently allow."""
    from event_deduplication_ray.pipelines.queries import (
        ORACLE_SQL,
        RAY_QUERIES,
    )

    sqlc, rows = set(SQL_CHECKED), set(ROWS_ONLY)
    assert not (sqlc & rows), sqlc & rows
    missing = set(RAY_QUERIES) - sqlc - rows
    assert not missing, f"unregistered in any gate: {sorted(missing)}"
    unknown = (sqlc | rows) - set(RAY_QUERIES)
    assert not unknown, f"gate names without a query: {sorted(unknown)}"
    no_oracle = sqlc - set(ORACLE_SQL)
    assert not no_oracle, f"SQL-checked without oracle: {sorted(no_oracle)}"
    orphaned = set(ORACLE_SQL) - set(RAY_QUERIES)
    assert not orphaned, f"oracle without query: {sorted(orphaned)}"
