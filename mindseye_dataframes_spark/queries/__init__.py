"""The engine's declared query surface.

Every operator from SURVEY.md §2 is declared here as a named query:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) the equivalent ANSI SQL the DuckDB
oracle runs on the same parquet tables. ``__spark_entry__.py`` simply
re-exports this registry.
"""

from __future__ import annotations

import importlib

from mindseye_dataframes_spark.queries.registry import REGISTRY, Query, query  # noqa: F401

_MODULES = (
    "relational",
    "windows",
    "featurize",
    "dedup",
    "similarity",
    "text",
    "timeseries",
    "multimodal",
    "scalars",
    "joins_extra",
    "json_props",
    "suppliers",
    "pipeline",
    "pivot",
    "sources_formats",
    "subqueries",
    "maps_stats",
    "curation",
    "training",
    "llm_prep",
    "scale_patterns",
    "lakehouse",
    "analytics_extra",
    "reshape",
    "sketches",
    "quality_gate",
    "incremental",
    "corpus_stats",
    "behavior",
    "graph_vectors",
    "ml_features",
    "basket",
    "sequences",
    "clustering",
)
_loaded = False

# Queries already hash-verified green by a previous driver round.
# The driver checks only the FIRST 50 entries of ``queries()``, so
# ordering IS the verification strategy: queries with no green row yet
# go first, already-proven ones fill the window behind them (least
# recently verified first, so regression coverage rotates), and
# oracle-less (rows-only) queries go last. Update these sets each
# round from the latest CORRECTNESS file.
PROVEN_R01_ONLY = {
    # green in CORRECTNESS_r01.json only — two rounds stale, the
    # highest-priority proven queries to rotate back into the window
    "q61_token_count_bpe", "q62_winnow_fingerprints",
    "q64_analytic_ranks", "q66_image_resize", "q77_dup_clusters",
}
PROVEN_R02 = {
    # green in CORRECTNESS_r02.json (50/50)
    "q01_pricing_summary", "q02_filter_project", "q03_staging_cast",
    "q04_topk_orders", "q05_revenue_by_region", "q06_dictionary_keys",
    "q07_group_moments", "q08_semi_join", "q09_anti_join",
    "q10_outer_join_agg", "q11_union_groups", "q12_intersect_except",
    "q13_zip_positional", "q14_count_distinct", "q15_rollup",
    "q16_window_topn", "q17_window_lag_delta", "q18_running_sum",
    "q25_sessionization", "q43_string_functions", "q44_date_functions",
    "q45_math_functions", "q46_percentiles", "q47_cube",
    "q51_full_outer_join", "q52_right_and_cross", "q53_json_extraction",
    "q54_supplier_volume", "q55_sliding_window", "q56_curation_funnel",
    "q57_pivot", "q59_grouping_sets", "q67_audio_features",
    "q68_csv_roundtrip", "q69_json_roundtrip", "q70_scalar_subquery",
    "q71_conditional_agg", "q72_orc_roundtrip", "q73_map_column",
    "q74_exact_stats", "q75_hash_sample", "q76_profile_columns",
    "q78_eval_identity", "q79_dup_clusters_star",
    "q80_ngram_jaccard_pairs", "q81_pack_sequences", "q82_seeded_shuffle",
    "q83_mixture_sample", "q84_video_frame_sample",
    "q85_partitioned_layout_roundtrip",
}
PROVEN_R03 = {
    # green in CORRECTNESS_r03.json (49/50; the one red, q114, is
    # deliberately absent so it claims a group-0 slot until green)
    "q100_scd2_intervals", "q101_trend_per_user", "q102_fuzzy_name_match",
    "q103_unpivot_metrics", "q104_nullsafe_join", "q105_twap",
    "q108_quality_gate", "q109_debounce", "q110_ordered_funnel",
    "q111_incremental_agg", "q113_udtf_token_windows",
    "q115_dedup_survivorship", "q19_moving_avg", "q20_ntile_rank",
    "q21_first_last", "q22_asof_join", "q23_range_join",
    "q24_tumbling_window", "q26_text_stats", "q27_quality_by_lang",
    "q28_token_frequency", "q29_simhash_fingerprints", "q30_exact_dedup",
    "q31_minhash_signatures", "q32_lsh_dup_pairs", "q33_simhash_clusters",
    "q34_embedding_near_dup", "q35_cosine_topk", "q36_ann_lsh_topk",
    "q37_zscore_expansion", "q38_onehot_labels", "q39_param_identity",
    "q41_blob_metadata", "q58_language_id", "q60_ann_ivf_topk",
    "q86_pii_redaction", "q87_contamination_screen", "q88_chunk_documents",
    "q89_corpus_extremes", "q90_vector_features", "q91_token_positions",
    "q92_binned_interval_join", "q93_trailing_anomaly",
    "q94_distinctive_terms", "q95_price_histogram", "q96_latest_per_key",
    "q97_zorder_layout", "q98_gap_fill", "q99_merge_upsert",
}


def _order_key(item: tuple[str, Query]) -> tuple[int, str]:
    name, q = item
    if q.oracle is None:
        group = 4  # rows-only checks last — never burn a window slot
    elif name in PROVEN_R03:
        group = 3  # freshest evidence: verify last
    elif name in PROVEN_R02:
        group = 2  # one round stale: fill the window behind the stale set
    elif name in PROVEN_R01_ONLY:
        group = 1  # stalest evidence: rotate back into the window
    else:
        group = 0  # no green row yet (q114 + this round's new): claim a slot
    return (group, name)


def load_all() -> dict[str, Query]:
    """Import every query module (idempotent) and return the registry
    ordered for the driver's verification window (see PROVEN_GREEN)."""
    global _loaded
    if not _loaded:
        for mod in _MODULES:
            try:
                importlib.import_module(f"mindseye_dataframes_spark.queries.{mod}")
            except ModuleNotFoundError as exc:
                # allow partial builds while modules land incrementally
                if f"queries.{mod}" not in str(exc):
                    raise
        _loaded = True
    return dict(sorted(REGISTRY.items(), key=_order_key))
