"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query at sf0.001 (smoke).
``queries()`` — one entry per implemented operator from SURVEY.md §2,
implemented in :mod:`mondrian_olap_spark.suite` through the engine API.
``oracle_sql()`` — DuckDB-equivalent SQL per query (the correctness gate).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from mondrian_olap_spark.suite import QUERIES

    return QUERIES["flagship_region_quarter"](spark, "/root/testdata/sf0.001")


#: entries already hash-verified GREEN by the driver in rounds 1-3.  The
#: driver checks a 50-entry prefix of this dict, so never-yet-checked (or
#: previously-red, now fixed) entries are listed FIRST to rotate them
#: through the gate; the previously-green entries keep full local coverage
#: via tools/check_oracle.py --exact (the driver-gate mirror).
_DRIVER_CHECKED = frozenset({
    # round 5 greens (CORRECTNESS_r05.json: all 50 prefix rows green,
    # hash-exact — includes approx_distinct_parts with its new bit-exact
    # oracle and the re-rotated set_intersect_active_nations).  After this
    # round the unchecked remainder is exactly the 20 entries that have
    # never appeared in any CORRECTNESS_r*.json; they fill the front of
    # the 50-row prefix, and 30 previously-green entries rotate behind
    # them for re-verification.
    "approx_distinct_parts", "bucketed_star_gate", "dedup_source_overlap",
    "embed_ivf_recall_gate", "embed_label_norm_stats",
    "embed_lsh_neardup_pairs", "embed_quantization_report",
    "events_approx_quantiles", "events_asof_attribution",
    "events_asof_forward_tolerance", "events_funnel_steps",
    "events_props_json_stats", "events_retention_weekly",
    "events_salted_join", "events_zorder_cells",
    "filter_member_property_gate", "multimodal_real_bmp_gate",
    "multimodal_real_wav_gate", "pipeline_apply_changes",
    "pipeline_balanced_sample", "pipeline_corpus_diff",
    "pipeline_decontamination_report", "pipeline_end_to_end_curation",
    "pipeline_length_histogram", "pipeline_mix_applied",
    "pipeline_mix_weights", "pipeline_pack_concat",
    "pipeline_padding_efficiency", "pipeline_quality_topk",
    "pipeline_shuffle_order", "pipeline_skew_profile",
    "pipeline_temperature_mix", "pipeline_token_packing",
    "set_intersect_active_nations", "streaming_cms_gate",
    "streaming_dedup_gate", "streaming_maintenance_gate",
    "streaming_sessionization_gate", "streaming_windowed_counts_gate",
    "text_bigram_entropy", "text_bigram_perplexity",
    "text_bpe_pair_counts", "text_cms_frequency_gate",
    "text_inverted_index", "text_kl_from_corpus", "text_segment_dedup",
    "text_tfidf_top_terms", "text_top_ngrams", "text_unigram_entropy",
    "vba_val_round_dateserial",
    # round 4 greens (CORRECTNESS_r04.json: all 50 prefix rows green —
    # includes the 3 former round-3 hash-fails, the 5 never-checked
    # entries, and the 7 new round-4 entries; approx_distinct_parts is
    # rows-only by design and counted as checked)
    "text_quality_features", "text_stats_by_source",
    "pipeline_deterministic_sample", "text_pii_redaction",
    "text_quality_filter", "embed_dedup_keep_list", "text_token_counts",
    # approx_distinct_parts: removed from the checked set in round 5 — it
    # gained a bit-exact oracle (exact count + HLL error-bound assertion)
    # replacing the old rows-only check; rotate it through the driver gate
    "aggregate_crossjoin_set",
    "aggregate_value_forms", "tuple_item_implicit_measure",
    "text_repetition_features", "pipeline_split_contamination",
    "text_chunking", "events_sessionization",
    # round 3 greens (CORRECTNESS_r03.json)
    "multimodal_decode_features", "tuple_case_contextual",
    "nested_filter_crossjoin", "exists_customers_q1", "mixed_depth_axis",
    "filter_nonempty_grid", "filter_last_regions", "generate_children_drill",
    "pages_axis_3d", "weekly_hierarchy_totals", "currentdate_member",
    "dimension_calc_member_mdx", "drilldown_level_top",
    "dimension_formula_member", "member_range_years",
    "drilldown_operator_month", "member_captions_suppliers",
    "namedset_rank_filter", "toggle_drill_state_year", "drillthrough_grouped",
    "linreg_variance_point", "matches_regex_filter", "extract_hierarchy",
    "sql_view_fact", "descendants_months_mdx", "object_accessor_metadata",
    "strtotuple_slicer", "locale_caption_members",
    "family_navigation_firstchild", "parameter_scaled_measure",
    "tuple_item_name", "measures_allmembers", "vba_function_names",
    "ragged_hierarchy_members", "format_strings_gate",
    "aggregate_routing_gate", "dedup_exact_fingerprint",
    "dedup_ngram_jaccard_pairs", "dedup_minhash_lsh_pairs",
    "dedup_simhash_pairs", "embed_cosine_topk", "embed_neardup_pairs",
    "text_langid_distribution", "text_winnowing_fingerprints",
    "dedup_keep_list", "embed_ivf_topk", "pipeline_split_counts",
    # rounds 1-2 greens
    "flagship_region_quarter", "pricing_summary_flags", "slicer_multi_member_in",
    "slicer_cross_dim_tuple", "crossjoin_nation_priority",
    "nonempty_crossjoin_nation_brand", "rollup_region_nation", "cube_flags_totals",
    "distinct_count_by_region", "aggregate_member_set", "median_percentile_price",
    "dispersion_stats", "corr_linreg_stats", "case_coalesce_measures",
    "calc_member_chain", "topcount_nations", "bottomcount_nations",
    "toppercent_nations", "topsum_nations", "rank_nations",
    "head_nations_hierarchized", "subset_nations_by_price", "ytd_monthly",
    "prev_member_month", "parallel_period_month", "last_periods_moving_3m",
    "opening_closing_period", "except_regions", "filter_order_nations",
    "generate_customer_list", "level_members_metadata", "descendants_of_member",
    "drillthrough_cell", "events_by_type", "count_exclude_empty",
    "events_daily_users", "virtual_sales_orders", "virtual_valid_measure",
    # set_intersect_active_nations: removed from the checked set in round 5
    # (round-4 axis-contiguity validation broke its rows-only query; fixed —
    # rotate it back through the driver gate)
    "role_region_grant", "set_union_nations",
    "visual_totals_regions", "scalar_string_math_functions",
    "date_functions_by_year", "member_properties_parts",
    "member_lookup_strtomember", "drilldown_member_region", "parent_child_rollup",
    "udf_scaled_revenue", "empty_cells_grid",
})


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    import mondrian_olap_spark.suite_pipeline  # noqa: F401 — registers entries
    from mondrian_olap_spark.suite import ORACLE, QUERIES

    # never-driver-checked entries first (the driver hashes a 50-entry
    # prefix); among those, entries WITH a bit-exact oracle precede
    # rows-only ones — a hash-verifiable entry must not lose its prefix
    # slot to a weak-check entry
    unchecked = {k: v for k, v in QUERIES.items() if k not in _DRIVER_CHECKED}
    unchecked = dict(
        sorted(unchecked.items(), key=lambda kv: kv[0] not in ORACLE)
    )
    checked = {k: v for k, v in QUERIES.items() if k in _DRIVER_CHECKED}
    return {**unchecked, **checked}


def oracle_sql() -> dict[str, str]:
    import mondrian_olap_spark.suite_pipeline  # noqa: F401 — registers entries
    from mondrian_olap_spark.suite import ORACLE

    return dict(ORACLE)
