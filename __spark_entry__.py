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


#: entries already hash-verified by the driver in rounds 1-2 (green in
#: CORRECTNESS_r01/r02).  The driver checks a 50-entry prefix of this dict,
#: so never-yet-checked entries are listed FIRST to rotate them through the
#: gate; the previously-green entries keep full local coverage via
#: tools/check_oracle.py --exact (the driver-gate mirror).
_DRIVER_CHECKED = frozenset({
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
    "role_region_grant", "set_union_nations", "set_intersect_active_nations",
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
    # highest-value entries pinned to the very front of the prefix, then
    # oracle-backed entries, then rows-only ones
    front = ("multimodal_decode_features", "tuple_case_contextual")
    unchecked = dict(
        sorted(
            unchecked.items(),
            key=lambda kv: (
                front.index(kv[0]) if kv[0] in front else len(front),
                kv[0] not in ORACLE,
            ),
        )
    )
    checked = {k: v for k, v in QUERIES.items() if k in _DRIVER_CHECKED}
    return {**unchecked, **checked}


def oracle_sql() -> dict[str, str]:
    import mondrian_olap_spark.suite_pipeline  # noqa: F401 — registers entries
    from mondrian_olap_spark.suite import ORACLE

    return dict(ORACLE)
