"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` exposes
every implemented operator as ``(spark, sf_dir) -> DataFrame``;
``oracle_sql()`` gives each one's DuckDB twin (omitted for non-SQL
operators → rows-only check). The real registry lives in
``quty_server_spark.plans.registry``; importing
``quty_server_spark.operators`` populates it.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import quty_server_spark.operators  # noqa: F401,E402  (registers all queries)
from quty_server_spark.plans.registry import registry  # noqa: E402
from quty_server_spark.session import configure  # noqa: E402

SF0001 = "/root/testdata/sf0.001"

# The driver's correctness artifact samples the first ~50 registered
# queries, so registration order IS driver coverage. Round-9 rotation
# (the staleness-RETIRING round — VERDICT r08 "Next round" #1; the r08
# head was never edited, so the driver re-sampled r07's 50 names and
# the early relational surface's freshest green rows stayed r02/r03
# vintage). With the never-sampled debt at zero since r07, the window
# is spent on:
# (1) the 4 queries whose code changed THIS round — the shared BSP
# label memo (dedup_cluster / dedup_cluster_stats /
# dedup_keep_canonical now label once per (session, sf_dir),
# dedup.py:simhash_component_labels) must be re-proven byte-identical,
# and stream_rate_source gained its first real oracle (deterministic
# rate-micro-batch values over range(0,5000)) — previously the only
# rows-only entry in the registry;
# (2) two long-green canaries (flagship since r01, one stream_*) so a
# comparator regression on the old surface stays externally detectable;
# (3) ALL 42 stale queries, oldest green row first: the three
# r02-vintage (agg_pivot, events_time_rollup, events_user_funnel), then
# the 39 whose newest green row is r03 — the whole early
# join/agg/window/set/scalar/TPC-H surface. 6+2+42 = 50 = the window, so
# one sample retires the entire stale class and the max green-row age drops
# to <= 2 rounds. tests/test_rotation_debt.py asserts this head ⊇
# (registered ∖ cumulative-green) so rotation debt cannot silently
# rebuild; tests/test_oracle_parity.py asserts the head spends its
# slots on debt when debt exists. Queries not listed keep their import
# order after these; nothing is removed — the full local gate
# (tools/check_oracle.py) still checks all 229.
DRIVER_PRIORITY = [
    # (1) changed or NEW this round — re-prove via driver
    "dedup_cluster",
    "dedup_cluster_stats",
    "dedup_keep_canonical",
    "stream_rate_source",
    "dedup_incremental_simhash",
    "dedup_incremental_simhash_capped",
    # (2) canaries: long-green batch + streaming
    "flagship_delivery_report",
    "stream_session_window",
    # (3) stale: newest green row r02
    "agg_pivot",
    "events_time_rollup",
    "events_user_funnel",
    # (3) stale: newest green row r03
    "agg_basic",
    "agg_count_distinct",
    "agg_cube",
    "agg_grouping_sets",
    "agg_percentile",
    "agg_rollup",
    "agg_sketch_mergeable",
    "agg_stats",
    "conditional_case_null",
    "distinct_projection",
    "join_asof",
    "join_cross",
    "join_left_anti",
    "join_left_semi",
    "join_null_safe",
    "join_range_nonequi",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q14_promo_effect",
    "q17_small_quantity",
    "q18_large_orders",
    "scalar_array",
    "scalar_dates",
    "scalar_maps",
    "scalar_math",
    "scalar_strings",
    "set_except",
    "set_intersect",
    "set_union_distinct",
    "sort_limit_topn",
    "subquery_correlated_exists",
    "subquery_scalar_in",
    "window_lag_lead",
    "window_moving_frame",
    "window_rank_dense_ntile",
    "window_row_number_topk",
    "window_running_sum",
    "window_value_fns",
]


def _rotated(d: dict) -> dict:
    front = {n: d[n] for n in DRIVER_PRIORITY if n in d}
    return front | {n: v for n, v in d.items() if n not in front}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    configure(spark)
    return registry.queries["flagship_delivery_report"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, rotated so
    the driver's fixed-size sample covers never-checked surfaces."""
    return _rotated(dict(registry.queries))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return _rotated(dict(registry.oracles))
