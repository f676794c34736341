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
# queries, so registration order IS driver coverage. Round-7 rotation
# (the verification-CLOSING round — VERDICT r06 "Next round" #1): after
# r06 the cumulative driver record covers 191/212 queries; this head is
# exactly the complement, so a full r07 sample closes the record at
# every-query-proven:
# (1) the 21 queries with zero driver rows in CORRECTNESS_r01-r06 —
# the 7 deferred TPC-H picks + agg_unpivot, and the 13 round-6 ops
# registered behind the r06 head;
# (2) agg_approx_distinct — its only driver row (r03) predates the
# bounded-error oracle that landed in r04; re-sampled to replace the
# stale no_oracle row;
# (3) the 4 queries whose code changed THIS round: the two array-output
# stringifications (embed_quantize_int8, text_winnow_fingerprint —
# never driver-green before, the r06 comparator erred on their array
# columns) and the two hot-key caps (graph_bipartite_butterflies,
# dedup_fuzzy_levenshtein — r06-green but the cap changes their
# results, QUALIFY-mirrored in the oracle);
# (4) two long-green canaries (flagship since r01, one stream_*) so a
# comparator regression on the old surface stays externally detectable.
# New round-7 queries are appended after these so they get driver rows
# in the same sample. tests/test_rotation_debt.py asserts this head ⊇
# (registered ∖ cumulative-green) so rotation debt cannot silently
# rebuild. Queries not listed keep their import order after these;
# nothing is removed — the full local gate (tools/check_oracle.py)
# still checks all 212+.
DRIVER_PRIORITY = [
    # (1) never driver-sampled: deferred TPC-H family + agg_unpivot
    "q7_nation_volume",
    "q8_market_share",
    "q13_order_distribution",
    "q15_top_supplier",
    "q19_discounted_revenue",
    "q22_sales_opportunity",
    "min_cost_supplier",
    "agg_unpivot",
    # (1) never driver-sampled: round-6 ops registered behind the head
    "join_bloom_runtime_filtered",
    "window_rolling_median",
    "events_dau_wau",
    "events_bot_regularity",
    "events_funnel_time_to_convert",
    "events_top_paths",
    "dedup_exact_normalized",
    "dedup_decontaminate_ngram",
    "doc_quality_gate",
    "embed_norm_outliers",
    "graph_degree_distribution",
    "sample_stratified_hash",
    "text_lexicon_sentiment",
    # (2) stale driver row (r03 no_oracle; bounded-error oracle in r04)
    "agg_approx_distinct",
    # (3) changed this round — re-prove via driver
    "embed_quantize_int8",
    "text_winnow_fingerprint",
    "graph_bipartite_butterflies",
    "dedup_fuzzy_levenshtein",
    # (4) canaries: long-green batch + streaming
    "flagship_delivery_report",
    "stream_session_window",
    # (5) NEW this round (never existed before r07) — registered inside
    # the head so they acquire driver rows in the same sample
    "sim_ann_recall_eval",
    "sim_ivf_cell_balance",
    "dedup_minhash_error_eval",
    "dedup_cluster_stats",
    "doc_mix_rebalance",
    "doc_seqlen_histogram",
    "doc_pack_efficiency",
    "orders_supplier_herfindahl",
    "events_watermark_lag_audit",
    "mm_modality_mix",
    "source_python_datasource",
    "stream_python_datasource",
    "sink_python_datasource_writer",
    "scalar_variant_json",
    "sql_recursive_cte_hierarchy",
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
