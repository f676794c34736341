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
# queries, so registration order IS driver coverage. Round-11 rotation
# (r10 VERDICT "Next round" #3): the r04 class got its green rows in
# r10, so the oldest freshest-green vintage is the 44-query r05 class.
# The window is spent on:
# (1) the 6 queries NEW this round — rotation DEBT (no cumulative green
# row), mandatory per tests/test_rotation_debt: the lake MinHash-band
# artifact pair, the capped MinHash gate, the MinHash continuous ingest
# gate, the embedding-family incremental gate (completing the
# write-once/probe-nightly triad), and the ingest mix-drift QA;
# (2) the 6 queries whose own code changed this round (discipline: a
# changed query re-earns its external green row): the SimHash/IVF
# artifact pairs + the SimHash continuous gate (scratch paths now
# session-keyed via session_tmp_dir) and route_fanout (eager
# count gate replaced by the parquet-footer metadata gate). The
# load_table schema cache touches EVERY query identically and is
# covered by the full local gate + this head's cross-section, so it
# does not by itself head-list the other 230;
# (3) one long-green canary (flagship, green since r01) so a comparator
# regression on the old surface stays externally detectable;
# (4) the r05 class alphabetically up to the window: 37 of 44 fit; the
# 7-query tail (text_bigram_familiarity, udf_map_in_arrow, and the five
# window_* queries) stays r05-vintage and leads class (3) of the r12
# head.
# 6+6+1+37 = 50 — exactly the driver's sample window. Queries not
# listed keep their import order after these; nothing is removed — the
# full local gate (tools/check_oracle.py) still checks all 240+.
DRIVER_PRIORITY = [
    # (1) NEW this round — the MinHash-family artifact split, the
    # capped MinHash gate, the MinHash continuous ingest gate, the
    # embedding-family incremental gate, and the ingest mix-drift QA
    "sink_lake_minhash_artifact",
    "dedup_incremental_minhash_artifact",
    "dedup_incremental_minhash_capped",
    "stream_ingest_dedup_gate_minhash",
    "dedup_incremental_embedding_artifact",
    "doc_ingest_mix_drift",
    # (2) CHANGED this round — session-keyed artifact paths + the
    # route_fanout metadata gate
    "sink_lake_signature_artifact",
    "dedup_incremental_simhash_artifact",
    "sink_ivf_postings_artifact",
    "sim_ann_ivf_artifact",
    "stream_ingest_dedup_gate",
    "route_fanout",
    # (3) canary: the long-green batch flagship
    "flagship_delivery_report",
    # (4) stale: newest green row r05 (alphabetical, first 37 of 44)
    "agg_corr_regression",
    "agg_filtered_conditional",
    "agg_grouping_id",
    "agg_heavy_hitters",
    "agg_percentile_approx_check",
    "dedup_containment",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_prefix",
    "dedup_simhash",
    "doc_chunk_overlap",
    "embed_dim_variance",
    "events_anomaly_mad",
    "events_anomaly_running_z",
    "events_concurrency_sweep",
    "events_cumulative_uniques",
    "events_transition_matrix",
    "join_asof_tolerance",
    "join_dpp_partition_pruned",
    "lineitem_abc_pareto",
    "orders_cohort_ltv",
    "orders_market_basket",
    "orders_rfm_segmentation",
    "scalar_bitwise",
    "scalar_try_arithmetic",
    "sim_ann_ivf",
    "sim_ann_ivf_nprobe2",
    "sim_cosine_topk",
    "sink_manifest_snapshot",
    "sink_scd2_history",
    "sink_zorder_clustered",
    "stream_chained_windows",
    "stream_kafka_replay",
    "stream_seq_counter_tws",
    "subquery_lateral_topk",
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
