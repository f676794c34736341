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
# queries, so registration order IS driver coverage. Round-10 rotation
# (r09 VERDICT "Next round" #1): after r09 retired the r02/r03 class,
# the oldest freshest-green vintage is the 43-query r04 class — the
# pub/sub envelope/routing/cluster surface, the stream_* battery, and a
# handful of pipeline ops. The window is spent on:
# (1) the 6 queries NEW this round — all rotation DEBT (no cumulative
# green row), so they must be in the head per tests/test_rotation_debt:
# the lake-signature artifact pair, the IVF posting-list artifact pair,
# the MinHash-family nightly gate, and the continuous ingest gate;
# (2) one long-green canary (flagship, green since r01) so a comparator
# regression on the old surface stays externally detectable;
# (3) ALL 43 r04-vintage queries, alphabetically (they share a vintage)
# — one sample drops the max green-row age to <= 5 rounds.
# 6+1+43 = 50 — exactly the driver's sample window. The two standing
# incremental-gate queries (oracle refactored to the shared
# SQL_INCREMENTAL_GATE constant this round, byte-identical) do NOT take
# head slots: they are r09-green, the youngest vintage in the registry,
# and the artifact twin sharing the same constant IS in the head.
# Queries not listed keep their import order after these; nothing is
# removed — the full local gate (tools/check_oracle.py) still checks
# all 235.
DRIVER_PRIORITY = [
    # (1) NEW this round — the lake-signature artifact pair, the
    # MinHash-family incremental gate, the IVF posting-list artifact
    # pair, and the continuous (streaming) ingest gate
    "sink_lake_signature_artifact",
    "dedup_incremental_simhash_artifact",
    "sink_ivf_postings_artifact",
    "sim_ann_ivf_artifact",
    "dedup_incremental_minhash",
    "stream_ingest_dedup_gate",
    # (2) canary: the long-green batch flagship. (The usual streaming
    # canary slot is covered this round by stream_ingest_dedup_gate
    # above — a fresh streaming query exercising foreachBatch,
    # checkpointing, and the artifact join in one row.)
    "flagship_delivery_report",
    # (3) stale: newest green row r04 (whole class, alphabetical)
    "cluster_discovery",
    "cluster_node_info",
    "doc_pack_sequences",
    "embed_label_centroids",
    "envelope_parse",
    "envelope_serialize",
    "events_retention_cohort",
    "join_range_banded",
    "kafka_wire_decode",
    "kafka_wire_encode",
    "pending_event_buffer",
    "route_broadcast_fallback",
    "route_event_dispatch",
    "route_fanout_salted",
    "route_loop_suppression",
    "route_membership_recheck",
    "sample_stratified_topk",
    "scalar_higher_order",
    "scalar_json",
    "sink_incremental_matview",
    "status_snapshot",
    "stream_checkpoint_recovery",
    "stream_dedup",
    "stream_dedup_within_watermark",
    "stream_foreach_batch_sink",
    "stream_liveness_expiry",
    "stream_pipeline_end_to_end",
    "stream_route_fanout",
    "stream_sliding_window",
    "stream_static_join",
    "stream_stream_full_outer",
    "stream_stream_join",
    "stream_stream_left_outer",
    "stream_subscriptions_stateful",
    "stream_tumbling_window",
    "stream_watermark_late_drop",
    "stream_window_topk",
    "subs_channel_catalog",
    "subs_current_state",
    "subs_kick_cascade",
    "subs_member_channels",
    "subs_remove_node",
    "udf_grouped_agg_wmean",
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
