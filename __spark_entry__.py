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
# queries, so registration order IS driver coverage. Round-17 rotation
# (r16 VERDICT "Next round" #1): clear the FULL r10 vintage — after
# this round no query's newest external green row predates r11. The
# window is:
# (1) the 4 queries NEW this round — rotation DEBT (no cumulative
# green row), mandatory per tests/test_rotation_debt: the IVF
# RE-CLUSTER verb (the maintenance action the drift reports feed —
# retrain the frozen-K quantizer over the standing artifact's stable
# stratum, reassign ALL postings, summarize under the write-once
# oracle byte-for-byte; probe-after-recluster ≡ fresh-build pinned),
# the MULTIMODAL snapshot (THE PRODUCT covering the media column:
# text gates AND the media keeper election, staged cross-modality
# keeper pinned at both SFs), the BPE-DENOMINATED trainer shards
# (the encoder's third consumer: shard layout + audit carrying
# trained-token totals through the shared bpe_counts oracle CTE;
# per-shard totals pinned to the encoder's), and the SKEW-SAFE
# distinct-word BPE encode (same bpe_counts oracle; output equality
# to the narrow-map encoder pinned);
# (2) the 1 query whose text changed this round and re-earns its
# green row per the discipline: text_bpe_encode (docstring now points
# at the registered vocab twin — semantics and oracle unchanged);
# (3) the canary: q1_pricing_summary (long-green, re-greened r16);
# (4) the FULL r10 vintage — all 39 queries whose newest external
# green row is r10 (the judge's histogram bucket, named in the r16
# verdict) roll through;
# (5) the head's remaining 3 slots advance the r11 vintage
# (alphabetical prefix of its 38 queries).
# 6+1+1+39+3 = 50 — exactly the driver's sample window. Queries not
# listed keep their import order after these; nothing is removed — the
# full local gate (tools/check_oracle.py) still checks all registered
# queries.
DRIVER_PRIORITY = [
    # (1) NEW this round — including the round-17 late pair: the
    # persisted merge-table artifact sink (the 7th artifact family;
    # training-recursion oracle byte-for-byte) and the artifact-driven
    # encoder (plan size constant in merge count; shared bpe_counts
    # oracle, equality to the in-session encoder pinned in pytest).
    "sink_ivf_postings_artifact_recluster",
    "corpus_training_snapshot_mm",
    "sink_training_shards_bpe",
    "text_bpe_encode_vocab",
    "sink_bpe_merges_artifact",
    "text_bpe_encode_artifact",
    # (2) CHANGED this round — re-earn the green row
    "text_bpe_encode",
    # (3) canary
    "q1_pricing_summary",
    # (4) the r10 vintage — cleared in full
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
    # (5) r11 vintage, alphabetical prefix
    "agg_corr_regression",
    "agg_filtered_conditional",
    "agg_grouping_id",
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
