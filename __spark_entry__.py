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
# queries, so registration order IS driver coverage. Round-15 rotation
# (r14 VERDICT "Next round" #1): clear the last r08 rotation debt and
# start advancing the r09 vintage. The window is:
# (1) the 10 queries NEW this round — rotation DEBT (no cumulative green
# row), mandatory per tests/test_rotation_debt: the trainer-shard
# APPEND twin (the write-once sink's claimed append-stability proven
# under the byte-shared summary oracle, with the stale-keeper
# compaction-debt contract), the PERCEPTUAL multimodal near-dup pass
# (blockhash signatures through the mapInPandas decode seam riding the
# SimHash banding machinery, staged byte-swapped twins), and the BPE
# TRAINING LOOP (6 chained exact greedy merges, per-round choice+count
# hash-verified against the unrolled oracle) plus its two depth
# consumers: the BPE COMPRESSION CURVE (per-round corpus symbol count
# and saved ppm under the shared unrolled-state oracle) and the
# perceptual CLUSTER COLLAPSE (min-label components over the near-pair
# graph with the cross-modality / byte-variant audit), and the
# CONTINUOUS trainer handoff stream_training_shards (per-epoch
# overwrite commit dirs — the file-sink exactly-once device — close
# state under the append twin's oracle byte-for-byte), and the media
# family's ARTIFACT TIER — write-once banded perceptual-signature
# artifact, its oracle-verified append (batch signed alone, lake never
# re-decoded), the asymmetric nightly ingest gate (non-vacuous by
# the twin offset's cross-residue construction), and its RETRACTION
# verb (tombstone sidecar, live ≡ compacted ≡ survivor-rebuild under
# the survivor-scoped write-once oracle);
# (2) the 2 queries whose code changed this round and must re-earn
# their external green rows: sink_training_shards (shard hash / writer
# / summary factored into helpers shared with the append twin) and
# snapshot_retraction_impact (survivor side now the shared
# scoped_training_snapshot helper) — semantics-identical extracts,
# re-verified locally at both SFs, listed per the discipline;
# (3) the canary: q1_pricing_summary (long-green, re-greened r14);
# (4) the FULL r08 vintage — all 16 leftovers named by the r14 judge
# roll in, so after this round no query's newest external green row
# predates r09;
# (5) the head's remaining 21 slots advance the r09 vintage
# (alphabetical prefix of its 49 queries).
# 10+2+1+16+21 = 50 — exactly the driver's sample window. Queries not
# listed keep their import order after these; nothing is removed — the
# full local gate (tools/check_oracle.py) still checks all registered
# queries.
DRIVER_PRIORITY = [
    # (1) NEW this round
    "sink_training_shards_append",
    "mm_payload_neardup",
    "text_bpe_train_n",
    "text_bpe_compression",
    "mm_payload_neardup_keep",
    "stream_training_shards",
    "sink_media_signature_artifact",
    "sink_media_signature_artifact_append",
    "mm_neardup_incremental_artifact",
    "sink_media_signature_artifact_retract",
    # (2) CHANGED this round — re-earn the green row
    "sink_training_shards",
    "snapshot_retraction_impact",
    # (3) canary
    "q1_pricing_summary",
    # (4) the r08 vintage — cleared in full
    "q15_top_supplier",
    "q19_discounted_revenue",
    "q22_sales_opportunity",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q7_nation_volume",
    "q8_market_share",
    "sample_stratified_hash",
    "scalar_variant_json",
    "sink_python_datasource_writer",
    "source_python_datasource",
    "sql_recursive_cte_hierarchy",
    "stream_python_datasource",
    "text_lexicon_sentiment",
    "text_winnow_fingerprint",
    "window_rolling_median",
    # (5) r09 vintage, alphabetical prefix
    "agg_basic",
    "agg_count_distinct",
    "agg_cube",
    "agg_grouping_sets",
    "agg_percentile",
    "agg_pivot",
    "agg_rollup",
    "agg_sketch_mergeable",
    "agg_stats",
    "conditional_case_null",
    "dedup_cluster",
    "dedup_cluster_stats",
    "dedup_incremental_simhash",
    "dedup_incremental_simhash_capped",
    "dedup_keep_canonical",
    "distinct_projection",
    "events_time_rollup",
    "events_user_funnel",
    "join_asof",
    "join_cross",
    "join_left_anti",
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
