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
# queries, so registration order IS driver coverage. Round-13 rotation
# (r12 VERDICT "Next round" #3): the stale class is now the 23-query
# r06 vintage (newest driver-green row r06 — sink_merge_upsert ..
# udf_iter_model_score), which fits the head whole. The window is:
# (1) the 8 queries NEW this round — rotation DEBT (no cumulative green
# row), mandatory per tests/test_rotation_debt: the relabel APPLY sink
# (maintained label artifact == full rebuild, through a from-scratch
# full-corpus oracle), the bridge-staged relabel queue (the r12
# verdict's non-vacuity ask — always returns real rows), and the
# passage-family incremental tier (write-once passage-digest artifact
# sink, its oracle-verified APPEND, and the shard-vs-artifact nightly
# gate, plus its continuous streaming twin — the fourth family's
# continuous tier);
# (2) the 8 queries whose own code changed this round (discipline: a
# changed query re-earns its external green row): the snapshot (gated
# label broadcast + inline quality predicate), route_fanout (the
# mixed-layout row-bound hardening), and the six incremental-clustering
# / signature-artifact queries whose builders gained staged/labels_path
# parameters and tuple cache keys;
# (3) one long-green canary (flagship, green since r01);
# (4) the full 23-query r06 stale class, then the next-stalest vintage
# (r08, alphabetical) up to the window: 10 of 47 fit.
# 8+8+1+23+10 = 50 — exactly the driver's sample window. Queries not
# listed keep their import order after these; nothing is removed — the
# full local gate (tools/check_oracle.py) still checks all 262.
DRIVER_PRIORITY = [
    # (1) NEW this round — relabel APPLY + staged queue + passage tier
    "sink_lake_cluster_labels_artifact_relabel",
    "dedup_cluster_relabel_queue_staged",
    "sink_lake_passage_artifact",
    "sink_lake_passage_artifact_append",
    "dedup_incremental_passages",
    "stream_ingest_passage_gate",
    "corpus_training_snapshot_incremental",
    "stream_cluster_maintenance",
    # (2) CHANGED this round — re-earn the green row
    "corpus_training_snapshot",
    "route_fanout",
    "dedup_cluster_incremental",
    "dedup_cluster_relabel_queue",
    "sink_lake_cluster_labels_artifact",
    "sink_lake_signature_artifact",
    "sink_lake_signature_artifact_append",
    "dedup_incremental_simhash_artifact",
    # (3) canary: the long-green batch flagship
    "flagship_delivery_report",
    # (4a) stale: the whole r06 class (newest driver-green row r06)
    "sink_merge_upsert",
    "sink_partitioned_parquet",
    "source_csv_roundtrip",
    "source_json_corrupt_records",
    "source_json_roundtrip",
    "source_orc_roundtrip",
    "source_schema_evolution",
    "split_train_val_test",
    "text_boilerplate_shingles",
    "text_bpe_pair_counts",
    "text_domain_mix",
    "text_fingerprint",
    "text_lang_id",
    "text_pii_scrub",
    "text_pmi_collocations",
    "text_quality_score",
    "text_repetition_ngrams",
    "text_stats",
    "text_tfidf_keywords",
    "text_tokenize",
    "udf_cogrouped_asof",
    "udf_grouped_zscore",
    "udf_iter_model_score",
    # (4b) stale: newest green row r08 (alphabetical, first 13 of 47)
    "agg_approx_distinct",
    "agg_unpivot",
    "dedup_decontaminate_ngram",
    "dedup_exact_normalized",
    "dedup_fuzzy_levenshtein",
    "dedup_minhash_error_eval",
    "doc_mix_rebalance",
    "doc_pack_efficiency",
    "doc_quality_gate",
    "doc_seqlen_histogram",
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
