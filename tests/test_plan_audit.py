"""Whole-surface physical-plan audit.

test_scale_plans.py pins specific plans query-by-query; this sweep
instead asserts three anti-patterns are absent from EVERY registered
batch query, so a future operator cannot ship with a scale-killing plan
unnoticed:

- ``CartesianProduct`` — an unconditional cross product of two
  distributed sides;
- ``BatchEvalPython`` — a row-at-a-time Python UDF on the plan (only
  Arrow-vectorized Python is acceptable, and only where declared);
- ``BroadcastNestedLoopJoin`` anywhere OUTSIDE the justified allowlist
  below (BNLJ with a broadcast one-row/tiny build side is the optimal
  plan for scalar-subquery joins and bounded theta joins — the audit
  exists to catch NEW, unjustified ones).

Streaming queries are excluded: building them executes the stream to a
memory sink, and the returned table's plan is a bare memory scan —
their plan properties are pinned in their own tests. Source/sink
round-trip builders are excluded for the same structural reason: their
builder executes real file writes as a side effect and the returned
DataFrame is a bare read-back scan, so the sweep would pay the write
jobs to audit a plan with nothing in it — their write/read plans
(partition pruning, bucketing, DPP) are pinned in test_scale_plans.py.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as se
from tests.conftest import SF_DIR

# name -> why a BroadcastNestedLoopJoin is the right plan there.
BNLJ_JUSTIFIED = {
    "join_cross": "the query IS a cross join (explicit Cartesian semantics)",
    "route_broadcast_fallback": "reference semantics: flood to ALL nodes; "
    "nodes side is the tiny broadcast flood list",
    "join_range_nonequi": "pure theta join; the banded equi restatement "
    "(join_range_banded) is the both-sides-large scale path",
    "agg_histogram_mode": "1-row global-stats build side joined back",
    "agg_skew_profile": "1-row global moments build side joined back",
    "events_densified_hourly": "1-row [min,max] time-bounds build side",
    "events_user_funnel": "1-row stage-threshold build side",
    "pending_event_buffer": "1-row readiness-watermark clamp build side",
    "q22_sales_opportunity": "1-row AVG(acctbal) scalar subquery",
    "subquery_scalar_in": "1-row scalar subquery build side",
    "text_pmi_collocations": "1-row corpus-total build side",
    "text_bpe_encode": "N 1-row trained-merge argmax build sides joined "
    "back in training order (the trainer's broadcast-argmax shape at "
    "encode time)",
    "text_bpe_encode_vocab": "the same N 1-row trained-merge argmax "
    "build sides, applied once per DISTINCT word (the skew-safe "
    "vocabulary-grain twin; the doc-side joins are hash joins)",
    "text_bpe_encode_artifact": "ONE 1-row build side — the whole "
    "merge table folded into a single training-ordered array row and "
    "broadcast once (the artifact encoder's constant-plan-size shape; "
    "contrast the in-session encoders' N separate 1-row sides)",
    "doc_pack_sequences_bpe": "inherits text_bpe_encode's N 1-row "
    "trained-merge argmax build sides (the packer consumes the encoder)",
    "sample_token_budget_bpe": "inherits text_bpe_encode's N 1-row "
    "trained-merge argmax build sides (the sampler consumes the encoder)",
    "text_tfidf_keywords": "1-row corpus-doc-count build side",
    "sim_cosine_topk": "documented brute-force baseline over a bounded "
    "query set (ANN variants are the scale path)",
    "dedup_decontaminate_embedding": "benchmark side is an eval suite — "
    "small by construction, broadcast; the corpus scans once unshuffled "
    "(same shape argument as the n-gram decontamination twin)",
    "sim_ann_ivf_nprobe2": "probe set x capped-K centroid broadcast "
    "table (bounded at IVF_K_MAX by construction)",
    "embed_norm_outliers": "1-row corpus-median build side (scalar-"
    "subquery shape)",
    "sim_ann_recall_eval": "the exact arm IS the documented brute-force "
    "baseline over the bounded query sample (recall has no cheaper "
    "ground truth); the approx arm stays a bucket hash join",
    "sim_ivf_cell_balance": "1-row corpus-totals build side",
    "doc_mix_rebalance": "1-row corpus-totals build side",
    "doc_ingest_mix_drift": "1-row shard/lake-totals build side",
    "dedup_incremental_embedding_artifact": "the shard x coarse-quantizer "
    "assignment — the standard IVF assign step, build side capped at "
    "IVF_K_MAX by construction; the probe join itself is a cell hash join",
    "text_bpe_merge_step": "1-row argmax-pair build side broadcast back "
    "over the weighted vocabulary (scalar-subquery shape)",
    "text_bpe_compression": "1-row round-0 baseline build side joined "
    "back over the 7-row curve (scalar-subquery shape)",
    # text_bpe_train_n needs no entry: its per-round 1-row argmax
    # crossJoins (same scalar-subquery shape as text_bpe_merge_step)
    # sit behind per-round lazy localCheckpoints, so the registered
    # plan the sweep sees is the checkpoint-truncated union of the
    # round outputs.
}


# Builders that run real write jobs as a side effect and return a bare
# read-back scan (see module docstring). Everything registered in
# sources/formats.py with a write step.
SIDE_EFFECT_BUILDERS = {
    "source_csv_roundtrip",
    "source_json_roundtrip",
    "source_orc_roundtrip",
    "sink_partitioned_parquet",
    "join_bucketed_colocated",
    "source_schema_evolution",
    "source_json_corrupt_records",
    "sink_merge_upsert",
    "sink_compacted_parquet",
    "sink_scd2_history",
    "sink_incremental_matview",
    "sink_zorder_clustered",
    "join_dpp_partition_pruned",
    "sink_manifest_snapshot",
    "sink_python_datasource_writer",
}


@pytest.fixture(scope="module")
def audit(spark):
    flags: dict[str, list[str]] = {}
    complex_out: dict[str, list[str]] = {}
    from tools.check_oracle import lint_spark_complex

    for name, fn in se.queries().items():
        if name.startswith("stream_") or name in SIDE_EFFECT_BUILDERS:
            continue
        df = fn(spark, SF_DIR)
        bad = lint_spark_complex(df.schema)
        if bad:
            complex_out[name] = bad
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        hits = []
        if "CartesianProduct" in plan:
            hits.append("cartesian")
        if "BatchEvalPython" in plan:
            hits.append("row_python_udf")
        if "BroadcastNestedLoopJoin" in plan:
            hits.append("bnlj")
        if hits:
            flags[name] = hits
    return {"flags": flags, "complex": complex_out}


def test_no_cartesian_products_anywhere(audit):
    bad = [n for n, h in audit["flags"].items() if "cartesian" in h]
    assert not bad, f"CartesianProduct in: {bad}"


def test_no_row_at_a_time_python_udfs(audit):
    bad = [n for n, h in audit["flags"].items() if "row_python_udf" in h]
    assert not bad, f"row-wise BatchEvalPython in: {bad}"


def test_no_complex_output_columns(audit):
    # Driver comparator cannot canonicalize array/map/struct outputs
    # (round-6: embed_quantize_int8, text_winnow_fingerprint). Complex
    # values stay INSIDE queries; outputs must stringify or explode.
    assert not audit["complex"], (
        f"complex-typed output columns in: {audit['complex']} — "
        f"concat_ws/array_to_string the column or explode to scalar grain"
    )


def test_bnlj_only_where_justified(audit):
    bad = [
        n
        for n, h in audit["flags"].items()
        if "bnlj" in h and n not in BNLJ_JUSTIFIED
    ]
    assert not bad, (
        f"unjustified BroadcastNestedLoopJoin in: {bad} — either fix the "
        f"plan (broadcast-equi / banded restatement) or add an explicit "
        f"justification to BNLJ_JUSTIFIED"
    )


def test_allowlist_carries_no_dead_entries(audit):
    # An allowlist entry whose query no longer BNLJs is stale — prune it
    # so the list stays an honest inventory of cross-shaped plans.
    stale = [
        n
        for n in BNLJ_JUSTIFIED
        if "bnlj" not in audit["flags"].get(n, [])
    ]
    assert not stale, f"stale BNLJ_JUSTIFIED entries: {stale}"
