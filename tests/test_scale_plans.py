"""Physical-plan regression tests — the 100 TB design assertions.

Correctness tests prove the engine computes the right answer at small SF;
these prove the *plan* is the one that survives a 1000-executor cluster:
filters reach the parquet scan, projections prune columns, small
dimensions broadcast instead of shuffling the fact side, partition
filters prune directories, and hot paths stay inside whole-stage codegen.
A regression here (e.g. a lost broadcast hint, a filter stuck above a
join) changes no small-SF answer but ruins the scale story — hence
plan-level tests.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as se
from tests.conftest import SF_DIR


def plan_of(spark, name: str) -> str:
    df = se.queries()[name](spark, SF_DIR)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(spark, "q6_forecast_revenue")
    assert "PushedFilters:" in plan
    # All three predicates push into the parquet reader.
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_quantity,24.0)" in plan
    assert "GreaterThanOrEqual(l_discount,0.04)" in plan


def test_column_pruning(spark):
    plan = plan_of(spark, "q6_forecast_revenue")
    # The scan reads only the 4 needed columns of lineitem's 11.
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_quantity" in read and "l_extendedprice" in read
    assert "l_returnflag" not in read and "l_orderkey" not in read


def test_dimension_joins_broadcast(spark):
    # Star joins must be broadcast hash joins — no shuffle of the fact side,
    # and never a sort-merge join against a 25-row dimension.
    for name in ["q3_shipping_priority", "q5_local_supplier_volume", "q10_returned_items"]:
        plan = plan_of(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_routing_join_broadcasts_state(spark):
    # The routing core: messages shuffled by nothing, subscription state
    # broadcast (it is the small compacted side).
    plan = plan_of(spark, "route_fanout")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_no_cartesian_in_candidate_joins(spark):
    # LSH candidate generation must join on band equality, never cross.
    for name in ["dedup_minhash_lsh", "dedup_simhash", "sim_ann_lsh"]:
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, name


def test_partition_pruning(spark):
    # Reading back the partitioned sink with a partition-column filter must
    # prune at planning time, not scan-and-filter.
    df = se.queries()["sink_partitioned_parquet"](spark, SF_DIR)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "event_type" in pf and "click" in pf


def test_whole_stage_codegen(spark):
    # Scalar batteries stay fully inside codegen (no Python, no interpreted
    # expressions breaking the pipeline). AQE finalizes the plan only on
    # execution, so materialize first and read the executed plan.
    for name in ["text_quality_score", "scalar_strings", "q1_pricing_summary"]:
        df = se.queries()[name](spark, SF_DIR)
        df.collect()  # finalize THIS plan (count() would build another)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
        # '*(n)' prefixes mark whole-stage-codegen'd operators.
        assert "*(" in plan, name


def test_exactly_one_python_udf_surface(spark):
    # Auth is the only operator allowed a scalar Python UDF; relational and
    # LLM-pipeline hot paths must not contain any.
    for name in [
        "q1_pricing_summary",
        "dedup_minhash_lsh",
        "text_fingerprint",
        "sim_cosine_topk",
        "route_fanout",
    ]:
        plan = plan_of(spark, name)
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, name
