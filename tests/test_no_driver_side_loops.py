"""Static hygiene gate: no driver-side materialization in engine code.

A registered query that calls ``.collect()`` / ``.toPandas()`` /
``.toLocalIterator()`` isn't distributed — at 100 TB it pulls the data
set through the driver. ``first()`` is the same materialization as
``head(1)`` and is forbidden on the same grounds. This AST walk pins the
invariant over every non-test engine module, so a future operator can't
quietly regress it. ``localCheckpoint``/``cache`` are allowed
(cluster-side materialization).
"""

from __future__ import annotations

import ast
import pathlib

ROOT = pathlib.Path(__file__).resolve().parents[1] / "quty_server_spark"

FORBIDDEN = {"collect", "toPandas", "toLocalIterator", "head", "take", "first"}

# Receivers that are the pyspark.sql.functions module, not a DataFrame:
# F.first(...) is the SQL aggregate, not driver-side materialization.
_FUNCTIONS_ALIASES = {"F", "functions"}


def _is_functions_call(node: ast.Call) -> bool:
    return (
        isinstance(node.func, ast.Attribute)
        and isinstance(node.func.value, ast.Name)
        and node.func.value.id in _FUNCTIONS_ALIASES
    )

# (module-relative path, enclosing function, method) triples allowed to
# materialize. Every entry must justify why the materialized set is O(1)
# regardless of input scale.
EXEMPT: set[tuple[str, str, str]] = {
    # Both derive micro-batch cut points from a 1-row global MIN/MAX
    # aggregate — the aggregation runs distributed; only the single
    # reduced row crosses to the driver.
    ("quty_server_spark/streaming/ops.py", "stream_watermark_late_drop", "first"),
    ("quty_server_spark/streaming/ops.py", "checkpoint_recovery_run", "first"),
    ("quty_server_spark/streaming/ops.py", "kafka_replay_run", "first"),
    # BSP convergence check: a 1-row SUM(changed) aggregate per superstep
    # whose action also materializes that superstep's lazy checkpoint —
    # only the single count crosses to the driver (the standard
    # driver-coordinated BSP idiom).
    ("quty_server_spark/operators/dedup.py", "min_label_components", "first"),
    # Same BSP idiom: the per-iteration L1 rank delta is a 1-row SUM
    # aggregate whose action also materializes the iteration's lazy
    # checkpoint; only that scalar crosses to the driver.
    ("quty_server_spark/operators/graph.py", "pagerank_converged", "first"),
    # Retraction cleanup of partitions a dynamic overwrite cannot
    # empty: both collects pull DISTINCT partition-key values of the
    # AFFECTED partition set — bounded by the artifact's partition
    # count (metadata grain: <= 16 passage prefixes, <= IVF_K_MAX
    # cells, <= LABEL_HOME_BUCKETS buckets), never row-scale.
    ("quty_server_spark/operators/retract.py", "_retract_rows", "collect"),
    (
        "quty_server_spark/operators/retract.py",
        "apply_cluster_label_retraction",
        "collect",
    ),
    # Trainer-shard compaction (same partition-scoped-rewrite device):
    # both collects pull DISTINCT content-keyed shard ids of the
    # affected/kept set — bounded by N_TRAIN_SHARDS (metadata grain:
    # 8 values), never row-scale.
    (
        "quty_server_spark/operators/pipeline.py",
        "compact_training_shards_inplace",
        "collect",
    ),
}


def _enclosing_function(tree: ast.AST, lineno: int) -> str:
    """Name of the innermost function containing ``lineno`` ('' if none)."""
    best = ""
    best_span = None
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            end = node.end_lineno or node.lineno
            if node.lineno <= lineno <= end:
                span = end - node.lineno
                if best_span is None or span < best_span:
                    best, best_span = node.name, span
    return best


def test_no_driver_side_materialization():
    hits = []
    for path in sorted(ROOT.rglob("*.py")):
        rel = str(path.relative_to(ROOT.parent))
        tree = ast.parse(path.read_text(), filename=str(path))
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr in FORBIDDEN
                and not _is_functions_call(node)
            ):
                fn = _enclosing_function(tree, node.lineno)
                if (rel, fn, node.func.attr) in EXEMPT:
                    continue
                hits.append(f"{rel}:{node.lineno} .{node.func.attr}() in {fn}()")
    assert not hits, "driver-side materialization in engine code:\n" + "\n".join(hits)


def test_exemptions_still_exist():
    """Every EXEMPT entry must still match a real call site, so stale
    exemptions can't silently widen the gate."""
    found: set[tuple[str, str, str]] = set()
    for path in sorted(ROOT.rglob("*.py")):
        rel = str(path.relative_to(ROOT.parent))
        tree = ast.parse(path.read_text(), filename=str(path))
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr in FORBIDDEN
                and not _is_functions_call(node)
            ):
                found.add((rel, _enclosing_function(tree, node.lineno), node.func.attr))
    assert EXEMPT <= found, f"stale exemptions: {EXEMPT - found}"
