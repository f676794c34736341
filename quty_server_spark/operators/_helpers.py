"""Shared helpers for oracle-exact aggregation and table access.

The determinism strategy (see plans/registry.py docstring): double-typed
measures are summed as DECIMAL(38,6) — decimal addition is exact and
associative, so Spark's partition-parallel partial aggregation and DuckDB's
single-node aggregation produce bit-identical results; the final cast back
to double is a single deterministic rounding. This also holds at 100 TB:
decimal sums are Tungsten-native (no UDF), and partial aggregation
(map-side combine) still applies.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from quty_server_spark.sources.tables import load_table  # noqa: F401  (re-export)

DEC = "decimal(38,6)"


def dsum(col: str | Column) -> Column:
    """Exact-decimal sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: str | Column) -> Column:
    """Deterministic average: exact decimal sum / count, divided in double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def osum(expr: str) -> str:
    """DuckDB twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"


def oavg(expr: str) -> str:
    """DuckDB twin of :func:`davg`."""
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE) / COUNT({expr}))"


def ensure_checkpoint_dir(spark) -> None:
    """Set a session-scoped reliable-checkpoint dir if none is configured,
    removed at interpreter exit — shared by every BSP loop (dedup
    components, pagerank) so whichever runs first claims ONE cleaned-up
    dir instead of each module bootstrapping its own leak.

    checkpointDir is only readable via the JVM SparkContext (no public
    PySpark getter)."""
    if not spark.sparkContext._jsc.sc().getCheckpointDir().isDefined():
        import atexit
        import shutil
        import tempfile

        d = tempfile.mkdtemp(prefix="quty_ckpt_")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        spark.sparkContext.setCheckpointDir(d)
