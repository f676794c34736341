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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from quty_server_spark.sources.tables import load_table  # noqa: F401  (re-export)

DEC = "decimal(38,6)"


def spread_probe(spark: SparkSession, df: DataFrame, *cols: str) -> DataFrame:
    """Fan a small probe-side plan out to the core count (r17, guide
    §2.5/§2.6): the fixture parquet files are ONE row group each, so
    their scan is a single partition and everything below the query's
    first exchange runs on one core. For plans whose downstream per-row
    work dwarfs the scan decode — candidate-pair cosine scoring, the
    10M-row fan-out join — a deterministic hash repartition on ``cols``
    (thousands of distinct values over ``defaultParallelism`` partitions,
    the 20-100x headroom rule) parallelizes that work. Scale-safe by the
    gate, not by luck: when the scan already has >= core-count partitions
    (any production-sized input) this is a NO-OP — no exchange is added,
    so the at-scale plan is untouched and payloads are never re-shuffled.

    Deliberately NOT applied wholesale (e.g. in load_table): an
    interleaved A/B measured the blanket form REGRESSING every query
    whose per-row work is comparable to the parquet decode (the decode
    stays serial either way, and the extra exchange + 32-task stage
    costs more than it buys — events_time_rollup 2.0x, text_pmi 1.8x).
    Apply it only where measurement shows the downstream work dominates.
    The partition-count probe is pure physical planning — no Spark job
    (the zero-jobs construction pins in tests stay green)."""
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par, *[F.col(c) for c in cols])


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
