"""Batch sources: canonical parquet tables.

The driver's fixture set (TESTDATA.md) is a TPC-H-ish star schema plus an
``events`` message stream, a ``documents`` corpus and an ``embeddings``
vector table. These loaders are the single place where schema quirks are
normalized so every downstream operator sees clean types:

- ``events.ts`` is parquet TIMESTAMP(NANOS); with
  ``spark.sql.legacy.parquet.nanosAsLong=true`` it scans as int64 ns and is
  converted here to a microsecond timestamp (truncation, matching DuckDB's
  ``ts::TIMESTAMP`` cast of a TIMESTAMP_NS value).
- naive (isAdjustedToUTC=false) parquet timestamps: ``configure()`` disables
  ``spark.sql.parquet.inferTimestampNTZ.enabled`` so they scan directly as
  session-tz TIMESTAMP (UTC-pinned — wall-clock values bit-exact with the
  oracle's naive reading) with NO cast above the scan, keeping ts/date
  filters pushed down to parquet. The NTZ→TIMESTAMP cast below is a
  defensive fallback for sessions where that conf could not be applied.

Scale note: loads are plain ``spark.read.parquet`` so Catalyst keeps
predicate pushdown / column pruning / partition pruning; do NOT cache or
materialize here — the 100 TB design point relies on scans staying lazy and
pruned per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quty_server_spark.session import configure

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# Footer-inferred schema per parquet path. A bare spark.read.parquet
# fires a (small) schema-inference Spark job on EVERY DataFrame
# construction; with the schema supplied the read is pure plan
# building — zero jobs (pinned for route_fanout in
# tests/test_pubsub_semantics.py). Keyed by path: the fixture files
# are immutable per path, and test-written corpora live under unique
# tmp dirs. Schemas are session-independent plain StructTypes.
_SCHEMA_CACHE: dict = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one canonical table, normalizing schema quirks."""
    configure(spark)
    path = f"{sf_dir}/{name}.parquet"
    schema = _SCHEMA_CACHE.get(path)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[path] = df.schema
    else:
        df = spark.read.schema(schema).parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # int64 nanoseconds -> microsecond timestamp. Integer division (DIV)
        # is mandatory: float division would round the ~1.7e18 ns epoch value
        # past double precision before truncating.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz:
        # Session tz is UTC, so this cast keeps wall-clock values bit-exact
        # with the DuckDB oracle's naive reading of the same parquet.
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return df


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register every canonical table as a temp view (for spark.sql use)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(prefix + name)
