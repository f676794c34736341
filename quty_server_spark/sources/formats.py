"""Source/sink format coverage: CSV, JSON, ORC, partitioned parquet.

The reference's only I/O is a WebSocket ingress/egress (SURVEY.md §2.B);
the driver-mandated surface (§2.C row 1–2) is file sources and sinks.
Each query here is a write→read round trip through a different format, so
both directions are oracle-checked against the original table.

Scale notes: every writer here produces splittable output (CSV/JSON are
line-delimited; ORC/parquet are block-columnar), so a 1000-executor read
parallelizes. Partitioned parquet is the layout that matters at 100 TB —
the partition column becomes directory structure, and a filter on it
prunes entire directories at planning time (visible as ``PartitionFilters``
in the scan node).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quty_server_spark.operators._helpers import load_table
from quty_server_spark.plans.registry import registry


def _workdir(sf_dir: str, name: str) -> str:
    path = os.path.join(
        tempfile.gettempdir(),
        "quty_formats",
        os.path.basename(sf_dir.rstrip("/")),
        name,
    )
    shutil.rmtree(path, ignore_errors=True)
    return path


@registry.query(
    "source_csv_roundtrip",
    oracle="SELECT * FROM customer",
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer → CSV (header) → read back with an explicit schema.
    Schema-on-read, not inference: at scale, inference is a second full
    scan."""
    out = _workdir(sf_dir, "csv")
    c = load_table(spark, sf_dir, "customer")
    c.write.option("header", "true").csv(out)
    return spark.read.schema(c.schema).option("header", "true").csv(out)


@registry.query(
    "source_json_roundtrip",
    oracle="SELECT * FROM part",
)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part → JSON lines → read back with explicit schema (line-delimited
    JSON stays splittable; multiline JSON would not be)."""
    out = _workdir(sf_dir, "json")
    p = load_table(spark, sf_dir, "part")
    p.write.json(out)
    return spark.read.schema(p.schema).json(out)


@registry.query(
    "source_orc_roundtrip",
    oracle="SELECT * FROM nation",
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation → ORC → read back (second columnar format besides parquet)."""
    out = _workdir(sf_dir, "orc")
    n = load_table(spark, sf_dir, "nation")
    n.write.orc(out)
    return spark.read.orc(out)


@registry.query(
    "sink_partitioned_parquet",
    oracle="""
    SELECT event_id, user_id, value, CAST(ts AS TIMESTAMP) AS ts, event_type
    FROM events WHERE event_type = 'click'
    """,
)
def sink_partitioned_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → parquet partitioned by event_type → read back one
    partition. The filter on the partition column prunes directories at
    planning time (PartitionFilters, zero data touched for other types) —
    the core 100 TB layout technique this engine assumes for fact tables."""
    out = _workdir(sf_dir, "part_parquet")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", "ts", "event_type"
    )
    ev.write.partitionBy("event_type").parquet(out)
    return spark.read.parquet(out).filter(F.col("event_type") == "click")
