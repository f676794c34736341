"""Fixture-drift sentinel.

The driver regenerates /root/testdata per round and physical types have
drifted before (round 3 -> 4 silently flipped events.ts from
TIMESTAMP(NANOS) to timestamp[us]; load_table keeps a fallback for both).
These tests fail LOUDLY at round start if a fixture's physical parquet
type leaves the set the loaders (sources/tables.py, streaming
EVENTS_FIXTURE_SCHEMA) are written to handle — so drift surfaces as one
named assertion instead of 160 mysterious hash mismatches.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from quty_server_spark.sources.tables import TABLES, load_table
from tests.conftest import SF_DIR

# Physical ts representations load_table()/events_stream() handle:
# int64 (legacy NANOS scanned via nanosAsLong) or native us/ns timestamps
# (naive ones scan as session-tz TIMESTAMP with NTZ inference off).
HANDLED_TS_TYPES = {"int64", "timestamp[us]", "timestamp[ns]"}


def _schema(name: str):
    return {f.name: str(f.type) for f in pq.read_schema(f"{SF_DIR}/{name}.parquet")}


def test_events_ts_physical_type_is_handled():
    s = _schema("events")
    assert s["ts"] in HANDLED_TS_TYPES, (
        f"events.ts drifted to physical type {s['ts']!r} — not in the set "
        f"load_table()/EVENTS_FIXTURE_SCHEMA handle ({sorted(HANDLED_TS_TYPES)}); "
        f"update sources/tables.py + streaming EVENTS_FIXTURE_SCHEMA together"
    )
    assert s["event_id"] == "int64" and s["value"] == "double"
    assert s["event_type"] == "string" and s["props"] == "string"


@pytest.mark.parametrize("name,col", [("orders", "o_orderdate"), ("lineitem", "l_shipdate")])
def test_date_columns_physical_type_is_handled(name, col):
    assert _schema(name)[col] in HANDLED_TS_TYPES | {"date32[day]"}


def test_embeddings_vector_column_shape():
    s = _schema("embeddings")
    assert s["embedding"] in (
        "list<element: float>",
        "list<element: double>",
    ), f"embeddings.embedding drifted to {s['embedding']!r}"
    assert s["vec_id"] == "int64"


def test_documents_corpus_columns():
    s = _schema("documents")
    for col in ("doc_id", "text", "lang", "source"):
        assert col in s, f"documents.{col} missing — corpus fixture drifted"
    assert s["text"] == "string"


def test_all_tables_exist_and_load_normalized(spark):
    """Every canonical table loads, and events.ts normalizes to a plain
    session-tz TIMESTAMP regardless of which physical flavor the fixture
    carries — the single invariant every downstream operator assumes."""
    for name in TABLES:
        df = load_table(spark, SF_DIR, name)
        assert df.columns, name
        dtypes = dict(df.dtypes)
        assert "timestamp_ntz" not in dtypes.values(), (name, dtypes)
    ev = dict(load_table(spark, SF_DIR, "events").dtypes)
    assert ev["ts"] == "timestamp", ev


def test_schema_cache_invalidates_on_rewrite(spark):
    """The footer-schema cache is keyed by (path, mtime) so a path
    REWRITTEN with a different schema re-infers instead of silently
    scanning with the stale schema (r11 ADVICE: the bare-path key
    yielded nulls/mis-typed columns after a rewrite)."""
    import os
    import shutil
    import tempfile
    import time

    d = tempfile.mkdtemp(prefix="schema_cache_test_")
    try:
        sf = d  # load_table reads f"{sf_dir}/{name}.parquet"
        p = os.path.join(sf, "documents.parquet")
        spark.range(3).selectExpr(
            "id AS doc_id", "CAST(id AS STRING) AS text"
        ).coalesce(1).write.mode("overwrite").parquet(p)
        first = dict(load_table(spark, sf, "documents").dtypes)
        assert first["text"] == "string"
        time.sleep(1.05)  # ensure a distinct directory mtime tick
        spark.range(3).selectExpr(
            "id AS doc_id", "id AS text"
        ).coalesce(1).write.mode("overwrite").parquet(p)
        second = dict(load_table(spark, sf, "documents").dtypes)
        assert second["text"] == "bigint", (
            "stale cached schema served after rewrite"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize(
    "sf_dir",
    ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"],
)
def test_documents_text_is_ascii_only(sf_dir):
    """The media-family oracles index per-CHARACTER ascii() lists with
    BYTE offsets (multimodal.py's fake-decode convention: ascii text ⇒
    byte i == ascii(char i)), and the Spark side hashes raw UTF-8
    bytes — the two agree only while documents.text stays pure ASCII.
    The r15 ADVICE asked for this to break LOUDLY instead of silently
    mis-slicing signature regions if the fixture ever grows a
    multi-byte character: for valid UTF-8, octet_length == char length
    iff every character is single-byte."""
    import os

    import duckdb

    path = f"{sf_dir}/documents.parquet"
    if not os.path.exists(path):
        pytest.skip(f"fixture {path} absent this round")
    n = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{path}') "
        "WHERE octet_length(encode(text)) <> length(text)"
    ).fetchone()[0]
    assert n == 0, (
        f"{n} non-ASCII documents in {path} — the media oracles' "
        "byte-offset-into-ascii()-list convention no longer holds; "
        "derive region offsets from a byte decode on BOTH sides "
        "(multimodal._percep_region_sql) before trusting media hashes"
    )
