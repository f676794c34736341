"""Oracle type-lint: no registered oracle may output a DuckDB type that
Spark cannot emit.

Round-3 post-mortem: three driver hash-reds (`flagship_delivery_report`,
`scalar_json`, `scalar_higher_order`) were caused by DuckDB promoting
SUM(BIGINT) / list_aggregate(..., 'sum') to HUGEINT (int128). The local
value-compare (`fetchall()` -> Python int) is representation-insensitive,
so those queries passed locally for three rounds while failing the
driver's comparator. This sweep closes that false-green mode structurally:
every oracle is bound lazily on DuckDB and its output types are checked
against the Spark-emittable set BEFORE any value comparison can mask a
representation mismatch.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as se
from tests.conftest import SF_DIR
from tools.check_oracle import lint_ns_range, lint_oracle_types

ORACLES = se.oracle_sql()


@pytest.fixture(scope="module")
def con():
    from quty_server_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def test_lint_is_red_on_hugeint(con):
    """The lint itself must catch the exact round-3 failure shapes."""
    bad = lint_oracle_types(con, "SELECT SUM(CAST(1 AS BIGINT)) AS s")
    assert bad == ["s: HUGEINT"]
    bad = lint_oracle_types(
        con, "SELECT list_aggregate([1, 2]::BIGINT[], 'sum') AS s"
    )
    assert bad and "HUGEINT" in bad[0]


def test_lint_is_green_on_cast(con):
    assert lint_oracle_types(
        con, "SELECT CAST(SUM(CAST(1 AS BIGINT)) AS BIGINT) AS s"
    ) == []


def test_lint_is_red_on_complex_output(con):
    """Round-6 failure shape: array-typed output columns break the
    driver's pandas canonicalizer (unhashable numpy.ndarray)."""
    bad = lint_oracle_types(con, "SELECT [1, 2, 3] AS fp")
    assert bad and "complex output" in bad[0]
    bad = lint_oracle_types(con, "SELECT {'a': 1} AS st")
    assert bad and "complex output" in bad[0]
    # stringified form is the sanctioned encoding
    assert lint_oracle_types(
        con, "SELECT array_to_string([1, 2, 3], ',') AS fp"
    ) == []


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_emits_spark_types(con, name):
    assert lint_oracle_types(con, ORACLES[name]) == []


# ---------------------------------------------------------------------------
# Value-domain representability (round-4 post-mortem). The driver's
# comparator converts both sides to pandas; Arrow's timestamp[us] ->
# timestamp[ns] cast raises ArrowInvalid on any datetime outside
# [1677-09-22, 2262-04-11] — which killed `sink_scd2_history`'s
# 9999-12-31 open-row sentinel even though Spark and DuckDB agreed on
# the value. lint_ns_range in tools/check_oracle.py scans BOTH sides'
# result cells at gate time so the class is structurally dead.
# ---------------------------------------------------------------------------


def test_ns_range_lint_is_red_on_9999_sentinel(con):
    """The lint must catch the exact round-4 failure value."""
    rows = con.execute("SELECT TIMESTAMP '9999-12-31' AS valid_to").fetchall()
    bad = lint_ns_range(["valid_to"], rows)
    assert bad and bad[0].startswith("valid_to:")
    # and the date flavor of the same overflow
    rows = con.execute("SELECT DATE '9999-12-31' AS d").fetchall()
    assert lint_ns_range(["d"], rows)


def test_ns_range_lint_is_green_on_in_range_sentinel(con):
    rows = con.execute(
        "SELECT TIMESTAMP '2261-12-31' AS valid_to, TIMESTAMP '1992-01-01' AS valid_from"
    ).fetchall()
    assert lint_ns_range(["valid_to", "valid_from"], rows) == []


def test_scd2_oracle_values_are_ns_representable(con):
    """Run the actual scd2 oracle at test SF and assert every timestamp
    cell survives a pandas-ns conversion — the driver-comparator contract."""
    res = con.execute(ORACLES["sink_scd2_history"])
    cols = [d[0] for d in res.description]
    assert lint_ns_range(cols, res.fetchall()) == []
