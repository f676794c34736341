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
from tools.check_oracle import lint_oracle_types

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


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_emits_spark_types(con, name):
    assert lint_oracle_types(con, ORACLES[name]) == []
