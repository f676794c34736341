"""Every registered oracle-checkable query must match DuckDB at sf0.001.

This is the same gate the driver applies at sf0.01 (row count + column
names + order-insensitive value multiset), run at the smallest SF so the
suite stays fast.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as se
from tests.conftest import SF_DIR
from tools.check_oracle import df_to_multiset

ALL = se.queries()
ORACLES = se.oracle_sql()


@pytest.mark.parametrize("name", sorted(ALL))
def test_query_matches_oracle(spark, ducks, name):
    sdf = ALL[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    if name not in ORACLES:
        assert srows is not None  # rows-only smoke: runs and collects
        return
    res = ducks.execute(ORACLES[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows)
    _, sm = df_to_multiset(list(sdf.columns), srows)
    _, om = df_to_multiset(ocols, orows)
    assert sm == om


def test_entry_smoke(spark):
    df = se.entry(spark)
    assert df.count() > 0
