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


def test_driver_priority_is_subset_of_registry():
    """Every rotated name must resolve — a typo'd DRIVER_PRIORITY entry
    would silently fall out of _rotated() and waste a driver-sample slot."""
    missing = [n for n in se.DRIVER_PRIORITY if n not in ALL]
    assert not missing, f"DRIVER_PRIORITY names not in registry: {missing}"


def test_rotation_front_loads_never_sampled_queries():
    """The driver samples the first ~50 registered queries; the rotation
    must spend that window on queries lacking driver verification —
    *when such debt exists*. The r07-era form asserted a fixed ">= 30
    never-sampled in the first 50", which fails the moment the rotation
    SUCCEEDS (the r07 driver run sampled the whole debt, so fresh==0).
    The correct invariant is debt-conditional: the head must front-load
    at least min(30, |debt|) unproven queries, where debt = registered
    ∖ cumulative-green ∖ no_oracle. With debt exhausted the window is
    free for staleness rotation (re-proving the oldest green rows), and
    the exact coverage invariant lives in test_rotation_debt.py."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arts = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r[0-9][0-9].json")))
    if not arts:
        pytest.skip("no prior driver artifacts in this checkout")
    green: set[str] = set()
    sampled: set[str] = set()
    for p in arts:
        with open(p) as f:
            for name, row in json.load(f).items():
                sampled.add(name)
                if row.get("hash_match"):
                    green.add(name)
    no_oracle = set(ALL) - set(ORACLES)
    debt = set(ALL) - green - no_oracle
    first50 = list(ALL)[:50]
    # Count head slots SPENT ON DEBT directly (r08 advice): debt includes
    # sampled-but-red queries, so "never sampled" undercounts — re-proving
    # a red query is exactly what the head is for and must count.
    spent = [n for n in first50 if n in debt]
    need = min(30, len(debt))
    assert len(spent) >= need, (
        f"only {len(spent)} of the first 50 registered queries address "
        f"verification debt but debt has {len(debt)} entries — "
        f"rotation drifted; debt={sorted(debt)}"
    )
