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
    must spend that window on queries lacking driver verification. The
    r06-era form of this test (">= 40 of the first 50 absent from
    r01-r05") assumed debt larger than the window; from round 7 the debt
    is smaller, so the exact invariant lives in test_rotation_debt.py
    (head ⊇ registered ∖ cumulative-green, vs ALL prior artifacts).
    Here: every name the head spends a slot on is either unproven,
    changed-this-round, new-this-round, or an explicit canary — i.e.
    the window is never silently wasted re-sampling old green surface
    beyond the declared canaries."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arts = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r[0-9][0-9].json")))
    if not arts:
        pytest.skip("no prior driver artifacts in this checkout")
    sampled: set[str] = set()
    for p in arts:
        sampled |= set(json.load(open(p)))
    first50 = list(ALL)[:50]
    fresh = [n for n in first50 if n not in sampled]
    # 33 = 21 never-sampled (r01-r06) + 2 never-green array fixes + 10
    # new round-7 queries; the rest of the head re-proves changed code
    # and canaries. Drops below 30 only if the rotation drifted back to
    # the green surface.
    assert len(fresh) >= 30, (
        f"only {len(fresh)} of the first 50 registered queries are "
        f"never-driver-sampled — rotation drifted; first50={first50}"
    )
