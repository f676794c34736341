"""Rotation-debt guard: the driver samples only the first ~50 registered
queries each round, so any query that (a) has no hash-green row in the
cumulative CORRECTNESS_r* record and (b) is not in the current head will
NEVER acquire driver verification — silent debt. This sweep makes that
state a test failure: every unproven query must sit inside the head, and
the head must fit the driver's sample window.

The driver's sample size has been 50 in every round so far
(CORRECTNESS_r01..r06 each contain 50 rows).
"""

from __future__ import annotations

import glob
import json
import os

import __spark_entry__ as se

DRIVER_SAMPLE = 50
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cumulative_green() -> set[str]:
    green: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r[0-9][0-9].json")):
        with open(path) as f:
            for name, row in json.load(f).items():
                if row.get("hash_match"):
                    green.add(name)
    return green


def test_every_unproven_query_is_in_the_driver_head():
    queries = set(se.queries())
    green = _cumulative_green()
    # rows-only-by-design queries can never be hash-green; they are
    # covered by the weaker rows-only driver check instead.
    no_oracle = queries - set(se.oracle_sql())
    debt = queries - green - no_oracle
    head = set(se.DRIVER_PRIORITY[:DRIVER_SAMPLE])
    uncovered = sorted(debt - head)
    assert not uncovered, (
        f"{len(uncovered)} queries have no cumulative driver-green row and "
        f"are outside the rotation head — they can never be verified: "
        f"{uncovered}"
    )


def test_head_fits_driver_sample_window():
    assert len(se.DRIVER_PRIORITY) <= DRIVER_SAMPLE, (
        "DRIVER_PRIORITY longer than the driver's sample — tail entries "
        "would silently not be sampled"
    )


def test_head_names_are_registered():
    unknown = [n for n in se.DRIVER_PRIORITY if n not in se.queries()]
    assert not unknown, f"DRIVER_PRIORITY names not in registry: {unknown}"
