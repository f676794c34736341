"""Benchmark/probe tooling must reference real registry names — a typo'd
HEADLINE entry silently drops out of the driver-visible bench (`names =
[n for n in HEADLINE if n in qs]`), shrinking coverage without failing."""

from __future__ import annotations

import __spark_entry__ as se
import bench
from tools.scaling_probe import DEFAULT as PROBE_DEFAULT


def test_headline_names_are_registered():
    qs = se.queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, f"bench.HEADLINE names not in registry: {missing}"


def test_probe_default_names_are_registered():
    qs = se.queries()
    missing = [n for n in PROBE_DEFAULT if n not in qs]
    assert not missing, f"scaling_probe DEFAULT not in registry: {missing}"
