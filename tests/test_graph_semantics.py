"""Semantics of the iterative graph operators on known graphs.

The fixture purchase graph is bipartite, so the registered
graph_pagerank_converged stops at exactly 3 supersteps; these tests also
drive the convergence loop on a NON-bipartite graph (where it takes
materially more iterations) and check the result against an independent
pure-Python evaluation of the same integer recurrence — proving the
distributed loop, not just the fixture's degenerate shape.
"""

from __future__ import annotations

from quty_server_spark.operators.graph import (
    PPB,
    TELE,
    butterfly_census,
    pagerank_converged,
)
from tests.conftest import SF_DIR


def _python_pagerank(edges: list[tuple[str, str]]) -> tuple[dict[str, int], int]:
    """Independent single-threaded evaluation of the exact integer
    recurrence: iterate until the integer rank vector repeats."""
    nodes = sorted({n for e in edges for n in e})
    n = len(nodes)
    outdeg: dict[str, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    ranks = {v: PPB // n for v in nodes}
    rounds = 0
    for i in range(1, 21):
        contrib: dict[str, int] = {}
        for s, d in edges:
            contrib[d] = contrib.get(d, 0) + ranks[s] // outdeg[s]
        new = {v: TELE // n + 85 * contrib.get(v, 0) // 100 for v in nodes}
        delta = sum(abs(new[v] - ranks[v]) for v in nodes)
        ranks, rounds = new, i
        if delta == 0:
            break
    return ranks, rounds


def test_converged_pagerank_matches_python_on_cyclic_graph(spark):
    # Non-bipartite, asymmetric: a 3-cycle with one chord. Integer
    # truncation quantizes the geometric decay, so the vector repeats
    # exactly after several (not 3) iterations.
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    want, want_rounds = _python_pagerank(edges)
    assert want_rounds > 3  # genuinely more work than the bipartite case

    df = spark.createDataFrame(edges, ["src", "dst"])
    ranks, rounds = pagerank_converged(spark, df)
    got = {r.node: r.r for r in ranks.collect()}
    assert got == want
    assert rounds == want_rounds


def test_fixture_bipartite_graph_converges_at_three(spark):
    from quty_server_spark.operators.graph import _edges

    _, rounds = pagerank_converged(spark, _edges(spark, SF_DIR))
    assert rounds == 3  # the iteration count the oracle pins


def test_converged_respects_max_rounds_guard(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    _, rounds = pagerank_converged(spark, df, max_rounds=2)
    assert rounds == 2  # stopped by the bound, not by convergence


def test_butterfly_census_known_graph(spark):
    # c1,c2 both buy s1,s2 (one butterfly); c3 buys s1 only.
    edges = [
        ("c1", "s1"),
        ("c1", "s2"),
        ("c2", "s1"),
        ("c2", "s2"),
        ("c3", "s1"),
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    row = butterfly_census(df).collect()[0]
    assert row.co_pairs == 1  # (s1, s2) is the only co-purchased pair
    assert row.wedges == 2  # via c1 and via c2
    assert row.butterflies == 1  # C(2, 2)


def test_butterfly_census_no_duplicate_edges_inflation(spark):
    # The registered query deduplicates edges; the census itself must
    # count a repeated (c, s1)-(c, s2) wedge once per distinct edge set.
    edges = [("c1", "s1"), ("c1", "s2")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    row = butterfly_census(df).collect()[0]
    assert row.co_pairs == 1 and row.wedges == 1 and row.butterflies == 0


def test_butterfly_degree_cap_drops_hub_vertices(spark):
    # A hub customer of degree cap+1 would contribute C(cap+1, 2) wedge
    # rows; the cap must remove it from the candidate universe entirely
    # while low-degree customers keep contributing.
    from quty_server_spark.operators.graph import WEDGE_DEGREE_CAP

    hub = [("hub", f"s{i}") for i in range(WEDGE_DEGREE_CAP + 1)]
    ok = [("c1", "s0"), ("c1", "s1"), ("c2", "s0"), ("c2", "s1")]
    df = spark.createDataFrame(hub + ok, ["src", "dst"])
    row = butterfly_census(df).collect()[0]
    # only c1/c2 survive: one co-pair, two wedges, one butterfly
    assert row.co_pairs == 1 and row.wedges == 2 and row.butterflies == 1


def test_butterfly_degree_cap_vacuous_at_cap(spark):
    # Degree exactly == cap is kept: the cap drops strictly-above only,
    # so at fixture scale the census is the exact census of sub-hub nodes.
    from quty_server_spark.operators.graph import WEDGE_DEGREE_CAP

    edges = [("c1", f"s{i}") for i in range(WEDGE_DEGREE_CAP)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    row = butterfly_census(df).collect()[0]
    n = WEDGE_DEGREE_CAP
    assert row.co_pairs == n * (n - 1) // 2
    assert row.wedges == n * (n - 1) // 2
