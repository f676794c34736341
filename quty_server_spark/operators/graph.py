"""Graph analytics over the relational fixtures.

The reference's cluster is itself a graph (nodes + mesh edges,
``lib/QutyCluster.js:49-51``); ``dedup_cluster`` already covers connected
components with a BSP label-propagation loop. This module adds the other
canonical iterative graph workload — PageRank — restated for cross-engine
exactness: **all arithmetic is integer** (rank carried in parts-per-billion,
contributions by integer division), so Spark's partition-parallel sums and
DuckDB's single-node sums agree bit-for-bit, with no float-associativity
slack. Damping is the standard 0.85 as the integer ratio 85/100.

Scale design: each iteration is one equality join (ranks ⋈ edges on the
source key) plus one aggregation by destination — the exact shape GraphX /
Pregel lowers to. Iterations are unrolled (fixed k=2) so the oracle is
plain SQL; the open-ended variant would reuse ``dedup_cluster``'s hardened
BSP loop (checkpoint every k supersteps, convergence via accumulator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quty_server_spark.operators._helpers import load_table
from quty_server_spark.operators.dedup import BROADCAST_NODES_MAX
from quty_server_spark.plans.registry import registry

PPB = 1_000_000_000  # rank unit: parts-per-billion
TELE = PPB - PPB * 85 // 100  # undamped teleport mass, precomputed (int32-safe)


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed purchase-flow edges customer → supplier (distinct), from
    orders ⋈ lineitem. Node ids are namespaced strings so the two key
    spaces cannot collide."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )


@registry.query(
    "graph_pagerank_2iter",
    oracle=f"""
    WITH edges AS (
        SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS src,
                        's:' || CAST(l_suppkey AS VARCHAR) AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    nodes AS (
        SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    n AS (SELECT COUNT(*) AS n_nodes FROM nodes),
    outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    r0 AS (
        SELECT node, CAST({PPB} // n_nodes AS BIGINT) AS r
        FROM nodes, n),
    c1 AS (
        SELECT e.dst AS node, SUM(r0.r // o.deg) AS contrib
        FROM edges e JOIN r0 ON e.src = r0.node
                     JOIN outdeg o ON e.src = o.src
        GROUP BY e.dst),
    r1 AS (
        SELECT nodes.node,
               CAST({TELE} // n_nodes
                    + 85 * COALESCE(c1.contrib, 0) // 100 AS BIGINT) AS r
        FROM nodes LEFT JOIN c1 ON nodes.node = c1.node, n),
    c2 AS (
        SELECT e.dst AS node, SUM(r1.r // o.deg) AS contrib
        FROM edges e JOIN r1 ON e.src = r1.node
                     JOIN outdeg o ON e.src = o.src
        GROUP BY e.dst),
    r2 AS (
        SELECT nodes.node,
               CAST({TELE} // n_nodes
                    + 85 * COALESCE(c2.contrib, 0) // 100 AS BIGINT) AS r
        FROM nodes LEFT JOIN c2 ON nodes.node = c2.node, n)
    SELECT node, r AS rank_ppb FROM r2 WHERE r > {PPB} // 1000
    """,
)
def graph_pagerank_2iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two unrolled PageRank iterations (damping 0.85) over the
    customer→supplier purchase graph, in pure integer ppb arithmetic.
    Suppliers are sinks (no out-edges): their mass leaks, which both
    engines state identically — the oracle is the same recurrence.
    Returns nodes above a 0.1% rank floor (suppliers, at fixture shape).

    Per iteration: broadcast-sized outdeg joins, one shuffle of edges by
    src for the contribution join, one aggregation by dst. At 100 TB the
    edge table shuffles ONCE per iteration (ranks are the small side and
    broadcast), matching the Pregel lowering; skewed in-degree hubs cost
    only their own aggregation partition because contributions pre-sum
    map-side."""
    # localCheckpoint, not cache(): both frames feed every superstep, but
    # CacheManager entries outlive the query and pin executor memory for
    # the whole session — localCheckpointed blocks are GC-cleanable once
    # the returned DataFrame is dropped (the repo-wide pattern for
    # multi-consumer intermediates).
    edges = _edges(spark, sf_dir).localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    teleport = (PPB - PPB * 85 // 100) // n_nodes

    # The rank/contrib/outdeg tables are all |nodes|-row. Below the
    # threshold they broadcast (edges stay in place, zero per-iteration
    # edge shuffle); at billion-node scale a broadcast build would OOM
    # the driver, so the shuffle (sort-merge) path engages — same gate
    # as dedup's BSP frontier (dedup.py BROADCAST_NODES_MAX), and the
    # n_nodes count needed for the teleport term pays for the decision.
    small = n_nodes <= BROADCAST_NODES_MAX
    side = F.broadcast if small else (lambda df: df)

    ranks = nodes.select("node", F.lit(PPB // n_nodes).cast("bigint").alias("r"))
    for _ in range(2):
        contrib = (
            edges.join(side(ranks), edges.src == ranks.node)
            .join(side(outdeg), "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("r div deg")).alias("contrib"))
        )
        ranks = (
            nodes.join(side(contrib), nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr("85 * coalesce(contrib, 0) div 100")
                )
                .cast("bigint")
                .alias("r"),
            )
        )
    return ranks.filter(F.col("r") > PPB // 1000).select(
        "node", F.col("r").alias("rank_ppb")
    )
