"""Similarity search over the embeddings table (array<float>, dim 64).

Three tiers (SURVEY.md §2.C "LLM-pipeline"; BASELINE.json north star):

- brute-force cosine top-k: the exactness baseline — broadcast the query
  set, one partition-parallel scan of the corpus, per-query window top-k;
- threshold pair mining (embedding-cosine near-dup);
- sign-LSH (random hyperplane) bucketed ANN: the 100 TB path — queries
  only touch their own bucket, so the scan shrinks by ~2^n_planes; the
  hyperplanes are frozen ±1 literals so the DuckDB oracle reproduces
  bucket codes exactly.

Cosine scores are bit-identical between Spark's fold and DuckDB's list
functions (see functions/vectors.py), so rankings use exact values with
vec_id tiebreaks.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from quty_server_spark.functions.vectors import as_double, cosine, dot
from quty_server_spark.operators._helpers import load_table
from quty_server_spark.plans.registry import registry

DIM = 64
N_PLANES = 8
_rng = random.Random(42)
HYPERPLANES: list[list[int]] = [
    [_rng.choice((-1, 1)) for _ in range(DIM)] for _ in range(N_PLANES)
]

SQL_QUERY_SET = "(SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id % 20 = 0)"
SQL_CORPUS = "(SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)"


def _queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("query_id"), as_double(F.col("embedding")).alias("qv")
    )


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.select("vec_id", as_double(F.col("embedding")).alias("v"))


@registry.query(
    "sim_cosine_topk",
    oracle=f"""
    WITH q AS {SQL_QUERY_SET}, c AS {SQL_CORPUS},
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_cosine_similarity(q.v, c.v) AS cos_sim
        FROM q JOIN c ON q.vec_id <> c.vec_id)
    SELECT query_id, neighbor_id, cos_sim, rn
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, neighbor_id) AS rn FROM scored)
    WHERE rn <= 3
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-3 per query vector (every 20th vec_id).

    Plan: the small query set is broadcast against the corpus — one scan,
    no shuffle of the corpus; top-k is a per-query window (partial top-k
    per partition under AQE). This is the exact baseline the LSH variant
    approximates."""
    q = _queries(spark, sf_dir)
    c = _corpus(spark, sf_dir)
    scored = (
        c.join(broadcast(q), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qv"), F.col("v")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)


def all_pairs_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact O(n^2/2) pair scoring — UNREGISTERED ground-truth baseline.

    Kept only for pytest recall/exactness checks against the banded
    canonical queries below (tests/test_similarity_semantics.py); never
    part of the driver surface because an all-pairs BroadcastNestedLoopJoin
    is a cartesian at 100 TB."""
    c = _corpus(spark, sf_dir)
    a = c.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = c.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    return a.join(b, F.col("vec_a") < F.col("vec_b")).select(
        "vec_a", "vec_b", cosine(F.col("va"), F.col("vb")).alias("cos_sim")
    )


def _sql_plane_literal(plane: list[int]) -> str:
    return "[" + ", ".join(f"{x}.0" for x in plane) + "]"


_SQL_BUCKET = " + ".join(
    f"(CASE WHEN list_dot_product(v, {_sql_plane_literal(HYPERPLANES[j])}) > 0 "
    f"THEN {1 << j} ELSE 0 END)"
    for j in range(N_PLANES)
)


def _bucket_col() -> F.Column:
    bucket = None
    for j, plane in enumerate(HYPERPLANES):
        plane_col = F.array(*[F.lit(float(x)) for x in plane])
        term = F.when(dot(F.col("v"), plane_col) > 0, F.lit(1 << j)).otherwise(0)
        bucket = term if bucket is None else bucket + term
    return bucket


@registry.query(
    "sim_ann_lsh",
    oracle=f"""
    WITH c AS {SQL_CORPUS},
    bucketed AS (
        SELECT vec_id, v, {_SQL_BUCKET} AS bucket FROM c),
    q AS (SELECT * FROM bucketed WHERE vec_id % 20 = 0),
    scored AS (
        SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id, q.bucket,
               list_cosine_similarity(q.v, b.v) AS cos_sim
        FROM q JOIN bucketed b ON q.bucket = b.bucket AND q.vec_id <> b.vec_id)
    SELECT query_id, neighbor_id, bucket, cos_sim, rn
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, neighbor_id) AS rn FROM scored)
    WHERE rn <= 3
    """,
)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest neighbors via sign-LSH: 8 frozen ±1 hyperplanes
    → 256 buckets; queries score only against their own bucket, then
    window top-3. At scale the corpus is hash-partitioned by bucket, so a
    query touches ~1/256 of the data — this is the IVF-style recall/cost
    trade the brute-force baseline calibrates."""
    c = _corpus(spark, sf_dir).withColumn("bucket", _bucket_col())
    q = c.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    scored = (
        c.join(
            broadcast(q),
            (F.col("qbucket") == F.col("bucket")) & (F.col("query_id") != F.col("vec_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("bucket"),
            cosine(F.col("qv"), F.col("v")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)


@registry.query(
    "sim_ann_ivf",
    oracle=f"""
    WITH c AS {SQL_CORPUS},
    cent AS (SELECT vec_id AS cid, v AS cv FROM c WHERE vec_id % 50 = 7),
    assigned AS (
        SELECT vec_id, v, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                   ORDER BY list_cosine_similarity(v, cv) DESC, cid) AS arn
        FROM c CROSS JOIN cent),
    cells AS (SELECT vec_id, v, cid AS cell FROM assigned WHERE arn = 1),
    q AS (SELECT vec_id AS query_id, v AS qv, cell
          FROM cells WHERE vec_id % 20 = 0),
    scored AS (
        SELECT q.query_id, m.vec_id AS neighbor_id, q.cell,
               list_cosine_similarity(q.qv, m.v) AS cos_sim
        FROM q JOIN cells m ON q.cell = m.cell AND q.query_id <> m.vec_id)
    SELECT query_id, neighbor_id, cell, cos_sim, rn
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, neighbor_id) AS rn FROM scored)
    WHERE rn <= 3
    """,
)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: a deterministic coarse quantizer — every
    50th vector is a centroid (~sqrt(n) cells as n grows) — assigns each
    vector to its nearest centroid by cosine (argmax via per-vector
    window, centroid-id tiebreak); queries probe only their own cell
    (nprobe=1) and take window top-3. Complements sim_ann_lsh: data-
    dependent cells follow the corpus distribution where LSH's fixed
    hyperplanes don't. At scale the assignment is one broadcast pass
    (centroid set is small), the posting lists are hash-partitioned by
    cell, and a query's scan is |corpus|/n_cells."""
    c = _corpus(spark, sf_dir)
    cent = c.filter(F.col("vec_id") % 50 == 7).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    aw = Window.partitionBy("vec_id").orderBy(
        F.desc("cent_cos"), F.asc("cid")
    )
    cells = (
        c.join(broadcast(cent))
        .withColumn("cent_cos", cosine(F.col("v"), F.col("cv")))
        .withColumn("arn", F.row_number().over(aw))
        .filter(F.col("arn") == 1)
        .select("vec_id", "v", F.col("cid").alias("cell"))
    )
    q = cells.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("cell").alias("qcell"),
    )
    scored = (
        cells.join(
            broadcast(q),
            (F.col("qcell") == F.col("cell")) & (F.col("query_id") != F.col("vec_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "cell",
            cosine(F.col("qv"), F.col("v")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)


@registry.query(
    "embed_quantize_int8",
    oracle="""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    s AS (SELECT vec_id, v,
                 list_aggregate(list_transform(v, x -> abs(x)), 'max') / 127.0
                     AS scale
          FROM c)
    SELECT vec_id,
           CAST(FLOOR(scale * 1000000) AS BIGINT) AS scale_micro,
           list_transform(v, x -> CAST(FLOOR(x / scale + 0.5) AS INTEGER)) AS q8
    FROM s
    """,
)
def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column: per-vector
    scale = max|x|/127, values mapped by floor(x/scale + 0.5) (explicit
    half-up on both engines — ROUND differs between them at halves).
    This is the storage/throughput lever for ANN at 100 TB: 4x smaller
    vectors, SIMD-friendly int8 dot products, scale kept for dequantize.
    Scale is emitted as floor-micros so no float rounding is compared."""
    c = _corpus(spark, sf_dir)
    amax = F.array_max(F.transform(F.col("v"), lambda x: F.abs(x)))
    scale = amax / F.lit(127.0)
    q8 = F.transform(
        F.col("v"), lambda x: F.floor(x / F.col("scale") + F.lit(0.5)).cast("int")
    )
    return (
        c.withColumn("scale", scale)
        .select(
            "vec_id",
            F.floor(F.col("scale") * 1000000).cast("bigint").alias("scale_micro"),
            q8.alias("q8"),
        )
    )


@registry.query(
    "sim_label_cohesion",
    oracle=f"""
    WITH c AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.label,
           COUNT(*) AS n_pairs,
           CAST(SUM(CAST(ROUND(list_cosine_similarity(a.v, b.v), 6)
                         AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_cos
    FROM c a JOIN c b ON a.label = b.label AND a.vec_id < b.vec_id
    GROUP BY a.label
    """,
)
def sim_label_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped similarity check: average pairwise cosine within each label
    (rounded per-pair then decimal-summed so the aggregate is
    order-independent and engine-exact)."""
    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("ia"), "label", as_double(F.col("embedding")).alias("va"))
    b = e.select(
        F.col("vec_id").alias("ib"),
        F.col("label").alias("label_b"),
        as_double(F.col("embedding")).alias("vb"),
    )
    pairs = a.join(b, (F.col("label") == F.col("label_b")) & (F.col("ia") < F.col("ib")))
    return (
        pairs.select(
            "label", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_r")
        )
        .groupBy("label")
        .agg(
            F.count("*").alias("n_pairs"),
            (F.sum(F.col("cos_r").cast("decimal(38,6)")).cast("double") / F.count("*")).alias(
                "avg_cos"
            ),
        )
    )


DEDUP_COS_THRESHOLD = 0.35


@registry.query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH c AS {SQL_CORPUS},
    dropped AS (
        SELECT DISTINCT b.vec_id
        FROM c a JOIN c b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.v, b.v) >= {DEDUP_COS_THRESHOLD})
    SELECT e.vec_id, e.label
    FROM embeddings e
    WHERE e.vec_id NOT IN (SELECT vec_id FROM dropped)
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate REMOVAL (the decision operator on
    top of sim_cosine_pairs' mining): greedy keep-lowest-id — a vector is
    dropped when any lower-id vector sits within cosine >= 0.35; the
    survivor set is the deduplicated corpus handed to training. Pair
    scoring here is the exact O(n^2) baseline; at 100 TB the identical
    drop rule runs over LSH- or IVF-restricted candidate pairs
    (sim_ann_lsh / sim_ann_ivf buckets) so the quadratic never
    materializes — same semantics, pruned candidate generation."""
    c = _corpus(spark, sf_dir)
    a = c.select(F.col("vec_id").alias("a_id"), F.col("v").alias("va"))
    b = c.select(F.col("vec_id").alias("b_id"), F.col("v").alias("vb"))
    dropped = (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .filter(cosine(F.col("va"), F.col("vb")) >= DEDUP_COS_THRESHOLD)
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
    )
    e = load_table(spark, sf_dir, "embeddings")
    return e.join(dropped, "vec_id", "left_anti").select("vec_id", "label")
