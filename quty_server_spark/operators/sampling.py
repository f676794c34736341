"""Deterministic sampling & dataset-split operators.

A training-data pipeline needs reproducible sampling: the same document
must land in the same split on every run, on any cluster layout, with no
coordination. Random sampling (``df.sample``) cannot be oracle-checked
and is not layout-stable, so everything here derives from the content
key's md5 (functions/hashing.py pattern): hash-mod bucketing gives
Bernoulli sampling, per-label windows give stratified sampling, and
fixed hash ranges give train/val/test assignment. All JVM builtins.

At 100 TB: these are single scans with no shuffle (Bernoulli/split) or
one shuffle by the stratum key (stratified) — and because assignment is
content-keyed, incremental re-runs over grown corpora keep historical
rows in their original splits (no leakage when data is appended).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from quty_server_spark.functions.hashing import hash28, sql_hash28
from quty_server_spark.operators._helpers import load_table
from quty_server_spark.plans.registry import registry


@registry.query(
    "sample_bernoulli_hash",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {sql_hash28("'salt1|' || CAST(doc_id AS VARCHAR)")} % 100 < 10
    """,
)
def sample_bernoulli_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% Bernoulli sample, content-keyed: keep rows whose salted key
    hash falls in a fixed 10/100 band. Layout-independent, replayable,
    and a different salt gives an independent sample."""
    d = load_table(spark, sf_dir, "documents")
    key = F.concat(F.lit("salt1|"), F.col("doc_id").cast("string"))
    return d.filter(hash28(key) % 100 < 10).select("doc_id", "lang")


@registry.query(
    "sample_stratified_topk",
    oracle=f"""
    SELECT lang, doc_id, hrank
    FROM (SELECT lang, doc_id,
                 ROW_NUMBER() OVER (
                     PARTITION BY lang
                     ORDER BY {sql_hash28("'salt2|' || CAST(doc_id AS VARCHAR)")},
                              doc_id) AS hrank
          FROM documents)
    WHERE hrank <= 25
    """,
)
def sample_stratified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample: exactly 25 docs per language, chosen by hash
    order (deterministic shuffle within stratum). One shuffle on the
    stratum key; skewed strata cost only their own partition."""
    d = load_table(spark, sf_dir, "documents")
    key = F.concat(F.lit("salt2|"), F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy(hash28(key).asc(), F.col("doc_id").asc())
    return (
        d.select("lang", "doc_id", F.row_number().over(w).alias("hrank"))
        .filter(F.col("hrank") <= 25)
    )


@registry.query(
    "split_train_val_test",
    oracle=f"""
    SELECT CASE
             WHEN {sql_hash28("'split|' || CAST(doc_id AS VARCHAR)")} % 100 < 80 THEN 'train'
             WHEN {sql_hash28("'split|' || CAST(doc_id AS VARCHAR)")} % 100 < 90 THEN 'val'
             ELSE 'test'
           END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1
    """,
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment from fixed hash bands of the
    salted doc key. Content-keyed: appending new data never moves an old
    row across splits (no train/test leakage on incremental rebuilds)."""
    d = load_table(spark, sf_dir, "documents")
    band = hash28(F.concat(F.lit("split|"), F.col("doc_id").cast("string"))) % 100
    split = (
        F.when(band < 80, "train").when(band < 90, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


@registry.query(
    "sample_stratified_hash",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {sql_hash28("'salt4|' || CAST(doc_id AS VARCHAR)")} % 1000
          < CASE WHEN lang = 'en' THEN 50 ELSE 200 END
    """,
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-rebalancing Bernoulli sample — the training-mix op: the
    head language ('en') keeps 5 percent, every tail language 20
    percent, so the sampled mix flattens toward uniform. The rate is a
    literal CASE over the stratum column (no join, no shuffle — a pure
    narrow filter the parquet scan can evaluate), and membership is the
    same salted-hash band device as sample_bernoulli_hash:
    layout-independent, replayable, append-stable, independent of other
    salts. At 100 TB this is a full-scan filter with zero exchanges."""
    d = load_table(spark, sf_dir, "documents")
    key = F.concat(F.lit("salt4|"), F.col("doc_id").cast("string"))
    rate = F.when(F.col("lang") == "en", 50).otherwise(200)
    return d.filter(hash28(key) % 1000 < rate).select("doc_id", "lang")
