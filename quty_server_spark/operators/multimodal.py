"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a modality tag
and a metadata struct; decode / feature-extraction runs as Arrow-batched
pandas over ``mapInPandas`` — the Spark-side plumbing (schema, batch
iteration, partitioning) is real and oracle-tested. The actual codec calls
are STUBBED (no image/audio libraries in this container): see
:func:`decode_image` / :func:`decode_audio` which raise
``NotImplementedError``, and :func:`_fake_decode` — the deterministic
stand-in the queries use so results stay verifiable.

The binary payload is synthesized from ``documents.text`` (utf-8 bytes) —
the fixture set has no real media — so every byte-level feature has an
exact SQL twin (ascii text ⇒ byte i == ascii(char i)).

Scale: mapInPandas streams Arrow batches (default 10k rows) through one
Python worker per core; payload bytes never hit the driver. For real
media, partition by size-bucketed modality so one 4K video batch cannot
OOM a worker.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from quty_server_spark.operators._helpers import load_table
from quty_server_spark.plans.registry import registry

MODALITIES = ["image", "audio", "video"]


def decode_image(payload: bytes) -> dict:
    """STUB — real image decode (PIL/opencv) is unavailable in this
    container. The plumbing that would call it is real; swap this body
    for ``PIL.Image.open(io.BytesIO(payload))`` when the codec exists."""
    raise NotImplementedError("image codecs not available in this environment")


def decode_audio(payload: bytes) -> dict:
    """STUB — real audio decode (soundfile/librosa) is unavailable."""
    raise NotImplementedError("audio codecs not available in this environment")


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in decoder: derives 'media' features from raw
    bytes only, so the DuckDB oracle can replicate them exactly."""
    n = len(payload)
    first = payload[0] if n else 0
    checksum = sum(payload[:16]) % 256
    return {
        "n_bytes": n,
        "first_byte": first,
        "checksum16": checksum,
        "fake_width": n % 640 + 1,
        "fake_height": n % 480 + 1,
    }


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, modality, payload binary, meta struct)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(m) for m in MODALITIES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.col("lang").alias("container"),
            F.col("source").alias("origin"),
            F.col("n_chars").alias("declared_size"),
        ).alias("meta"),
    )


_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("first_byte", IntegerType()),
        StructField("checksum16", IntegerType()),
        StructField("fake_width", IntegerType()),
        StructField("fake_height", IntegerType()),
    ]
)


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batch in, feature batch out. Real decode
    would dispatch on modality to decode_image/decode_audio; here every
    modality goes through the deterministic fake decoder."""
    for pdf in batches:
        feats = [_fake_decode(bytes(p)) for p in pdf["payload"]]
        out = pd.DataFrame(feats)
        out.insert(0, "modality", pdf["modality"].values)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


@registry.query(
    "mm_decode_features",
    oracle="""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                           ELSE 'video' END AS modality,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS first_byte,
           CAST(list_sum(list_transform(range(1, LEAST(LENGTH(text), 16) + 1),
                i -> ascii(substr(text, i, 1)))) % 256 AS INTEGER) AS checksum16,
           CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS fake_width,
           CAST(octet_length(encode(text)) % 480 + 1 AS INTEGER) AS fake_height
    FROM documents
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary feature extraction through the real mapInPandas pipeline
    (Arrow batches, python worker, declared output schema); the codec call
    inside is the deterministic stub."""
    return media_table(spark, sf_dir).mapInPandas(
        _extract_features, schema=_FEATURE_SCHEMA
    )


@registry.query(
    "mm_resize_dims",
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               octet_length(encode(text)) % 640 + 1 AS w,
               octet_length(encode(text)) % 480 + 1 AS h
        FROM documents WHERE doc_id % 3 = 0)
    SELECT doc_id, w AS src_width, h AS src_height,
           CAST(FLOOR(224.0 * w / GREATEST(w, h)) AS INTEGER) AS dst_width,
           CAST(FLOOR(224.0 * h / GREATEST(w, h)) AS INTEGER) AS dst_height
    FROM dims
    """,
)
def mm_resize_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning for 'image' payloads: aspect-preserving fit into a
    224x224 budget (long side scaled to 224). The pixel resample itself
    would run inside the mapInPandas decode stub (operators above); the
    dimension arithmetic — the part a planner needs for batch sizing and
    memory budgeting at scale — is pure column math, oracle-checked."""
    feats = media_table(spark, sf_dir).filter(F.col("modality") == "image")
    n = F.octet_length("payload")
    w = (n % 640 + 1).cast("int")
    h = (n % 480 + 1).cast("int")
    longest = F.greatest(w, h)
    return feats.select(
        "doc_id",
        w.alias("src_width"),
        h.alias("src_height"),
        # floor, not round: 224*w/max hits exact halves, where Spark
        # (half-up) and DuckDB (banker's) disagree.
        F.floor(F.lit(224.0) * w / longest).cast("int").alias("dst_width"),
        F.floor(F.lit(224.0) * h / longest).cast("int").alias("dst_height"),
    )


@registry.query(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id,
           n_chars % 30 + 1 AS duration_s,
           CAST(f.frame_idx AS BIGINT) AS frame_idx,
           CAST((ascii(substr(text, 1, 1)) + 7 * f.frame_idx) % 256 AS INTEGER)
               AS frame_feature
    FROM documents, UNNEST(range(0, n_chars % 30 + 1)) AS f(frame_idx)
    WHERE doc_id % 3 = 2
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for 'video' payloads: fake duration from metadata,
    one row per sampled frame (1 fps), per-frame feature derived from the
    payload deterministically. Real frame extraction would be a
    mapInPandas over (payload, frame_idx) batches — the explode shape,
    which is the part that matters for partitioning, is identical."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 2)
    duration = (F.col("n_chars") % 30 + 1).cast("int")
    return (
        d.withColumn("duration_s", duration)
        .select(
            "doc_id",
            "duration_s",
            F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("duration_s").cast("bigint") - 1)).alias(
                "frame_idx"
            ),
            F.col("text"),
        )
        .select(
            "doc_id",
            F.col("duration_s").cast("bigint").alias("duration_s"),
            "frame_idx",
            ((F.ascii(F.substring("text", 1, 1)) + 7 * F.col("frame_idx")) % 256)
            .cast("int")
            .alias("frame_feature"),
        )
    )


CHUNK = 256  # bytes per audio chunk (stands in for a fixed sample window)


@registry.query(
    "mm_audio_chunks",
    oracle=f"""
    WITH a AS (SELECT doc_id, text, n_chars FROM documents
               WHERE doc_id % 3 = 1 AND n_chars >= {CHUNK}),
    idx AS (SELECT doc_id, text,
                   unnest(range(0, CAST(ceil(n_chars / {CHUNK}.0) AS BIGINT)))
                       AS chunk_idx
            FROM a)
    SELECT doc_id, chunk_idx,
           LENGTH(substring(text, CAST(chunk_idx * {CHUNK} + 1 AS INT), {CHUNK}))
               AS chunk_len,
           md5(substring(text, CAST(chunk_idx * {CHUNK} + 1 AS INT), {CHUNK}))
               AS chunk_md5
    FROM idx
    """,
)
def mm_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window chunking of 'audio' binary payloads (doc_id % 3 == 1
    is the audio modality slice of media_table): each payload is split
    into 256-byte windows — the shape of sample-frame extraction before a
    feature UDF — emitting per-chunk length and content hash. Pure
    JVM-side byte slicing: explode(sequence) × substring on the binary
    column, no Python; one row per chunk keeps batches bounded no matter
    how long one recording is (a 10 GB audio file becomes 40M rows, not
    one 10 GB cell per operator). The oracle mirrors the slicing on the
    source text (payload bytes ARE the utf-8 text, ascii ⇒ 1 byte/char)."""
    d = load_table(spark, sf_dir, "documents")
    a = d.filter((F.col("doc_id") % 3 == 1) & (F.col("n_chars") >= CHUNK)).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    n_chunks = F.ceil(F.octet_length("payload") / float(CHUNK)).cast("bigint")
    chunk = F.expr(f"substring(payload, CAST(chunk_idx * {CHUNK} + 1 AS INT), {CHUNK})")
    return (
        a.withColumn("chunk_idx", F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)))
        .select(
            "doc_id",
            "chunk_idx",
            F.octet_length(chunk).alias("chunk_len"),
            F.md5(chunk).alias("chunk_md5"),
        )
    )


@registry.query(
    "mm_modality_mix",
    oracle="""
    WITH media AS (
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                               ELSE 'video' END AS modality,
               octet_length(encode(text)) AS n_bytes,
               lang AS container
        FROM documents)
    SELECT modality,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(SUM(n_bytes) // COUNT(*) AS BIGINT) AS avg_bytes,
           CAST(MAX(n_bytes) AS BIGINT) AS max_bytes,
           CAST(COUNT(DISTINCT container) AS BIGINT) AS n_containers
    FROM media GROUP BY modality
    """,
)
def mm_modality_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media-corpus composition report: per modality, item count, byte
    volume, average/max payload size, and container variety — the
    numbers that size a multimodal ingest (which decode pool gets how
    many workers, what Arrow batch size keeps the biggest payload from
    OOMing a python worker, whether one modality dominates storage).
    Computed from the typed metadata + payload length only: no decode,
    so it runs at catalog speed even when the codecs are the env-gated
    stubs. Integer floor-division average.

    Scale: one narrow scan, 3-row group-by; octet_length is computed
    executor-side without materializing payload copies."""
    m = media_table(spark, sf_dir)
    return (
        m.select(
            "modality",
            F.octet_length("payload").alias("n_bytes"),
            F.col("meta.container").alias("container"),
        )
        .groupBy("modality")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
            F.expr("CAST(sum(n_bytes) div count(*) AS BIGINT)").alias(
                "avg_bytes"
            ),
            F.max("n_bytes").cast("bigint").alias("max_bytes"),
            F.countDistinct("container").cast("bigint").alias("n_containers"),
        )
    )


@registry.query(
    "mm_payload_dedup",
    oracle="""
    WITH media AS (
        SELECT doc_id,
               ['image','audio','video'][(doc_id % 3 + 1)::INT] AS modality,
               text AS payload_text
        FROM documents
        UNION ALL
        SELECT doc_id + 3000000 AS doc_id,
               ['image','audio','video'][((doc_id + 1) % 3 + 1)::INT]
                   AS modality,
               text AS payload_text
        FROM documents WHERE doc_id % 9 = 0
    )
    SELECT md5(payload_text) AS payload_md5,
           MIN(doc_id) AS keeper_doc_id,
           COUNT(*) AS n_copies,
           COUNT(DISTINCT modality) AS n_modalities
    FROM media
    GROUP BY 1
    HAVING COUNT(*) > 1
    """,
)
def mm_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact MEDIA dedup — the dedup family extended to the multimodal
    binary column: group items by the md5 of their raw payload bytes
    (codec-free, so it works on media the container cannot decode),
    keep the lowest id, and report each collapsed group's copy count
    and DISTINCT MODALITY count — n_modalities > 1 is the
    cross-modality duplicate (the same bytes filed under two container
    tags), a mislabeling QA catch no text-side dedup can see. The
    fixture stages a deterministic byte-identical twin for every ninth
    item under a SHIFTED modality tag (id + 3,000,000), so the
    cross-modality case is always exercised; the synthesized payload is
    the document's utf-8 bytes, making the byte-level digest exactly
    reproducible in SQL.

    Scale: identical to dedup_exact — the digest is computed scan-side
    (JVM md5 over the binary column; payload bytes never leave the
    executor), the shuffle key is the 32-char digest, and partial
    aggregation collapses copies map-side. For real media this is the
    first pass before perceptual hashing, at pennies per petabyte."""
    base = media_table(spark, sf_dir).select("doc_id", "modality", "payload")
    twins_src = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 9 == 0
    )
    twins = twins_src.select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.element_at(
            F.array(*[F.lit(m) for m in MODALITIES]),
            ((F.col("doc_id") + 1) % 3 + 1).cast("int"),
        ).alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
    )
    media = base.unionByName(twins)
    return (
        media.groupBy(F.md5("payload").alias("payload_md5"))
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count("*").alias("n_copies"),
            F.countDistinct("modality").alias("n_modalities"),
        )
        .filter(F.col("n_copies") > 1)
    )
