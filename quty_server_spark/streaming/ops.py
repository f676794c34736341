"""Structured Streaming equivalents of the engine's operators.

The reference is an always-on message router; its Spark-first restatement
is Structured Streaming (SURVEY.md §7 Phase 3): sources → watermarked
event-time windows / stateful subscription fold / stream-static routing
joins → sinks.

Verification strategy (SURVEY.md §5): every streaming query here runs the
real streaming machinery — ``readStream`` file source, watermarks,
``trigger(availableNow=True)``, memory or foreachBatch sink — then returns
the materialized result as a batch DataFrame so the driver's DuckDB oracle
can check it exactly like any batch query. With availableNow over one
input file the stream processes everything in one micro-batch, so
watermarks drop nothing and results are deterministic; the explicit
late-data query (stream_watermark_late_drop) constructs a two-batch file
sequence so the watermark *does* drop rows, deterministically.

Scale: these are the operators that survive on an unbounded 100 TB/day
feed — windowed aggs with watermark-bounded state, dropDuplicates keyed by
event id, broadcast stream-static joins, and an applyInPandasWithState
subscription fold whose per-key state is the live membership set.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile
from concurrent.futures import ThreadPoolExecutor
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from quty_server_spark.operators import pubsub
from quty_server_spark.operators.dedup import (
    SQL_DUPED,
    SQL_FULL_LABELS_SUMMARY_TMPL,
    SQL_INCREMENTAL_GATE,
    SQL_MINHASH_GATE,
    SQL_PASSAGE_GATE,
    SQL_SIMHASH,
    duped_corpus,
)
from quty_server_spark.operators._helpers import load_table
from quty_server_spark.operators.similarity import SQL_EMB_GATE
from quty_server_spark.plans.registry import registry
from quty_server_spark.session import configure, session_tmp_dir

EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # internal staged files carry int64 ns
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

# The driver fixture stores ``ts`` as naive parquet timestamp[us]
# (isAdjustedToUTC=false). configure() disables TIMESTAMP_NTZ inference,
# so under the pinned-UTC session it scans directly as TIMESTAMP with
# wall-clock values bit-exact to the DuckDB oracle — the streaming mirror
# of the load_table() normalization, with no cast above the scan.
EVENTS_FIXTURE_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming read of the events table (file source, explicit schema),
    normalizing the naive fixture timestamp to a session-tz event time."""
    configure(spark)
    # The fixture is a single FILE; FileStreamSource injects a basePath
    # option for non-glob paths and basePath must be a directory, so a
    # trailing glob char keeps the source on the plain-listing path.
    return (
        spark.readStream.schema(EVENTS_FIXTURE_SCHEMA)
        .parquet(f"{sf_dir}/events.parquet*")
    )


def run_to_memory(df: DataFrame, name: str, output_mode: str) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into a memory
    sink and return the materialized table."""
    spark = df.sparkSession
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def run_to_parquet(df: DataFrame, name: str, sf_dir: str) -> DataFrame:
    """Run an APPEND-mode streaming DataFrame to completion (availableNow)
    into a parquet file sink under the session scratch dir and return the
    read-back frame — the large-output twin of :func:`run_to_memory`
    (r17, guide §5 "the driver should do almost no data work"): a memory
    sink serializes EVERY result row through the driver single-threaded,
    which for a fan-out-shaped stream (10.3 M rows at sf0.1) cost ~90 s
    of pure driver ingest; the file sink keeps rows executor-side and
    the returned scan is a parallel parquet read. Rows are identical —
    the sink only changes WHERE the materialization lives. Fresh dirs
    per call, so every invocation re-runs the stream from the source
    exactly like the memory sink (no cross-run reuse)."""
    import shutil

    from quty_server_spark.session import session_tmp_dir

    spark = df.sparkSession
    root = os.path.join(session_tmp_dir(spark, "stream_sink", sf_dir), name)
    shutil.rmtree(root, ignore_errors=True)
    out, ckpt = os.path.join(root, "data"), os.path.join(root, "ckpt")
    q = (
        df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.schema(df.schema).parquet(out)


# ---------------------------------------------------------------------------
# Event-time windows + watermarks
# ---------------------------------------------------------------------------


@registry.query(
    "stream_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling 1-hour window aggregation on the event stream.
    State is bounded by the watermark (1h lag): closed windows are evicted
    — the unbounded-feed survival property."""
    s = events_stream(spark, sf_dir)
    agg = (
        s.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(F.col("w.start").alias("hour_start"), "event_type", "n", "total_value")
    )
    return run_to_memory(agg, "mem_tumbling", "complete")


@registry.query(
    "stream_sliding_window",
    oracle="""
    WITH contrib AS (
        SELECT e.*, date_trunc('hour', CAST(ts AS TIMESTAMP))
                    - to_hours(b.back) AS win_start
        FROM events e, UNNEST(range(0, 2)) AS b(back))
    SELECT win_start, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM contrib GROUP BY win_start
    """,
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (2h length, 1h slide): each event lands in exactly 2
    overlapping windows; the oracle replicates via the two contributing
    window starts per event."""
    s = events_stream(spark, sf_dir)
    agg = (
        s.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(F.col("w.start").alias("win_start"), "n", "total_value")
    )
    return run_to_memory(agg, "mem_sliding", "complete")


@registry.query(
    "stream_session_window",
    oracle="""
    WITH ordered AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN CAST(ts AS TIMESTAMP)
                         - LAG(CAST(ts AS TIMESTAMP))
                           OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
                         >= INTERVAL 30 MINUTE
                    OR LAG(CAST(ts AS TIMESTAMP))
                       OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events),
    numbered AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_no
        FROM ordered)
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, session_no
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) per user — the streaming analog of
    the reference's liveness sessions (heartbeat cadence, SURVEY §2.A #26).
    Oracle reconstructs sessions via gaps-and-islands."""
    s = events_stream(spark, sf_dir)
    agg = (
        s.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id", F.col("w.start").alias("session_start"), "n_events"
        )
    )
    return run_to_memory(agg, "mem_session", "complete")


@registry.query(
    "stream_dedup",
    oracle="SELECT event_id, event_type FROM events",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once projection from an at-least-once feed: the
    source is unioned with itself (every event delivered twice — the
    reference's reconnect-flush duplication, lib/Publisher.js:110-124) and
    dropDuplicates on the event key restores uniqueness."""
    s = events_stream(spark, sf_dir).select("event_id", "event_type")
    # Deliver every event twice inside the stream (explode beats a second
    # file source: one scan, and no basePath conflict on a single-file path).
    doubled = (
        s.withColumn("_copy", F.explode(F.array(F.lit(1), F.lit(2))))
        .drop("_copy")
    )
    deduped = doubled.dropDuplicates(["event_id"])
    return run_to_memory(deduped, "mem_dedup", "append")


@registry.query(
    "stream_dedup_within_watermark",
    oracle="SELECT event_id, event_type FROM events",
)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark: like stream_dedup, but the dedup
    state is EVICTED once the watermark passes an event's time — the
    variant that survives an unbounded feed, because state holds only the
    watermark-width window of keys instead of every key ever seen.
    Duplicates here arrive in the same micro-batch (well inside the 1-hour
    watermark), so the result equals plain dedup."""
    s = events_stream(spark, sf_dir).select("event_id", "event_type", "ts")
    doubled = (
        s.withColumn("_copy", F.explode(F.array(F.lit(1), F.lit(2))))
        .drop("_copy")
    )
    deduped = (
        doubled.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "event_type")
    )
    return run_to_memory(deduped, "mem_dedup_wm", "append")


# ---------------------------------------------------------------------------
# Stream-static joins (routing on a live feed)
# ---------------------------------------------------------------------------


@registry.query(
    "stream_static_join",
    oracle="""
    SELECT e.event_id, e.user_id, e.value, c.c_name, c.c_mktsegment
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type = 'purchase'
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: purchases joined to the customer
    dimension (broadcast — the static side ships to every task once)."""
    s = events_stream(spark, sf_dir).filter(F.col("event_type") == "purchase")
    c = load_table(spark, sf_dir, "customer")
    joined = s.join(broadcast(c), s.user_id == c.c_custkey).select(
        "event_id", "user_id", "value", "c_name", "c_mktsegment"
    )
    return run_to_memory(joined, "mem_ssjoin", "append")


@registry.query(
    "stream_stream_join",
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
           CAST(date_diff('second', CAST(c.ts AS TIMESTAMP),
                          CAST(p.ts AS TIMESTAMP)) AS BIGINT) AS lag_s
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     -- compare at Spark's microsecond precision: raw TIMESTAMP_NS bounds
     -- would diverge when a pair straddles the 30-min edge by sub-us parts
     AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
     AND CAST(p.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP) + INTERVAL 30 MINUTE
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: clicks joined to purchases by the same
    user within 30 minutes, both sides watermarked — the attribution-join
    shape. The watermarks + time-range condition bound both join-state
    buffers (rows age out once the other side's watermark passes the
    interval), which is what lets this run forever on unbounded feeds."""
    clicks = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select(
        "click_id",
        "purchase_id",
        "user_id",
        (F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")).alias(
            "lag_s"
        ),
    )
    return run_to_memory(joined, "mem_ssj", "append")


@registry.query(
    "stream_stream_left_outer",
    oracle="""
    WITH clicks AS (
        SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS click_ts
        FROM events WHERE event_type = 'click'
    ),
    purchases AS (
        SELECT event_id AS purchase_id, user_id,
               CAST(ts AS TIMESTAMP) AS purchase_ts
        FROM events WHERE event_type = 'purchase'
    ),
    wm AS (
        SELECT LEAST((SELECT MAX(click_ts) FROM clicks),
                     (SELECT MAX(purchase_ts) FROM purchases))
               - INTERVAL 1 HOUR AS w
    ),
    matched AS (
        SELECT c.click_id, p.purchase_id, c.user_id,
               CAST(date_diff('second', c.click_ts, p.purchase_ts) AS BIGINT)
                   AS lag_s
        FROM clicks c JOIN purchases p
          ON c.user_id = p.user_id
         AND p.purchase_ts >= c.click_ts
         AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE
    ),
    unmatched AS (
        -- a click is null-extended only once the watermark proves no
        -- purchase can still arrive for its 30-min window; trailing
        -- unmatched clicks stay buffered in join state and never emit
        SELECT c.click_id, CAST(NULL AS BIGINT) AS purchase_id, c.user_id,
               CAST(NULL AS BIGINT) AS lag_s
        FROM clicks c
        WHERE NOT EXISTS (
            SELECT 1 FROM purchases p
            WHERE p.user_id = c.user_id
              AND p.purchase_ts >= c.click_ts
              AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE)
          AND c.click_ts + INTERVAL 30 MINUTE < (SELECT w FROM wm)
    )
    SELECT * FROM matched UNION ALL SELECT * FROM unmatched
    """,
)
def stream_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every click, paired with
    its within-30-min purchase or null-extended once it provably cannot
    match — the unconverted-click feed of the attribution pipeline.

    Outer emission is watermark-gated: a click's null row appears only
    after the global watermark (min of both sides' max-event-time minus
    the 1 h delay) passes the end of its 30-min match window; Spark then
    evicts the buffered row in a no-data microbatch. The oracle encodes
    exactly that rule, so trailing unmatched clicks — still inside the
    watermark horizon when the finite input ends — are absent on BOTH
    sides. Same bounded-state story as the inner join: both buffers age
    out by watermark, which is what lets this run forever."""
    clicks = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        "leftOuter",
    ).select(
        "click_id",
        "purchase_id",
        "user_id",
        (F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")).alias(
            "lag_s"
        ),
    )
    return run_to_memory(joined, "mem_ssj_lo", "append")


@registry.query(
    "stream_pipeline_end_to_end",
    oracle=f"""
    WITH {pubsub.SQL_CHANGELOG}, {pubsub.SQL_CURRENT_SUBS},
    wire AS (
        SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN event_type = 'view' THEN 'corrupt frame without pipe'
                    ELSE 'M|' || to_json(struct_pack(
                            c := 'ch' || CAST(CAST(props ->> '$.k' AS INTEGER) % 5 AS VARCHAR),
                            m := printf('%.2f', value),
                            s := CAST(user_id AS VARCHAR),
                            _q := CAST(event_id % 100 AS VARCHAR)))
               END AS frame
        FROM events WHERE event_type IN ('click', 'view')
    ),
    parsed AS (
        SELECT event_id, ts,
               substr(frame, strpos(frame, '|') + 1) AS payload
        FROM wire WHERE strpos(frame, '|') > 0
    ),
    msgs AS (
        SELECT event_id, ts, payload ->> '$.c' AS channel
        FROM parsed WHERE json_valid(payload)
    )
    SELECT date_trunc('hour', m.ts) AS hour_start, m.channel, s.member_id,
           COUNT(*) AS n_deliveries
    FROM msgs m JOIN current_subs s ON m.channel = s.channel
    GROUP BY 1, 2, 3
    """,
)
def stream_pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole data plane as ONE streaming query:
    serialize -> parse (malformed drop) -> route -> windowed rollup.

    A live feed is framed into the wire envelope (views corrupt on
    purpose), parsed back (split at first '|', from_json; corrupt frames
    yield null and drop — util.parseSocketEvent -> false), routed against
    the broadcast compacted subscription state (sendMessage's inner-join
    fan-out), and rolled up into watermarked hourly delivery counts per
    (channel, member). This is the composition proof: every §2.A stage
    chains inside a single unbounded plan with bounded state — the
    aggregation runs in UPDATE mode (complete mode would keep every
    group forever and make the watermark inert) into the idempotent
    epoch-keyed foreachBatch sink, and the final state takes each
    group's last update (max_by epoch), the stream_watermark_late_drop
    pattern.

    The wire seq here is event_id%100, NOT the batch path's per-channel
    row_number counter — windowed sequence numbering needs an ordered
    partition and is a batch/compaction concern; the streaming envelope
    carries a content-derived seq instead (same mod-100 wrap).
    """
    s = events_stream(spark, sf_dir).filter(
        F.col("event_type").isin("click", "view")
    )
    k = F.get_json_object("props", "$.k").cast("int")
    frame = F.when(
        F.col("event_type") == "view", F.lit("corrupt frame without pipe")
    ).otherwise(
        F.concat(
            F.lit("M|"),
            F.to_json(
                F.struct(
                    F.concat(F.lit("ch"), (k % 5).cast("string")).alias("c"),
                    F.format_string("%.2f", F.col("value")).alias("m"),
                    F.col("user_id").cast("string").alias("s"),
                    (F.col("event_id") % 100).cast("string").alias("_q"),
                )
            ),
        )
    )
    wire = s.select("event_id", "ts", frame.alias("frame"))
    payload_schema = "c string, m string, s string, _q string"
    parsed = (
        wire.filter(F.instr("frame", "|") > 0)
        .withColumn("payload", F.expr("substring(frame, instr(frame, '|') + 1)"))
        .withColumn("p", F.from_json("payload", payload_schema))
        .filter(F.col("p.c").isNotNull())
        .select("event_id", "ts", F.col("p.c").alias("channel"))
    )
    subs = pubsub.current_subs(spark, sf_dir)  # compacted state, broadcast
    routed = parsed.join(broadcast(subs), "channel")
    agg = (
        routed.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "channel", "member_id")
        .agg(F.count("*").alias("n_deliveries"))
        .select(
            F.col("w.start").alias("hour_start"),
            "channel",
            "member_id",
            "n_deliveries",
        )
    )
    outdir = os.path.join(
        tempfile.gettempdir(),
        "quty_stream_e2e",
        os.path.basename(sf_dir.rstrip("/")),
    )
    shutil.rmtree(outdir, ignore_errors=True)
    os.makedirs(outdir)
    q = (
        agg.writeStream.foreachBatch(_epoch_writer(outdir))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    upd = spark.read.option("basePath", outdir).parquet(
        os.path.join(outdir, "epoch=*")
    )
    return upd.groupBy("hour_start", "channel", "member_id").agg(
        F.max_by("n_deliveries", "epoch").alias("n_deliveries")
    )


@registry.query(
    "stream_route_fanout",
    oracle=f"""
    WITH {pubsub.SQL_CHANGELOG}, {pubsub.SQL_CURRENT_SUBS}
    SELECT e.event_id,
           'ch' || CAST(CAST(e.props ->> '$.k' AS INTEGER) % 7 AS VARCHAR) AS channel,
           s.member_id
    FROM events e
    JOIN current_subs s
      ON 'ch' || CAST(CAST(e.props ->> '$.k' AS INTEGER) % 7 AS VARCHAR) = s.channel
    WHERE e.event_type = 'click'
    """,
)
def stream_route_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's routing core (#3) on a live feed: streaming messages
    × static subscription state, one output row per (message, subscriber);
    subscriber-less messages drop (at-most-once, lib/ChannelHub.js:274).
    In production the static side is the continuously-compacted state of
    stream_subscriptions_stateful."""
    s = events_stream(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    msgs = s.filter(F.col("event_type") == "click").select(
        "event_id", F.concat(F.lit("ch"), (k % 7).cast("string")).alias("channel")
    )
    subs = pubsub.current_subs(spark, sf_dir)  # static side
    routed = msgs.join(broadcast(subs), "channel").select(
        "event_id", "channel", "member_id"
    )
    # r17: file sink, not memory — the fan-out output is |messages x
    # subscribers| (10.3 M rows at sf0.1) and a memory sink ingests all
    # of it through the driver (guide §5). See run_to_parquet.
    return run_to_parquet(routed, "routed", sf_dir)


# ---------------------------------------------------------------------------
# Stateful subscription fold (applyInPandasWithState)
# ---------------------------------------------------------------------------

_SUBS_OUT_SCHEMA = StructType(
    [
        StructField("channel", StringType()),
        StructField("member_id", LongType()),
    ]
)
_SUBS_STATE_SCHEMA = StructType([StructField("members", StringType())])


def _fold_subscriptions(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-channel state function: fold join/leave ops in event-time order
    into the channel's member set — the reference's ChannelHub mutations
    (subscribe idempotence lib/ChannelHub.js:65-69, unsubscribe + GC
    lib/ChannelHub.js:85-88) as keyed streaming state (JSON-encoded set)."""
    import json

    (channel,) = key
    members: set[int] = set(json.loads(state.get[0]) if state.exists else [])
    # applyInPandasWithState delivers one key's rows as MULTIPLE Arrow
    # chunks (~10k rows each) with no cross-chunk ordering guarantee —
    # sorting each chunk independently folds ops out of event-time order
    # once a channel's changelog exceeds one chunk. Concatenate first,
    # sort the whole changelog once, then fold.
    chunks = list(pdfs)
    if not chunks:  # timeout-only invocation delivers no data
        return
    pdf = pd.concat(chunks, ignore_index=True)
    # Vectorized fold: member histories are independent, so folding in
    # (ts, event_id) order == keeping each member's LAST op. (ts,
    # event_id) is unique within a channel group — kick fan-out emits one
    # row per channel and the original kick rows are filtered upstream —
    # so the sort is deterministic. Joins add to the set, last-op leaves
    # (incl. pre-fanned kicks) mask members out; untouched members keep
    # their prior state.
    last = pdf.sort_values(["ts", "event_id"]).drop_duplicates(
        "member_id", keep="last"
    )
    joined = set(last.loc[last["op"] == "join", "member_id"].astype(int))
    left = set(last.loc[last["op"] != "join", "member_id"].astype(int))
    members = (members - left) | joined
    if members:
        state.update((json.dumps(sorted(members)),))
        yield pd.DataFrame(
            {"channel": channel, "member_id": sorted(members)}
        )
    else:
        # last member left -> destroy the channel (GC, ChannelHub.js:85-88)
        state.remove()


@registry.query(
    "stream_subscriptions_stateful",
    oracle=f"""
    WITH {pubsub.SQL_CHANGELOG}, {pubsub.SQL_CURRENT_SUBS}
    SELECT channel, member_id FROM current_subs
    """,
)
def stream_subscriptions_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The subscription lifecycle as REAL keyed streaming state:
    applyInPandasWithState per channel folds the join/leave/kick changelog
    into a live membership set. Kicks are global (removeClient —
    lib/ChannelHub.js:187-199), so they are pre-fanned-out to the member's
    channels exactly as the reference iterates them. The oracle is the
    same batch fold — sequential fold and last-op-wins agree on every
    (channel, member) history."""
    ev = events_stream(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    changelog = (
        ev.filter(
            F.col("event_type").isin("signup", "error")
            | ((F.col("event_type") == "purchase") & (F.col("value") > 195))
        )
        .select(
            F.concat(F.lit("ch"), (k % 5).cast("string")).alias("channel"),
            F.col("user_id").alias("member_id"),
            F.when(F.col("event_type") == "signup", "join")
            .when(F.col("event_type") == "error", "leave")
            .otherwise("kick")
            .alias("op"),
            "ts",
            "event_id",
        )
    )
    # Global kick -> per-channel leave rows, one per channel (the member's
    # channels are unknowable mid-stream, so fan to all channels: the fold
    # discards no-op leaves, matching removeClient's iterate-and-remove).
    channels = pubsub.changelog(spark, sf_dir).select("channel").distinct()
    kicks = (
        changelog.filter(F.col("op") == "kick")
        .drop("channel")
        .crossJoin(broadcast(channels))
        .select("channel", "member_id", F.lit("leave").alias("op"), "ts", "event_id")
    )
    folded = (
        changelog.filter(F.col("op") != "kick")
        .unionByName(kicks)
        .groupBy("channel")
        .applyInPandasWithState(
            _fold_subscriptions,
            outputStructType=_SUBS_OUT_SCHEMA,
            stateStructType=_SUBS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return run_to_memory(folded, "mem_subs_state", "update")


# ---------------------------------------------------------------------------
# Liveness expiry (§2.A #26) — event-time state timeout
# ---------------------------------------------------------------------------

# The reference pings every 10 s and terminates a socket that stayed
# silent for 2 consecutive intervals (lib/Server.js:343-360 with
# HEARTBEAT_INTERVAL=10s, lib/util.js:14). Restated in event time on the
# fixture's cadence: a member expires when silent for 60 minutes (2 x a
# 30-minute heartbeat), judged against a 15-minute watermark.
LIVENESS_SILENCE_MS = 60 * 60 * 1000
LIVENESS_WM = "15 minutes"
LIVENESS_WM_MS = 15 * 60 * 1000

_LIVE_OUT_SCHEMA = StructType(
    [
        StructField("member_id", LongType()),
        StructField("last_seen", TimestampType()),
        StructField("n_heartbeats", LongType()),
    ]
)
_LIVE_STATE_SCHEMA = StructType(
    [StructField("last_us", LongType()), StructField("n", LongType())]
)


def _liveness_expiry(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-member liveness state: every event is a heartbeat that bumps
    last_seen and re-arms an event-time timeout at last_seen + 2x the
    heartbeat interval. When the watermark passes the timeout with no new
    beat, the member EXPIRES: one output row (the kill decision,
    lib/Server.js:352-357), state removed. A later beat re-creates state
    from scratch — the reference's reconnect-after-kill (revive), proven
    by tests/test_streaming_recovery.py with a multi-batch choreography.
    State is O(members), not O(events): one (long, long) per key."""
    (member,) = key
    if state.hasTimedOut:
        last_us, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "member_id": [member],
                "last_seen": [pd.Timestamp(last_us, unit="us")],
                "n_heartbeats": [n],
            }
        )
        return
    pdf = pd.concat(list(pdfs), ignore_index=True)
    last_us = int(pdf["ts"].max().value // 1000)
    n = len(pdf)
    if state.exists:
        prev_last, prev_n = state.get
        last_us = max(last_us, int(prev_last))
        n += int(prev_n)
    state.update((last_us, n))
    # Event-time timeouts take epoch MILLISECONDS; the watermark tracks
    # floor-ms of event time, so truncation here matches the engine.
    state.setTimeoutTimestamp(last_us // 1000 + LIVENESS_SILENCE_MS)


@registry.query(
    "stream_liveness_expiry",
    oracle=f"""
    WITH hb AS (
        SELECT user_id AS member_id,
               MAX(CAST(ts AS TIMESTAMP)) AS last_seen,
               COUNT(*) AS n_heartbeats,
               MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS last_us
        FROM events GROUP BY user_id),
    wm AS (SELECT MAX(epoch_us(CAST(ts AS TIMESTAMP))) // 1000
                  - {LIVENESS_WM_MS} AS w_ms
           FROM events)
    SELECT member_id, last_seen, n_heartbeats
    FROM hb, wm
    WHERE (last_us // 1000) + {LIVENESS_SILENCE_MS} < wm.w_ms
    """,
)
def stream_liveness_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.A #26 end-to-end on the fixture: every user event is a
    heartbeat; members whose last beat is more than 60 minutes below the
    final watermark (max event time - 15 min) have their state expire via
    GroupStateTimeout.EventTimeTimeout and are emitted as killed. The
    oracle replicates the decision in floor-millisecond arithmetic —
    exactly the precision the engine's watermark uses."""
    s = events_stream(spark, sf_dir)
    hb = s.select(F.col("user_id").alias("member_id"), "ts")
    expired = (
        hb.withWatermark("ts", LIVENESS_WM)
        .groupBy("member_id")
        .applyInPandasWithState(
            _liveness_expiry,
            outputStructType=_LIVE_OUT_SCHEMA,
            stateStructType=_LIVE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    return run_to_memory(expired, "mem_liveness", "append")


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4.x arbitrary state API)
# ---------------------------------------------------------------------------


def _make_seq_processor():
    """Built lazily: importing StatefulProcessor is cheap, but keeping the
    class local avoids import-order issues in environments without the
    RocksDB provider."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class SeqProcessor(StatefulProcessor):
        """Per-channel monotone sequence counter wrapping at 100 — the
        reference's outbound ``_q`` injection (MAX_SEND_SEQ,
        lib/util.js:13,186-196) restated as keyed streaming state: the
        counter survives micro-batches in a ValueState."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._count = handle.getValueState(
                "count", StructType([StructField("n", LongType())])
            )

        def handleInputRows(self, key, rows, timerValues):
            pdf = pd.concat(list(rows)).sort_values(["ts", "event_id"])
            start = self._count.get()[0] if self._count.exists() else 0
            n = len(pdf)
            out = pd.DataFrame(
                {
                    "channel": key[0],
                    "event_id": pdf["event_id"].values,
                    "seq": [(start + i) % 100 for i in range(1, n + 1)],
                }
            )
            self._count.update((start + n,))
            yield out

        def close(self) -> None:
            pass

    return SeqProcessor()


_SEQ_OUT_SCHEMA = StructType(
    [
        StructField("channel", StringType()),
        StructField("event_id", LongType()),
        StructField("seq", LongType()),
    ]
)


def _protobuf_available() -> bool:
    # transformWithStateInPandas drives its state protocol over protobuf;
    # without google.protobuf the driver-side worker crashes at init.
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def stream_seq_counter_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-channel wire sequence numbers via transformWithStateInPandas —
    the second arbitrary-state API (alongside applyInPandasWithState),
    requiring the RocksDB state store and google.protobuf. The name
    `stream_seq_counter_tws` registers unconditionally: this
    implementation when the tws runtime deps exist, else
    :func:`stream_seq_counter_apws` (identical fold on the other API).
    State is one long per channel; at scale that is O(channels), not
    O(messages)."""
    configure(spark)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        msgs = _seq_counter_messages(spark, sf_dir)
        seq = msgs.groupBy("channel").transformWithStateInPandas(
            statefulProcessor=_make_seq_processor(),
            outputStructType=_SEQ_OUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
        return run_to_memory(seq, "mem_seq_tws", "append")
    finally:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
        )


_SEQ_STATE_SCHEMA = StructType([StructField("n", LongType())])


def _seq_counter_fold(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState twin of SeqProcessor: identical fold (sort by
    (ts, event_id), attach-then-increment mod 100, counter carried in keyed
    state across micro-batches). Exists so the `stream_seq_counter_tws`
    name registers unconditionally — transformWithStateInPandas needs
    google.protobuf, which some environments (this container) lack."""
    pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(
        ["ts", "event_id"]
    )
    start = state.get[0] if state.exists else 0
    n = len(pdf)
    state.update((start + n,))
    yield pd.DataFrame(
        {
            "channel": key[0],
            "event_id": pdf["event_id"].values,
            "seq": [(start + i) % 100 for i in range(1, n + 1)],
        }
    )


def _seq_counter_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = events_stream(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return s.filter(F.col("event_type") == "click").select(
        F.concat(F.lit("ch"), (k % 7).cast("string")).alias("channel"),
        "event_id",
        "ts",
    )


def stream_seq_counter_apws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fallback implementation of the per-channel wire sequence counter on
    the applyInPandasWithState API (no protobuf / RocksDB requirement);
    same output schema and fold semantics as the tws path, so either
    implementation satisfies the same oracle. State is one long per
    channel — O(channels), not O(messages)."""
    configure(spark)
    seq = (
        _seq_counter_messages(spark, sf_dir)
        .groupBy("channel")
        .applyInPandasWithState(
            _seq_counter_fold,
            outputStructType=_SEQ_OUT_SCHEMA,
            stateStructType=_SEQ_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return run_to_memory(seq, "mem_seq_apws", "append")


# The name always registers; the implementation is the tws path when its
# runtime deps exist, else the applyInPandasWithState twin — so the
# registry carries the query unconditionally and the local gate proves the
# fold either way.
registry.register(
    "stream_seq_counter_tws",
    stream_seq_counter_tws if _protobuf_available() else stream_seq_counter_apws,
    oracle=f"""
    WITH {pubsub.SQL_MESSAGES}
    SELECT channel, event_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY channel
                                   ORDER BY ts, event_id) % 100 AS BIGINT) AS seq
    FROM messages
    """,
)


# ---------------------------------------------------------------------------
# Watermark late-data drop + checkpoint recovery (deterministic micro-batches)
# ---------------------------------------------------------------------------


def _as_ns_events(df: DataFrame) -> DataFrame:
    """Events projection with ts back as int64 ns, so staged files scan
    under EVENTS_RAW_SCHEMA (Spark would otherwise write INT96)."""
    return df.select(
        "event_id",
        (F.unix_micros("ts") * 1000).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def _stage_single_file(df: DataFrame, stage_root: str, name: str) -> str:
    """Write ``df`` as exactly one parquet file; return that file's path."""
    d = os.path.join(stage_root, f"stage_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(d)
    part = next(p for p in os.listdir(d) if p.endswith(".parquet"))
    return os.path.join(d, part)


def _epoch_writer(outdir: str):
    """Idempotent foreachBatch sink: each micro-batch overwrites its own
    epoch-keyed directory, so a re-executed (crash-retried) batch lands on
    the same path and the result is unchanged — the sink half of
    exactly-once (§2.A #28)."""

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(outdir, f"epoch={epoch_id}")
        )

    return write_epoch


@registry.query(
    "stream_watermark_late_drop",
    oracle="""
    WITH bounds AS (SELECT MIN(CAST(ts AS TIMESTAMP)) AS t0 FROM events)
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start, COUNT(*) AS n
    FROM events, bounds
    WHERE CAST(ts AS TIMESTAMP) >= bounds.t0 + INTERVAL 1 HOUR
    GROUP BY 1
    """,
)
def stream_watermark_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data DROP, actually exercised. Three ordered
    micro-batches: (1) the middle of the event-time range — advances the
    watermark to max(batch1.ts) - 2h; (2) a spacer hour of fresh rows —
    needed because Spark's late-event filter uses the watermark as of the
    PREVIOUS batch's start (the two-watermark model that keeps chained
    stateful operators consistent, SPARK-24634), so a drop only happens
    two batches after the rows that advanced the watermark; (3) the
    earliest hour of events — now genuinely below the late-event
    watermark and DISCARDED — plus the final hour, still fresh and
    merged. The aggregation runs in UPDATE mode (complete mode never
    drops late rows); updates land in an epoch-keyed foreachBatch sink
    and the final state takes each window's last update (max_by epoch).
    The oracle is simply "every event except the earliest hour", because
    that is exactly what the watermark admits — the reference's
    at-most-once discard restated in event time.
    tests/test_streaming_recovery.py asserts the drop is non-empty."""
    configure(spark)
    ev = load_table(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    late_cut = lo + dt.timedelta(hours=1)
    spacer_cut = hi - dt.timedelta(hours=2)
    hold_cut = hi - dt.timedelta(hours=1)
    workdir = os.path.join(
        tempfile.gettempdir(), "quty_stream_late", os.path.basename(sf_dir.rstrip("/"))
    )
    shutil.rmtree(workdir, ignore_errors=True)
    indir = os.path.join(workdir, "in")
    outdir = os.path.join(workdir, "out")
    os.makedirs(indir)
    os.makedirs(outdir)
    main = ev.filter(
        (F.col("ts") >= F.lit(late_cut)) & (F.col("ts") < F.lit(spacer_cut))
    )
    spacer = ev.filter(
        (F.col("ts") >= F.lit(spacer_cut)) & (F.col("ts") < F.lit(hold_cut))
    )
    late_and_fresh = ev.filter(
        (F.col("ts") < F.lit(late_cut)) | (F.col("ts") >= F.lit(hold_cut))
    )
    files = [
        _stage_single_file(_as_ns_events(main), workdir, "b1"),
        _stage_single_file(_as_ns_events(spacer), workdir, "b2"),
        _stage_single_file(_as_ns_events(late_and_fresh), workdir, "b3"),
    ]
    # One file per micro-batch, ordered by modification time: b1 then b2.
    for i, src in enumerate(files):
        dst = os.path.join(indir, f"batch{i}.parquet")
        shutil.copy(src, dst)
        os.utime(dst, (1_700_000_000 + i * 1000, 1_700_000_000 + i * 1000))
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(indir)
    )
    s = raw.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    agg = (
        s.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("hour_start"), "n")
    )
    q = (
        agg.writeStream.foreachBatch(_epoch_writer(outdir))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    upd = spark.read.option("basePath", outdir).parquet(os.path.join(outdir, "epoch=*"))
    return upd.groupBy("hour_start").agg(F.max_by("n", "epoch").alias("n"))


def checkpoint_recovery_run(spark: SparkSession, sf_dir: str) -> dict:
    """The "Kafka semantics" proof: a checkpointed streaming query is
    STOPPED mid-input and a new query resumes from the checkpoint.

    Choreography: the events table is split in two files by event time.
    Phase 1 exposes only file 1 to the source and runs an availableNow
    query to termination (it commits its offsets + sink epochs, then
    stops — a controlled stand-in for a crash between micro-batches).
    Phase 2 adds file 2 and starts a NEW query on the SAME
    checkpointLocation: the file source resumes from the committed
    offsets, so file 1 is never re-read (no duplicates) and file 2 is
    picked up exactly once (no loss), continuing the epoch numbering.
    The sink is the idempotent epoch-keyed foreachBatch writer, so a
    crash-retried uncommitted batch would overwrite its own epoch rather
    than append — together: end-to-end exactly-once over restarts, the
    durable-delivery property the reference approximates with client-side
    queues (lib/Publisher.js:55-66,110-124; lib/QutyClient.js:241-259).

    Returns phase metadata for tests; the registered query returns only
    the final read-back, which the oracle checks against the batch truth.
    """
    configure(spark)
    ev = load_table(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cut = lo + (hi - lo) / 2
    workdir = os.path.join(
        tempfile.gettempdir(), "quty_stream_ckpt", os.path.basename(sf_dir.rstrip("/"))
    )
    shutil.rmtree(workdir, ignore_errors=True)
    indir = os.path.join(workdir, "in")
    outdir = os.path.join(workdir, "out")
    ckpt = os.path.join(workdir, "ckpt")
    os.makedirs(indir)
    os.makedirs(outdir)
    f1 = _stage_single_file(
        _as_ns_events(ev.filter(F.col("ts") < F.lit(cut))), workdir, "b1"
    )
    f2 = _stage_single_file(
        _as_ns_events(ev.filter(F.col("ts") >= F.lit(cut))), workdir, "b2"
    )

    def run_once() -> list[int]:
        raw = spark.readStream.schema(EVENTS_RAW_SCHEMA).parquet(indir)
        s = raw.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        out = s.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "value"
        )
        q = (
            out.writeStream.foreachBatch(_epoch_writer(outdir))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(outdir)
            if d.startswith("epoch=")
        )

    shutil.copy(f1, os.path.join(indir, "file0.parquet"))
    epochs_phase1 = run_once()  # consume file 1, commit offsets, stop
    shutil.copy(f2, os.path.join(indir, "file1.parquet"))
    epochs_all = run_once()  # NEW query, same checkpoint: resumes
    result = (
        spark.read.option("basePath", outdir)
        .parquet(os.path.join(outdir, "epoch=*"))
        .select("event_id", "user_id", "value")
    )
    return {
        "result": result,
        "epochs_phase1": epochs_phase1,
        "epochs_all": epochs_all,
        "outdir": outdir,
        "cut": cut,
    }


@registry.query(
    "stream_checkpoint_recovery",
    oracle="SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase'",
)
def stream_checkpoint_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered surface of :func:`checkpoint_recovery_run` — the final
    read-back after stop + restart-from-checkpoint must equal the batch
    truth exactly (every purchase event once: no loss across the restart,
    no duplicates from re-reading file 1)."""
    return checkpoint_recovery_run(spark, sf_dir)["result"]


# ---------------------------------------------------------------------------
# foreachBatch sink
# ---------------------------------------------------------------------------


@registry.query(
    "stream_foreach_batch_sink",
    oracle="""
    SELECT event_id, event_type, value FROM events WHERE event_type = 'purchase'
    """,
)
def stream_foreach_batch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch sink — the engine's delivery tier (§2.A #28): each
    micro-batch is written idempotently (epoch-keyed path, overwrite) to
    parquet, then read back. This is the pattern that replaces the
    reference's per-socket delivery loop with exactly-once batch writes."""
    configure(spark)
    outdir = os.path.join(
        tempfile.gettempdir(), "quty_feb_sink", os.path.basename(sf_dir.rstrip("/"))
    )
    shutil.rmtree(outdir, ignore_errors=True)
    s = events_stream(spark, sf_dir).filter(F.col("event_type") == "purchase").select(
        "event_id", "event_type", "value"
    )

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(os.path.join(outdir, f"epoch={epoch_id}"))

    q = (
        s.writeStream.foreachBatch(write_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(os.path.join(outdir, "epoch=*")).select(
        "event_id", "event_type", "value"
    )


@registry.query(
    "stream_rate_source",
    oracle="""
    SELECT CAST(r % 16 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(r) AS BIGINT) AS value_sum
    FROM range(0, 5000) t(r)
    GROUP BY 1
    """,
)
def stream_rate_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate source, value-verified: the built-in load-generator source
    (the stand-in for a Kafka ingress in this container — no broker
    available) feeding a real micro-batch pipeline: projection + modulo
    bucketing + windowless aggregation, availableNow to a memory sink.
    Unlike the wall-clock `rate` format, `rate-micro-batch` is
    DETERMINISTIC by contract: it advances its offset by exactly
    rowsPerBatch per batch independent of execution timing, and with a
    fresh checkpoint + availableNow the run consumes exactly one batch —
    values 0..rowsPerBatch-1. That makes the emitted `value` column (and
    so every per-bucket count and sum) a pure function of the three
    pinned options, so the query carries a real SQL oracle over
    range(0, 5000) — no rows-only trust needed. At scale the rate source
    is also the backpressure-calibration tool: crank the per-batch row
    count until the sink lags, and that is the pipeline's throughput
    ceiling."""
    from quty_server_spark.session import configure

    configure(spark)
    rate = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 5000)
        .option("numPartitions", 4)
        .option("startTimestamp", 0)
        .load()
    )
    agg = (
        rate.select((F.col("value") % 16).alias("bucket"), "value")
        .groupBy("bucket")
        .agg(F.count("*").alias("n"), F.sum("value").alias("value_sum"))
    )
    return run_to_memory(agg, "rate_smoke", "complete")


# ---------------------------------------------------------------------------
# Kafka wire semantics across a checkpointed restart (no broker available:
# the staged-file log stands in for the topic; what is proven is the
# CONSUMER contract — resume from committed offsets, no loss, no dupes,
# per-key order preserved)
# ---------------------------------------------------------------------------

KAFKA_RECORD_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("topic", StringType()),
        StructField("partition", LongType()),
        StructField("offset", LongType()),
        StructField("key", StringType()),
        StructField("value", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def kafka_replay_run(spark: SparkSession, sf_dir: str) -> dict:
    """Kafka-shaped log replay across a stop + checkpoint-resume.

    The topic is staged as two files, each holding a per-partition offset
    PREFIX/SUFFIX (offset order == ts order per partition by
    construction, so a ts cut splits every partition's log cleanly). A
    checkpointed query consumes file 1 and is stopped; a NEW query on the
    same checkpoint consumes only file 2. Per-key ordering across the
    restart is pinned in tests/test_kafka_wire.py: every key's phase-1
    offsets all precede its phase-2 offsets, and the final log is
    gap-free 0..n-1 per partition — the reference's per-socket FIFO
    (lib/util.js sendSocketEvent seq) restated as the consumer-group
    resume contract."""
    configure(spark)
    rec = pubsub.kafka_records(spark, sf_dir).withColumn(
        "partition", F.col("partition").cast("long")
    )
    # O(1) bounds row: the aggregation runs distributed; only the single
    # reduced (min, max) row crosses to the driver.
    lo, hi = rec.agg(F.min("ts"), F.max("ts")).first()
    cut = lo + (hi - lo) / 2
    n_before, n_after = rec.agg(
        F.sum((F.col("ts") < F.lit(cut)).cast("long")),
        F.sum((F.col("ts") >= F.lit(cut)).cast("long")),
    ).first()
    if not n_before or not n_after:
        # Degenerate ts distribution (all records in one half of the
        # midpoint): fall back to the ts median so both phases carry
        # records — phase 1 committing zero epochs would fail the replay
        # harness on fixture drift rather than on a contract violation.
        cut = rec.agg(
            F.expr("percentile(unix_micros(ts), 0.5)").cast("long")
        ).first()[0]
        cut = dt.datetime.fromtimestamp(cut / 1_000_000, tz=dt.timezone.utc)
        n_before, n_after = rec.agg(
            F.sum((F.col("ts") < F.lit(cut)).cast("long")),
            F.sum((F.col("ts") >= F.lit(cut)).cast("long")),
        ).first()
    assert n_before and n_after, (
        f"kafka_replay_run: degenerate topic split (before={n_before}, "
        f"after={n_after}) — fixture ts distribution leaves one replay "
        f"phase empty even at the median cut; regenerate fixtures or "
        f"adjust the cut strategy"
    )
    workdir = os.path.join(
        tempfile.gettempdir(), "quty_kafka_replay", os.path.basename(sf_dir.rstrip("/"))
    )
    shutil.rmtree(workdir, ignore_errors=True)
    indir = os.path.join(workdir, "in")
    outdir = os.path.join(workdir, "out")
    ckpt = os.path.join(workdir, "ckpt")
    os.makedirs(indir)
    os.makedirs(outdir)
    cols = ["event_id", "topic", "partition", "offset", "key", "value", "ts"]
    f1 = _stage_single_file(
        rec.filter(F.col("ts") < F.lit(cut)).select(*cols), workdir, "b1"
    )
    f2 = _stage_single_file(
        rec.filter(F.col("ts") >= F.lit(cut)).select(*cols), workdir, "b2"
    )

    def run_once() -> list[int]:
        raw = spark.readStream.schema(KAFKA_RECORD_SCHEMA).parquet(indir)
        # Consumer-side envelope parse happens downstream (kafka_wire_decode
        # covers it); the replay path forwards records as-is.
        q = (
            raw.writeStream.foreachBatch(_epoch_writer(outdir))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(outdir)
            if d.startswith("epoch=")
        )

    shutil.copy(f1, os.path.join(indir, "file0.parquet"))
    epochs_phase1 = run_once()  # consume file 1, commit offsets, stop
    shutil.copy(f2, os.path.join(indir, "file1.parquet"))
    epochs_all = run_once()  # NEW query, same checkpoint: resume, file 2 only
    result = (
        spark.read.option("basePath", outdir)
        .parquet(os.path.join(outdir, "epoch=*"))
        .select(*cols, "epoch")
    )
    return {
        "result": result,
        "epochs_phase1": epochs_phase1,
        "epochs_all": epochs_all,
    }


@registry.query(
    "stream_kafka_replay",
    oracle=f"""
    WITH {pubsub.SQL_KAFKA_RECORDS}
    SELECT event_id, topic, "partition", "offset", "key", "value"
    FROM kafka_records
    """,
)
def stream_kafka_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered surface of :func:`kafka_replay_run` — the read-back after
    stop + resume must equal the batch-synthesized topic exactly (every
    record once: committed offsets are not re-consumed, pending ones are
    not lost)."""
    return (
        kafka_replay_run(spark, sf_dir)["result"]
        .withColumn("partition", F.col("partition").cast("int"))
        .select("event_id", "topic", "partition", "offset", "key", "value")
    )


@registry.query(
    "stream_window_topk",
    oracle="""
    WITH spend AS (
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start,
               user_id,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS spend
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2)
    SELECT hour_start, user_id, spend, rn
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY hour_start
                    ORDER BY spend DESC, user_id) AS rn FROM spend)
    WHERE rn <= 3
    """,
)
def stream_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 spenders per event-time hour: the watermarked windowed
    aggregation runs IN the stream (state = open windows only); the
    rank-and-take runs on the closed windows it emits — the standard
    split for leaderboard queries on an unbounded feed, since a global
    rank inside the stream would need unbounded state. The final top-k
    is a window over (hour, spend) with a deterministic tiebreak."""
    s = events_stream(spark, sf_dir)
    spend = (
        s.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("spend")
        )
        .select(F.col("w.start").alias("hour_start"), "user_id", "spend")
    )
    closed = run_to_memory(spend, "mem_window_topk", "complete")
    from pyspark.sql import Window as W

    rank_w = W.partitionBy("hour_start").orderBy(
        F.desc("spend"), F.asc("user_id")
    )
    return (
        closed.withColumn("rn", F.row_number().over(rank_w))
        .filter(F.col("rn") <= 3)
        .select("hour_start", "user_id", "spend", "rn")
    )


@registry.query(
    "stream_stream_full_outer",
    oracle="""
    WITH clicks AS (
        SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS click_ts
        FROM events WHERE event_type = 'click'
    ),
    purchases AS (
        SELECT event_id AS purchase_id, user_id,
               CAST(ts AS TIMESTAMP) AS purchase_ts
        FROM events WHERE event_type = 'purchase'
    ),
    wm AS (
        SELECT LEAST((SELECT MAX(click_ts) FROM clicks),
                     (SELECT MAX(purchase_ts) FROM purchases))
               - INTERVAL 1 HOUR AS w
    ),
    matched AS (
        SELECT c.click_id, p.purchase_id, c.user_id,
               CAST(date_diff('second', c.click_ts, p.purchase_ts) AS BIGINT)
                   AS lag_s
        FROM clicks c JOIN purchases p
          ON c.user_id = p.user_id
         AND p.purchase_ts >= c.click_ts
         AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE
    ),
    unmatched_clicks AS (
        SELECT c.click_id, CAST(NULL AS BIGINT) AS purchase_id, c.user_id,
               CAST(NULL AS BIGINT) AS lag_s
        FROM clicks c
        WHERE NOT EXISTS (
            SELECT 1 FROM purchases p
            WHERE p.user_id = c.user_id
              AND p.purchase_ts >= c.click_ts
              AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE)
          AND c.click_ts + INTERVAL 30 MINUTE < (SELECT w FROM wm)
    ),
    unmatched_purchases AS (
        -- a purchase null-extends once the watermark proves no click can
        -- still match: its latest admissible click has click_ts <=
        -- purchase_ts, so decidability is purchase_ts < watermark
        SELECT CAST(NULL AS BIGINT) AS click_id, p.purchase_id, p.user_id,
               CAST(NULL AS BIGINT) AS lag_s
        FROM purchases p
        WHERE NOT EXISTS (
            SELECT 1 FROM clicks c
            WHERE c.user_id = p.user_id
              AND p.purchase_ts >= c.click_ts
              AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE)
          AND p.purchase_ts < (SELECT w FROM wm)
    )
    SELECT * FROM matched
    UNION ALL SELECT * FROM unmatched_clicks
    UNION ALL SELECT * FROM unmatched_purchases
    """,
)
def stream_stream_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join: clicks and purchases each
    null-extend once the watermark proves their window closed — the
    both-directions attribution feed (unconverted clicks AND organic
    purchases) in one bounded-state unbounded plan. Left-side emission is
    gated on the click's 30-min window passing the watermark; right-side
    on the purchase's own event time passing it (its latest admissible
    click is no newer than itself). The oracle encodes both rules, so
    trailing rows still inside the horizon are absent on BOTH sides."""
    clicks = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        "fullOuter",
    ).select(
        "click_id",
        "purchase_id",
        F.coalesce(F.col("user_id"), F.col("p_user_id")).alias("user_id"),
        (F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")).alias(
            "lag_s"
        ),
    )
    return run_to_memory(joined, "mem_ssfo", "append")


@registry.query(
    "stream_chained_windows",
    oracle="""
    WITH horizon AS (SELECT MAX(CAST(ts AS TIMESTAMP)) AS max_ts FROM events),
    ten AS (
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP))
               + INTERVAL (10 * (EXTRACT(minute FROM CAST(ts AS TIMESTAMP)) // 10)) MINUTE
                   AS w10_start,
               event_type, COUNT(*) AS n,
               SUM(CAST(value AS DECIMAL(38,6))) AS total_dec
        FROM events GROUP BY 1, 2)
    SELECT date_trunc('hour', w10_start) AS hour_start,
           event_type,
           CAST(SUM(n) AS BIGINT) AS n_events,
           COUNT(*) AS n_subwindows,
           CAST(SUM(total_dec) AS DOUBLE) AS total_value
    FROM ten, horizon
    WHERE date_trunc('hour', w10_start) + INTERVAL 1 HOUR <= max_ts
    GROUP BY 1, 2
    """,
)
def stream_chained_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained (multi-level) streaming aggregation: a 10-minute windowed
    count/sum per channel feeds a second stateful aggregation that rolls
    the CLOSED 10-minute windows up to hours — two stateful operators in
    ONE unbounded plan via ``window_time`` (Spark 3.4+ multi-stateful
    support), append mode. This is the streaming rollup cascade (minute →
    hour → day) that keeps per-level state bounded by the watermark
    instead of re-scanning raw events per grain.

    Append-mode emission: with a 0-second watermark delay the final
    watermark equals max(ts), so exactly the hour windows whose END is
    <= max(ts) are emitted; the oracle states the same horizon filter.
    """
    s = events_stream(spark, sf_dir)
    ten = (
        s.withWatermark("ts", "0 seconds")
        .groupBy(F.window("ts", "10 minutes").alias("w10"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("total_dec"),
        )
    )
    hour = (
        ten.groupBy(
            F.window(F.window_time("w10"), "1 hour").alias("w60"), "event_type"
        )
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            F.count("*").alias("n_subwindows"),
            F.sum("total_dec").cast("double").alias("total_value"),
        )
        .select(
            F.col("w60.start").alias("hour_start"),
            "event_type",
            "n_events",
            "n_subwindows",
            "total_value",
        )
    )
    return run_to_memory(hour, "mem_chained_windows", "append")


@registry.query(
    "stream_python_datasource",
    oracle="""
    SELECT CAST(i % 8 AS INT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(i) AS BIGINT) AS min_doc,
           CAST(MAX(i) AS BIGINT) AS max_doc,
           CAST(SUM(i % 13 + 3) AS BIGINT) AS total_tokens
    FROM range(0, 500) t(i) GROUP BY i % 8
    """,
)
def stream_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom STREAMING connector through the Spark 4 Python data source
    API (sources/synth_source.py SimpleDataSourceStreamReader): the
    bounded synthetic corpus arrives as offset-tracked micro-batches
    (200 docs each), consumed across REPEATED availableNow runs on one
    checkpoint — each run is a fresh query resuming from committed
    offsets, so the exact per-shard counts the oracle states prove the
    resume contract end-to-end (no batch re-consumed, none lost; the
    same stop/resume device as stream_kafka_replay). The idempotent
    epoch-keyed foreachBatch sink supplies the sink half of
    exactly-once; readBetweenOffsets regenerates a planned-but-
    uncommitted batch bit-identically on restart (source half).

    Scale: at a real deployment the reader's offset is a feed position
    (queue cursor, API page token); partition-parallelism comes from the
    batch variant's InputPartitions — the simple stream reader
    prioritizes the offset/replay contract, which is what this query
    pins."""
    from quty_server_spark.sources.synth_source import (
        register_synth_stream_source,
    )

    configure(spark)
    register_synth_stream_source(spark)
    n_docs = 500
    workdir = os.path.join(
        tempfile.gettempdir(),
        "quty_synth_stream",
        os.path.basename(sf_dir.rstrip("/")),
    )
    shutil.rmtree(workdir, ignore_errors=True)
    outdir = os.path.join(workdir, "out")
    ckpt = os.path.join(workdir, "ckpt")
    os.makedirs(outdir)
    # 500 docs / 200-doc batches -> 3 productive runs + 1 empty; the
    # bound is a guard, the loop exits on row-count convergence.
    for _ in range(6):
        raw = spark.readStream.format("quty_synth_stream").load()
        q = (
            raw.writeStream.foreachBatch(_epoch_writer(outdir))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if any(d.startswith("epoch=") for d in os.listdir(outdir)):
            got = (
                spark.read.option("basePath", outdir)
                .parquet(os.path.join(outdir, "epoch=*"))
                .count()
            )
            if got >= n_docs:
                break
    rows = spark.read.option("basePath", outdir).parquet(
        os.path.join(outdir, "epoch=*")
    )
    return rows.groupBy("shard").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.min("doc_id").cast("bigint").alias("min_doc"),
        F.max("doc_id").cast("bigint").alias("max_doc"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("total_tokens"),
    )


# ---------------------------------------------------------------------------
# Continuous ingest gate: the nightly dedup gate as a stream
# ---------------------------------------------------------------------------


def _run_ingest_gate_stream(
    spark: SparkSession,
    sf_dir: str,
    kind: str,
    gate_batch_of,
    out_cols: list[str],
    table: str = "documents",
    id_col: str = "doc_id",
    docs: DataFrame | None = None,
) -> DataFrame:
    """Shared runner for the continuous ingest gates: stage the shard
    (``<id_col> % 10 == 0`` of ``table``, or a caller-staged ``docs``
    frame for families whose shard universe is derived rather than a
    raw table — the media gate's staged perceptual universe) as 4
    hash-partitioned files, stream them one-file-per-trigger, apply the
    family's per-batch gate inside ``foreachBatch`` with an epoch-keyed
    idempotent parquet sink, and return the union of all epochs.
    Scratch dirs are session-keyed (session_tmp_dir) and the returned
    frame is eagerly ``localCheckpoint``-ed, so a later call for the
    same sf_dir — which rmtree's and restages — can never invalidate a
    frame this call already handed out (r10 ADVICE)."""
    from quty_server_spark.session import session_tmp_dir

    configure(spark)
    base = session_tmp_dir(spark, kind, sf_dir)
    indir = os.path.join(base, "in")
    outdir = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)

    # Stage the incoming shard as 4 files -> 4 micro-batches under
    # maxFilesPerTrigger=1 (hash-partitioned on the id, so batch
    # composition is deterministic in content, not in arrival order).
    if docs is None:
        docs = load_table(spark, sf_dir, table).filter(
            F.col(id_col) % 10 == 0
        )
    docs.repartition(4, id_col).write.parquet(indir)

    gate_batch = gate_batch_of(outdir)
    stream = (
        # docs.schema, not a re-read of the staging dir: the staged
        # files were just written FROM docs, and a spark.read.parquet
        # here would fire a schema-inference job per gate run (the same
        # construction-job class load_table's schema cache removes).
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(indir)
    )
    q = (
        stream.writeStream.foreachBatch(gate_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.parquet(os.path.join(outdir, "epoch=*"))
        .select(*out_cols)
        .localCheckpoint(eager=True)
    )


@registry.query(
    "stream_ingest_dedup_gate",
    oracle=SQL_INCREMENTAL_GATE,
)
def stream_ingest_dedup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental dedup gate run CONTINUOUSLY: incoming documents
    arrive as a file stream in micro-batches, and each batch is signed,
    banded, and joined against the precomputed lake-signature artifact
    inside ``foreachBatch`` — the streaming twin of
    :func:`~quty_server_spark.operators.dedup.dedup_incremental_simhash_artifact`,
    sharing its oracle SQL byte-for-byte. The union of all epochs'
    outputs must equal the one-shot batch gate exactly: every shard doc
    lands in exactly one micro-batch (file-partitioned), each doc's
    signature is computed over its complete row, and the within-batch
    ``distinct`` collapses multi-band collisions just as the batch gate
    does, so no cross-epoch dedup is needed.

    Scale: this is the shape of a production ingest tier that cannot
    wait for a nightly window — per micro-batch cost is sign(batch) +
    one band-equality join against the artifact scan (batch side
    broadcast), and the epoch-keyed overwrite sink makes replays
    idempotent (same exactly-once convention as
    :func:`stream_foreach_batch_sink`). The lake-sized signing job is
    amortized into the artifact on both the nightly AND the continuous
    path."""
    from quty_server_spark.operators.dedup import (
        HAMMING_MAX,
        lake_signature_artifact,
        simhash_bands,
        simhash_sigs_docs,
    )

    configure(spark)
    lake = (
        spark.read.parquet(lake_signature_artifact(spark, sf_dir))
        .select("doc_id", "sig", "band_id", "band_val")
        .alias("o")
    )

    def gate_batch_of(outdir: str):
        def gate_batch(batch_df: DataFrame, epoch_id: int) -> None:
            shard = simhash_bands(simhash_sigs_docs(batch_df)).alias("n")
            res = (
                shard.join(
                    lake,
                    (F.col("n.band_id") == F.col("o.band_id"))
                    & (F.col("n.band_val") == F.col("o.band_val")),
                )
                .select(
                    F.col("n.doc_id").alias("incoming_doc_id"),
                    F.col("o.doc_id").alias("lake_doc_id"),
                    F.bit_count(
                        F.col("n.sig").bitwiseXOR(F.col("o.sig"))
                    ).alias("hamming"),
                )
                .filter(F.col("hamming") <= HAMMING_MAX)
                .distinct()
            )
            res.write.mode("overwrite").parquet(
                os.path.join(outdir, f"epoch={epoch_id}")
            )

        return gate_batch

    return _run_ingest_gate_stream(
        spark,
        sf_dir,
        "quty_stream_gate",
        gate_batch_of,
        ["incoming_doc_id", "lake_doc_id", "hamming"],
    )


@registry.query(
    "stream_ingest_dedup_gate_minhash",
    oracle=SQL_MINHASH_GATE,
)
def stream_ingest_dedup_gate_minhash(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The MinHash-family continuous ingest gate — the streaming twin
    of :func:`~quty_server_spark.operators.dedup.dedup_incremental_minhash_artifact`,
    sharing its oracle SQL byte-for-byte: each micro-batch is shingled,
    min-hashed, and banded, candidates come from an equality join
    against the precomputed lake MinHash-band artifact (which carries
    the lake's per-doc shingle counts, so no lake-side aggregation runs
    per batch), and the exact-Jaccard verify joins only the batch's own
    shingles against the lake documents scan restricted to candidate
    pairs. Epoch union equals the one-shot batch gate exactly: each doc
    lands in one micro-batch and its candidates/verify are computed
    from its complete row plus static lake state — nothing crosses
    epochs.

    Scale: per micro-batch cost is shingle+sign(batch) + one band join
    against the artifact scan + a candidate-restricted verify; the
    lake-sized signature and size aggregations are amortized into the
    write-once artifact on the continuous path just as on the nightly
    one."""
    from quty_server_spark.operators.dedup import (
        _minhash_gate_verify_nb,
        doc_shingles_docs,
        lake_minhash_artifact,
        lake_shingles_for_verify,
        minhash_bands,
        minhash_sigs,
    )

    configure(spark)
    lake = (
        spark.read.parquet(lake_minhash_artifact(spark, sf_dir))
        .select("doc_id", "sig", "n_sh", "band_id")
        .alias("o")
    )
    # Lazy-checkpointed once: every micro-batch's verify joins the lake
    # shingles, and without the checkpoint each batch would re-run the
    # lake documents scan+explode — 4 lake passes per run instead of 1
    # (materializes on the first batch, reused by the rest).
    lake_sh = lake_shingles_for_verify(spark, sf_dir).localCheckpoint(
        eager=False
    )

    def gate_batch_of(outdir: str):
        def gate_batch(batch_df: DataFrame, epoch_id: int) -> None:
            sh = doc_shingles_docs(batch_df).localCheckpoint(eager=False)
            shard = minhash_bands(minhash_sigs(sh)).alias("n")
            cand = (
                shard.join(
                    lake,
                    (F.col("n.band_id") == F.col("o.band_id"))
                    & (F.col("n.sig") == F.col("o.sig")),
                )
                .select(
                    F.col("n.doc_id").alias("incoming_doc_id"),
                    F.col("o.doc_id").alias("lake_doc_id"),
                    F.col("o.n_sh").alias("nb"),
                )
                .distinct()
            )
            res = _minhash_gate_verify_nb(cand, sh, lake_sh)
            res.write.mode("overwrite").parquet(
                os.path.join(outdir, f"epoch={epoch_id}")
            )

        return gate_batch

    return _run_ingest_gate_stream(
        spark,
        sf_dir,
        "quty_stream_gate_minhash",
        gate_batch_of,
        ["incoming_doc_id", "lake_doc_id", "jaccard"],
    )


@registry.query(
    "stream_ingest_dedup_gate_embedding",
    oracle=SQL_EMB_GATE,
)
def stream_ingest_dedup_gate_embedding(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The EMBEDDING-family continuous ingest gate — the streaming twin
    of :func:`~quty_server_spark.operators.similarity.dedup_incremental_embedding_artifact`,
    completing the continuous tier for ALL THREE signature families
    (SimHash ``stream_ingest_dedup_gate``, MinHash
    ``stream_ingest_dedup_gate_minhash``, and now semantic near-dup):
    incoming vectors arrive as a file stream in micro-batches; each
    batch is assigned to IVF cells against the artifact's K-row
    centroid sidecar and probed cell-vs-cell against the artifact's
    lake postings inside ``foreachBatch``, with the epoch-keyed
    idempotent parquet sink. Shares the batch gate's oracle SQL
    byte-for-byte; epoch union equals the one-shot gate exactly (each
    vector lands in one micro-batch, its cell assignment is a pure
    function of its own row and the static centroids, and candidates
    come only from static lake state — nothing crosses epochs;
    set-equality tested in tests/test_streaming_recovery.py).

    Scale: per micro-batch cost is |batch| × K broadcast assignment
    (map-side combined) + a same-cell equality join against the
    cell-partitioned artifact — the batch's assigned cells drive
    partition pruning, so each trigger reads only the cell directories
    its vectors land in. The corpus-sized assignment is amortized into
    the write-once artifact on the continuous path just as on the
    nightly one."""
    from pyspark.sql.functions import broadcast

    from quty_server_spark.functions.vectors import (
        as_double,
        cosine_norms,
        norm,
    )
    from quty_server_spark.operators.similarity import (
        EMB_GATE_COS,
        _ivf_cells_plan,
        ivf_postings_artifact,
    )

    configure(spark)
    path = ivf_postings_artifact(spark, sf_dir)
    art = spark.read.parquet(path).select(
        "vec_id", "v", F.col("cell").cast("bigint").alias("cell")
    )
    # r17: per-side precomputed norms (cosine_norms — bit-identical),
    # the batch twin's form mirrored on the continuous path.
    lake = (
        art.filter(F.col("vec_id") % 10 != 0)
        .withColumn("vn", norm(F.col("v")))
        .alias("o")
    )
    cent = spark.read.parquet(os.path.join(path, "_centroids"))

    def gate_batch_of(outdir: str):
        def gate_batch(batch_df: DataFrame, epoch_id: int) -> None:
            shard = batch_df.select(
                "vec_id", as_double(F.col("embedding")).alias("v")
            )
            assigned = (
                _ivf_cells_plan(shard, cent)
                .withColumn("vn", norm(F.col("v")))
                .alias("n")
            )
            res = (
                lake.join(
                    broadcast(assigned), F.col("n.cell") == F.col("o.cell")
                )
                .withColumn(
                    "cos_sim",
                    cosine_norms(
                        F.col("n.v"),
                        F.col("o.v"),
                        F.col("n.vn"),
                        F.col("o.vn"),
                    ),
                )
                .filter(F.col("cos_sim") >= EMB_GATE_COS)
                .select(
                    F.col("n.vec_id").alias("incoming_vec_id"),
                    F.col("o.vec_id").alias("lake_vec_id"),
                    "cos_sim",
                )
            )
            res.write.mode("overwrite").parquet(
                os.path.join(outdir, f"epoch={epoch_id}")
            )

        return gate_batch

    return _run_ingest_gate_stream(
        spark,
        sf_dir,
        "quty_stream_gate_embedding",
        gate_batch_of,
        ["incoming_vec_id", "lake_vec_id", "cos_sim"],
        table="embeddings",
        id_col="vec_id",
    )


@registry.query(
    "stream_ingest_passage_gate",
    oracle=SQL_PASSAGE_GATE,
)
def stream_ingest_passage_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PASSAGE-family continuous ingest gate — the streaming twin of
    :func:`~quty_server_spark.operators.dedup.dedup_incremental_passages`,
    extending the continuous tier to the fourth artifact family:
    incoming documents arrive as a file stream in micro-batches; each
    batch is windowed (16-token windows at stride 8) and its digests
    LEFT-SEMI probed against the write-once lake passage artifact
    inside ``foreachBatch``, reporting per-doc window totals, lake-dup
    hits, and the scrub ratio, with the epoch-keyed idempotent parquet
    sink. Shares the batch gate's oracle SQL byte-for-byte; epoch union
    equals the one-shot gate exactly (each doc lands in one micro-batch,
    its windows are a pure function of its own text, and hits come only
    from static lake state — nothing crosses epochs; set-equality
    tested in tests/test_streaming_recovery.py).

    Scale: per micro-batch cost is window(batch) + one (pfx, digest)
    semi-join against the prefix-partitioned artifact — no lake-side
    aggregation (multiplicity absorbed by the semi join), no
    re-windowing of the lake on any trigger."""
    from quty_server_spark.operators.dedup import (
        _passage_pfx,
        _passage_windows,
        lake_passage_artifact,
    )

    configure(spark)
    art = spark.read.parquet(lake_passage_artifact(spark, sf_dir)).select(
        "pfx", "passage_md5"
    )

    def gate_batch_of(outdir: str):
        def gate_batch(batch_df: DataFrame, epoch_id: int) -> None:
            w = _passage_windows(batch_df).select(
                "doc_id", "passage_md5", _passage_pfx()
            ).localCheckpoint(eager=False)
            hits = (
                w.join(art, ["pfx", "passage_md5"], "leftsemi")
                .groupBy("doc_id")
                .agg(F.count("*").alias("n_lake_dup_windows"))
            )
            res = (
                w.groupBy("doc_id")
                .agg(F.count("*").alias("n_windows"))
                .join(hits, "doc_id", "left")
                .select(
                    "doc_id",
                    "n_windows",
                    F.coalesce("n_lake_dup_windows", F.lit(0)).alias(
                        "n_lake_dup_windows"
                    ),
                )
                .withColumn(
                    "dup_ppm",
                    F.expr("(1000000 * n_lake_dup_windows) DIV n_windows"),
                )
            )
            res.write.mode("overwrite").parquet(
                os.path.join(outdir, f"epoch={epoch_id}")
            )

        return gate_batch

    return _run_ingest_gate_stream(
        spark,
        sf_dir,
        "quty_stream_gate_passages",
        gate_batch_of,
        ["doc_id", "n_windows", "n_lake_dup_windows", "dup_ppm"],
    )


def _media_gate_oracle() -> str:
    """The batch media gate's oracle, shared byte-for-byte — the same
    one-definition device every other continuous gate twin uses."""
    from quty_server_spark.operators.multimodal import (
        _mm_incremental_gate_oracle,
    )

    return _mm_incremental_gate_oracle()


@registry.query("stream_ingest_media_gate", oracle=_media_gate_oracle())
def stream_ingest_media_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MEDIA-family continuous ingest gate — the streaming twin of
    :func:`~quty_server_spark.operators.multimodal.mm_neardup_incremental_artifact`,
    closing the r15 verdict's named gap: every other artifact family's
    nightly gate already had a foreachBatch twin; the perceptual
    media gate was batch-only. Tonight's media shard (``doc_id % 10 ==
    0`` of the staged perceptual universe — twins cross the shard/lake
    boundary by the ``_NEARDUP_TWIN_BASE ≡ 7 (mod 10)`` device, so
    every epoch set sees staged pairs) arrives as a file stream in
    micro-batches; each batch's payloads are signed through the REAL
    Arrow-batch decode seam inside ``foreachBatch`` (payload bytes
    never reach the driver) and its bands join the standing write-once
    perceptual-signature artifact asymmetrically (incoming × lake,
    never lake × lake), with the epoch-keyed idempotent parquet sink.
    Shares the batch gate's oracle SQL byte-for-byte; the epoch union
    equals the one-shot gate exactly — each media item lands in one
    micro-batch, its signature is a pure function of its own payload,
    and matches come only from static lake state, so nothing crosses
    epochs (set-equality pinned in tests/test_streaming_recovery.py).

    Scale: per micro-batch cost is one O(bytes) cumulative-sum signing
    pass over the batch's payloads + one band-equality join against the
    band_id-partitioned artifact (directory-pruned to the probe's own
    bands); the lake-side decode never runs on any trigger — the
    artifact amortizes it exactly as on the nightly path."""
    from quty_server_spark.operators.dedup import HAMMING_MAX
    from quty_server_spark.operators.multimodal import (
        media_sig_bands,
        media_signature_artifact,
        percep_media_universe,
    )

    configure(spark)
    lake = (
        spark.read.parquet(media_signature_artifact(spark, sf_dir))
        .select("doc_id", "sig", "band_id", "band_val")
        .alias("o")
    )

    def gate_batch_of(outdir: str):
        def gate_batch(batch_df: DataFrame, epoch_id: int) -> None:
            shard = media_sig_bands(spark, sf_dir, docs=batch_df).alias("n")
            res = (
                shard.join(
                    lake,
                    (F.col("n.band_id") == F.col("o.band_id"))
                    & (F.col("n.band_val") == F.col("o.band_val")),
                )
                .select(
                    F.col("n.doc_id").alias("incoming_doc_id"),
                    F.col("o.doc_id").alias("lake_doc_id"),
                    F.bit_count(
                        F.col("n.sig").bitwiseXOR(F.col("o.sig"))
                    ).alias("hamming"),
                )
                .filter(F.col("hamming") <= HAMMING_MAX)
                .distinct()
            )
            res.write.mode("overwrite").parquet(
                os.path.join(outdir, f"epoch={epoch_id}")
            )

        return gate_batch

    shard_uni = percep_media_universe(spark, sf_dir).filter(
        F.col("doc_id") % 10 == 0
    ).select("doc_id", "payload")
    return _run_ingest_gate_stream(
        spark,
        sf_dir,
        "quty_stream_gate_media",
        gate_batch_of,
        ["incoming_doc_id", "lake_doc_id", "hamming"],
        docs=shard_uni,
    )


@registry.query(
    "stream_cluster_maintenance",
    oracle=SQL_FULL_LABELS_SUMMARY_TMPL.format(sim=SQL_SIMHASH.lstrip()),
)
def stream_cluster_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUS clustering maintenance — the full label lifecycle run
    per micro-batch, composing three families in one stream: incoming
    documents arrive in epochs; each epoch is signed and banded, gated
    against a PRIVATE mutable copy of the signature artifact, contracted
    against the maintained label artifact's CURRENT state, min-label
    BSP'd, APPLIED (rewrite queued stale clusters + append the epoch's
    labels, sidecar-routed — :func:`~quty_server_spark.operators.dedup._apply_maintenance_for_state`),
    and finally the epoch's bands are APPENDED to the signature copy so
    LATER epochs can pair with earlier epochs' documents, not just the
    lake.

    Exactness is inductive and ORDER-INDEPENDENT at the close: after
    each epoch the maintained state equals a full recompute over
    lake ∪ processed epochs (the same contraction argument as
    :func:`~quty_server_spark.operators.dedup.dedup_cluster_incremental`,
    applied with the epoch as the shard), so after ALL epochs the
    artifact holds exactly the full-corpus components — which is what
    the oracle recomputes from scratch (the write-once sink's summary
    SQL over the raw corpus, lake restriction dropped). A cross-epoch
    merge (epoch-2 doc near an epoch-1 doc, neither near the lake) is
    representable ONLY because of the per-epoch signature append — the
    measurable difference between this stream and four independent
    nightly runs.

    Scale: per-trigger cost = sign(epoch) + gate join against the
    artifact + |epoch|-sized BSP + bucket-scoped apply + a 4-file band
    append. The artifacts are session-private copies (built from the
    memoized lake artifacts), so concurrent consumers of the standing
    artifacts never observe this stream's mutations."""
    from quty_server_spark.operators.dedup import (
        _apply_maintenance_for_state,
        _cluster_graph_for_bands,
        _write_home_bucket_layout,
        append_to_band_artifact,
        lake_cluster_labels_artifact,
        lake_signature_artifact,
        min_label_components,
        simhash_bands,
        simhash_sigs_docs,
    )
    from quty_server_spark.session import session_tmp_dir

    configure(spark)
    base = session_tmp_dir(spark, "quty_stream_clabels", sf_dir)
    indir = os.path.join(base, "in")
    sig_path = os.path.join(base, "sig")
    lbl_path = os.path.join(base, "labels")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)

    # Private mutable copies of the two standing artifacts: the lake's
    # banded signatures (grown by each epoch's append) and the lake-only
    # labels in home-bucket layout (maintained by each epoch's apply).
    # The memoized artifact builders resolve first (sequential — they
    # may run the one-time lake jobs); the three independent setup
    # writes (sig copy, home layout, stream input) then overlap in a
    # small pool (guide §2.6 — disjoint output dirs, read-only inputs).
    lake_sig = lake_signature_artifact(spark, sf_dir)
    lake_lbl = lake_cluster_labels_artifact(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 == 0
    )
    with ThreadPoolExecutor(max_workers=2) as pool:
        sig_f = pool.submit(
            lambda: spark.read.parquet(lake_sig)
            .sortWithinPartitions("band_id", "band_val")
            .write.partitionBy("band_id")
            .parquet(sig_path)
        )
        lbl_f = pool.submit(
            _write_home_bucket_layout,
            spark.read.parquet(lake_lbl),
            lbl_path,
        )
        docs.repartition(4, "doc_id").write.parquet(indir)
        sig_f.result()
        lbl_f.result()

    def gate_batch(batch_df: DataFrame, epoch_id: int) -> None:
        bands = simhash_bands(
            simhash_sigs_docs(batch_df.select("doc_id", "text"))
        ).localCheckpoint(eager=False)
        pairs, singles = _cluster_graph_for_bands(
            spark, bands, sig_path, lbl_path
        )
        labels, _ = min_label_components(spark, pairs)
        # r18 (guide §2.6): once the BSP's first action has run, the
        # gate join over the signature copy is materialized (bands and
        # the contracted graph are checkpointed), so the epoch's band
        # append — which touches sig_path only — is independent of the
        # label apply (lbl_path only) and overlaps it in a worker
        # thread. The per-epoch invariant is unchanged: both are done
        # before the trigger returns, so epoch N+1 still sees epoch N's
        # bands and labels.
        with ThreadPoolExecutor(max_workers=1) as pool:
            band_f = pool.submit(
                append_to_band_artifact, bands, sig_path, "band_val"
            )
            _apply_maintenance_for_state(
                spark,
                lbl_path,
                labels.localCheckpoint(eager=True),
                singles.localCheckpoint(eager=False),
            )
            band_f.result()

    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(indir)
        .writeStream.foreachBatch(gate_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.parquet(lbl_path)
        .groupBy(F.col("lbl").alias("cluster_id"))
        .agg(
            F.count("*").alias("n_docs"),
            F.max("node").alias("max_doc_id"),
        )
        .localCheckpoint(eager=True)
    )


def _stream_corpus_snapshot_oracle() -> str:
    from quty_server_spark.operators.pipeline import (
        _incremental_snapshot_oracle,
    )

    return _incremental_snapshot_oracle()


@registry.query(
    "stream_corpus_snapshot",
    oracle=_stream_corpus_snapshot_oracle(),
)
def stream_corpus_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE CONTINUOUS PRODUCT — the streaming twin of
    :func:`~quty_server_spark.operators.pipeline.corpus_training_snapshot_incremental`,
    making the top-level training-snapshot product continuous end to
    end (r13 VERDICT "Next round" #6). Incoming documents arrive in
    micro-batches; each epoch runs the full composition:

    1. QUALITY gate — the family's shared predicate
       (pipeline.snapshot_quality_keep), per-doc, order-independent.
    2. PASSAGE scrub — the epoch's windows LEFT-SEMI probed against the
       write-once lake digest artifact (static lake state, per-doc,
       order-independent); dup_ppm computed per doc.
    3. LABEL lifecycle — the epoch is signed, gated against the private
       signature copy (lake ∪ earlier epochs), contracted-BSP'd, and
       APPLIED to the private maintained label artifact; the epoch's
       bands are appended so later epochs can pair with this one — the
       exact :func:`stream_cluster_maintenance` composition, whose
       close-state ≡ full-recompute contract is what makes step 4
       exact.

    Steps 1–2 are emitted per epoch into the idempotent epoch-keyed
    sink (the PROVISIONAL admissions). Step 4, at stream close,
    reconciles keepers against the FINAL maintained labels: a
    provisional doc survives iff its full-corpus cluster label is its
    own id. Reconciliation must be close-time because admission is
    retroactive by nature — a later epoch can deliver a smaller-id
    member of an earlier doc's cluster and evict it (a production
    stream would emit a tombstone; the snapshot semantics here are
    "admit provisionally, settle at snapshot close"). The oracle is
    the batch twin's SQL byte-for-byte, and the epoch-union +
    final-equality pins live in tests/test_streaming_recovery.py.

    Scale: per-trigger cost = quality(epoch) + window(epoch) + pruned
    digest probe + the maintenance stream's epoch-sized label work;
    close-time cost = one join of the provisional rows against the
    maintained artifact. Zero lake-sized compute on any trigger."""
    from quty_server_spark.operators.dedup import (
        _apply_maintenance_for_state,
        _cluster_graph_for_bands,
        _passage_pfx,
        _passage_windows,
        _write_home_bucket_layout,
        append_to_band_artifact,
        lake_cluster_labels_artifact,
        lake_passage_artifact,
        lake_signature_artifact,
        min_label_components,
        simhash_bands,
        simhash_sigs_docs,
    )
    from quty_server_spark.operators.pipeline import snapshot_quality_keep
    from quty_server_spark.session import session_tmp_dir

    configure(spark)
    base = session_tmp_dir(spark, "quty_stream_snapshot", sf_dir)
    indir = os.path.join(base, "in")
    outdir = os.path.join(base, "out")
    sig_path = os.path.join(base, "sig")
    lbl_path = os.path.join(base, "labels")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)

    # Same setup-overlap device as stream_cluster_maintenance: resolve
    # the memoized artifacts first, then run the three independent
    # setup writes concurrently (guide §2.6).
    lake_sig = lake_signature_artifact(spark, sf_dir)
    lake_lbl = lake_cluster_labels_artifact(spark, sf_dir)
    pw_art = spark.read.parquet(lake_passage_artifact(spark, sf_dir)).select(
        "pfx", "passage_md5"
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    ).filter(F.col("doc_id") % 10 == 0)
    with ThreadPoolExecutor(max_workers=2) as pool:
        sig_f = pool.submit(
            lambda: spark.read.parquet(lake_sig)
            .sortWithinPartitions("band_id", "band_val")
            .write.partitionBy("band_id")
            .parquet(sig_path)
        )
        lbl_f = pool.submit(
            _write_home_bucket_layout,
            spark.read.parquet(lake_lbl),
            lbl_path,
        )
        docs.repartition(4, "doc_id").write.parquet(indir)
        sig_f.result()
        lbl_f.result()

    def gate_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df = batch_df.localCheckpoint(eager=True)

        # provisional admission: quality + lake-passage scrub. Reads the
        # epoch checkpoint + the STATIC lake digest artifact and writes
        # the epoch-keyed sink dir — fully independent of the label
        # lifecycle below (which touches sig_path/lbl_path only), so it
        # runs in a worker thread alongside it (guide §2.6; the r17
        # multimodal-snapshot device). Epoch semantics unchanged: both
        # halves complete before the trigger returns.
        def _admit_epoch() -> None:
            w = _passage_windows(batch_df).select(
                "doc_id", "passage_md5", _passage_pfx()
            ).localCheckpoint(eager=False)
            hits = (
                w.join(pw_art, ["pfx", "passage_md5"], "leftsemi")
                .groupBy("doc_id")
                .agg(F.count("*").alias("nh"))
            )
            scrub = (
                w.groupBy("doc_id")
                .agg(F.count("*").alias("nw"))
                .join(hits, "doc_id", "left")
                .select(
                    "doc_id",
                    F.expr("(1000000 * coalesce(nh, 0)) DIV nw").alias(
                        "dup_ppm"
                    ),
                )
            )
            n_tok = F.size(F.split("text", " "))
            res = (
                batch_df.filter(snapshot_quality_keep())
                .select(
                    "doc_id", "lang", "source",
                    n_tok.cast("bigint").alias("n_tokens"),
                )
                .join(scrub, "doc_id", "left")
                .withColumn(
                    "dup_ppm",
                    F.coalesce("dup_ppm", F.lit(0)).cast("bigint"),
                )
                .filter(F.col("dup_ppm") < 500000)
            )
            res.write.mode("overwrite").parquet(
                os.path.join(outdir, f"epoch={epoch_id}")
            )

        with ThreadPoolExecutor(max_workers=1) as pool:
            admit_f = pool.submit(_admit_epoch)
            # label lifecycle (the stream_cluster_maintenance
            # composition), with the same band-append overlap
            bands = simhash_bands(
                simhash_sigs_docs(batch_df.select("doc_id", "text"))
            ).localCheckpoint(eager=False)
            pairs, singles = _cluster_graph_for_bands(
                spark, bands, sig_path, lbl_path
            )
            labels, _ = min_label_components(spark, pairs)
            with ThreadPoolExecutor(max_workers=1) as band_pool:
                band_f = band_pool.submit(
                    append_to_band_artifact, bands, sig_path, "band_val"
                )
                _apply_maintenance_for_state(
                    spark,
                    lbl_path,
                    labels.localCheckpoint(eager=True),
                    singles.localCheckpoint(eager=False),
                )
                band_f.result()
            admit_f.result()

    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(indir)
        .writeStream.foreachBatch(gate_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    prov = spark.read.parquet(outdir).select(
        "doc_id", "lang", "source", "n_tokens", "dup_ppm"
    )
    lbl = spark.read.parquet(lbl_path).select(
        F.col("node").alias("doc_id"), F.col("lbl").alias("final_lbl")
    )
    return (
        prov.join(lbl, "doc_id", "left")
        .withColumn(
            "cluster_id", F.coalesce("final_lbl", F.col("doc_id"))
        )
        .filter(F.col("cluster_id") == F.col("doc_id"))
        .select(
            "doc_id", "lang", "source", "n_tokens", "cluster_id", "dup_ppm"
        )
        .localCheckpoint(eager=True)
    )


@registry.query(
    "stream_ingest_exact_dedup_sequential",
    oracle=f"""
    WITH {SQL_DUPED},
    shard AS (
        SELECT doc_id, md5(text) AS h, (doc_id % 7) % 4 AS epoch
        FROM duped WHERE doc_id % 10 = 0
    ),
    lake_h AS (
        SELECT DISTINCT md5(text) AS h FROM duped WHERE doc_id % 10 <> 0
    )
    SELECT s.doc_id AS admitted_doc_id,
           CAST(s.epoch AS BIGINT) AS epoch,
           s.h AS text_md5
    FROM shard s
    WHERE NOT EXISTS (SELECT 1 FROM lake_h l WHERE l.h = s.h)
      AND NOT EXISTS (
          SELECT 1 FROM shard s2
          WHERE s2.h = s.h AND (s2.epoch < s.epoch
                OR (s2.epoch = s.epoch AND s2.doc_id < s.doc_id)))
    """,
)
def stream_ingest_exact_dedup_sequential(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The ORDER-DEPENDENT continuous gate — the one semantics no other
    streaming query in the registry has: later micro-batches must see
    EARLIER batches' admissions, because first-contact wins. Exact
    dedup over the duped corpus (every ``doc_id % 10 == 0`` doc has an
    exact copy at ``+1,000,000``, itself also ``% 10 == 0`` — so the
    duplicate pairs live INSIDE the stream): a doc is admitted iff its
    content hash is not in the lake AND no same-hash doc arrived in an
    earlier epoch (or earlier doc_id within its own epoch). The
    foreachBatch body APPENDS each epoch's admitted hashes to a
    seen-state parquet directory and anti-joins the next batch against
    it — the in-stream version of the write-once/append artifact
    lifecycle, where the stream maintains its OWN artifact.

    Determinism + replay safety: epochs are staged as one file per
    ``(doc_id % 7) % 4`` value (files utime'd in epoch order, so the
    file source's oldest-first ordering equals the oracle's epoch
    numbering — ``1,000,000 % 7 == 1`` splits each original from its
    copy into different epochs, exercising the cross-epoch path ~75%
    of the time and the within-batch min the rest). Seen-state rows
    are keyed ``(h, epoch)`` and each batch reads only rows with
    ``epoch < epoch_id``: a replayed epoch cannot be rejected by its
    own previous append, so the epoch-keyed output overwrite stays
    idempotent even though the state dir is append-only (duplicate
    appends from replays are filtered the same way). The oracle states
    the sequential fold declaratively as a pure function of
    (hash, epoch, doc_id) — DuckDB never streams, yet verifies the
    order-dependent answer exactly.

    Scale: per-batch cost = hash(batch) + two anti-joins (lake hashes,
    seen hashes — both broadcastable digests) + a per-hash min window
    over the batch; the seen state grows by exactly the admitted
    hashes, 32 bytes each. This is the production shape of a streaming
    exactly-once admission ledger."""
    configure(spark)
    base = session_tmp_dir(spark, "quty_stream_seq_dedup", sf_dir)
    indir = os.path.join(base, "in")
    outdir = os.path.join(base, "out")
    seendir = os.path.join(base, "seen")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(indir)

    corpus = duped_corpus(spark, sf_dir)
    shard = corpus.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id", "text", F.expr("(doc_id % 7) % 4").alias("epoch")
    )
    lake_h = (
        corpus.filter(F.col("doc_id") % 10 != 0)
        .select(F.md5("text").alias("h"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # Stage one file per epoch, utime'd in epoch order so the file
    # source's oldest-first ordering IS the oracle's epoch numbering.
    # Empty epochs still stage a (schema-only) file so trigger indices
    # never shift.
    import glob as _glob
    import time as _time

    t0 = _time.time()
    for k in range(4):
        stage = os.path.join(base, f"stage{k}")
        shard.filter(F.col("epoch") == k).select(
            "doc_id", "text"
        ).coalesce(1).write.parquet(stage)
        part = _glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = os.path.join(indir, f"e{k}.parquet")
        os.replace(part, dst)
        os.utime(dst, (t0 + k, t0 + k))
        shutil.rmtree(stage, ignore_errors=True)
    # Seen-state init: empty (h, epoch) ledger.
    spark.createDataFrame([], "h string, epoch long").write.parquet(seendir)

    def gate_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from pyspark.sql import Window

        b = batch_df.select("doc_id", F.md5("text").alias("h"))
        seen = (
            spark.read.schema("h string, epoch long")
            .parquet(seendir)
            .filter(F.col("epoch") < epoch_id)
            .select("h")
        )
        survivors = b.join(lake_h, "h", "left_anti").join(
            seen, "h", "left_anti"
        )
        w = Window.partitionBy("h").orderBy("doc_id")
        admitted = (
            survivors.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                F.col("doc_id").alias("admitted_doc_id"),
                F.lit(epoch_id).cast("bigint").alias("epoch"),
                F.col("h").alias("text_md5"),
            )
            .localCheckpoint(eager=True)  # one computation for 2 writes
        )
        admitted.write.mode("overwrite").parquet(
            os.path.join(outdir, f"e{epoch_id}")
        )
        admitted.select(
            F.col("text_md5").alias("h"), F.col("epoch")
        ).write.mode("append").parquet(seendir)

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(indir)
        .writeStream.foreachBatch(gate_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.parquet(os.path.join(outdir, "e*"))
        .select("admitted_doc_id", "epoch", "text_md5")
        .localCheckpoint(eager=True)
    )


@registry.query(
    "stream_lake_retraction",
    oracle=None,  # set below — shares the batch retraction oracle
)
def stream_lake_retraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUS takedown — the retraction verb's streaming twin,
    completing the lifecycle symmetry (ingest, append, maintenance, and
    the snapshot product all have continuous twins; deletion now does
    too): takedown requests arrive as a unified (kind, id) feed in
    micro-batches — document ids for the three doc-keyed families, vec
    ids for IVF — and each batch appends its victims to the families'
    ``_tombstones`` sidecars inside ``foreachBatch`` (an O(batch)
    union+distinct sidecar rewrite; zero artifact data files touched on
    any trigger). At stream close, the four live views are summarized
    in the shared tagged frame.

    The oracle is byte-identical to the three batch retraction sinks'
    (``SQL_RETRACT_SUMMARY``), so a green row proves the epoch-split
    tombstone stream converges to EXACTLY the one-shot retraction —
    which holds by construction because tombstone-set union is
    commutative and idempotent: batch order cannot matter, and an epoch
    REPLAY after a crash re-unions the same victim ids into the same
    set (the idempotent-sink discipline every continuous twin in this
    module follows, here for free from the data structure).

    Scale: per-trigger cost is the batch's victim list (the sidecar is
    victim-set-sized metadata, like _label_homes); consumers pay the
    tombstone tier's one broadcast anti-join until scheduled compaction
    (sink_lake_artifacts_retract_compacted) folds the accumulated set
    physically. Reference analog: the reference retires a dead node's
    subscriptions per-event as leave messages arrive
    (lib/QutyCluster.js:518-578); this is that verb at lake scale."""
    from quty_server_spark.operators.retract import (
        RETRACT_MOD,
        _copy_artifact,
        _write_tombstones,
        ARTIFACT_LAYOUTS,
        read_artifact_live,
        _tagged_retract_summary,
    )
    from quty_server_spark.operators.dedup import (
        lake_minhash_artifact,
        lake_passage_artifact,
        lake_signature_artifact,
    )
    from quty_server_spark.operators.similarity import (
        ivf_postings_artifact,
    )

    configure(spark)
    base = session_tmp_dir(spark, "quty_stream_retract", sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    indir = os.path.join(base, "in")
    ckpt = os.path.join(base, "ckpt")

    builders = {
        "sig": lake_signature_artifact,
        "minhash": lake_minhash_artifact,
        "passage": lake_passage_artifact,
        "ivf": ivf_postings_artifact,
    }
    paths = {}
    for fam, build in builders.items():
        p = os.path.join(base, fam)
        _copy_artifact(build(spark, sf_dir), p)
        paths[fam] = p

    # The unified takedown feed: document victims (three doc-keyed
    # families) + vector victims (IVF), staged as 4 hash-partitioned
    # files -> 4 deterministic micro-batches under maxFilesPerTrigger=1.
    docs_v = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == RETRACT_MOD)
        .select(F.lit("doc").alias("kind"), F.col("doc_id").alias("id"))
    )
    vec_v = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 10 == RETRACT_MOD)
        .select(F.lit("vec").alias("kind"), F.col("vec_id").alias("id"))
    )
    feed = docs_v.unionByName(vec_v)
    feed.repartition(4, "id").write.parquet(indir)

    def tombstone_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # Unconditional per-family union: an empty slice just rewrites
        # the (victim-list-sized) sidecar unchanged — cheaper than a
        # driver-side emptiness probe, and keeps the batch path free of
        # driver materialization (the repo-wide sweep).
        b = batch_df.localCheckpoint(eager=True)
        doc_ids = b.filter(F.col("kind") == "doc").select("id")
        vec_ids = b.filter(F.col("kind") == "vec").select("id")
        for fam in ("sig", "minhash", "passage"):
            _write_tombstones(spark, paths[fam], doc_ids)
        _write_tombstones(spark, paths["ivf"], vec_ids)

    q = (
        spark.readStream.schema(feed.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(indir)
        .writeStream.foreachBatch(tombstone_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return _tagged_retract_summary(
        {
            fam: read_artifact_live(
                spark, p, ARTIFACT_LAYOUTS[fam][1]
            )
            for fam, p in paths.items()
        }
    ).localCheckpoint(eager=True)


# Shares the batch retraction oracle byte-for-byte: stream-of-epochs
# tombstoning must converge to the one-shot retract.
def _set_stream_retraction_oracle() -> None:
    from quty_server_spark.operators.retract import SQL_RETRACT_SUMMARY

    registry.oracles["stream_lake_retraction"] = SQL_RETRACT_SUMMARY


_set_stream_retraction_oracle()


@registry.query(
    "stream_training_shards",
    oracle=None,  # set below — shares the batch append twin's oracle
)
def stream_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUS trainer handoff — the shard APPEND verb's streaming
    twin, completing the lifecycle symmetry the round-14/15 tiers
    built (ingest, maintenance, snapshot, retraction, and now the
    trainer handoff each have batch + continuous forms): tonight's
    admitted snapshot additions
    (:func:`~quty_server_spark.operators.pipeline.corpus_training_snapshot_incremental`'s
    output) arrive in micro-batches, and each epoch lands as ONE
    shard-partitioned commit directory next to the standing base
    shards — written ``mode("overwrite")`` into its own ``e{epoch}``
    root, the file-sink exactly-once device: an epoch REPLAY after a
    crash rewrites the identical directory instead of duplicating
    appended rows (plain parquet ``append`` is not replay-idempotent;
    per-epoch overwrite commits are — pinned in
    tests/test_streaming_recovery.py). The trainer reads base + e*
    as one partitioned dataset; shard-directory pruning works
    unchanged because every commit root carries the same ``shard=N``
    layout.

    At close the grown dataset is read back and summarized under the
    oracle shared BYTE-FOR-BYTE with ``sink_training_shards_append``
    (set below): epoch-split append converges to exactly the one-shot
    batch append, which holds by construction — the written ROW SET is
    the union of the epoch row sets, and row-set union is associative
    and commutative regardless of the epoch partitioning.

    Scale: per-trigger cost is the epoch's additions only (shard
    assignment is the scan-side content-keyed hash; the write is one
    exchange over the batch); the standing base is neither re-read nor
    re-written on any trigger; close = one partition-pruned read-back
    aggregate."""
    import glob as _glob

    from quty_server_spark.operators.pipeline import (
        _shard_summary,
        _write_training_shards,
        corpus_training_snapshot_incremental,
        scoped_training_snapshot,
    )

    configure(spark)
    base = session_tmp_dir(spark, "quty_stream_train_shards", sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    indir = os.path.join(base, "in")
    ckpt = os.path.join(base, "ckpt")
    outbase = os.path.join(base, "out", "base")

    lake_docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 != 0
    )
    _write_training_shards(scoped_training_snapshot(spark, lake_docs), outbase)

    adds = corpus_training_snapshot_incremental(spark, sf_dir)
    # 4 hash-partitioned files -> deterministic micro-batches under
    # maxFilesPerTrigger=1 (same staging device as the retraction
    # stream; empty slices simply stage no file).
    adds.repartition(4, "doc_id").write.parquet(indir)

    def append_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        _write_training_shards(
            batch_df,
            os.path.join(base, "out", f"e{epoch_id}"),
            mode="overwrite",
        )

    q = (
        spark.readStream.schema(adds.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(indir)
        .writeStream.foreachBatch(append_epoch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # Empty epochs commit an empty root (no shard=N files) — skip them:
    # schema inference has nothing to read there, and an empty slice
    # contributes no rows by definition.
    # This close-state glob + per-commit-root loop is DRIVER-side and
    # bounded by the EPOCH count (one dir per trigger; 4 on the
    # fixture) — metadata grain, like the retraction device's
    # partition lists. A deployment running unbounded triggers should
    # fold commit roots into the standing layout on a compaction
    # cadence (the sink_training_shards_compact verb) rather than let
    # this list grow with stream lifetime.
    outs = [outbase] + sorted(
        p
        for p in _glob.glob(os.path.join(base, "out", "e*"))
        if _glob.glob(os.path.join(p, "shard=*", "*.parquet"))
    )
    # One partitioned read per commit root (each infers its own shard=N
    # layout — a single multi-root read would need a shared basePath
    # and the commit roots are siblings, not partition values), unioned
    # by name; shard-directory pruning still pushes into every root.
    back = spark.read.parquet(outs[0])
    for p in outs[1:]:
        back = back.unionByName(spark.read.parquet(p))
    return _shard_summary(back).localCheckpoint(eager=True)


# Shares the batch append twin's oracle byte-for-byte: the epoch-split
# continuous append must converge to the one-shot nightly append.
def _set_stream_training_shards_oracle() -> None:
    from quty_server_spark.operators.pipeline import (
        _training_shards_append_oracle,
    )

    registry.oracles["stream_training_shards"] = (
        _training_shards_append_oracle()
    )


_set_stream_training_shards_oracle()
