"""Extended TPC-H-style analytics (SURVEY.md §2.C rows 3–8, widened).

More join/agg/subquery shapes over the star schema, complementing
relational.py's q1/q3/q5: predicate-heavy scan agg (q6), semi-join
existence counting (q4), top-k revenue with dimension joins (q10), promo
share conditional aggregation (q14), correlated-average filtering (q17),
and having-on-aggregate large orders (q18).

Scale rules are the same as relational.py: dimension sides broadcast,
facts never shuffled except for their own aggregations, filters pushed
to parquet, decimal-exact sums (operators/_helpers.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from quty_server_spark.functions.hashing import hash28, sql_hash28
from quty_server_spark.operators._helpers import davg, dsum, load_table, oavg, osum
from quty_server_spark.plans.registry import registry


@registry.query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {osum('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.04 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure predicate scan + ungrouped aggregate — the query
    whose entire cost is scan efficiency; every predicate reaches the
    parquet reader (PushedFilters), no shuffle except the final reduce."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount").between(0.04, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@registry.query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join (shipdate after orderdate
    stands in for the fixture's missing commitdate/receiptdate), then
    count by priority. The semi join shuffles only the keys + join
    predicate columns, never full rows."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    window = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
    )
    late = window.join(
        li,
        (window.o_orderkey == li.l_orderkey) & (li.l_shipdate > window.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@registry.query(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {osum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue per customer, top 20. Customer and
    nation broadcast; lineitem filtered on returnflag at the scan. The
    LIMIT ordering carries c_custkey as unique tiebreaker so top-20 is
    deterministic across engines."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            ),
            li.l_orderkey == o.o_orderkey,
        )
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(rev).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@registry.query(
    "q14_promo_effect",
    oracle=f"""
    SELECT 100.0 * {osum("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
               / {osum('l.l_extendedprice * (1 - l.l_discount)')} AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: conditional share of revenue from PROMO parts. Part is
    broadcast (map-side hash join); the conditional sum is one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .join(broadcast(p), li.l_partkey == p.p_partkey)
        .agg((F.lit(100.0) * dsum(promo) / dsum(rev)).alias("promo_revenue_pct"))
    )


@registry.query(
    "q17_small_quantity",
    oracle=f"""
    WITH part_avg AS (
        SELECT l_partkey, {oavg('l_quantity')} AS avg_qty
        FROM lineitem GROUP BY l_partkey)
    SELECT {osum('l.l_extendedprice')} / 7.0 AS avg_yearly, COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part_avg a ON l.l_partkey = a.l_partkey
    WHERE l.l_quantity < 0.5 * a.avg_qty
    """,
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity) decorrelated into an aggregate + self-join — how Catalyst
    itself rewrites it; the per-part aggregate is tiny and broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        davg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(broadcast(part_avg), li.l_partkey == part_avg.pk)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (dsum("l_extendedprice") / 7.0).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


@registry.query(
    "q18_large_orders",
    oracle=f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           {osum('l.l_quantity')} AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 250)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume orders (total quantity > 250) with their
    customers. The HAVING subquery is a pre-aggregation of lineitem keyed
    by order — reused as a semi-join filter, so the main join only touches
    qualifying orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        o.join(broadcast(big), o.o_orderkey == big.l_orderkey, "left_semi")
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("total_qty"))
    )


@registry.query(
    "agg_pivot",
    oracle=f"""
    SELECT c_mktsegment,
           {osum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END")} AS open_total,
           {osum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END")} AS finished_total,
           {osum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END")} AS pending_total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c_mktsegment
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order totals by market segment × order status, statuses as
    columns. Spark's pivot with an explicit value list compiles to the
    same single-pass conditional aggregation the oracle spells out — no
    second scan to discover pivot values (which at 100 TB would be a full
    extra pass)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    piv = (
        o.join(broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(dsum("o_totalprice"))
    )
    return piv.select(
        "c_mktsegment",
        F.coalesce(F.col("O"), F.lit(0.0)).alias("open_total"),
        F.coalesce(F.col("F"), F.lit(0.0)).alias("finished_total"),
        F.coalesce(F.col("P"), F.lit(0.0)).alias("pending_total"),
    )


@registry.query(
    "agg_unpivot",
    oracle="""
    WITH wide AS (
        SELECT n_nationkey,
               LENGTH(n_name) AS name_len,
               n_regionkey AS region_key,
               n_nationkey % 7 AS key_mod
        FROM nation
    )
    SELECT n_nationkey, 'name_len' AS metric, CAST(name_len AS BIGINT) AS val FROM wide
    UNION ALL
    SELECT n_nationkey, 'region_key', CAST(region_key AS BIGINT) FROM wide
    UNION ALL
    SELECT n_nationkey, 'key_mod', CAST(key_mod AS BIGINT) FROM wide
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide metric columns to (key, metric, value) long
    form — pivot's inverse, the feed shape for metric stores and
    plotting. Spark's ``unpivot`` compiles to a single-scan Expand (each
    input row emits one row per metric), never a self-union of N scans —
    the difference between 1 and N passes at 100 TB.
    """
    n = load_table(spark, sf_dir, "nation")
    wide = n.select(
        "n_nationkey",
        F.length("n_name").cast("long").alias("name_len"),
        F.col("n_regionkey").cast("long").alias("region_key"),
        (F.col("n_nationkey") % 7).cast("long").alias("key_mod"),
    )
    return wide.unpivot(
        ["n_nationkey"],
        ["name_len", "region_key", "key_mod"],
        "metric",
        "val",
    )


@registry.query(
    "events_time_rollup",
    oracle=f"""
    SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
           date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
           COUNT(*) AS n, {osum('value')} AS total_value
    FROM events
    GROUP BY GROUPING SETS (
        (date_trunc('day', CAST(ts AS TIMESTAMP))),
        (date_trunc('day', CAST(ts AS TIMESTAMP)),
         date_trunc('hour', CAST(ts AS TIMESTAMP))))
    """,
)
def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: one pass produces both the
    hourly and the daily rollup of the event stream (rollup minus the
    grand total). At scale this is the materialization query behind a
    multi-resolution dashboard — partial aggregation collapses rows
    map-side at the finest grain, and coarser grains reuse the same
    shuffle."""
    ev = load_table(spark, sf_dir, "events")
    bucketed = ev.select(
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
        "value",
    )
    return (
        bucketed.rollup("day", "hour")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
        .filter(F.grouping_id() < 3)  # drop the grand-total row
        .select("day", "hour", "n", "total_value")
    )


@registry.query(
    "events_user_funnel",
    oracle="""
    WITH s AS (SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t_signup
               FROM events WHERE event_type = 'signup' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_click
          FROM events e JOIN s ON e.user_id = s.user_id
          WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > s.t_signup
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_purchase
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.t_click
          GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM s) AS n_signup,
           (SELECT COUNT(*) FROM c) AS n_click_after,
           (SELECT COUNT(*) FROM p) AS n_purchase_after
    """,
)
def events_user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel over the event stream: signup → first
    click strictly after it → first purchase strictly after that click,
    counted per stage. Each stage is a per-user MIN keyed the same way,
    so at scale all three aggregations reuse one hash partitioning by
    user_id (no re-shuffle between stages); the stage outputs are
    single-row aggregates cross-joined at the end — the classic
    sessionized-funnel shape of product analytics at 100 TB."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        s.agg(F.count("*").alias("n_signup"))
        .crossJoin(c.agg(F.count("*").alias("n_click_after")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase_after")))
    )


@registry.query(
    "events_retention_cohort",
    oracle="""
    WITH activity AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day
        FROM events),
    cohort AS (SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY user_id)
    SELECT c.cohort_day,
           CAST(date_diff('day', c.cohort_day, a.day) AS INT) AS day_offset,
           COUNT(*) AS active_users
    FROM activity a JOIN cohort c ON a.user_id = c.user_id
    GROUP BY c.cohort_day, date_diff('day', c.cohort_day, a.day)
    """,
)
def events_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-active day, and
    for each (cohort, day-offset) the count of users still active. The
    distinct-activity set and the cohort MIN share the user_id
    partitioning; the final group-by is over a tiny (cohort × offset)
    domain. COUNT(*) over the distinct set replaces COUNT(DISTINCT) —
    same answer, one fewer dedup pass."""
    ev = load_table(spark, sf_dir, "events")
    activity = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    cohort = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        activity.join(cohort, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.to_date("day"), F.to_date("cohort_day"))
            .cast("int")
            .alias("day_offset"),
        )
        .agg(F.count("*").alias("active_users"))
    )


@registry.query(
    "events_sessionize_batch",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN CAST(ts AS TIMESTAMP)
                         - lag(CAST(ts AS TIMESTAMP))
                           OVER (PARTITION BY user_id
                                 ORDER BY CAST(ts AS TIMESTAMP), event_id)
                        > INTERVAL 30 MINUTE
                         OR lag(CAST(ts AS TIMESTAMP))
                            OVER (PARTITION BY user_id
                                  ORDER BY CAST(ts AS TIMESTAMP), event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events),
    sess AS (
        SELECT user_id, event_id, value, ts,
               CAST(SUM(is_new) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS BIGINT)
                   AS session_no
        FROM seq)
    SELECT user_id, session_no, COUNT(*) AS n_events,
           {osum('value')} AS session_value,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sess GROUP BY user_id, session_no
    """,
)
def events_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization in batch (the offline twin of
    stream_session_window): a session break is a >30-minute silence per
    user; session ids are a running sum over break flags. Both window
    passes and the final aggregate share ONE shuffle by user_id — the
    sort order (ts, event_id) is reused, so at 100 TB this is a single
    exchange + sort regardless of row count."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts) > 1800 * 1_000_000),
        1,
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ev.select("user_id", "event_id", "value", "ts")
        .withColumn("is_new", is_new)
        .withColumn("session_no", F.sum("is_new").over(run))
        .groupBy("user_id", "session_no")
        .agg(
            F.count("*").alias("n_events"),
            dsum("value").alias("session_value"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


@registry.query(
    "agg_histogram_mode",
    oracle=f"""
    WITH b AS (
        SELECT CASE WHEN o_totalprice >= 500000.0 THEN 11
                    ELSE CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) + 1 END AS bucket,
               o_totalprice
        FROM orders),
    h AS (SELECT bucket, COUNT(*) AS n, {osum('o_totalprice')} AS bucket_total
          FROM b GROUP BY bucket)
    SELECT bucket, n, bucket_total,
           CASE WHEN n = (SELECT MAX(n) FROM h) THEN 1 ELSE 0 END AS is_mode
    FROM h
    """,
)
def agg_histogram_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals (10 buckets of 50k over
    [0, 500000), overflow clamped into the last) with the modal bucket
    flagged. width_bucket(x, 0, 500000, 10) semantics, spelled as
    floor-division on both engines (DuckDB has no width_bucket builtin
    and Spark's operand order inside the builtin is not bit-specified —
    the explicit form is engine-portable). One map-side-combined
    aggregation; the mode flag is a broadcast of the single-row MAX back
    over the (tiny) bucket table, not a second scan of orders."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.when(F.col("o_totalprice") >= 500000.0, F.lit(11)).otherwise(
        F.floor(F.col("o_totalprice") / 50000.0) + 1
    )
    h = (
        o.select(bucket.cast("bigint").alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(F.count("*").alias("n"), dsum("o_totalprice").alias("bucket_total"))
    )
    mx = h.agg(F.max("n").alias("mx"))
    return h.join(broadcast(mx)).select(
        "bucket",
        "n",
        "bucket_total",
        F.when(F.col("n") == F.col("mx"), 1).otherwise(0).alias("is_mode"),
    )


@registry.query(
    "agg_skew_profile",
    oracle="""
    WITH k AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
    tot AS (SELECT SUM(n) AS total, COUNT(*) AS n_keys FROM k),
    ranked AS (
        SELECT user_id, n,
               ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS rn,
               SUM(n) OVER (ORDER BY n DESC, user_id
                            ROWS UNBOUNDED PRECEDING) AS cum
        FROM k)
    SELECT r.user_id, r.n, r.rn,
           CAST(r.n AS DOUBLE) / CAST(t.total AS DOUBLE) AS share,
           CAST(r.cum AS DOUBLE) / CAST(t.total AS DOUBLE) AS cum_share,
           t.n_keys
    FROM ranked r CROSS JOIN tot t
    WHERE r.rn <= 20
    """,
)
def agg_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostic: the top-20 heaviest keys with their absolute
    counts, share of total rows, and cumulative share — the measurement
    that decides whether a join/agg on this key needs salting or AQE skew
    handling BEFORE the 100 TB run, instead of discovering it from a
    straggler task. Per-key counts are one map-side-combined aggregation;
    ranking and the running share operate on the (tiny) key histogram,
    and shares are exact int64 counts with a single double division."""
    ev = load_table(spark, sf_dir, "events")
    k = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    tot = k.agg(F.sum("n").alias("total"), F.count("*").alias("n_keys"))
    # Top-20 via orderBy().limit() → TakeOrderedAndProject, NOT a global
    # row_number window: the per-key histogram can be 10^9 keys at scale
    # and must never be sorted in a single partition. Rank and running sum
    # are then computed over the 20 survivors only — the cumulative sum at
    # rank r depends only on rows ranked <= r, so restricting the window
    # to the top-20 is exact.
    top = k.orderBy(F.desc("n"), F.asc("user_id")).limit(20)
    w = Window.orderBy(F.desc("n"), F.asc("user_id"))
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        top.withColumn("rn", F.row_number().over(w))
        .withColumn("cum", F.sum("n").over(cum))
        .join(broadcast(tot))
        .select(
            "user_id",
            "n",
            "rn",
            (F.col("n").cast("double") / F.col("total").cast("double")).alias("share"),
            (F.col("cum").cast("double") / F.col("total").cast("double")).alias(
                "cum_share"
            ),
            "n_keys",
        )
    )


@registry.query(
    "audit_referential_integrity",
    oracle="""
    SELECT 'lineitem->orders' AS fk, COUNT(*) AS n_orphans
    FROM lineitem l WHERE NOT EXISTS
        (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'lineitem->part', COUNT(*)
    FROM lineitem l WHERE NOT EXISTS
        (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
    UNION ALL
    SELECT 'lineitem->supplier', COUNT(*)
    FROM lineitem l WHERE NOT EXISTS
        (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
    UNION ALL
    SELECT 'orders->customer', COUNT(*)
    FROM orders o WHERE NOT EXISTS
        (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    """,
)
def audit_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for every foreign-key
    edge of the star schema — the data-quality gate a pipeline runs
    before joining 100 TB of facts against dimensions (orphans silently
    vanish from inner joins, skewing every downstream aggregate). Each
    edge is a left-anti join counting misses; dimension key sets
    broadcast, so the audit costs one pass over each fact table for ALL
    edges of that table (Spark unions the three lineitem branches into
    one stage group)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    checks = [
        ("lineitem->orders", li, o.select("o_orderkey"), "l_orderkey", "o_orderkey"),
        (
            "lineitem->part",
            li,
            load_table(spark, sf_dir, "part").select("p_partkey"),
            "l_partkey",
            "p_partkey",
        ),
        (
            "lineitem->supplier",
            li,
            load_table(spark, sf_dir, "supplier").select("s_suppkey"),
            "l_suppkey",
            "s_suppkey",
        ),
        (
            "orders->customer",
            o,
            load_table(spark, sf_dir, "customer").select("c_custkey"),
            "o_custkey",
            "c_custkey",
        ),
    ]
    parts = [
        fact.join(broadcast(dim), fact[fk] == dim[pk], "left_anti")
        .agg(F.count("*").alias("n_orphans"))
        .select(F.lit(edge).alias("fk"), "n_orphans")
        for edge, fact, dim, fk, pk in checks
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@registry.query(
    "events_densified_hourly",
    oracle="""
    WITH b AS (SELECT date_trunc('hour', min(CAST(ts AS TIMESTAMP))) AS t0,
                      date_trunc('hour', max(CAST(ts AS TIMESTAMP))) AS t1
               FROM events),
    cal AS (SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS hour
            FROM b),
    types AS (SELECT DISTINCT event_type FROM events),
    grid AS (SELECT hour, event_type FROM cal CROSS JOIN types),
    c AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
                 event_type, COUNT(*) AS n
          FROM events GROUP BY 1, 2)
    SELECT g.hour, g.event_type, COALESCE(c.n, 0) AS n
    FROM grid g LEFT JOIN c ON g.hour = c.hour AND g.event_type = c.event_type
    """,
)
def events_densified_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification: the complete hour × event-type grid with
    zero-filled counts for silent hours — the gap-filling step charting
    and anomaly detection need (a missing bucket and a zero bucket are
    different signals). The calendar spine is generated from the data's
    own bounds (sequence + explode — one row per hour, never a driver
    loop); the type dimension and the spine both broadcast against the
    aggregated counts, so the fact table is touched exactly once."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    cal = b.select(
        F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    types = ev.select("event_type").distinct()
    grid = cal.crossJoin(broadcast(types))
    c = (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("c_hour"),
            F.col("event_type").alias("c_type"),
        )
        .agg(F.count("*").alias("n"))
    )
    return (
        grid.join(
            c,
            (grid.hour == c.c_hour) & (grid.event_type == c.c_type),
            "left_outer",
        )
        .select("hour", "event_type", F.coalesce("n", F.lit(0)).alias("n"))
    )


@registry.query(
    "min_cost_supplier",
    oracle="""
    SELECT n.n_name, s.s_suppkey, s.s_name, s.s_acctbal
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY s_nationkey
                    ORDER BY s_acctbal ASC, s_suppkey) AS rn
          FROM supplier) s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.rn = 1
    """,
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-group argmin (cheapest supplier per nation) via
    a window rank instead of a correlated MIN subquery — one shuffle by
    the group key, no re-scan."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("s_nationkey").orderBy(F.asc("s_acctbal"), F.asc("s_suppkey"))
    return (
        s.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("n_name", "s_suppkey", "s_name", "s_acctbal")
    )


@registry.query(
    "events_anomaly_mad",
    oracle="""
    WITH med AS (
        SELECT event_type,
               quantile_cont(value, 0.5) AS med_value
        FROM events GROUP BY event_type),
    dev AS (
        SELECT e.event_type, e.event_id, e.value, m.med_value,
               ABS(e.value - m.med_value) AS adev
        FROM events e JOIN med m USING (event_type)),
    mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad_value
        FROM dev GROUP BY event_type)
    SELECT d.event_type,
           COUNT(*) AS n,
           ROUND(ANY_VALUE(d.med_value), 6) AS med_value,
           ROUND(ANY_VALUE(m.mad_value), 6) AS mad_value,
           COUNT(*) FILTER (
               WHERE ABS(d.value - d.med_value) > 3 * m.mad_value) AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: median + MAD (median
    absolute deviation), flagging values beyond 3×MAD — the
    skew-immune anomaly gate (mean/std break on heavy tails). Exact
    interpolated medians (`percentile`) match DuckDB's quantile_cont;
    the two median passes are each one shuffle on the same small key
    (event_type), and the deviation join broadcasts the per-type
    medians. At 100 TB swap `percentile` for `approx_percentile` with a
    pinned accuracy — the operator shape is unchanged."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med_value")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med_value"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad_value")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.first("med_value"), 6).alias("med_value"),
            F.round(F.first("mad_value"), 6).alias("mad_value"),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("med_value"))
                    > 3 * F.col("mad_value"),
                    1,
                ).otherwise(0)
            ).alias("n_outliers"),
        )
    )


@registry.query(
    "agg_heavy_hitters",
    oracle="""
    WITH per AS (
        SELECT event_type, user_id, COUNT(*) AS n
        FROM events GROUP BY event_type, user_id),
    shared AS (
        SELECT event_type, user_id, n,
               CAST(n * 1000000 // SUM(n) OVER (PARTITION BY event_type)
                    AS BIGINT) AS share_ppm
        FROM per)
    SELECT event_type, user_id, n, share_ppm
    FROM shared
    WHERE n >= 3
    """,
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter report: per channel (event_type), the members whose
    traffic count crosses an integer threshold, with their exact
    share-of-channel in ppm (integer arithmetic — no float rounding to
    disagree across engines). The skew-diagnosis query a routing layer
    runs before deciding to salt a hot channel (SURVEY §7 'hard' #2).

    Scale: two-level aggregation — the corpus shuffles ONCE to
    (event_type, user_id) grain with map-side combine; the share window
    then runs over the already-aggregated (tiny) table, never the raw
    events."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type", "user_id").agg(F.count("*").alias("n"))
    return (
        per.withColumn(
            "share_ppm", F.expr("n * 1000000 div sum(n) over (partition by event_type)")
        )
        .filter(F.col("n") >= 3)
        .select("event_type", "user_id", "n", "share_ppm")
    )


@registry.query(
    "events_concurrency_sweep",
    oracle="""
    WITH bounds AS (
        SELECT event_type, CAST(ts AS TIMESTAMP) AS bts, 1 AS delta,
               event_id
        FROM events
        UNION ALL
        SELECT event_type, CAST(ts AS TIMESTAMP) + INTERVAL 5 MINUTE,
               -1 AS delta, event_id
        FROM events),
    swept AS (
        SELECT event_type,
               SUM(delta) OVER (
                   PARTITION BY event_type
                   ORDER BY bts, delta DESC, event_id, delta
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS live
        FROM bounds)
    SELECT event_type, CAST(MAX(live) AS BIGINT) AS peak_concurrent
    FROM swept GROUP BY event_type
    """,
)
def events_concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency via sweep-line: each event opens a 5-minute
    interval; the peak number of simultaneously-open intervals per
    channel is the max of a running +1/−1 sum over interval boundaries.
    (The reference's analog: peak live subscriptions per channel under
    heartbeat-window liveness, SURVEY §2.A #26.)

    Scale: the naive formulation is an interval SELF-join (O(n²) pairs
    on a hot channel); the sweep restates it as sort + running sum —
    one shuffle on the channel key, linear in events. Boundary ties
    process opens before closes (delta DESC) so touching intervals
    count as overlapping, with event_id as the final unique tiebreak."""
    ev = load_table(spark, sf_dir, "events")
    opens = ev.select(
        "event_type", F.col("ts").alias("bts"), F.lit(1).alias("delta"), "event_id"
    )
    closes = ev.select(
        "event_type",
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("bts"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("bts"), F.col("delta").desc(), F.col("event_id"), F.col("delta"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = opens.unionByName(closes).select(
        "event_type", F.sum("delta").over(w).alias("live")
    )
    return swept.groupBy("event_type").agg(
        F.max("live").cast("bigint").alias("peak_concurrent")
    )


@registry.query(
    "orders_market_basket",
    oracle="""
    WITH basket AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           COUNT(*) AS n_orders
    FROM basket a JOIN basket b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY part_a, part_b
    HAVING COUNT(*) >= 2
    """,
)
def orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent co-purchased part pairs (association mining support
    count): expand each order's basket to its within-order pairs, count
    pair occurrences across orders, keep support >= 2.

    Scale: the pair expansion is an equality self-join on the ORDER key
    — per-order cost is C(basket_size, 2), bounded by basket size, never
    a corpus cross product; the pair count then aggregates with map-side
    combine. This is how FP-growth-style candidate counting lowers to
    SQL; a hot SKU appearing in many orders skews only the final count
    aggregation, which partial aggregation absorbs."""
    li = load_table(spark, sf_dir, "lineitem")
    basket = li.select("l_orderkey", "l_partkey").distinct()
    a = basket.alias("a")
    b = basket.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


@registry.query(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        FROM events)
    SELECT event_type AS from_type, next_type AS to_type,
           COUNT(*) AS n_transitions,
           CAST(COUNT(*) * 1000000 // SUM(COUNT(*)) OVER (PARTITION BY event_type)
                AS BIGINT) AS prob_ppm
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: lead() pairs each event with the user's next one, pairs
    aggregate to a 5×5 matrix with exact integer-ppm transition
    probabilities. The behavioral-model / next-event-prediction feature
    table.

    Scale: one shuffle by user for the lead() sort; the pair aggregation
    map-side combines down to |types|² rows, and the probability window
    runs over that tiny matrix — never over events."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    return (
        seq.groupBy(
            F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
        )
        .agg(F.count("*").alias("n_transitions"))
        .withColumn(
            "prob_ppm",
            F.expr(
                "n_transitions * 1000000 div sum(n_transitions) "
                "over (partition by from_type)"
            ),
        )
    )


@registry.query(
    "events_cumulative_uniques",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, MIN(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d0
        FROM events GROUP BY user_id),
    daily AS (
        SELECT d0 AS day, COUNT(*) AS new_users FROM first_seen GROUP BY d0)
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (
               ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cumulative_users
    FROM daily
    """,
)
def events_cumulative_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: per day, the count of first-ever-seen users and
    the running total of distinct users to date. The standard DAU/user
    growth curve — computed WITHOUT a cumulative distinct (which would
    need per-day distinct state over the whole history): min(first day)
    per user, then a per-day count, then a running sum over the tiny
    daily table.

    Scale: one shuffle to user grain (map-side combined min), one to day
    grain; the unpartitioned running window is over |days| rows only —
    the corpus never flows through an ordered window."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    daily = first_seen.groupBy(F.col("d0").alias("day")).agg(
        F.count("*").alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cumulative_users"),
    )


@registry.query(
    "orders_rfm_segmentation",
    oracle="""
    WITH rfm AS (
        SELECT o_custkey,
               MAX(CAST(o_orderdate AS TIMESTAMP)) AS last_order,
               COUNT(*) AS frequency,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                   AS monetary
        FROM orders GROUP BY o_custkey),
    scored AS (
        SELECT o_custkey, frequency, monetary,
               NTILE(4) OVER (ORDER BY last_order, o_custkey) AS r_score,
               NTILE(4) OVER (ORDER BY frequency, o_custkey) AS f_score,
               NTILE(4) OVER (ORDER BY monetary, o_custkey) AS m_score
        FROM rfm)
    SELECT r_score * 100 + f_score * 10 + m_score AS segment,
           COUNT(*) AS n_customers,
           CAST(MIN(o_custkey) AS BIGINT) AS sample_custkey
    FROM scored GROUP BY segment
    """,
)
def orders_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: quartile scores for recency (last
    order), frequency (order count) and monetary (decimal-exact spend),
    combined into a 3-digit segment code, with segment sizes. Every
    NTILE ordering carries o_custkey as the unique tiebreaker so
    quartile boundaries are engine-independent.

    Scale: the corpus aggregates once to customer grain; the three
    unpartitioned NTILEs run over the customer AGGREGATE (orders of
    magnitude smaller than orders). For billions of customers the ntile
    would become percentile buckets over a sampled CDF (percent_rank is
    the same single-sort shape); at fixture scale the exact sort is the
    honest plan."""
    o = load_table(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        dsum("o_totalprice").alias("monetary"),
    )
    scored = rfm.select(
        "o_custkey",
        F.ntile(4).over(Window.orderBy("last_order", "o_custkey")).alias("r_score"),
        F.ntile(4).over(Window.orderBy("frequency", "o_custkey")).alias("f_score"),
        F.ntile(4).over(Window.orderBy("monetary", "o_custkey")).alias("m_score"),
    )
    return (
        scored.select(
            (
                F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
            ).alias("segment"),
            "o_custkey",
        )
        .groupBy("segment")
        .agg(
            F.count("*").alias("n_customers"),
            F.min("o_custkey").cast("bigint").alias("sample_custkey"),
        )
    )


@registry.query(
    "events_ab_test_lift",
    oracle=f"""
    WITH assigned AS (
        SELECT user_id,
               {sql_hash28("'ab1|' || CAST(user_id AS VARCHAR)")} % 2 AS variant,
               MAX(CASE WHEN event_type = 'purchase' AND value > 150
                        THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY user_id),
    arms AS (
        SELECT variant, COUNT(*) AS n_users,
               CAST(SUM(converted) AS BIGINT) AS n_converted,
               CAST(SUM(converted) * 1000000 // COUNT(*) AS BIGINT)
                   AS conv_ppm
        FROM assigned GROUP BY variant)
    SELECT a.n_users AS users_a, a.n_converted AS conv_a, a.conv_ppm AS ppm_a,
           b.n_users AS users_b, b.n_converted AS conv_b, b.conv_ppm AS ppm_b,
           CAST(b.conv_ppm - a.conv_ppm AS BIGINT) AS lift_ppm,
           CASE WHEN a.n_converted + b.n_converted = 0
                  OR a.n_converted + b.n_converted = a.n_users + b.n_users
                THEN NULL
                ELSE ROUND((CAST(b.n_converted AS DOUBLE) / b.n_users
                       - CAST(a.n_converted AS DOUBLE) / a.n_users)
                      / sqrt((CAST(a.n_converted + b.n_converted AS DOUBLE)
                              / (a.n_users + b.n_users))
                             * (1 - CAST(a.n_converted + b.n_converted AS DOUBLE)
                                    / (a.n_users + b.n_users))
                             * (1.0 / a.n_users + 1.0 / b.n_users)), 6)
           END AS z_stat
    FROM arms a JOIN arms b ON a.variant = 0 AND b.variant = 1
    """,
)
def events_ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample A/B conversion analysis: users hash-assigned to arms
    (salted md5 split — deterministic, layout-independent, re-runnable,
    the same device as sample_bernoulli_hash, so assignment never
    drifts when data is appended), conversion = any purchase, lift in
    exact integer ppm plus the pooled two-proportion z-statistic. The
    z formula runs on integers both engines agree on, so the doubles
    (and the rounded z) are bit-identical.

    Scale: one shuffle to user grain with map-side combine, then the
    arm aggregate is 2 rows — the z computation is free. The
    experiment-analysis query shape at any corpus size."""
    ev = load_table(spark, sf_dir, "events")
    key = F.concat(F.lit("ab1|"), F.col("user_id").cast("string"))
    assigned = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150), 1
            ).otherwise(0)
        ).alias("converted")
    ).select(
        (hash28(key) % 2).alias("variant"),
        "converted",
    )
    arms = assigned.groupBy("variant").agg(
        F.count("*").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_converted"),
        F.expr("CAST(sum(converted) * 1000000 div count(*) AS BIGINT)").alias(
            "conv_ppm"
        ),
    )
    # Pivot the 2-row arm aggregate into one row with a conditional
    # aggregation — NOT filter(variant==0) x filter(variant==1) +
    # crossJoin, which would compile the whole events scan + user-grain
    # aggregation subtree twice into the plan.
    arm = lambda v, c: F.max(F.when(F.col("variant") == v, F.col(c)))  # noqa: E731
    wide = arms.agg(
        arm(0, "n_users").alias("users_a"),
        arm(0, "n_converted").alias("conv_a"),
        arm(0, "conv_ppm").alias("ppm_a"),
        arm(1, "n_users").alias("users_b"),
        arm(1, "n_converted").alias("conv_b"),
        arm(1, "conv_ppm").alias("ppm_b"),
    )
    ca, na = F.col("conv_a").cast("double"), F.col("users_a").cast("double")
    cb, nb = F.col("conv_b").cast("double"), F.col("users_b").cast("double")
    pool = (ca + cb) / (na + nb)
    z_raw = (cb / nb - ca / na) / F.sqrt(pool * (1 - pool) * (1 / na + 1 / nb))
    z = F.when((ca + cb > 0) & (ca + cb < na + nb), z_raw)
    # The oracle's `arms a JOIN arms b ON a.variant=0 AND b.variant=1`
    # emits ZERO rows when either arm is empty; the pivoted agg would
    # emit one all-NULL row — require both arms present to match the
    # inner-join semantics (unreachable at fixture shape, but the
    # degenerate-input contract should agree).
    wide = wide.filter(
        F.col("users_a").isNotNull() & F.col("users_b").isNotNull()
    )
    return wide.select(
        "users_a",
        "conv_a",
        "ppm_a",
        "users_b",
        "conv_b",
        "ppm_b",
        (F.col("ppm_b") - F.col("ppm_a")).cast("bigint").alias("lift_ppm"),
        F.round(z, 6).alias("z_stat"),
    )


@registry.query(
    "orders_cohort_ltv",
    oracle=f"""
    WITH firsts AS (
        SELECT o_custkey,
               MIN(EXTRACT(year FROM o_orderdate) * 12
                   + EXTRACT(month FROM o_orderdate)) AS cohort_m
        FROM orders GROUP BY o_custkey),
    aged AS (
        SELECT f.cohort_m,
               EXTRACT(year FROM o.o_orderdate) * 12
                   + EXTRACT(month FROM o.o_orderdate) - f.cohort_m AS age_m,
               o.o_totalprice
        FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey),
    cells AS (
        SELECT CAST(cohort_m AS BIGINT) AS cohort_m,
               CAST(age_m AS BIGINT) AS age_m,
               COUNT(*) AS n_orders,
               SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS rev_dec
        FROM aged GROUP BY 1, 2)
    SELECT cohort_m, age_m, n_orders,
           CAST(SUM(rev_dec) OVER (
               PARTITION BY cohort_m ORDER BY age_m
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE) AS cum_revenue
    FROM cells
    """,
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: customers cohorted by first-order
    month (encoded as year*12+month integers — no engine-specific month
    arithmetic), revenue accumulated per cohort across month age, the
    retention/LTV triangle every growth team maintains. Decimal-exact
    partial sums; the running window runs over the tiny cohort×age
    aggregate, never over orders.

    Scale: one shuffle to customer grain for first-order month; the
    firsts join is left to the optimizer — it broadcasts while small
    and falls back to a co-partitioned shuffle join when the customer
    dimension outgrows the broadcast cap (a forced broadcast of a
    linearly-growing side would be a scale bug); then one shuffle to
    the cohort×age grain."""
    o = load_table(spark, sf_dir, "orders")
    month = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("bigint")
    firsts = o.groupBy("o_custkey").agg(F.min(month).alias("cohort_m"))
    aged = o.join(firsts, "o_custkey").select(
        "cohort_m",
        (month - F.col("cohort_m")).alias("age_m"),
        "o_totalprice",
    )
    cells = aged.groupBy("cohort_m", "age_m").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("rev_dec"),
    )
    w = (
        Window.partitionBy("cohort_m")
        .orderBy("age_m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cells.select(
        "cohort_m",
        "age_m",
        "n_orders",
        F.sum("rev_dec").over(w).cast("double").alias("cum_revenue"),
    )


@registry.query(
    "lineitem_abc_pareto",
    oracle=f"""
    WITH per_part AS (
        SELECT l_partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS rev_dec
        FROM lineitem GROUP BY l_partkey),
    ranked AS (
        SELECT l_partkey, rev_dec,
               SUM(rev_dec) OVER (
                   ORDER BY rev_dec DESC, l_partkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_dec,
               SUM(rev_dec) OVER () AS total_dec
        FROM per_part),
    classed AS (
        SELECT l_partkey,
               CASE WHEN cum_dec * 100 <= total_dec * 80 THEN 'A'
                    WHEN cum_dec * 100 <= total_dec * 95 THEN 'B'
                    ELSE 'C' END AS abc_class,
               rev_dec
        FROM ranked)
    SELECT abc_class, COUNT(*) AS n_parts,
           CAST(SUM(rev_dec) AS DOUBLE) AS class_revenue
    FROM classed GROUP BY abc_class
    """,
)
def lineitem_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto inventory classification: parts ranked by revenue,
    classed A while cumulative revenue stays within 80% of total, B to
    95%, else C. The boundary test is exact decimal arithmetic
    (cum*100 <= total*80) — no float share to round differently across
    engines — and the rank ordering carries l_partkey as unique
    tiebreak.

    Scale: the corpus aggregates once to part grain; the ranked
    cumulative window runs over the PART aggregate. That window is
    unpartitioned by the semantics of a global Pareto cut — at billions
    of parts the same cut is computed from a percentile sketch of the
    revenue distribution instead of an exact global sort (same
    single-aggregation cost; the exact sort is honest at fixture
    scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).alias("rev_dec")
    )
    w_cum = (
        Window.orderBy(F.desc("rev_dec"), F.asc("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = per_part.select(
        "l_partkey",
        "rev_dec",
        F.sum("rev_dec").over(w_cum).alias("cum_dec"),
        F.sum("rev_dec").over(w_all).alias("total_dec"),
    )
    classed = ranked.select(
        "rev_dec",
        F.when(F.col("cum_dec") * 100 <= F.col("total_dec") * 80, "A")
        .when(F.col("cum_dec") * 100 <= F.col("total_dec") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    return classed.groupBy("abc_class").agg(
        F.count("*").alias("n_parts"),
        F.sum("rev_dec").cast("double").alias("class_revenue"),
    )


@registry.query(
    "events_anomaly_running_z",
    oracle="""
    WITH milli AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               CAST(floor(value * 1000) AS BIGINT) AS v
        FROM events),
    seq AS (
        SELECT user_id, event_id, v,
               COUNT(*) OVER w AS n_prior,
               SUM(v) OVER w AS sum_prior,
               SUM(v * v) OVER w AS sumsq_prior
        FROM milli
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
    scored AS (
        SELECT user_id, event_id,
               CASE WHEN n_prior >= 5
                     AND CAST(sumsq_prior AS DOUBLE) / n_prior
                         - (CAST(sum_prior AS DOUBLE) / n_prior)
                           * (CAST(sum_prior AS DOUBLE) / n_prior) > 1e-12
                    THEN abs(v - CAST(sum_prior AS DOUBLE) / n_prior)
                         / sqrt(CAST(sumsq_prior AS DOUBLE) / n_prior
                                - (CAST(sum_prior AS DOUBLE) / n_prior)
                                  * (CAST(sum_prior AS DOUBLE) / n_prior))
                    END AS z
 FROM seq)
    SELECT user_id,
           COUNT(*) AS n_scored,
           CAST(SUM(CASE WHEN z > 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_anomalies
    FROM scored WHERE z IS NOT NULL
    GROUP BY user_id
    """,
)
def events_anomaly_running_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online anomaly detection, batch-replayable form: each event is
    scored against the running mean/std of the user's PRIOR events only
    (frame ends at 1 PRECEDING — no lookahead leakage), flagged when
    |z| > 3, after a 5-event warm-up. This is the batch twin of a
    streaming per-key state fold (applyInPandasWithState carrying
    n/sum/sumsq), and the prior-only frame is what makes the scores
    identical between the batch replay and the incremental stream.

    Determinism note: values are quantized to integer milli-units BEFORE
    the running sums, so the window accumulators are exact integers —
    engines may combine window partials in any order (DuckDB uses a
    segment tree, Spark accumulates sequentially) and still agree
    bit-for-bit; the z itself is then derived in double from identical
    integers. Raw-double running sums would gamble on accumulation
    order. One shuffle by user; both windows and the final aggregate
    share it."""
    ev = load_table(spark, sf_dir, "events")
    milli = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.floor(F.col("value") * 1000).cast("bigint").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = milli.select(
        "user_id",
        "event_id",
        "v",
        F.count("*").over(w).alias("n_prior"),
        F.sum("v").over(w).alias("sum_prior"),
        F.sum(F.col("v") * F.col("v")).over(w).alias("sumsq_prior"),
    )
    mean = F.col("sum_prior").cast("double") / F.col("n_prior")
    var = F.col("sumsq_prior").cast("double") / F.col("n_prior") - mean * mean
    z = F.when(
        (F.col("n_prior") >= 5) & (var > 1e-12),
        F.abs(F.col("v") - mean) / F.sqrt(var),
    )
    scored = seq.select("user_id", "event_id", z.alias("z")).filter(
        F.col("z").isNotNull()
    )
    return scored.groupBy("user_id").agg(
        F.count("*").alias("n_scored"),
        F.sum(F.when(F.col("z") > 3, 1).otherwise(0)).cast("bigint").alias(
            "n_anomalies"
        ),
    )


_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def _profile_oracle() -> str:
    branches = []
    for c in _PROFILE_COLS:
        mn, mx = f"MIN({c})", f"MAX({c})"
        if c == "o_totalprice":
            # doubles stringify differently across engines; both sides
            # pin the representation through DECIMAL(18,2).
            mn, mx = (
                f"CAST({mn} AS DECIMAL(18,2))",
                f"CAST({mx} AS DECIMAL(18,2))",
            )
        branches.append(
            f"""
    SELECT '{c}' AS column_name,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST({mn} AS VARCHAR) AS min_value,
           CAST({mx} AS VARCHAR) AS max_value
    FROM orders"""
        )
    return "\n    UNION ALL".join(branches)


@registry.query("profile_column_stats", oracle=_profile_oracle())
def profile_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profiler — the data-quality summary every
    ingest pipeline runs before training: per column, NULL count,
    exact distinct count, and min/max (stringified; doubles pinned
    through DECIMAL(18,2) so both engines agree on representation).

    Plan: ONE aggregation over the table computes all 6x4 statistics
    (Spark plans the multi-distinct via Expand — 6 passes worth of
    grouping in one shuffle), then a 1-row stack() unpivots to the
    (column, stat) grid driver-side-free. The oracle states the same
    stats as 6 UNION ALL branches. At 100 TB the profile is one
    map-side-combined pass; swap countDistinct for approx_count_distinct
    when exactness is not required (agg_approx_distinct pins that
    contract)."""
    o = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        col = F.col(c)
        mn, mx = F.min(col), F.max(col)
        if c == "o_totalprice":
            mn, mx = mn.cast("decimal(18,2)"), mx.cast("decimal(18,2)")
        aggs += [
            (F.count(F.lit(1)) - F.count(col)).alias(f"nn_{c}"),
            F.countDistinct(col).alias(f"nd_{c}"),
            mn.cast("string").alias(f"mn_{c}"),
            mx.cast("string").alias(f"mx_{c}"),
        ]
    wide = o.agg(*aggs)
    stack = (
        f"stack({len(_PROFILE_COLS)}, "
        + ", ".join(
            f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in _PROFILE_COLS
        )
        + ") AS (column_name, n_nulls, n_distinct, min_value, max_value)"
    )
    return wide.selectExpr(stack)


@registry.query(
    "events_funnel_time_to_convert",
    oracle="""
    WITH s AS (SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t_signup
               FROM events WHERE event_type = 'signup' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_click
          FROM events e JOIN s ON e.user_id = s.user_id
          WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > s.t_signup
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_purchase
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase'
            AND CAST(e.ts AS TIMESTAMP) > c.t_click
          GROUP BY e.user_id),
    d1 AS (SELECT (epoch_us(c.t_click) - epoch_us(s.t_signup))
                  // 1000000 AS sec
           FROM c JOIN s ON c.user_id = s.user_id),
    d2 AS (SELECT (epoch_us(p.t_purchase) - epoch_us(c.t_click))
                  // 1000000 AS sec
           FROM p JOIN c ON p.user_id = c.user_id)
    SELECT 'signup_to_click' AS stage,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(quantile_cont(sec, 0.5), 4) AS median_sec,
           ROUND(quantile_cont(sec, 0.9), 4) AS p90_sec
    FROM d1
    UNION ALL
    SELECT 'click_to_purchase', CAST(COUNT(*) AS BIGINT),
           ROUND(quantile_cont(sec, 0.5), 4), ROUND(quantile_cont(sec, 0.9), 4)
    FROM d2
    """,
)
def events_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events_user_funnel's latency companion: how LONG each conversion
    step takes — integer-second deltas between a user's funnel stage
    timestamps, summarized as exact interpolated median/p90 per stage
    (Spark `percentile` == DuckDB `quantile_cont` on the same integers,
    so the doubles agree bit-for-bit).

    Scale: all three stage aggregations and both delta joins are keyed
    by user_id — one hash partitioning reused end-to-end, then each
    stage reduces to a single row; the final frame is a 2-row union."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c.select("user_id", "t_click"), "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    d1 = c.join(s, "user_id").select(
        F.expr(
            "(unix_micros(t_click) - unix_micros(t_signup)) div 1000000"
        ).alias("sec")
    )
    d2 = p.join(c, "user_id").select(
        F.expr(
            "(unix_micros(t_purchase) - unix_micros(t_click)) div 1000000"
        ).alias("sec")
    )

    def _stage(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.lit(label).alias("stage"),
            F.count("*").cast("bigint").alias("n_users"),
            F.round(F.expr("percentile(sec, 0.5)"), 4).alias("median_sec"),
            F.round(F.expr("percentile(sec, 0.9)"), 4).alias("p90_sec"),
        )

    return _stage(d1, "signup_to_click").unionByName(
        _stage(d2, "click_to_purchase")
    )


@registry.query(
    "events_top_paths",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type, 1) OVER w AS e2,
               LEAD(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY CAST(ts AS TIMESTAMP), event_id)),
    paths AS (
        SELECT event_type || '>' || e2 || '>' || e3 AS path
        FROM seq WHERE event_type IS NOT NULL
                   AND e2 IS NOT NULL AND e3 IS NOT NULL)
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n
    FROM paths GROUP BY path
    ORDER BY n DESC, path LIMIT 20
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern mining, the flat-window form: each user's
    event stream yields its length-3 sliding paths (trigrams over the
    (ts, event_id)-ordered sequence — the deterministic tiebreak both
    engines state), counted globally and top-20 by support with a
    total-order tiebreak so LIMIT is engine-independent.

    Scale: one shuffle to user grain for the sequence window, one
    map-side-combined aggregation over the |types|^3-bounded path space
    (125 keys here), TakeOrdered for the top-k — the corpus is never
    joined against itself, unlike a naive subsequence self-join."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(
        # All three legs non-null in BOTH engines, and NULL-propagating
        # concat (not concat_ws, which would silently skip a NULL leg
        # while the oracle's || nulls the whole path) — the same
        # cross-engine NULL contract as dedup_fuzzy_levenshtein's key.
        F.col("event_type").isNotNull()
        & F.col("e2").isNotNull()
        & F.col("e3").isNotNull()
    )
    return (
        seq.select(
            F.concat(
                "event_type", F.lit(">"), "e2", F.lit(">"), "e3"
            ).alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(20)
    )


@registry.query(
    "events_dau_wau",
    oracle="""
    WITH du AS (
        SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id
        FROM events),
    days AS (SELECT DISTINCT day FROM du),
    contrib AS (
        SELECT CAST(t.td AS DATE) AS day, du.user_id
        FROM du, UNNEST(generate_series(CAST(du.day AS TIMESTAMP),
                                        CAST(du.day AS TIMESTAMP)
                                            + INTERVAL 6 DAY,
                                        INTERVAL 1 DAY)) AS t(td)),
    wau AS (
        SELECT c.day, COUNT(DISTINCT c.user_id) AS wau
        FROM contrib c JOIN days d ON c.day = d.day
        GROUP BY c.day),
    dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM du GROUP BY day)
    SELECT dau.day, CAST(dau.dau AS BIGINT) AS dau,
           CAST(wau.wau AS BIGINT) AS wau
    FROM dau JOIN wau ON dau.day = wau.day
    """,
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily / trailing-7-day active users — the standard engagement
    pair. The WAU "distinct users over a sliding window" is restated as
    a narrow EXPLODE: each (day, user) activity row contributes itself
    to the 7 target days it keeps the user active for, then one
    count-distinct per target day — an equality-keyed aggregation
    instead of the day-range theta join (which would plan as a
    broadcast nested-loop at best). Target days with no activity of
    their own are dropped by the equality join against the observed-day
    list, which both engines state identically.

    Scale: activity compacts to user-day grain first (map-side
    combined); the 7x explode is narrow; both aggregates and the final
    join share the day key."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    days = du.select("day").distinct()
    contrib = du.select(
        F.explode(
            F.expr("sequence(day, date_add(day, 6), interval 1 day)")
        ).alias("day"),
        "user_id",
    )
    wau = (
        contrib.join(F.broadcast(days), "day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    dau = du.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    return dau.join(wau, "day").select(
        "day",
        F.col("dau").cast("bigint").alias("dau"),
        F.col("wau").cast("bigint").alias("wau"),
    )


@registry.query(
    "events_bot_regularity",
    oracle="""
    WITH gaps AS (
        SELECT user_id,
               epoch_us(CAST(ts AS TIMESTAMP))
               - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                     PARTITION BY user_id
                     ORDER BY CAST(ts AS TIMESTAMP), event_id) AS gap
        FROM events),
    stats AS (
        SELECT user_id,
               COUNT(gap) AS n_gaps,
               CAST(SUM(CAST(gap AS DECIMAL(38,0))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(gap AS DECIMAL(38,0))
                        * CAST(gap AS DECIMAL(38,0))) AS DOUBLE) AS s2
        FROM gaps WHERE gap IS NOT NULL
        GROUP BY user_id
        HAVING COUNT(gap) >= 20)
    SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
           ROUND(sqrt(GREATEST(0, s2 / n_gaps - (s1 / n_gaps) * (s1 / n_gaps)))
                 / (s1 / n_gaps), 6) AS gap_cv,
           sqrt(GREATEST(0, s2 / n_gaps - (s1 / n_gaps) * (s1 / n_gaps)))
               / (s1 / n_gaps) < 0.1 AS is_regular
    FROM stats
    """,
)
def events_bot_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot / automation detection by inter-event regularity: per user,
    the coefficient of variation of the microsecond gaps between
    consecutive events — humans are bursty (cv near or above 1),
    schedulers are metronomic (cv near 0). Gap sums and sums of squares
    are EXACT decimal integers (gap² can reach ~1e24, far past int64 —
    DECIMAL(38,0) carries it exactly in both engines), so the doubles
    derived from them — and the cv comparison — are bit-identical.

    Scale: one shuffle to user grain shared by the lag window and the
    aggregate; the moment math is constant per user."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    ev = load_table(spark, sf_dir, "events")
    gaps = ev.select(
        "user_id",
        (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
        ).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    g = F.col("gap").cast("decimal(38,0)")
    stats = (
        gaps.groupBy("user_id")
        .agg(
            F.count("gap").alias("n_gaps"),
            F.sum(g).cast("double").alias("s1"),
            F.sum(g * g).cast("double").alias("s2"),
        )
        .filter(F.col("n_gaps") >= 20)
    )
    mean = F.col("s1") / F.col("n_gaps")
    # Clamp at 0: for perfectly metronomic gaps the double-arithmetic
    # variance can land a hair NEGATIVE (catastrophic cancellation),
    # where sqrt NaNs in Spark and ERRORS in DuckDB — exactly the bot
    # the operator exists to flag. GREATEST(0, ...) in both engines.
    var = F.greatest(
        F.lit(0.0), F.col("s2") / F.col("n_gaps") - mean * mean
    )
    cv = F.sqrt(var) / mean
    return stats.select(
        "user_id",
        F.col("n_gaps").cast("bigint").alias("n_gaps"),
        F.round(cv, 6).alias("gap_cv"),
        (cv < 0.1).alias("is_regular"),
    )


@registry.query(
    "orders_supplier_herfindahl",
    oracle="""
    WITH srev AS (
        SELECT n.n_name, l.l_suppkey,
               CAST(FLOOR(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                                   AS DECIMAL(38,6))) * 100) AS BIGINT)
                   AS rev_cents
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        GROUP BY n.n_name, l.l_suppkey),
    ntot AS (
        SELECT n_name, CAST(SUM(rev_cents) AS BIGINT) AS tot_cents,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers
        FROM srev GROUP BY n_name)
    SELECT t.n_name AS nation,
           t.n_suppliers,
           CAST(SUM((s.rev_cents * 1000000 // t.tot_cents)
                    * (s.rev_cents * 1000000 // t.tot_cents)) // 1000000
               AS BIGINT) AS hhi_ppm
    FROM srev s JOIN ntot t ON s.n_name = t.n_name
    GROUP BY t.n_name, t.n_suppliers
    """,
)
def orders_supplier_herfindahl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier revenue concentration per nation: the Herfindahl index
    (sum of squared market shares, emitted in ppm — 1,000,000 = one
    supplier owns the nation, 1,000,000/n = perfectly even). The
    standard skew diagnostic over a revenue dimension; operationally it
    is the same hot-key question as partition skew — a nation with HHI
    near 1e6 is a nation whose supplier key would hot-spot a shuffle.
    Shares are floor-divided ppm integers of exact decimal-cents sums,
    so both engines agree bit-for-bit (no double accumulation).

    Scale: lineitem shuffles once for the (nation, supplier) revenue
    group-by (dimensions broadcast into the scan); everything after
    operates on the supplier-grain table, orders of magnitude smaller.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    srev = (
        li.join(broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name", "l_suppkey")
        .agg(
            F.floor(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(38,6)"
                    )
                )
                * 100
            )
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    ntot = srev.groupBy("n_name").agg(
        F.sum("rev_cents").cast("bigint").alias("tot_cents"),
        F.count("*").cast("bigint").alias("n_suppliers"),
    )
    share = F.expr("rev_cents * 1000000 div tot_cents")
    return (
        srev.join(broadcast(ntot), "n_name")
        .select(F.col("n_name"), F.col("n_suppliers"), (share * share).alias("sq"))
        .groupBy("n_name", "n_suppliers")
        .agg(F.expr("CAST(sum(sq) div 1000000 AS BIGINT)").alias("hhi_ppm"))
        .select(F.col("n_name").alias("nation"), "n_suppliers", "hhi_ppm")
    )


@registry.query(
    "events_watermark_lag_audit",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
               MAX(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS hwm_us
        FROM events)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN hwm_us > t_us THEN 1 ELSE 0 END) AS BIGINT)
               AS n_late,
           CAST(MAX(CASE WHEN hwm_us > t_us THEN hwm_us - t_us ELSE 0 END)
               AS BIGINT) AS max_disorder_us
    FROM ordered GROUP BY user_id
    """,
)
def events_watermark_lag_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time disorder audit: per user, how many events arrive (in
    event_id ingestion order) BEHIND the user's running event-time
    high-water mark, and the worst lag. This is the batch measurement
    that chooses a streaming watermark delay — `withWatermark` set
    below the observed max_disorder_us drops real events
    (stream_watermark_late_drop exercises that drop), set far above it
    holds state longer than needed. Epoch microseconds (unix_micros ↔
    epoch_us) keep the arithmetic integer-exact.

    Scale: one shuffle to (user_id) for the running-max window, reused
    by the aggregation — same single-exchange shape as sessionize."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros(F.col("ts")).alias("t_us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ordered = e.withColumn("hwm_us", F.max("t_us").over(w))
    late = F.when(F.col("hwm_us") > F.col("t_us"), 1).otherwise(0)
    lag = F.when(
        F.col("hwm_us") > F.col("t_us"), F.col("hwm_us") - F.col("t_us")
    ).otherwise(F.lit(0).cast("bigint"))
    return ordered.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(late).cast("bigint").alias("n_late"),
        F.max(lag).cast("bigint").alias("max_disorder_us"),
    )
