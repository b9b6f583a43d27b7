"""Event-stream analytics in batch form over the ``events`` fixture.

The reference's streaming surface is processing-time only (SURVEY §2.8);
the ``events`` table (event_id, ts, user_id, event_type, value, props JSON)
is the driver's event-time fixture. These queries are the batch-equivalent
forms of the standard streaming aggregations (tumbling window, dedup,
sessionization) — the streaming forms live in workloads/streaming.py and
must agree with these (incremental == batch, SURVEY §5.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fluss_iceberg_spark.registry import query
from fluss_iceberg_spark.sources.tpch import load_table


@query(
    "events_hourly_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour,
           event_type,
           COUNT(1) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation (batch form of a streaming
    windowed agg). Group keys bound the exchange; 100 TB-safe."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


@query(
    "events_sessionize",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                    OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts, value,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id,
           session_id,
           COUNT(1) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap): lag → new-session flag →
    running-sum session id → per-session rollup.

    Scale: one hash partition exchange on user_id serves both windows and
    the final aggregation (same key → Catalyst reuses the partitioning; no
    second shuffle).
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # interval arithmetic (ts - lag(ts) yields a DayTimeInterval) is valid
    # for both TIMESTAMP and TIMESTAMP_NTZ inputs — the testdata vintages
    # differ — and is timezone-free, unlike unix_micros (NTZ-rejecting).
    prev = F.lag("ts").over(w)
    flagged = e.withColumn(
        "is_new",
        F.when((F.col("ts") - prev) > F.expr("INTERVAL 30 MINUTES"), 1)
        .when(prev.isNull(), 1)
        .otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("is_new").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


@query(
    "events_dedup_latest",
    oracle="""
    SELECT user_id, event_type, ts AS latest_ts, value AS latest_value
    FROM (
        SELECT user_id, event_type, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) t
    WHERE rn = 1
    """,
)
def dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-value-per-key (the PK-table upsert semantics of SURVEY §1.1 in
    query form): latest event per (user_id, event_type)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("latest_ts"),
            F.col("value").alias("latest_value"),
        )
    )


@query(
    "events_json_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(1) AS n
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY event_type
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-string column handling (events.props, FIXTURES.md §B):
    extract → cast → aggregate, all JVM-side built-ins. ``spread()``
    first: the JSON parse is the dominant map cost and a single-split
    scan would run it serially (no-op on well-split inputs)."""
    from fluss_iceberg_spark.operators.util import spread

    e = spread(load_table(spark, sf_dir, "events"))
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.withColumn("k", k)
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "events_asof_attribution",
    oracle="""
    WITH tagged AS (
        SELECT user_id, ts, 0 AS is_left, event_id AS rid, ts AS rts,
               CAST(NULL AS BIGINT) AS lid
        FROM events WHERE event_type = 'view'
        UNION ALL
        SELECT user_id, ts, 1, NULL, NULL, event_id
        FROM events WHERE event_type = 'click'
    ), w AS (
        SELECT *,
            last_value(rid IGNORE NULLS) OVER win AS view_id,
            last_value(rts IGNORE NULLS) OVER win AS view_ts
        FROM tagged
        WINDOW win AS (PARTITION BY user_id ORDER BY ts, is_left, rid NULLS FIRST
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT lid AS click_id, ts AS click_ts, user_id, view_id, view_ts
    FROM w WHERE is_left = 1
    """,
)
def asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF JOIN (absent from both the reference and Spark built-ins):
    each click attributed to the user's latest view at-or-before it.
    operators/temporal.asof_join — union+window, one shuffle on user_id,
    no pairwise blowup; the oracle is the same ANSI formulation DuckDB
    executes independently."""
    from fluss_iceberg_spark.operators.temporal import asof_join

    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "ts", "user_id")
    views = e.filter(F.col("event_type") == "view")
    res = asof_join(
        clicks, views, on="user_id", left_ts="ts", right_ts="ts",
        right_payload=["event_id", "ts"], right_id="event_id",
    )
    return res.select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        "user_id",
        F.col("asof_event_id").alias("view_id"),
        F.col("asof_ts").alias("view_ts"),
    )


@query(
    "events_error_burst",
    oracle="""
    SELECT c.event_id AS click_id,
           c.user_id,
           CAST(COUNT(e.event_id) AS BIGINT) AS n_errors
    FROM events c
    LEFT JOIN events e
      ON e.user_id = c.user_id
     AND e.event_type = 'error'
     AND e.ts > c.ts
     AND e.ts <= c.ts + INTERVAL 5 MINUTE
    WHERE c.event_type = 'click'
    GROUP BY c.event_id, c.user_id
    """,
)
def error_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-range (band) join: errors by the same user within 5 min
    after each click. operators/temporal.range_count_join — time-bucketed
    equi-join (bucket = window width, left explodes into 2 buckets) so
    Catalyst hash-joins instead of a theta-join nested loop."""
    from fluss_iceberg_spark.operators.temporal import range_count_join

    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "ts", "user_id")
    errors = e.filter(F.col("event_type") == "error")
    res = range_count_join(
        clicks, errors, on="user_id", left_ts="ts", right_ts="ts",
        window_seconds=300, left_id="event_id",
    )
    return res.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("n_in_range").alias("n_errors"),
    )


@query(
    "join_skew_salted",
    oracle="""
    SELECT e.user_id,
           e.event_type,
           COUNT(1) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events e
    JOIN (
        SELECT DISTINCT user_id, user_id % 5 AS cohort FROM events
    ) d ON e.user_id = d.user_id
    WHERE d.cohort = 0
    GROUP BY e.user_id, e.event_type
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted join, oracled against the plain join it must equal:
    the (power-law) events fact joins a small user-cohort dim with the
    fact side salted over 16 sub-keys, so a hot user never bottlenecks a
    single reducer. Salting must be result-invariant — the oracle is the
    unsalted ANSI join."""
    from fluss_iceberg_spark.operators.skew import salted_join

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value"
    )
    d = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .withColumn("cohort", F.col("user_id") % 5)
        .filter(F.col("cohort") == 0)
    )
    return (
        salted_join(e, d, on="user_id")
        .groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )


@query(
    "events_sliding_rollup",
    oracle="""
    WITH win AS (
        SELECT make_timestamp(((epoch_us(ts) // 900000000) - i) * 900000000)
                   AS window_start,
               event_type, value
        FROM events, UNNEST(range(0, 4)) AS r(i)
    )
    SELECT window_start, event_type,
           COUNT(1) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM win
    GROUP BY window_start, event_type
    """,
)
def sliding_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregation: 1-hour windows every 15 minutes (each
    event lands in 4 overlapping windows). Spark's window() expands the
    windows before the one grouped exchange — the same plan Structured
    Streaming uses for sliding event-time aggs; the oracle expands them
    with an explicit 0..3 bucket-offset UNNEST (both anchored at the
    epoch, which is a whole number of 15-minute buckets)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "events_session_window_builtin",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                    OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts, value,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(1) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in session_window (30-min gap) must equal the
    lag/cumsum gaps-and-islands sessionization: window.start = first
    event, window.end = last event + gap (so MAX(ts) = end - gap).
    Boundary semantics differ only on an exactly-30:00.000000 gap
    (builtin splits, islands keeps) — the fixture has none, and real
    micro-timestamped streams make the tie measure-zero. Session windows
    are the one windowed agg whose key is data-dependent; Spark merges
    them in the same single keyed exchange."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            (F.col("session_window.end") - F.expr("INTERVAL 30 MINUTES")).alias(
                "session_end"
            ),
            "n_events",
            "sum_value",
        )
    )


@query("events_tdigest_quantiles")  # float centroid means -> rows-only
def events_tdigest_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value quantiles via a distributed t-digest
    (operators/tdigest.py, Dunning & Ertl 2019) — the engine-opaque
    mergeable quantile form beside the value-gated bottom-k sketch
    (dedup_quantile_sketch). Emits the digest's p50/p90/p99 next to the
    EXACT percentiles (Spark's exact `percentile`) so the row itself
    shows the rank error; units pin merge associativity and tail
    accuracy bounds. Rows-only by nature: centroid means are floats and
    partition-layout-dependent within the accuracy bound.

    100 TB: raw values never shuffle — one map-side Arrow pass emits
    O(partitions x types x delta) centroid rows; the per-type merge is
    centroid-sized. The exact-percentile gate columns are the only
    full-sort cost and exist solely for the visible error report."""
    from fluss_iceberg_spark.operators.tdigest import tdigest_quantiles

    ev = load_table(spark, sf_dir, "events")
    td = tdigest_quantiles(ev, "value", "event_type", qs=(0.5, 0.9, 0.99))
    exact = ev.groupBy(F.col("event_type").cast("string").alias("grp")).agg(
        F.expr("percentile(value, 0.5)").alias("p500_exact"),
        F.expr("percentile(value, 0.9)").alias("p900_exact"),
        F.expr("percentile(value, 0.99)").alias("p990_exact"),
    )
    return (
        td.join(exact, on="grp")
        .select(
            F.col("grp").alias("event_type"),
            "p500_td", "p900_td", "p990_td",
            "p500_exact", "p900_exact", "p990_exact",
        )
        .orderBy("event_type")
    )


@query(
    "events_funnel_steps",
    oracle="""
    WITH flags AS (
        SELECT DISTINCT user_id,
               mt1 IS NOT NULL AS s1,
               mt2 IS NOT NULL AS s2,
               mt3 IS NOT NULL AS s3
        FROM (
            SELECT user_id, mt1, mt2,
                   MIN(CASE WHEN event_type = 'purchase' AND ts >= mt2
                            THEN ts END)
                       OVER (PARTITION BY user_id) AS mt3
            FROM (
                SELECT user_id, event_type, ts, mt1,
                       MIN(CASE WHEN event_type = 'click' AND ts >= mt1
                                THEN ts END)
                           OVER (PARTITION BY user_id) AS mt2
                FROM (
                    SELECT user_id, event_type, ts,
                           MIN(CASE WHEN event_type = 'view' THEN ts END)
                               OVER (PARTITION BY user_id) AS mt1
                    FROM events
                )
            )
        )
    ), agg AS (
        SELECT SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS n1,
               SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS n2,
               SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS n3
        FROM flags
    )
    SELECT step, step_name,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(n_users * 1000 // prev AS BIGINT) AS conv_from_prev_milli,
           CAST(n_users * 1000 // first AS BIGINT) AS conv_from_first_milli
    FROM (
        SELECT 1 AS step, 'view' AS step_name, n1 AS n_users,
               n1 AS prev, n1 AS first FROM agg
        UNION ALL
        SELECT 2, 'click', n2, n1, n1 FROM agg
        UNION ALL
        SELECT 3, 'purchase', n3, n2, n1 FROM agg
    )
    """,
)
def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase): a user
    counts for step k only if step k's FIRST qualifying event is at or
    after their step-(k-1) time — the sequence constraint that separates
    a funnel from three independent counts. ONE shuffle on user_id: the
    three chained `MIN(CASE ...) OVER (PARTITION BY user_id)` windows
    share the partitioning (mt2 conditions on mt1, mt3 on mt2), the
    per-user flags dedup rides the same layout, and the step counts are
    a 1-row aggregate unpivoted to 3 rows with integer-milli conversion
    ratios. At 100 TB the plan is scan → one user_id exchange → window
    chain → tiny agg — no joins, no second scan, no Python."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id")
    flags = (
        ev.withColumn(
            "mt1",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "mt2",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") >= F.col("mt1")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "mt3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("mt2")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .select(
            "user_id",
            F.col("mt1").isNotNull().alias("s1"),
            F.col("mt2").isNotNull().alias("s2"),
            F.col("mt3").isNotNull().alias("s3"),
        )
        .distinct()
    )
    agg = flags.agg(
        F.sum(F.col("s1").cast("long")).alias("n1"),
        F.sum(F.col("s2").cast("long")).alias("n2"),
        F.sum(F.col("s3").cast("long")).alias("n3"),
    )
    return agg.selectExpr(
        "stack(3, "
        " 1, 'view',     n1, n1, n1,"
        " 2, 'click',    n2, n1, n1,"
        " 3, 'purchase', n3, n2, n1"
        ") AS (step, step_name, n_users, prev, first)"
    ).select(
        "step",
        "step_name",
        F.col("n_users").cast("long").alias("n_users"),
        F.expr("n_users * 1000 div prev").cast("long")
        .alias("conv_from_prev_milli"),
        F.expr("n_users * 1000 div first").cast("long")
        .alias("conv_from_first_milli"),
    )
