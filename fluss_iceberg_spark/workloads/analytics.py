"""Event-analytics and reshaping operators a warehouse user of the
reference stack (Flink SQL + Trino over Fluss/Iceberg, fluss-iceberg
README.md:187's always-fresh analytics demo) reaches for next: gap-free
time-series resampling, funnel conversion, cohort retention, fuzzy
name matching, GROUPING SETS and UNPIVOT. All batch DataFrame plans
over the driver fixtures, each with an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fluss_iceberg_spark.registry import query
from fluss_iceberg_spark.sources.tpch import load_table


@query(
    "events_gap_fill",
    oracle="""
    WITH rng AS (
        SELECT date_trunc('hour', MIN(ts)) AS h0,
               date_trunc('hour', MAX(ts)) AS h1
        FROM events
    ), spine AS (
        SELECT t.event_type, gs.hour
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (
            SELECT UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
            FROM rng
        ) gs
    ), agg AS (
        SELECT date_trunc('hour', ts) AS hour, event_type,
               COUNT(1) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
        FROM events GROUP BY 1, 2
    )
    SELECT s.event_type, s.hour,
           CAST(COALESCE(a.n, 0) AS BIGINT) AS n_events,
           CAST(COALESCE(a.sv, 0.0) AS DOUBLE) AS sum_value
    FROM spine s
    LEFT JOIN agg a ON s.hour = a.hour AND s.event_type = a.event_type
    """,
)
def gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling / resampling: a dense hourly spine per
    event_type over the observed range, hours with no events filled with
    zeros (what every dashboard and forecasting pipeline needs before a
    rolling window — missing buckets silently skew moving averages).

    Scale shape: the fact side collapses FIRST through one keyed
    aggregation (hour × type — bounded output); the spine is generated
    from a 1-row min/max aggregate via sequence+explode (types × hours
    rows, metadata-sized) and LEFT-joins the aggregate. Nothing
    row-proportional is ever joined or exploded. Interval arithmetic
    only — valid for both TIMESTAMP and TIMESTAMP_NTZ testdata
    vintages."""
    e = load_table(spark, sf_dir, "events")
    agg = e.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sv"),
    )
    rng = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = (
        e.select("event_type").distinct()
        .crossJoin(F.broadcast(rng))
        .select(
            "event_type",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    return spine.join(agg, on=["event_type", "hour"], how="left").select(
        "event_type",
        "hour",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
        F.coalesce("sv", F.lit(0.0)).cast("double").alias("sum_value"),
    )


@query(
    "events_anomaly_zscore",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hour, event_type,
               COUNT(1) AS n_events
        FROM events GROUP BY 1, 2
    ), stats AS (
        SELECT hour, event_type, n_events,
               AVG(CAST(n_events AS DOUBLE)) OVER w AS mu,
               COUNT(1) OVER w AS n_win,
               SUM(CAST(n_events AS DOUBLE) * n_events) OVER w AS sumsq,
               SUM(CAST(n_events AS DOUBLE)) OVER w AS s1
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY hour
                     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT hour, event_type, n_events,
           CAST((n_events - mu) /
                sqrt((sumsq - s1 * s1 / n_win) / (n_win - 1)) AS DOUBLE)
               AS zscore
    FROM stats
    WHERE n_win >= 12
      AND (sumsq - s1 * s1 / n_win) / (n_win - 1) > 0
    """,
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection (the monitoring workload every
    always-fresh lakehouse feeds): each hour's event count scored
    against the TRAILING 24 hours' mean/stddev per event type (frame
    excludes the current row — scoring a point against a window that
    contains it dilutes the signal). Variance is computed from the
    rolling sum and sum-of-squares so both engines evaluate the exact
    same arithmetic (engine-native STDDEV differs in Welford vs two-pass
    rounding); warm-up hours (< 12 trailing points) and zero-variance
    windows are excluded.

    Scale shape: the fact collapses through one keyed aggregation; the
    rolling frame is one hash exchange on event_type over the already
    hour-granular series (bounded rows per type)."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-24, -1)
    )
    nd = F.col("n_events").cast("double")
    stats = hourly.select(
        "hour",
        "event_type",
        "n_events",
        F.avg(nd).over(w).alias("mu"),
        F.count(F.lit(1)).over(w).alias("n_win"),
        F.sum(nd * F.col("n_events")).over(w).alias("sumsq"),
        F.sum(nd).over(w).alias("s1"),
    )
    var = (F.col("sumsq") - F.col("s1") * F.col("s1") / F.col("n_win")) / (
        F.col("n_win") - 1
    )
    return (
        stats.filter((F.col("n_win") >= 12) & (var > 0))
        .select(
            "hour",
            "event_type",
            "n_events",
            ((nd - F.col("mu")) / F.sqrt(var)).cast("double").alias("zscore"),
        )
    )


@query(
    "events_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t0 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, MIN(e.ts) AS t0 FROM events e
        JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts >= v.t0
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, MIN(e.ts) AS t0 FROM events e
        JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= c.t0
        GROUP BY e.user_id
    )
    SELECT CAST(1 AS INT) AS step, 'view' AS step_name, COUNT(*) AS n_users FROM v
    UNION ALL
    SELECT CAST(2 AS INT), 'click', COUNT(*) FROM c
    UNION ALL
    SELECT CAST(3 AS INT), 'purchase', COUNT(*) FROM p
    """,
)
def funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (view → click → purchase): a user
    counts at step k only with a step-k event AT OR AFTER their earliest
    step-(k-1) qualifying event — the standard product-analytics funnel,
    which a plain per-type COUNT DISTINCT gets wrong (it ignores order).

    Scale shape: one user_id-keyed aggregation per step, each chained
    through a user_id equi-join with the previous step's (user, ts)
    frame — every exchange is keyed on user_id, so Catalyst reuses one
    hash partitioning across all three steps; per-step state is one
    timestamp per surviving user."""
    e = load_table(spark, sf_dir, "events")

    def step_after(prev: DataFrame, etype: str) -> DataFrame:
        return (
            e.filter(F.col("event_type") == etype)
            .join(prev, on="user_id")
            .filter(F.col("ts") >= F.col("t0"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t_next"))
            .select("user_id", F.col("t_next").alias("t0"))
        )

    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    c = step_after(v, "click")
    p = step_after(c, "purchase")

    def count_step(df: DataFrame, step: int, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(step).cast("int").alias("step"),
            F.lit(name).alias("step_name"),
            "n_users",
        )

    return (
        count_step(v, 1, "view")
        .unionByName(count_step(c, 2, "click"))
        .unionByName(count_step(p, 3, "purchase"))
    )


@query(
    "events_retention_cohorts",
    oracle="""
    WITH activity AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events
    ), cohort AS (
        SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY user_id
    )
    SELECT c.cohort_day,
           CAST(date_diff('day', c.cohort_day, a.day) AS INT) AS day_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM activity a JOIN cohort c ON a.user_id = c.user_id
    GROUP BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active day, counted
    on each later active day as an offset from their cohort day — the
    classic retention triangle.

    Scale shape: raw events collapse immediately to DISTINCT (user, day)
    — the only fact-sized exchange; cohorts derive from that same frame
    with the same user_id key (exchange reuse), and the final matrix is
    days² cells at most."""
    e = load_table(spark, sf_dir, "events")
    activity = e.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    cohort = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        activity.join(cohort, on="user_id")
        .select(
            "cohort_day",
            F.datediff("day", "cohort_day").cast("int").alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "fuzzy_part_names",
    oracle="""
    WITH d AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
    FROM d a JOIN d b ON a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def fuzzy_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy vocabulary join: all DISTINCT part-name pairs within edit
    distance 2 via PassJoin segment signatures + exact Levenshtein
    verify (operators/fuzzy.py — complete candidates, exact precision;
    extended from k=1 in r6 per the r5 verdict). The oracle is DuckDB's
    quadratic levenshtein self-join; the Spark plan is the
    linear-signature equi-join that replaces it at scale."""
    from fluss_iceberg_spark.operators.fuzzy import fuzzy_pairs

    names = load_table(spark, sf_dir, "part").select("p_name").distinct()
    return fuzzy_pairs(names, col="p_name", max_dist=2)


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(1) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), (o_orderpriority))
    """,
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form ROLLUP/CUBE specialize):
    status×priority cells plus each single-dimension margin, NO grand
    total — a set CUBE cannot express without a post-filter. One
    Expand + one keyed exchange, same plan family as the gated
    ROLLUP/CUBE queries."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(1) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority))
        """
    )


@query(
    "agg_grouping_id",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
           COUNT(1) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    """,
)
def grouping_id_markers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING_ID markers over GROUPING SETS — the standard way a
    consumer tells a margin row's NULL (column aggregated away) from a
    genuine NULL group value; both engines follow the SQL convention
    (one bit per grouping column, groupBy order, 1 = aggregated)."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_gid")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING_ID(o_orderstatus, o_orderpriority) AS INT)
                   AS gid,
               COUNT(1) AS n_orders
        FROM orders_gid
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        """
    )


@query(
    "agg_unpivot_measures",
    oracle="""
    WITH a AS (
        SELECT l_returnflag,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS amount FROM a
    UNION ALL
    SELECT l_returnflag, 'sum_price', sum_price FROM a
    UNION ALL
    SELECT l_returnflag, 'sum_disc', sum_disc FROM a
    """,
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide → long reshaping, pivot's inverse): per-returnflag
    measure columns melt into (measure, amount) rows via the native
    DataFrame.unpivot — a zero-shuffle Expand over the already-aggregated
    frame, not a self-union that would rescan the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
        F.sum(F.col("l_discount").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_disc"),
    )
    return agg.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "sum_disc"],
        variableColumnName="measure",
        valueColumnName="amount",
    )


@query(
    "events_value_percentiles",
    oracle="""
    SELECT event_type,
           percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS p50,
           percentile_disc(0.9) WITHIN GROUP (ORDER BY value) AS p90,
           percentile_disc(0.99) WITHIN GROUP (ORDER BY value) AS p99,
           COUNT(1) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles via SQL-standard PERCENTILE_DISC —
    discrete selection (an actual data value, no interpolation), which
    is what makes the result engine-exact where PERCENTILE_CONT's
    float-interpolation order would flake by an ulp. Plans as a single
    keyed sort-aggregate; at scale the grouped sort is bounded by the
    largest group, and approx sketches (percentile_approx) are the
    documented fallback when even that is too hot."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("__pct_events")
    return spark.sql(
        """
        SELECT event_type,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS p50,
               percentile_disc(0.9) WITHIN GROUP (ORDER BY value) AS p90,
               percentile_disc(0.99) WITHIN GROUP (ORDER BY value) AS p99,
               COUNT(1) AS n_events
        FROM __pct_events
        GROUP BY event_type
        """
    )


@query(
    "events_value_histogram",
    oracle="""
    SELECT CAST(floor(value / 50.0) AS BIGINT) AS bin,
           COUNT(1) AS n_events,
           CAST(MIN(value) AS DOUBLE) AS bin_min,
           CAST(MAX(value) AS DOUBLE) AS bin_max
    FROM events
    GROUP BY 1
    """,
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram binning (the warehouse profiling shape):
    bin id is floor(value/width) — IEEE double division is correctly
    rounded, so bin assignment is engine-exact. Pure map-side bin
    computation + one partial-aggregated shuffle on ~10 bins."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.floor(F.col("value") / F.lit(50.0)).cast("bigint").alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("value").cast("double").alias("bin_min"),
        F.max("value").cast("double").alias("bin_max"),
    )


@query(
    "events_seasonal_anomaly",
    oracle="""
    WITH d AS (
        SELECT event_id, event_type,
               CAST(EXTRACT(hour FROM ts) AS INT) AS hod, value
        FROM events
    ), med AS (
        SELECT event_type, hod, quantile_cont(value, 0.5) AS med
        FROM d GROUP BY 1, 2
    ), j AS (
        SELECT d.event_id, d.event_type, d.hod, d.value, med.med
        FROM d JOIN med USING (event_type, hod)
    ), mad AS (
        SELECT event_type, hod, quantile_cont(abs(value - med), 0.5) AS mad
        FROM j GROUP BY 1, 2
    )
    SELECT j.event_id, j.event_type, j.hod, j.value, j.med, mad.mad
    FROM j JOIN mad USING (event_type, hod)
    WHERE mad.mad > 0 AND abs(j.value - j.med) > 5 * mad.mad
    """,
)
def seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal robust-outlier detection — the production form of the
    anomaly family beside the trailing z-score: each event's value is
    scored against its OWN seasonal cell (event_type x hour-of-day)
    using median/MAD, the estimators that one bad day cannot poison
    (mean/stddev break down at 50% contamination; median/MAD at 0%+).
    Flag |value - med| > 5·MAD; zero-MAD cells (constant values) are
    excluded like the z-score's zero-variance guard.

    Cross-engine exact: Spark `percentile` and DuckDB `quantile_cont`
    share the linear-interpolation definition and bit-match on doubles;
    abs/compare/multiply are IEEE-identical, so the flagged set and
    every reported column hash-gate.

    Scale shape: two keyed aggregates over the facts (medians need one
    pass, deviation medians a second — MAD is inherently two-phase),
    each producing a #types x 24-row model that joins back as a
    BROADCAST; the flag itself rides the scan. Exact per-cell
    percentile buffers a cell's values; at 100 TB swap
    `approx_percentile` into the same shape (the family's documented
    sketch path, agg_price_percentiles_approx)."""
    e = load_table(spark, sf_dir, "events")
    d = e.select(
        "event_id",
        "event_type",
        F.hour("ts").cast("int").alias("hod"),
        "value",
    )
    med = d.groupBy("event_type", "hod").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    j = d.join(F.broadcast(med), on=["event_type", "hod"])
    mad = j.groupBy("event_type", "hod").agg(
        F.expr("percentile(abs(value - med), 0.5)").alias("mad")
    )
    return (
        j.join(F.broadcast(mad), on=["event_type", "hod"])
        .filter(
            (F.col("mad") > 0)
            & (F.abs(F.col("value") - F.col("med")) > 5 * F.col("mad"))
        )
        .select("event_id", "event_type", "hod", "value", "med", "mad")
    )


@query(
    "join_range_bands",
    oracle="""
    WITH bands AS (
        SELECT n_name AS band,
               CAST(n_nationkey * 700000 AS BIGINT) AS lo_c,
               CAST(n_nationkey * 700000 + 2500000 AS BIGINT) AS hi_c
        FROM nation
    ), f AS (
        SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem
    )
    SELECT band, lo_c, hi_c,
           COUNT(1) AS n_items,
           CAST(SUM(cents) AS BIGINT) AS sum_value
    FROM bands JOIN f ON f.cents >= lo_c AND f.cents < hi_c
    GROUP BY 1, 2, 3
    """,
)
def range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping price-band revenue rollup — an inequality join
    (cents BETWEEN lo AND hi, bands overlap ~3.6x) answered WITHOUT a
    nested loop: bands explode into fixed-width covering buckets, facts
    bucket map-side, and the band membership becomes a bucket EQUI-join
    (broadcast hash here; hash-partitioned on bucket when the band
    table is itself large) with the exact bounds as a residual filter —
    the form that survives a fact table at 100 TB where O(facts x
    bands) cannot. Integer cents end-to-end, so the DuckDB replay (a
    plain range join) hash-matches every aggregate
    (operators/rangejoin.band_join_agg)."""
    from fluss_iceberg_spark.operators.rangejoin import band_join_agg

    nation = load_table(spark, sf_dir, "nation")
    bands = nation.select(
        F.col("n_name").alias("band"),
        (F.col("n_nationkey").cast("bigint") * 700_000).alias("lo_c"),
        (F.col("n_nationkey").cast("bigint") * 700_000 + 2_500_000).alias(
            "hi_c"
        ),
    )
    fact = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents")
    )
    return band_join_agg(fact, bands)


@query(
    "export_leakage_safe_split",
    oracle="""
    WITH f AS (
        SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
        FROM documents
    ), g AS (
        SELECT fp, MIN(doc_id) AS rep_doc_id, COUNT(1) AS n_copies
        FROM f GROUP BY fp
    )
    SELECT f.doc_id, g.rep_doc_id, g.n_copies,
           CASE WHEN CAST(('0x' || substr(md5('split-v1:'
                    || CAST(g.rep_doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                    % 100 < 10
                THEN 'holdout' ELSE 'train' END AS split
    FROM f JOIN g USING (fp)
    """,
)
def leakage_safe_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/holdout split with duplicate-leakage prevention: the split
    decision is made once per exact-dedup fingerprint group, keyed on
    the group representative, so every copy of a text lands on the SAME
    side — a naive per-doc split would let duplicated documents leak
    into the eval set and score memorization. Deterministic md5
    bucketing (10% holdout of groups); one fingerprint groupBy + one
    md5-balanced join back (operators/dedup.leakage_safe_split)."""
    from fluss_iceberg_spark.operators.dedup import leakage_safe_split

    return leakage_safe_split(load_table(spark, sf_dir, "documents"))
