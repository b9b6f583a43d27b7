"""Window-function analytics over the orders/customer tables.

Beyond-reference coverage (SURVEY.md §2.5 notes ranking/window functions are
absent from the reference — luoyuxia/fluss-iceberg README.md:280-283 only has
ORDER BY+LIMIT). These exercise Spark's WindowExec paths: running frames,
lag/lead, ntile, rank — each a single shuffle on the partition key, frames
evaluated without materializing the whole partition per row.

Oracle-parity rules (registry.py): decimal-exact arithmetic, final CAST to
DOUBLE, unique ORDER BY tie-breaks inside window specs, INT/BIGINT casts
aligned between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fluss_iceberg_spark.registry import query
from fluss_iceberg_spark.sources.tpch import load_table


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(15,2)")


@query(
    "window_running_revenue",
    oracle="""
    SELECT o_orderkey,
           o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_rev
    FROM orders
    """,
)
def running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running revenue: cumulative frame, one shuffle on
    o_custkey; decimal prefix sums are order-defined (o_orderdate,
    o_orderkey tie-break) so exact in both engines."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_rev"),
    )


@query(
    "window_order_gaps",
    oracle="""
    SELECT o_orderkey,
           o_custkey,
           CAST(date_diff('day',
               CAST(lag(o_orderdate) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS DATE),
               CAST(o_orderdate AS DATE)) AS INT) AS gap_days
    FROM orders
    """,
)
def order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag(): days since the customer's previous order (NULL for the
    first). datediff on DATE-truncated timestamps matches DuckDB
    date_diff('day') exactly."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag(F.col("o_orderdate")).over(w)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"), prev.cast("date"))
        .cast("int")
        .alias("gap_days"),
    )


@query(
    "window_moving_avg_price",
    oracle="""
    SELECT o_orderkey,
           o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) OVER w AS DOUBLE)
             / COUNT(1) OVER w AS moving_avg
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def moving_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-order moving average per customer — bounded ROWS frame. Built as
    decimal SUM / COUNT (never engine-native AVG, whose result type
    differs between engines)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        (F.sum(_dec("o_totalprice")).over(w).cast("double") / F.count(F.lit(1)).over(w)).alias(
            "moving_avg"
        ),
    )


@query(
    "window_revenue_quartiles",
    oracle="""
    WITH rev AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS total_rev
        FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, total_rev,
           CAST(ntile(4) OVER (ORDER BY total_rev DESC, o_custkey) AS INT) AS quartile
    FROM rev
    """,
)
def revenue_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) over per-customer revenue. The global ORDER BY window is
    the known single-partition bottleneck — fine here because it runs on
    the *aggregated* per-customer rows (|customers| << |orders|), the
    standard scale pattern: aggregate first, rank the reduction."""
    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(_dec("o_totalprice")).cast("double").alias("total_rev")
    )
    w = Window.orderBy(F.desc("total_rev"), F.asc("o_custkey"))
    return rev.select(
        "o_custkey", "total_rev", F.ntile(4).over(w).cast("int").alias("quartile")
    )


@query(
    "window_nation_rank",
    oracle="""
    WITH rev AS (
        SELECT c.c_nationkey,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS revenue
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey
    )
    SELECT n.n_name,
           rev.revenue,
           CAST(rank()       OVER (ORDER BY rev.revenue DESC, n.n_name) AS INT) AS rnk,
           CAST(dense_rank() OVER (ORDER BY rev.revenue DESC, n.n_name) AS INT) AS drnk
    FROM rev JOIN nation n ON n.n_nationkey = rev.c_nationkey
    """,
)
def nation_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank()/dense_rank() of nations by customer revenue — broadcast dim
    join then a tiny (≤|nations|) global window."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.sum(_dec("o_totalprice")).cast("double").alias("revenue"))
    )
    w = Window.orderBy(F.desc("revenue"), F.asc("n_name"))
    return (
        rev.join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .select(
            "n_name",
            "revenue",
            F.rank().over(w).cast("int").alias("rnk"),
            F.dense_rank().over(w).cast("int").alias("drnk"),
        )
    )


@query("agg_approx_distinct_customers")
def approx_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate COUNT DISTINCT next to the exact count —
    the scale path for distinct cardinality (no exact distinct shuffle).
    Approximate ⇒ no DuckDB oracle (rows-only gate); the unit test bounds
    the relative error instead."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_customers"),
        F.countDistinct("o_custkey").alias("exact_customers"),
    )


@query(
    "agg_price_percentiles",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.5) AS med,
           quantile_cont(o_totalprice, 0.9) AS p90,
           quantile_cont(o_totalprice, 0.99) AS p99,
           COUNT(1) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per priority — Spark `percentile`
    and DuckDB `quantile_cont` share the linear-interpolation definition
    and bit-match on doubles. The scale caveat: exact percentile buffers
    each group's values; for heavy groups switch to approx_percentile
    (t-digest, mergeable sketch) — shown in the rows-only twin below."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("med"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        F.expr("percentile(o_totalprice, 0.99)").alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


@query("agg_price_percentiles_approx")
def price_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile: the mergeable-sketch scale path for the same
    question (bounded memory per group regardless of group size).
    Approximate ⇒ rows-only gate. The sketch's array result is projected
    into scalar p50/p90/p99 columns (array output crashes the driver's
    pandas canonicalizer — CORRECTNESS_r01)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.expr("approx_percentile(o_totalprice, array(0.5, 0.9, 0.99), 10000)").alias(
                "pcts"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "o_orderpriority",
            F.col("pcts")[0].alias("p50"),
            F.col("pcts")[1].alias("p90"),
            F.col("pcts")[2].alias("p99"),
            "n",
        )
    )
