"""TPC-H-style batch analytics over the testdata star schema.

The reference's batch surface is Trino SQL over Iceberg (README.md:257-292)
and Flink batch SQL (README.md:296-316); its schema domain is deliberately
TPC-H-shaped (sql-client.sql:1-48). These queries exercise the full
relational operator set at bench scale: multi-way joins, filtered
aggregation, grouped decimal arithmetic, window ranking, top-k.

Scale notes per query are in the docstrings; see registry.py for the
decimal/double oracle-parity rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fluss_iceberg_spark.registry import query
from fluss_iceberg_spark.sources.tpch import load_table


def _dec(col: str, prec: int = 12, scale: int = 2) -> F.Column:
    return F.col(col).cast(f"decimal({prec},{scale})")


@query(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)     AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1.0 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                / COUNT(1) AS DOUBLE)                                 AS avg_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                / COUNT(1) AS DOUBLE)                                 AS avg_price,
           COUNT(1) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: scan-heavy grouped aggregation.

    Scale: filter + projection push into the parquet scan; all aggregates
    are algebraic → partial aggregation before a group-cardinality-bounded
    (≤6 rows) exchange. This is the archetypal 100 TB-safe plan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    qty, price = _dec("l_quantity"), _dec("l_extendedprice")
    disc = (F.lit(1.0) - F.col("l_discount")).cast("decimal(12,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * disc).cast("double").alias("sum_disc_price"),
            (F.sum(qty).cast("double") / F.count(F.lit(1))).cast("double").alias("avg_qty"),
            (F.sum(price).cast("double") / F.count(F.lit(1))).cast("double").alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * CAST(1.0 - l.l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           o.o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-06-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC NULLS LAST, l_orderkey ASC
    LIMIT 10
    """,
)
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: selective dim filter → fact join → top-10.

    Scale: the customer filter broadcasts (post-filter side ≪ threshold via
    AQE); orders⋈lineitem shuffles on orderkey once; top-10 is
    TakeOrderedAndProject (no global sort).
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-15 00:00:00").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-15 00:00:00").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")).cast("decimal(12,2)"))
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc_nulls_last("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier",
    oracle="""
    SELECT n.n_name AS nation_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * CAST(1.0 - l.l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way star join, local-supplier predicate.

    Scale: all dims (region/nation/supplier/customer) broadcast; only
    orders⋈lineitem is a shuffle join on orderkey. Result is
    nation-cardinality rows.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")).cast("decimal(12,2)"))
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(12,4))) AS DOUBLE) AS revenue,
           COUNT(1) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter + global aggregate — pushdown showcase.

    Scale: every predicate reaches the parquet scan (min/max row-group
    skipping); single partial-aggregated exchange of one row per partition.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * F.col("l_discount").cast("decimal(12,4)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c.c_custkey,
           c.c_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * CAST(1.0 - l.l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           CAST(c.c_acctbal AS DOUBLE) AS c_acctbal,
           n.n_name AS nation_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC NULLS LAST, c_custkey ASC
    LIMIT 20
    """,
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item losers — join + group on a wide key + top-20."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")).cast("decimal(12,2)"))
            .cast("double")
            .alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.col("c_acctbal").cast("decimal(15,2)").cast("double").alias("c_acctbal"),
            F.col("n_name").alias("nation_name"),
        )
        .orderBy(F.desc_nulls_last("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(1) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: EXISTS → left-semi join (no fact-side duplication, the
    probe side short-circuits on first match)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "tpch_q14_promo_effect",
    oracle="""
    SELECT 100.0 * CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                     THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                          * CAST(1.0 - l.l_discount AS DECIMAL(12,2))
                     ELSE CAST(0.0 AS DECIMAL(25,4)) END) AS DOUBLE)
           / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * CAST(1.0 - l.l_discount AS DECIMAL(12,2))) AS DOUBLE) AS promo_revenue_pct,
           COUNT(1) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'
    """,
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: conditional aggregation over a broadcast dim join."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    disc_price = _dec("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")).cast(
        "decimal(12,2)"
    )
    promo = F.when(F.col("p_type").like("PROMO%"), disc_price).otherwise(
        F.lit(0.0).cast("decimal(25,4)")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (F.lit(100.0) * F.sum(promo).cast("double") / F.sum(disc_price).cast("double"))
            .alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "tpch_q18_large_orders",
    oracle="""
    WITH big AS (
        SELECT l_orderkey
        FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
    )
    SELECT c.c_name,
           c.c_custkey,
           o.o_orderkey,
           o.o_orderdate,
           CAST(CAST(o.o_totalprice AS DECIMAL(15,2)) AS DOUBLE) AS o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN big ON big.l_orderkey = o.o_orderkey
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC
    LIMIT 20
    """,
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: HAVING subquery → aggregate-then-semi-join, top-20.

    Scale: the HAVING pre-aggregate and the final aggregate share the
    l_orderkey hash partitioning, so the semi join is co-located (no extra
    exchange on the fact side)."""
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        l.join(big, on="l_orderkey", how="left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                 F.col("o_totalprice").cast("decimal(15,2)").cast("double")
                 .alias("o_totalprice"))
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("total_qty"))
        .orderBy(F.desc_nulls_last("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "window_top_customer_per_nation",
    oracle="""
    SELECT n_nationkey, nation_name, c_custkey, c_name,
           CAST(acctbal AS DOUBLE) AS acctbal
    FROM (
        SELECT n.n_nationkey,
               n.n_name AS nation_name,
               c.c_custkey,
               c.c_name,
               CAST(c.c_acctbal AS DECIMAL(15,2)) AS acctbal,
               ROW_NUMBER() OVER (
                   PARTITION BY n.n_nationkey
                   ORDER BY CAST(c.c_acctbal AS DECIMAL(15,2)) DESC, c.c_custkey ASC
               ) AS rn
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ) t
    WHERE rn <= 3
    """,
)
def window_top_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function ranking: top-3 customers by acctbal per nation.

    Scale: single hash-partitioned window on nationkey; rank pushdown via
    WindowGroupLimit keeps per-partition state at k rows.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    acct = F.col("c_acctbal").cast("decimal(15,2)")
    w = Window.partitionBy("n_nationkey").orderBy(acct.desc(), F.col("c_custkey").asc())
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "n_nationkey",
            F.col("n_name").alias("nation_name"),
            "c_custkey",
            "c_name",
            acct.cast("double").alias("acctbal"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@query(
    "agg_rollup_status_priority",
    oracle="""
    SELECT o_orderstatus,
           o_orderpriority,
           COUNT(1) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy aggregation (status → priority → grand total):
    one shuffle, grouping-set expansion map-side."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(15,2)")).cast("double").alias("total"),
    )


@query(
    "agg_cube_status_priority",
    oracle="""
    SELECT o_orderstatus,
           o_orderpriority,
           COUNT(1) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation (all 2² grouping sets: both, each alone, grand
    total — the other multi-dimensional aggregate beside ROLLUP; absent
    from the reference, SURVEY §2.4, but table stakes for an analytics
    engine). Same single-shuffle grouping-set expansion plan as ROLLUP."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(15,2)")).cast("double").alias("total"),
    )


@query(
    "set_ops_customers",
    oracle="""
    SELECT cust_key, 'both' AS which FROM (
        SELECT CAST(c_custkey AS INT) AS cust_key FROM customer
        WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT CAST(o_custkey AS INT) FROM orders
    )
    UNION ALL
    SELECT cust_key, 'only_customers' FROM (
        SELECT CAST(c_custkey AS INT) AS cust_key FROM customer
        WHERE c_mktsegment = 'BUILDING'
        EXCEPT
        SELECT CAST(o_custkey AS INT) FROM orders
    )
    """,
)
def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set operations (absent from the reference,
    SURVEY §2.6): BUILDING-segment customers split into those with orders
    (INTERSECT) and those without (EXCEPT). Catalyst plans both as
    left-semi / left-anti aggregate joins — one shuffle each on the key,
    broadcast when a side is small."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").cast("int").alias("cust_key")
    )
    order_keys = o.select(F.col("o_custkey").cast("int").alias("cust_key"))
    both = building.intersect(order_keys).withColumn("which", F.lit("both"))
    only_c = building.exceptAll(order_keys).distinct().withColumn(
        "which", F.lit("only_customers")
    )
    return both.unionByName(only_c)


@query(
    "agg_pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per priority pivoted on status (explicit value
    list → no extra distinct-values job)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
    )


@query(
    "agg_priority_distribution",
    oracle="""
    SELECT o_orderpriority,
           o_orderstatus,
           COUNT(1) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS total,
           CAST(MIN(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS min_price,
           CAST(MAX(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS max_price
    FROM orders
    GROUP BY o_orderpriority, o_orderstatus
    """,
)
def priority_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate GROUP BY incl. COUNT(DISTINCT) (distinct agg expands
    to a two-phase plan; still group-cardinality-bounded)."""
    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(15,2)")
    return o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.sum(price).cast("double").alias("total"),
        F.min(price).cast("double").alias("min_price"),
        F.max(price).cast("double").alias("max_price"),
    )
