"""Reference-pipeline parity queries (batch form).

These re-create, on the driver testdata (FIXTURES.md §B mapping), exactly
what the reference pipeline computes:

- enrichment lookup joins J1/J2 + projection P1 (README.md:222-239)
- nation revenue aggregation A1/A2 (README.md:247-250)
- top-5 nations T1 (README.md:280-283)
- COUNT(1) A3 (README.md:287,307) and MAX(ts) A4 (README.md:292,313)
- not-null sink enforcement S16 (sql-client.sql:50)

Each has a DuckDB oracle; value parity rules are in registry.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fluss_iceberg_spark.operators.aggregation import count_rows, max_of, nation_revenue
from fluss_iceberg_spark.operators.enrichment import enrich_orders
from fluss_iceberg_spark.operators.topk import top_k
from fluss_iceberg_spark.registry import query
from fluss_iceberg_spark.sources.tpch import load_table

# Shared oracle fragment: the enrichment join with the FIXTURES.md §B casts.
_ENRICH_SQL = """
    SELECT o.o_orderkey                          AS order_key,
           CAST(o.o_custkey AS INT)              AS cust_key,
           CAST(o.o_totalprice AS DECIMAL(15,2)) AS total_price,
           CAST(o.o_orderdate AS DATE)           AS order_date,
           o.o_orderpriority                     AS order_priority,
           c.c_name                              AS cust_name,
           CAST(c.c_acctbal AS DECIMAL(15,2))    AS cust_acctbal,
           c.c_mktsegment                        AS cust_mktsegment,
           n.n_name                              AS nation_name
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
"""


def _reference_frames(spark: SparkSession, sf_dir: str):
    """orders/customer/nation in the reference's column vocabulary."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_custkey").cast("int").alias("cust_key"),
        F.col("o_totalprice").cast("decimal(15,2)").alias("total_price"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.col("o_orderpriority").alias("order_priority"),
    )
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("int").alias("cust_key"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").cast("int").alias("nation_key"),
        F.col("c_acctbal").cast("decimal(15,2)").alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("int").alias("nation_key"),
        F.col("n_name").alias("name"),
    )
    return orders, customer, nation


def enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c, n = _reference_frames(spark, sf_dir)
    return enrich_orders(o, c, n)


@query(
    "ref_enriched_orders",
    oracle=f"""
    SELECT order_key, cust_key,
           CAST(total_price AS DOUBLE) AS total_price,
           order_date, order_priority, cust_name,
           CAST(cust_acctbal AS DOUBLE) AS cust_acctbal,
           cust_mktsegment, nation_name
    FROM ({_ENRICH_SQL}) e
    """,
)
def q_enriched_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J2 cascaded LEFT lookup joins + P1 projection (README.md:222-239).

    Arithmetic stays DECIMAL-exact inside the join; the *final* decimal
    columns are CAST to DOUBLE in both engines (registry.py parity rule)."""
    e = enriched(spark, sf_dir)
    return e.withColumn("total_price", F.col("total_price").cast("double")).withColumn(
        "cust_acctbal", F.col("cust_acctbal").cast("double")
    )


@query(
    "ref_nation_revenue",
    oracle=f"""
    SELECT nation_name,
           CAST(SUM(total_price) AS DOUBLE) AS revenue
    FROM ({_ENRICH_SQL}) e
    GROUP BY nation_name
    """,
)
def q_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2 revenue rollup keyed by nation_name (README.md:247-250)."""
    return nation_revenue(enriched(spark, sf_dir)).select(
        "nation_name", F.col("revenue").cast("double").alias("revenue")
    )


@query(
    "ref_top5_nations",
    oracle=f"""
    SELECT nation_name, CAST(SUM(total_price) AS DOUBLE) AS revenue
    FROM ({_ENRICH_SQL}) e
    GROUP BY nation_name
    ORDER BY revenue DESC NULLS LAST, nation_name ASC NULLS LAST
    LIMIT 5
    """,
)
def q_top5_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 ``ORDER BY revenue DESC LIMIT 5`` (README.md:280-283); nation_name
    tie-break for determinism."""
    rev = nation_revenue(enriched(spark, sf_dir)).select(
        "nation_name", F.col("revenue").cast("double").alias("revenue")
    )
    return top_k(rev, 5, F.desc_nulls_last("revenue"), F.asc_nulls_last("nation_name"))


@query("ref_count_orders", oracle="SELECT COUNT(1) AS cnt FROM orders")
def q_count_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 ``COUNT(1)`` (README.md:287,307)."""
    return count_rows(load_table(spark, sf_dir, "orders"))


@query("ref_max_orderdate", oracle="SELECT MAX(o_orderdate) AS max_ts FROM orders")
def q_max_orderdate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 ``MAX(timestamp)`` staleness probe (README.md:292,313)."""
    return max_of(load_table(spark, sf_dir, "orders"), "o_orderdate", "max_ts")


@query(
    "ref_notnull_drop",
    oracle=f"""
    SELECT COUNT(1) AS cnt
    FROM ({_ENRICH_SQL}) e
    WHERE cust_name IS NOT NULL AND cust_acctbal IS NOT NULL
    """,
)
def q_notnull_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S16 sink NOT NULL enforcement = DROP (sql-client.sql:50): rows with
    NULLs in declared NOT NULL columns are silently dropped, not failed.
    Modeled on the enriched stream: declare (cust_name, cust_acctbal) NOT
    NULL and count survivors."""
    e = enriched(spark, sf_dir)
    return count_rows(e.na.drop(subset=["cust_name", "cust_acctbal"]))
