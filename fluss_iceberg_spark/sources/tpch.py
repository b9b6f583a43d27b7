"""Loaders for the driver-provided TPC-H-ish parquet testdata.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings, one parquet file per table under a
scale-factor directory.

The loaders return the *raw* parquet schema — every query states its own
casts explicitly so the DuckDB oracle (which reads the same files) can
mirror them verbatim. The FIXTURES.md §B mapping onto the reference's
pipeline schemas (fluss_order / fluss_customer / fluss_nation,
sql-client.sql:1-48) lives in :func:`reference_views`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. Plain parquet scan → Catalyst gets full
    pushdown/pruning; no caching so each query plans its own minimal scan."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) which Spark 4 rejects
        # (PARQUET_TYPE_ILLEGAL). Read nanos as long (session-settable legacy
        # conf, so this works under any caller's session) and convert to a
        # microsecond TimestampType column — same truncation DuckDB's
        # epoch_us applies.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register each testdata table as a temp view (mirrors the DuckDB
    oracle's pre-registered views), so SQL-form queries run verbatim."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def reference_views(spark: SparkSession, sf_dir: str) -> None:
    """Map driver testdata onto the reference pipeline's schemas
    (FIXTURES.md §B; reference DDL README.md:141-169).

    - ``fluss_order``  ← orders   (o_totalprice double → DECIMAL(15,2),
      o_orderdate timestamp → DATE; README.md:142-148)
    - ``fluss_customer`` ← customer (no phone column in testdata; engine
      tolerates missing optional cols)
    - ``fluss_nation`` ← nation
    """
    register_views(spark, sf_dir, ("orders", "customer", "nation"))
    spark.sql(
        """
        SELECT o_orderkey                          AS order_key,
               CAST(o_custkey AS INT)              AS cust_key,
               CAST(o_totalprice AS DECIMAL(15,2)) AS total_price,
               CAST(o_orderdate AS DATE)           AS order_date,
               o_orderpriority                     AS order_priority,
               o_orderstatus                       AS order_status
        FROM orders
        """
    ).createOrReplaceTempView("fluss_order")
    spark.sql(
        """
        SELECT CAST(c_custkey AS INT)           AS cust_key,
               c_name                           AS name,
               CAST(c_nationkey AS INT)         AS nation_key,
               CAST(c_acctbal AS DECIMAL(15,2)) AS acctbal,
               c_mktsegment                     AS mktsegment
        FROM customer
        """
    ).createOrReplaceTempView("fluss_customer")
    spark.sql(
        """
        SELECT CAST(n_nationkey AS INT) AS nation_key,
               n_name                   AS name
        FROM nation
        """
    ).createOrReplaceTempView("fluss_nation")
