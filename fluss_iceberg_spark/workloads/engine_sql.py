"""SQL-facade queries: the engine's user surface driven purely via SQL."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fluss_iceberg_spark.engine import Engine
from fluss_iceberg_spark.registry import query
from fluss_iceberg_spark.sources.tpch import register_views

_REGION_REVENUE_SQL = """
    SELECT r.r_name AS region_name,
           COUNT(1) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * CAST(1.0 - l.l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
"""


@query("sql_region_revenue", oracle=_REGION_REVENUE_SQL)
def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pure-SQL surface (the reference's Trino/Flink SQL sessions):
    the exact same ANSI text runs on Spark and on the DuckDB oracle."""
    register_views(spark, sf_dir)
    return spark.sql(_REGION_REVENUE_SQL)


_NATION_SQL = "SELECT CAST(n_nationkey AS INT) AS n_nationkey, n_name, CAST(n_regionkey AS INT) AS n_regionkey FROM nation"


@query(
    "source_formats_roundtrip",
    oracle=f"""
    SELECT 'csv' AS fmt, t.* FROM ({_NATION_SQL}) t
    UNION ALL
    SELECT 'json' AS fmt, t.* FROM ({_NATION_SQL}) t
    """,
)
def formats_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source formats: the nation dim written out as headered CSV and
    as JSON lines, each read back under an explicit schema and tagged with
    its format — typed values must survive both text round trips. One
    gated query covers both non-parquet batch sources (SURVEY §2.1)."""
    import hashlib
    import shutil

    from pyspark.sql import functions as F

    from fluss_iceberg_spark.sources import files
    from fluss_iceberg_spark.sources.tpch import load_table

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = f"/tmp/fluss_files_scratch/{tag}"
    shutil.rmtree(base, ignore_errors=True)
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("int").alias("n_nationkey"),
        "n_name",
        F.col("n_regionkey").cast("int").alias("n_regionkey"),
    )
    files.write_csv(n, f"{base}/nation_csv")
    files.write_json(n, f"{base}/nation_json")
    via_csv = files.read_csv(spark, f"{base}/nation_csv", n.schema)
    via_json = files.read_json(spark, f"{base}/nation_json", n.schema)
    return via_csv.select(F.lit("csv").alias("fmt"), "*").unionByName(
        via_json.select(F.lit("json").alias("fmt"), "*")
    )


@query("engine_show_create")  # DDL introspection — rows-only
def show_create(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 SHOW CREATE TABLE + M1 snapshots through the Engine facade."""
    import hashlib
    import shutil

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    wh = f"/tmp/fluss_engine_scratch/{tag}"
    shutil.rmtree(wh, ignore_errors=True)
    eng = Engine(spark, wh)
    schema = T.StructType(
        [
            T.StructField("nation_name", T.StringType(), False),
            T.StructField("revenue", T.DecimalType(15, 2), True),
        ]
    )
    t = eng.create_table(
        "nation_revenue",
        schema,
        primary_key=["nation_name"],
        not_null=["nation_name"],
        properties={"datalake.enabled": "true", "datalake.freshness": "30s"},
    )
    from decimal import Decimal

    t.merge(
        spark.createDataFrame(
            [("GERMANY", Decimal("10.00")), ("FRANCE", Decimal("20.00"))],
            "nation_name string, revenue decimal(15,2)",
        )
    )
    eng.refresh("nation_revenue")
    ddl = eng.show_create_table("nation_revenue")
    n_snaps = eng.sql("SELECT COUNT(1) AS c FROM nation_revenue__snapshots").collect()[0].c
    rows = eng.sql("SELECT COUNT(1) AS c FROM nation_revenue").collect()[0].c
    return spark.createDataFrame(
        [(ddl, int(n_snaps), int(rows))], "ddl string, n_snapshots long, n_rows long"
    ).select("ddl", "n_snapshots", "n_rows", F.lit("ok").alias("status"))
