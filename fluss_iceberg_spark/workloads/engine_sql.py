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
    """S13 + the SQL DDL surface (README.md:129-203): the whole lifecycle
    through ``engine.sql()`` strings — CREATE CATALOG / USE CATALOG,
    CREATE TABLE with PRIMARY KEY + WITH properties, INSERT INTO (upsert
    semantics: the second insert overwrites GERMANY), SHOW CREATE TABLE,
    then *re-create* a twin table from the emitted DDL and verify the
    round-trip DDL matches."""
    import hashlib
    import shutil

    from pyspark.sql import functions as F

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    wh = f"/tmp/fluss_engine_scratch/{tag}"
    shutil.rmtree(wh, ignore_errors=True)
    eng = Engine(spark, wh)
    eng.sql(f"CREATE CATALOG fluss_catalog WITH ('warehouse' = '{wh}/fluss')")
    eng.sql("USE CATALOG fluss_catalog")
    eng.sql("""
        CREATE TABLE nation_revenue (
            nation_name STRING NOT NULL,
            revenue DECIMAL(15, 2),
            PRIMARY KEY (nation_name) NOT ENFORCED
        ) WITH (
            'table.datalake.enabled' = 'true',
            'table.datalake.freshness' = '30s'
        )
    """)
    eng.sql(
        "INSERT INTO nation_revenue SELECT * FROM VALUES "
        "('GERMANY', CAST(10.00 AS DECIMAL(15,2))), "
        "('FRANCE', CAST(20.00 AS DECIMAL(15,2)))"
    )
    eng.sql(
        "INSERT INTO nation_revenue SELECT * FROM VALUES "
        "('GERMANY', CAST(35.00 AS DECIMAL(15,2)))"
    )
    ddl = eng.sql("SHOW CREATE TABLE nation_revenue").collect()[0].ddl
    # round-trip: the emitted DDL must itself be valid engine DDL
    eng.sql(ddl.replace("`nation_revenue`", "`nation_revenue_rt`"))
    ddl_rt = eng.sql("SHOW CREATE TABLE nation_revenue_rt").collect()[0].ddl
    roundtrip_ok = ddl_rt == ddl.replace("`nation_revenue`", "`nation_revenue_rt`")
    n_snaps = eng.sql("SELECT COUNT(1) AS c FROM nation_revenue__snapshots").collect()[0].c
    rows = eng.sql(
        "SELECT nation_name, CAST(revenue AS DOUBLE) AS revenue "
        "FROM nation_revenue ORDER BY nation_name"
    ).collect()
    final_state = ";".join(f"{r.nation_name}={r.revenue}" for r in rows)
    from fluss_iceberg_spark.operators.util import arrow_local_df

    return arrow_local_df(
        spark,
        [(ddl, bool(roundtrip_ok), int(n_snaps), len(rows), final_state)],
        "ddl string, roundtrip_ok boolean, n_snapshots long, n_rows long, "
        "final_state string",
    ).select("*", F.lit("ok").alias("status"))


@query(
    "engine_merge_into",
    oracle="""
    SELECT CAST(c_custkey AS INT) AS cust_key, c_name AS name,
           CAST(c_nationkey AS INT) AS nation_key,
           CAST(CAST(c_acctbal AS DECIMAL(15,2)) AS DOUBLE) AS acctbal,
           c_mktsegment AS mktsegment
    FROM customer WHERE c_custkey % 4 <> 0
    UNION ALL
    SELECT CAST(c_custkey AS INT), c_name, CAST(c_nationkey AS INT),
           CAST(CAST(c_acctbal + 1000.0 AS DECIMAL(15,2)) AS DOUBLE), 'MERGED'
    FROM customer WHERE c_custkey % 4 = 0 AND c_custkey % 8 <> 0
    UNION ALL
    SELECT CAST(c_custkey + 10000000 AS INT), c_name, CAST(c_nationkey AS INT),
           CAST(CAST(c_acctbal + 1000.0 AS DECIMAL(15,2)) AS DOUBLE), 'MERGED'
    FROM customer WHERE c_custkey % 100 = 0
    """,
)
def merge_into_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL ``MERGE INTO`` (A1/ST4's lake-native upsert as a statement,
    README.md:247-250; Iceberg's Spark MERGE surface): one statement
    exercises all three arms against a PK customer table — DELETE every
    8th key, UPDATE every other 4th (+1000 / 'MERGED'), INSERT unseen
    keys (base key + 10M for every 100th) — committed as ONE snapshot
    via the touched-bucket copy-on-write merge."""
    import hashlib
    import shutil

    from pyspark.sql import functions as F

    from fluss_iceberg_spark.sources.tpch import load_table

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    wh = f"/tmp/fluss_engine_scratch/{tag}/merge_into"
    shutil.rmtree(wh, ignore_errors=True)
    eng = Engine(spark, wh)
    base = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("int").alias("cust_key"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").cast("int").alias("nation_key"),
        F.col("c_acctbal").cast("decimal(15,2)").alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
    )
    t = eng.create_table(
        "customer_m", base.schema, primary_key=["cust_key"], n_buckets=16
    )
    t.merge(base)
    eng.refresh("customer_m")
    upd = base.filter(F.col("cust_key") % 4 == 0)
    ins = base.filter(F.col("cust_key") % 100 == 0).withColumn(
        "cust_key", (F.col("cust_key") + 10_000_000).cast("int")
    )
    upd.unionByName(ins).createOrReplaceTempView("merge_src")
    eng.sql(
        """
        MERGE INTO customer_m t USING merge_src s ON t.cust_key = s.cust_key
        WHEN MATCHED AND s.cust_key % 8 = 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET
            acctbal = CAST(t.acctbal + 1000.0 AS DECIMAL(15,2)),
            mktsegment = 'MERGED'
        WHEN NOT MATCHED THEN INSERT (cust_key, name, nation_key, acctbal, mktsegment)
            VALUES (s.cust_key, s.name, s.nation_key,
                    CAST(s.acctbal + 1000.0 AS DECIMAL(15,2)), 'MERGED')
        """
    )
    return eng.catalog.load("customer_m").read().withColumn(
        "acctbal", F.col("acctbal").cast("double")
    )


@query(
    "engine_time_travel_sql",
    oracle="""
    SELECT CAST(n_nationkey AS INT) AS nation_key, n_name AS name,
           'v0' AS at_version
    FROM nation WHERE n_nationkey < 10
    UNION ALL
    SELECT CAST(n_nationkey AS INT) AS nation_key, n_name AS name,
           'v1' AS at_version
    FROM nation
    """,
)
def time_travel_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SELECT ... FROM t VERSION AS OF n`` through ``engine.sql()``:
    v0 (first append: keys < 10) and v1 (all keys) queried side by side
    from the same SQL string — the engine rewrites each versioned
    reference to an immutable snapshot view before Catalyst plans it."""
    import hashlib
    import shutil

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from fluss_iceberg_spark.sources.tpch import load_table

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    wh = f"/tmp/fluss_engine_scratch/{tag}/time_travel"
    shutil.rmtree(wh, ignore_errors=True)
    eng = Engine(spark, wh)
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("int").alias("nation_key"),
        F.col("n_name").alias("name"),
    )
    t = eng.create_table(
        "nations_tt",
        T.StructType(
            [
                T.StructField("nation_key", T.IntegerType(), False),
                T.StructField("name", T.StringType(), True),
            ]
        ),
    )
    t.append(nat.filter(F.col("nation_key") < 10))  # v0
    t.append(nat.filter(F.col("nation_key") >= 10))  # v1
    eng.refresh("nations_tt")
    return eng.sql(
        """
        SELECT nation_key, name, 'v0' AS at_version
        FROM nations_tt VERSION AS OF 0
        UNION ALL
        SELECT nation_key, name, 'v1' AS at_version
        FROM nations_tt VERSION AS OF 1
        """
    )


@query(
    "engine_timestamp_travel",
    oracle="""
    SELECT CAST(n_nationkey AS INT) AS nation_key, n_name AS name,
           't0' AS at_time
    FROM nation WHERE n_nationkey < 10
    UNION ALL
    SELECT CAST(n_nationkey AS INT) AS nation_key, n_name AS name,
           't1' AS at_time
    FROM nation
    """,
)
def timestamp_travel_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SELECT ... FROM t TIMESTAMP AS OF <ts>`` through ``engine.sql()``
    (the second half of Iceberg's Spark time-travel surface; VERSION AS OF
    is gated by engine_time_travel_sql). Resolution walks the snapshot
    log's committed_at_ms — newest snapshot at-or-before the timestamp.
    Both accepted literal forms are exercised: bare epoch-milliseconds
    (resolves to v0, taken at v0's own commit time) and an ISO string
    strictly after v1's commit (resolves to v1)."""
    import hashlib
    import shutil
    import time as _time
    from datetime import datetime, timezone

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from fluss_iceberg_spark.sources.tpch import load_table

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    wh = f"/tmp/fluss_engine_scratch/{tag}/timestamp_travel"
    shutil.rmtree(wh, ignore_errors=True)
    eng = Engine(spark, wh)
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("int").alias("nation_key"),
        F.col("n_name").alias("name"),
    )
    t = eng.create_table(
        "nations_ts_tt",
        T.StructType(
            [
                T.StructField("nation_key", T.IntegerType(), False),
                T.StructField("name", T.StringType(), True),
            ]
        ),
    )
    t.append(nat.filter(F.col("nation_key") < 10))  # v0
    _time.sleep(0.005)  # commit clock is ms-granular: keep t0 < t1 strict
    t.append(nat.filter(F.col("nation_key") >= 10))  # v1
    eng.refresh("nations_ts_tt")
    t0_ms = t.snapshot(0).committed_at_ms
    t1_iso = (
        datetime.fromtimestamp(t.snapshot(1).committed_at_ms / 1000 + 1, timezone.utc)
        .strftime("%Y-%m-%d %H:%M:%S.%f")
    )
    return eng.sql(
        f"""
        SELECT nation_key, name, 't0' AS at_time
        FROM nations_ts_tt TIMESTAMP AS OF {t0_ms}
        UNION ALL
        SELECT nation_key, name, 't1' AS at_time
        FROM nations_ts_tt TIMESTAMP AS OF '{t1_iso}'
        """
    )


@query("engine_approx_distinct")  # HLL estimates -> rows-only by nature
def approx_distinct_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.4's approximate COUNT(DISTINCT) through the SQL facade
    (reference parity: Trino exposes ``approx_distinct`` over the same
    Iceberg tables, README.md:287 COUNT family): ``engine.sql()``
    rewrites ``APPROX_COUNT_DISTINCT(col)`` — and the Trino spelling
    ``APPROX_DISTINCT(col)`` — to the built-in Datasketches HLL pair
    (engine.py _rewrite_approx_distinct), so facade estimates share the
    matview COUNT(DISTINCT) sketch family. The gate row is its own
    accuracy report (the dedup_hll_distinct convention): per order
    status, the lgK=12 estimate, the exact count, and the error in
    milli-units — unit-gated to the 3-sigma HLL bound
    (tests/test_engine_sql.py).

    100 TB: one pass, 2^12 registers per group; the exact column exists
    only to make the gate self-reporting and would be dropped in
    production."""
    import hashlib

    from fluss_iceberg_spark.sources.tpch import load_table

    load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_custkey"
    ).createOrReplaceTempView("orders_ad")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    eng = Engine(spark, f"/tmp/fluss_engine_scratch/{tag}/approx_distinct")
    return eng.sql(
        """
        SELECT o_orderstatus,
               APPROX_COUNT_DISTINCT(o_custkey) AS approx_custkeys,
               APPROX_DISTINCT(o_custkey) AS approx_custkeys_trino,
               COUNT(DISTINCT o_custkey) AS exact_custkeys,
               ABS(APPROX_COUNT_DISTINCT(o_custkey) - COUNT(DISTINCT o_custkey))
                   * 1000 DIV COUNT(DISTINCT o_custkey) AS err_milli
        FROM orders_ad
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
        """
    )
