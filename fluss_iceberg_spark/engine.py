"""Engine facade: the user-facing surface of the lakehouse.

A user of the reference interacts through SQL sessions (Flink SQL client,
Trino CLI — README.md:107-109, 264) against catalogs of stream/lake
tables. This facade is the equivalent single entry point:

    eng = Engine(spark, warehouse="/data/warehouse")
    eng.attach_testdata("/root/testdata/sf0.1")       # parquet views
    eng.create_table("nation_revenue", schema, primary_key=["nation_name"])
    eng.sql("SELECT * FROM nation_revenue ORDER BY revenue DESC LIMIT 5")
    eng.show_create_table("nation_revenue")             # S13
    eng.sql("SELECT * FROM nation_revenue__snapshots")  # M1

Lake tables are registered as temp views on create/load (snapshot reads),
with a ``name__snapshots`` companion view for the metadata table — the
reference's ``name$snapshots`` (README.md:275) with '$' replaced, since
Spark temp view names reject it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from fluss_iceberg_spark.lake.table import LakeCatalog, LakeTable
from fluss_iceberg_spark.sources.tpch import register_views


class Engine:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.catalog = LakeCatalog(spark, warehouse)

    # ---- DDL (S8-S13) ----

    def create_table(self, name: str, schema: T.StructType, **kwargs) -> LakeTable:
        t = self.catalog.create_table(name, schema, **kwargs)
        self._register(t)
        return t

    def load_table(self, name: str) -> LakeTable:
        t = self.catalog.load(name)
        self._register(t)
        return t

    def _register(self, t: LakeTable) -> None:
        # the reference exposes metadata as `t$snapshots` (README.md:275);
        # Spark temp view names reject '$', so the companion view is
        # `t__snapshots`
        t.read().createOrReplaceTempView(t.name)
        t.snapshots().createOrReplaceTempView(f"{t.name}__snapshots")

    def refresh(self, name: str) -> None:
        """Re-register views after a write (snapshot reads are immutable)."""
        self._register(self.catalog.load(name))

    def attach_testdata(self, sf_dir: str) -> None:
        register_views(self.spark, sf_dir)

    def show_create_table(self, name: str) -> str:
        """S13 ``SHOW CREATE TABLE`` (README.md:116-122): reconstruct DDL
        from table metadata, reference-style WITH properties."""
        t = self.catalog.load(name)
        cols = []
        for f in t.schema.fields:
            nn = " NOT NULL" if f.name in t.not_null else ""
            cols.append(f"  `{f.name}` {f.dataType.simpleString().upper()}{nn}")
        if t.primary_key:
            cols.append(f"  PRIMARY KEY ({', '.join(t.primary_key)}) NOT ENFORCED")
        props = dict(t.properties)
        props["engine.n-buckets"] = str(t.n_buckets)
        with_clause = ",\n".join(f"  '{k}' = '{v}'" for k, v in sorted(props.items()))
        return (
            f"CREATE TABLE `{name}` (\n" + ",\n".join(cols) + "\n)"
            + (f" WITH (\n{with_clause}\n)" if with_clause else "")
        )

    # ---- query surface ----

    def sql(self, query: str) -> DataFrame:
        """Spark SQL over attached testdata views + registered lake tables.
        Catalyst plans it; nothing engine-specific in the path."""
        return self.spark.sql(query)
