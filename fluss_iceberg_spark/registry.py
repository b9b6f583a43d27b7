"""Query registry — the driver contract's backbone.

Every implemented operator from SURVEY.md §2 registers here as a named
query: a ``(spark, sf_dir) -> DataFrame`` callable plus (when the operator
is SQL-expressible) an equivalent ANSI-SQL oracle string for DuckDB.
``__spark_entry__.py`` re-exports these as ``queries()`` / ``oracle_sql()``.

Oracle-parity rules used throughout (so Spark and DuckDB produce
bit-identical values):

- Money/measure arithmetic is done in DECIMAL (exact); the *final* output
  column is CAST to DOUBLE in both engines. A double→decimal cast is
  unambiguous (decimal half-points like .005 are never binary-representable,
  so both engines round the same binary value to the same decimal), and a
  decimal→double cast is IEEE round-to-nearest in both.
- Averages are computed as CAST(exact_decimal_sum AS DOUBLE) / COUNT, never
  engine-native AVG (whose result type differs between engines).
- Every computed column is aliased identically in both forms.
- ORDER BY ... LIMIT k always carries a unique tie-break column.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_WORKLOAD_MODULES = (
    "fluss_iceberg_spark.workloads.reference",
    "fluss_iceberg_spark.workloads.tpch",
    "fluss_iceberg_spark.workloads.tpch2",
    "fluss_iceberg_spark.workloads.windows",
    "fluss_iceberg_spark.workloads.events",
    "fluss_iceberg_spark.workloads.lake",
    "fluss_iceberg_spark.workloads.streaming",
    "fluss_iceberg_spark.workloads.text",
    "fluss_iceberg_spark.workloads.dedup",
    "fluss_iceberg_spark.workloads.similarity",
    "fluss_iceberg_spark.workloads.multimodal",
    "fluss_iceberg_spark.workloads.engine_sql",
)


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query, optionally with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # ship the package to Python workers (pandas-UDF kernels are
            # pickled by module reference) before any plan is built
            from fluss_iceberg_spark.runtime import ensure_shipped

            ensure_shipped(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every workload module (idempotent), populating the registry."""
    for mod in _WORKLOAD_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Workload modules come online incrementally during the build;
            # missing ones are skipped, a typo inside one still raises.
            if mod.rsplit(".", 1)[-1] not in str(e):
                raise
