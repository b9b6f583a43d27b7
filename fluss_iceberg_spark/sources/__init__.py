"""Data sources: driver testdata loaders and faker-parity synthetic generators."""

from fluss_iceberg_spark.sources.tpch import TABLES, load_table, register_views  # noqa: F401
