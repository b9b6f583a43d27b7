"""fluss_iceberg_spark — a PySpark-native streaming-lakehouse analytics engine.

Re-creates the query and data-processing capabilities of the
``luoyuxia/fluss-iceberg`` reference demo (a Fluss + Flink + Iceberg + Trino
streaming-lakehouse pipeline) as an idiomatic PySpark engine:

- **Batch analytics** (the reference's Trino surface): plain DataFrame / Spark
  SQL over Parquet-backed lake tables.
- **Lake table layer** (the reference's Iceberg surface): a lightweight
  snapshot-log table format (``fluss_iceberg_spark.lake``) providing atomic
  commits, PK-upsert (MERGE) semantics, snapshot metadata tables and time
  travel. The Spark-Iceberg connector jar is not available in this
  environment, so the format is self-contained Parquet + JSON metadata with
  the same observable contract.
- **Streaming pipeline** (the reference's Flink surface): Structured
  Streaming micro-batches, lookup-join enrichment, incremental upsert
  aggregation, freshness-triggered lake tiering, and hot∪cold union reads.
- **Training-data extensions**: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding cosine), similarity search, text analysis and
  multimodal column plumbing, designed partition-parallel for large scale.

Reference citations in docstrings use ``file:line`` relative to
``/root/reference/`` (e.g. ``README.md:236``).
"""

__version__ = "0.1.0"

from fluss_iceberg_spark.session import get_spark  # noqa: F401
