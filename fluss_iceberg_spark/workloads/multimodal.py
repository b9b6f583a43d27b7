"""Multimodal-column queries: binary payload plumbing with stubbed decode."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fluss_iceberg_spark.operators import multimodal as MM
from fluss_iceberg_spark.registry import query
from fluss_iceberg_spark.sources.tpch import load_table


@query(
    "multimodal_decode_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           sha256(text) AS sha256,
           CAST(1 + ascii(substr(text, 1, 1)) AS INT) AS fake_width,
           CAST(1 + ascii(substr(text, length(text), 1)) AS INT) AS fake_height
    FROM documents
    """,
)
def decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary ingest (payload + typed metadata) → mapInPandas decode stub
    over Arrow batches. The oracle checks the whole plumbing: byte counts,
    content hash, and header-derived fake features all survive the
    binary→Arrow→pandas round trip."""
    return MM.decoded_features(load_table(spark, sf_dir, "documents"))
