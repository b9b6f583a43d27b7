"""Aggregations — the reference's continuous revenue rollup + batch analytics.

- A1/A2: ``SELECT nation_name, SUM(total_price) FROM enriched_orders GROUP
  BY nation_name`` maintained as a PK-upsert table (README.md:247-250).
  Batch form here; the incremental MERGE-delta form lives in
  ``streaming/pipeline.py``.
- A3: ``COUNT(1)`` (README.md:287,307); A4: ``MAX(ingest_ts)``
  (README.md:292,313).

Scale notes: SUM/COUNT/MAX are algebraic → Spark plans partial (map-side)
aggregation before the exchange, so the shuffle carries ≤ one row per
(partition × nation) — at 100 TB the exchange is bounded by group
cardinality, not data volume. Decimal sums keep exact arithmetic; Spark
widens DECIMAL(15,2) sums to DECIMAL(25,2) (README.md:198 declares the
reference's revenue as DECIMAL(15,2) — we cast back on write).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def nation_revenue(enriched: DataFrame) -> DataFrame:
    """Batch form of the reference's revenue aggregation (README.md:247-250).

    One output row per nation_name incl. the NULL group (unmatched keys —
    FIXTURES.md invariant 3). revenue kept DECIMAL(15,2) like the
    reference's sink column (README.md:198).
    """
    return enriched.groupBy("nation_name").agg(
        F.sum("total_price").cast("decimal(15,2)").alias("revenue")
    )


def count_rows(df: DataFrame) -> DataFrame:
    """A3 ``COUNT(1)`` (README.md:287,307)."""
    return df.agg(F.count(F.lit(1)).alias("cnt"))


def max_of(df: DataFrame, col: str, alias: str = "max_val") -> DataFrame:
    """A4 ``MAX(col)`` (README.md:292,313)."""
    return df.agg(F.max(col).alias(alias))
