"""Bucketized inequality (band) joins.

The reference stack answers range predicates by letting Trino/Flink run
a nested-loop; the scale-correct Spark form for fact-to-range joins
(IP-range lookups, price bands, geofences, SLA tiers) is bucketization:
cover each [lo, hi) range with fixed-width buckets, equi-join facts to
buckets, and re-check the exact bounds as a residual filter. The
inequality join becomes a HASH join — broadcastable when the band table
is small, shuffle-partitionable on the bucket key when it is not —
instead of the O(facts x bands) nested loop that cannot survive 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def band_join_agg(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str = "cents",
    band_col: str = "band",
    lo_col: str = "lo_c",
    hi_col: str = "hi_c",
    bucket_width: int = 700_000,
) -> DataFrame:
    """Aggregate ``fact`` rows into every [lo, hi) band containing their
    integer ``value_col``: (band, lo, hi, n_items, sum_value). Bands may
    overlap — a fact contributes to each band covering it.

    Plan: bands explode into ceil(width/bucket_width)+1 covering buckets
    (a few rows per band), facts compute bucket = value div width
    map-side, the join is a bucket EQUI-join (broadcast here; hash-
    partitioned when the band table is large), and the exact bounds run
    as a residual filter behind it. Aggregation is partial map-side."""
    b = bands.select(
        band_col,
        lo_col,
        hi_col,
        F.explode(
            F.sequence(
                F.expr(f"{lo_col} div {bucket_width}"),
                F.expr(f"({hi_col} - 1) div {bucket_width}"),
            )
        ).alias("bucket"),
    )
    f = fact.withColumn(
        "bucket", F.expr(f"{value_col} div {bucket_width}")
    )
    return (
        f.join(F.broadcast(b), on="bucket")
        .filter(
            (F.col(value_col) >= F.col(lo_col))
            & (F.col(value_col) < F.col(hi_col))
        )
        .groupBy(band_col, lo_col, hi_col)
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(value_col).alias("sum_value"),
        )
    )
