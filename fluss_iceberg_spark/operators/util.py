"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's parallelism IF
    its scan has fewer partitions — and pass it through untouched
    otherwise.

    Why: a map-heavy pipeline (gram generation, Arrow kernels) with no
    early shuffle inherits the SCAN's partitioning. On a 100 TB corpus
    that is thousands of file splits — fine. But a small or
    single-row-group parquet file scans as ONE partition and the whole
    map stage runs serially on one core. The guard makes this a no-op
    exactly when repartitioning would hurt (a big input already has
    enough splits, and shuffling raw 100 TB input would be a
    scale-killer), and a cheap raw-row shuffle when the input is small
    enough that one core would otherwise do all the work.
    """
    if df.isStreaming:
        # streaming frames can't be probed via .rdd (and micro-batch
        # parallelism is the source's concern) — pass through untouched
        return df
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    # .rdd builds the RDD plan lazily; no job runs here.
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
