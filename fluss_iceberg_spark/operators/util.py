"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def arrow_local_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """``createDataFrame`` for driver-local row lists via the ARROW path.

    The plain list-of-tuples path pickles rows into a Python RDD: every
    downstream action ships them back through Python workers — measured
    ~0.8 s warm / ~3 s after a session recycle for a 10k-row frame
    (guide §4: every Python path pays the JVM↔Python boundary; guide §6:
    Arrow for driver transfers). Routing the same rows through a pandas
    DataFrame turns them into an Arrow-backed LocalTableScan: no Python
    workers at execution time, identical values and schema (the explicit
    ``schema`` string drives the same DDL-parsed types as before).

    Use for frames of ints/floats/strings (exact under Arrow). Not for
    Decimal/struct payloads — those keep the classic path at call sites.
    """
    import pandas as pd

    if isinstance(schema, str):
        # parse via Spark's own DDL parser: a comma-bearing type
        # (decimal(10,2), map<string,int>, struct<...>) would silently
        # mis-split under a naive comma split (r12 ADVICE)
        from pyspark.sql.types import _parse_datatype_string

        struct = _parse_datatype_string(schema)
    else:  # StructType
        struct = schema
    fields = [(f.name, f.dataType.simpleString()) for f in struct.fields]
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    pdf = pd.DataFrame.from_records(rows, columns=[n for n, _ in fields])
    # from_records coerces a mixed int/None column (e.g.
    # $snapshots.parent_id — None for the first snapshot) to float64 +
    # NaN, which integer Spark types reject. Rebuild ONLY such columns
    # as object dtype from the original rows (exact ints, real nulls);
    # the common all-int/all-string columns keep the fast C path. The
    # positional rebuild requires sequence rows — assert that rather
    # than silently scrambling a dict/Row caller's values (r12 ADVICE).
    for i, (n, t) in enumerate(fields):
        if pdf[n].dtype.kind == "f" and not t.startswith(
            ("double", "float", "decimal")
        ):
            if not all(
                isinstance(r, (tuple, list)) and len(r) == len(fields)
                for r in rows
            ):
                raise TypeError(
                    "arrow_local_df int/None repair needs index-aligned "
                    "tuple rows (len == #fields); got a non-sequence row"
                )
            pdf[n] = pd.Series([r[i] for r in rows], dtype="object")
    return spark.createDataFrame(pdf, schema=schema)


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
