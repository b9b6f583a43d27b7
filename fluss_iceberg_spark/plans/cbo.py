"""Cost-based planning lite: consume ANALYZE stats to pick broadcast
sides at PLAN time (the consumer of ``LakeTable.analyze`` /
``table_stats`` — the Iceberg puffin-stats / CBO role).

Why Spark's static path gets this wrong: without CBO statistics,
Catalyst sizes a scan by FILE BYTES and carries that size through
filters unchanged (SizeInBytesOnlyStatsVisitor). A selective equality
predicate over a big table really yields ~rows/ndv rows, but the
planner still sees file-bytes, so ``autoBroadcastJoinThreshold`` never
fires and the join plans as SortMergeJoin — AQE can only rescue it
AFTER materializing the shuffle stage's map side. ANALYZE's row count
+ per-column NDV make the post-filter cardinality knowable before any
stage runs; at 100 TB that is the difference between shipping a
kilobyte dimension slice and shuffling the fact table.

Selectivity model (System R defaults — the point is order-of-magnitude
broadcast decisions, not exact costing):

- ``col = lit``   → 1 / ndv(col)
- ``col in (..)`` → min(1, |list| / ndv(col))
- range ops       → 1/3
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fluss_iceberg_spark.lake.table import LakeTable

_RANGE_SELECTIVITY = 1.0 / 3.0

# rough per-value widths for row-size estimates (bytes)
_TYPE_WIDTH = {
    T.LongType(): 8, T.IntegerType(): 4, T.ShortType(): 2, T.ByteType(): 1,
    T.DoubleType(): 8, T.FloatType(): 4, T.BooleanType(): 1,
    T.DateType(): 4, T.TimestampType(): 8, T.TimestampNTZType(): 8,
}
_DEFAULT_WIDTH = 24  # strings / decimals / unknown


def estimate_rows(t: LakeTable, where: list[tuple] | None = None) -> float | None:
    """Estimated output rows of ``t.read(where=...)`` from the latest
    ANALYZE stats, or None when the table was never analyzed."""
    stats = t.table_stats()
    if stats is None:
        return None
    rows = float(stats.get("row_count", 0))
    cols = stats.get("columns", {})
    for col, op, lit in where or ():
        ndv = max(1, int(cols.get(col, {}).get("ndv", 0)) or 1)
        if op == "=":
            rows /= ndv
        elif op == "in":
            rows *= min(1.0, len(list(lit)) / ndv)
        else:
            rows *= _RANGE_SELECTIVITY
    return rows


def _row_width(t: LakeTable) -> int:
    return sum(
        _TYPE_WIDTH.get(f.dataType, _DEFAULT_WIDTH) for f in t.schema.fields
    )


def estimate_bytes(t: LakeTable, where: list[tuple] | None = None) -> float | None:
    rows = estimate_rows(t, where)
    return None if rows is None else rows * _row_width(t)


def join_with_stats(
    left: LakeTable,
    right: LakeTable,
    on: list[str],
    lwhere: list[tuple] | None = None,
    rwhere: list[tuple] | None = None,
    how: str = "inner",
    broadcast_threshold_bytes: int = 10 * 1024 * 1024,
) -> DataFrame:
    """Join two lake-table scans, broadcasting the side whose ESTIMATED
    post-predicate size (ANALYZE row count × selectivity × row width)
    fits under the threshold — even when its file bytes would not.
    Falls back to Catalyst's own choice when neither side has stats or
    neither estimate fits."""
    ldf, rdf = left.read(where=lwhere), right.read(where=rwhere)
    lb, rb = estimate_bytes(left, lwhere), estimate_bytes(right, rwhere)
    fits_l = lb is not None and lb <= broadcast_threshold_bytes
    fits_r = rb is not None and rb <= broadcast_threshold_bytes
    if fits_l and (not fits_r or lb <= rb) and how in ("inner", "right"):
        ldf = F.broadcast(ldf)
    elif fits_r and how in ("inner", "left"):
        rdf = F.broadcast(rdf)
    return ldf.join(rdf, on=on, how=how)
