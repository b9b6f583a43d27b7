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
    ANALYZE stats, or None when the table was never analyzed.

    Stale-stats guard: the base cardinality is the CURRENT manifest row
    count (``count_rows()`` is O(1) metadata), not the ANALYZE-time
    ``row_count`` — a table that grew 100× since ANALYZE must not be
    force-broadcast on its old size. Per-column NDVs do stay at their
    ANALYZE-time values (recomputing them needs a scan); since growth
    can only raise true NDV, the stale NDV yields a LARGER estimate,
    which errs away from broadcasting — the safe direction."""
    stats = t.table_stats()
    if stats is None:
        return None
    cur_rows = float(t.count_rows())
    rows = cur_rows if cur_rows > 0 else float(stats.get("row_count", 0))
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


def join_with_runtime_filter(
    fact: LakeTable,
    dim: LakeTable,
    on: str,
    dwhere: list[tuple] | None = None,
    max_build_keys: int = 100_000,
) -> DataFrame:
    """Runtime-filtered star join (Spark's dynamic partition pruning /
    Iceberg runtime filtering, extended down to the manifest layer):
    materialize the filtered dimension's join-key set, push it into the
    FACT scan as an IN-list manifest predicate (min/max bounds, value
    sets, bloom probes — ``LakeTable.read(where=[(on, 'in', keys)])``),
    then broadcast-join the dimension. The dim predicate cannot be
    pushed to the fact statically — only the join makes it selective —
    so without this the plan is "scan 100 TB of fact, shuffle or probe,
    discard 99%"; with it, non-matching fact files are never opened
    (time/key-clustered fact tables prune to the colliding files).

    Safety rails, all decided from metadata:
    - inner join only — ``prune_only=True`` relies on the join itself
      being the exact row filter; pruning the preserved side of an
      outer join would drop rows.
    - the key set is collected driver-side, so it must be bounded:
      ANALYZE-estimated post-predicate dim cardinality must fit
      ``max_build_keys`` (and the actual collect re-checks). Unanalyzed
      or too-large dims fall back to ``join_with_stats`` — correct,
      just unfiltered at the scan.
    """
    dimdf = dim.read(where=dwhere)
    est = estimate_rows(dim, dwhere)
    if est is None or est > max_build_keys:
        return join_with_stats(fact, dim, on=[on], rwhere=dwhere)
    rows = (
        dimdf.select(on)
        .filter(F.col(on).isNotNull())
        .distinct()
        .limit(max_build_keys + 1)
        .collect()
    )
    if len(rows) > max_build_keys:  # estimate was wrong — stay safe
        return join_with_stats(fact, dim, on=[on], rwhere=dwhere)
    keys = [r[0] for r in rows]
    if not keys:
        # inner join with an empty dim side is empty; skip the scan
        return fact.read().limit(0).join(F.broadcast(dimdf), on=on)
    factdf = fact.read(where=[(on, "in", keys)], prune_only=True)
    return factdf.join(F.broadcast(dimdf), on=on, how="inner")


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
    # a side is a broadcast candidate only if it FITS and broadcasting
    # it is legal for the join type (the preserved side of an outer
    # join cannot be broadcast); prefer the smaller among legal fits
    legal = {"inner": ("l", "r"), "left": ("r",), "right": ("l",)}.get(
        how, ()
    )
    cands = []
    if "l" in legal and lb is not None and lb <= broadcast_threshold_bytes:
        cands.append((lb, "l"))
    if "r" in legal and rb is not None and rb <= broadcast_threshold_bytes:
        cands.append((rb, "r"))
    if cands:
        side = min(cands)[1]
        if side == "l":
            ldf = F.broadcast(ldf)
        else:
            rdf = F.broadcast(rdf)
    return ldf.join(rdf, on=on, how=how)
