"""Temporal join operators Spark lacks as built-ins: as-of join and
bounded-range (band) join.

The reference has no event-time joins at all (SURVEY.md §2.3: only
processing-time lookup joins, luoyuxia/fluss-iceberg README.md:236-239);
these are extension operators for event-time analytics, built the
scale-first way:

- ``asof_join``: union-then-window formulation — ONE shuffle on the join
  key, no pairwise join blowup, no per-row Python. This is how you as-of
  join 100 TB: tag both sides, sort within key partitions, carry the last
  right-side payload forward with ``last(ignorenulls=True)``.
- ``range_count_join``: time-bucketed equi-join — the left side explodes
  into the (at most 2) buckets its window can touch, turning an O(n·m)
  theta join into an equi-join Catalyst can hash/sort-merge, followed by
  an exact range filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _epoch_seconds(df: DataFrame, col: str):
    """Timezone-free epoch seconds for bucketing, valid for both TIMESTAMP
    and TIMESTAMP_NTZ columns (the testdata vintages differ). The NTZ form
    subtracts the epoch as an interval and casts — no session-timezone
    dependence, so bucket adjacency survives DST in any caller session."""
    if isinstance(df.schema[col].dataType, T.TimestampNTZType):
        return F.expr(f"CAST(`{col}` - TIMESTAMP_NTZ '1970-01-01 00:00:00' AS LONG)")
    return F.unix_timestamp(F.col(col))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    right_id: str,
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    ``right.ts <= left.ts`` and the same key (LEFT semantics: unmatched →
    NULL payload).

    Deterministic tie-breaks: right rows sharing the as-of timestamp
    resolve to the highest ``right_id``; right rows at exactly the left
    timestamp DO match (<=). Window order is (ts, is_left, right_id) so
    same-instant right rows sort before left rows.
    """
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.col(right_id).alias("__rid"),
        *[F.col(c).alias(f"__p_{c}") for c in right_payload],
        *[F.lit(None).cast(t.dataType).alias(f"__l_{c}") for c, t in zip(left.columns, left.schema)],
    )
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(right.schema[right_id].dataType).alias("__rid"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}")
            for c in right_payload
        ],
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc(), F.col("__rid").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).select(
        "*",
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"__asof_{c}")
            for c in right_payload
        ],
    )
    out = carried.filter(F.col("__is_left") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *[F.col(f"__asof_{c}").alias(f"asof_{c}") for c in right_payload],
    )
    return out


def range_count_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    left_id: str,
) -> DataFrame:
    """Count right rows with ``left.ts < right.ts <= left.ts + window``
    per left row (same key), keeping zero-count left rows.

    Bucketing: with bucket width == window length, a right row matching a
    left row lives in the left row's bucket or the next one — so the left
    side duplicates into 2 buckets and the theta join becomes an
    equi-join on (key, bucket). Scale: shuffle is keyed on (key, bucket),
    skew bounded by bucket width, never a broadcast of a big side.
    """
    w = F.lit(window_seconds)
    lb = F.floor(_epoch_seconds(left, left_ts) / w)
    l = left.select(
        F.col(left_id).alias("__lid"),
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__lts"),
        F.explode(F.array(lb, lb + 1)).alias("__bkt"),
    )
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__rts"),
        F.floor(_epoch_seconds(right, right_ts) / w).alias("__bkt"),
    )
    hits = (
        l.join(r, ["__k", "__bkt"])
        .filter(
            (F.col("__rts") > F.col("__lts"))
            & (F.col("__rts") <= F.col("__lts") + F.expr(f"INTERVAL {window_seconds} SECONDS"))
        )
        .groupBy("__lid")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return (
        left.join(hits, left[left_id] == hits["__lid"], "left")
        .select(
            *left.columns,
            F.coalesce(F.col("__n"), F.lit(0)).cast("bigint").alias("n_in_range"),
        )
    )
