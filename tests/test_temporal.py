"""Unit tests for operators/temporal: as-of join and band join edge cases
(hand-computed expected outputs, SURVEY §5 strategy)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from fluss_iceberg_spark.operators.temporal import asof_join, range_count_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_join_basic_ties_and_unmatched(spark):
    left = spark.createDataFrame(
        [
            (100, _ts("2024-01-01 10:00:00"), 1),  # matches rid 2 (latest <=)
            (101, _ts("2024-01-01 10:00:05"), 1),  # exact-ts match allowed (rid 3)
            (102, _ts("2024-01-01 09:00:00"), 1),  # before all views -> NULL
            (103, _ts("2024-01-01 10:00:00"), 2),  # other key, no views -> NULL
        ],
        "event_id long, ts timestamp, user_id long",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), 1, 10.0),
            (2, _ts("2024-01-01 09:45:00"), 1, 20.0),
            (3, _ts("2024-01-01 10:00:05"), 1, 30.0),
        ],
        "event_id long, ts timestamp, user_id long, value double",
    )
    res = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        right_payload=["event_id", "value"], right_id="event_id",
    )
    got = {r.event_id: (r.asof_event_id, r.asof_value) for r in res.collect()}
    assert got == {
        100: (2, 20.0),
        101: (3, 30.0),
        102: (None, None),
        103: (None, None),
    }
    assert res.count() == left.count()  # left-join cardinality preserved


def test_asof_join_same_ts_right_rows_pick_max_id(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 7)], "event_id long, ts timestamp, user_id long"
    )
    right = spark.createDataFrame(
        [(5, _ts("2024-01-01 09:00:00"), 7), (9, _ts("2024-01-01 09:00:00"), 7)],
        "event_id long, ts timestamp, user_id long",
    )
    res = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        right_payload=["event_id"], right_id="event_id",
    )
    assert res.collect()[0].asof_event_id == 9  # deterministic tie-break


def test_range_count_join_boundaries(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 7), (2, _ts("2024-01-01 12:00:00"), 7)],
        "event_id long, ts timestamp, user_id long",
    )
    right = spark.createDataFrame(
        [
            (_ts("2024-01-01 10:00:00"), 7),   # == left ts: excluded (strict >)
            (_ts("2024-01-01 10:02:00"), 7),   # inside
            (_ts("2024-01-01 10:05:00"), 7),   # == ts+300s: included (<=)
            (_ts("2024-01-01 10:05:01"), 7),   # just outside
            (_ts("2024-01-01 10:02:00"), 8),   # other key
        ],
        "ts timestamp, user_id long",
    )
    res = range_count_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        window_seconds=300, left_id="event_id",
    )
    got = {r.event_id: r.n_in_range for r in res.collect()}
    assert got == {1: 2, 2: 0}  # zero-count rows preserved


def test_range_count_join_crosses_bucket_boundary(spark):
    # left at 10:04, window 300 s -> matches at 10:05:30 sit in the NEXT
    # bucket; the 2-bucket explode must still find them.
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:04:00"), 7)], "event_id long, ts timestamp, user_id long"
    )
    right = spark.createDataFrame(
        [(_ts("2024-01-01 10:05:30"), 7), (_ts("2024-01-01 10:08:59"), 7)],
        "ts timestamp, user_id long",
    )
    res = range_count_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        window_seconds=300, left_id="event_id",
    )
    assert res.collect()[0].n_in_range == 2
