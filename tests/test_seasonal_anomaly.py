"""Seasonal robust-outlier semantics: planted outliers in a known
(event_type x hour) cell are flagged, inliers are not, zero-MAD cells
are excluded, and the median/MAD arithmetic replays in pure Python."""

from __future__ import annotations

import datetime
import shutil
import statistics
import tempfile

from fluss_iceberg_spark import registry

registry.load_all()


def _write_events(spark, rows, path):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _run(spark, rows):
    d = tempfile.mkdtemp(prefix="seasonal_")
    try:
        _write_events(spark, rows, d)
        return registry.QUERIES["events_seasonal_anomaly"](spark, d).collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _ts(hour, minute):
    return datetime.datetime(2024, 1, 1, hour, minute)


def test_planted_outlier_flagged_inliers_not(spark):
    # hour-3 'click' cell: 9 values near 10, one at 500
    rows = [
        (i, _ts(3, i), 1, "click", 10.0 + i * 0.1, "{}") for i in range(9)
    ] + [(9, _ts(3, 30), 1, "click", 500.0, "{}")]
    out = _run(spark, rows)
    assert [r["event_id"] for r in out] == [9]
    r = out[0]
    vals = [10.0 + i * 0.1 for i in range(9)] + [500.0]
    med = statistics.median(vals)
    assert r["med"] == med
    devs = [abs(v - med) for v in vals]
    assert r["mad"] == statistics.median(devs)
    assert abs(500.0 - med) > 5 * r["mad"]


def test_zero_mad_cell_excluded(spark):
    # constant cell: MAD = 0 — even a wild value in ANOTHER hour's
    # constant cell must not divide by zero or flag everything
    rows = [(i, _ts(5, i), 1, "view", 7.0, "{}") for i in range(10)]
    assert _run(spark, rows) == []


def test_cells_are_independent(spark):
    # same value is an outlier in one hour's cell, normal in another's
    rows = (
        [(i, _ts(1, i), 1, "buy", 10.0 + 0.01 * i, "{}") for i in range(9)]
        + [(9, _ts(1, 40), 1, "buy", 100.0, "{}")]
        + [(10 + i, _ts(2, i), 1, "buy", 100.0 + i, "{}") for i in range(10)]
    )
    out = _run(spark, rows)
    assert [r["event_id"] for r in out] == [9]
    assert out[0]["hod"] == 1
