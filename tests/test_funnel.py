"""Ordered funnel: the sequence constraint (step k at-or-after step
k-1's first time) is what separates a funnel from independent counts."""

from __future__ import annotations

import datetime as dt


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_funnel_order_constraint(spark, monkeypatch, tmp_path):
    """User 1 converts in order; user 2 clicked BEFORE viewing (the
    click must NOT count, but a later click does... absent here, so
    user 2 stalls at step 1); user 3 has click-after-view but purchase
    BEFORE click (stalls at step 2)."""
    rows = [
        (1, "view", _ts(0)), (1, "click", _ts(1)), (1, "purchase", _ts(2)),
        (2, "click", _ts(0)), (2, "view", _ts(1)),
        (3, "view", _ts(0)), (3, "purchase", _ts(1)), (3, "click", _ts(2)),
        (4, "error", _ts(0)),  # never enters the funnel
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    p = str(tmp_path / "events.parquet")
    df.write.mode("overwrite").parquet(p)

    import fluss_iceberg_spark.workloads.events as EV

    monkeypatch.setattr(
        EV, "load_table", lambda spark, sf_dir, name: spark.read.parquet(p)
    )
    got = {r["step"]: r for r in EV.events_funnel_steps(spark, "x").collect()}
    assert got[1]["n_users"] == 3  # users 1, 2, 3 viewed
    assert got[2]["n_users"] == 2  # 1 and 3 clicked at/after first view
    assert got[3]["n_users"] == 1  # only user 1 purchased after clicking
    assert got[2]["conv_from_prev_milli"] == 2000 // 3
    assert got[3]["conv_from_prev_milli"] == 500
    assert got[3]["conv_from_first_milli"] == 1000 // 3


def test_funnel_same_timestamp_counts(spark, monkeypatch, tmp_path):
    """ts >= semantics: a click at exactly the first-view instant
    qualifies (consistent in Spark and DuckDB)."""
    rows = [(1, "view", _ts(0)), (1, "click", _ts(0))]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    p = str(tmp_path / "events.parquet")
    df.write.mode("overwrite").parquet(p)

    import fluss_iceberg_spark.workloads.events as EV

    monkeypatch.setattr(
        EV, "load_table", lambda spark, sf_dir, name: spark.read.parquet(p)
    )
    got = {r["step"]: r["n_users"]
           for r in EV.events_funnel_steps(spark, "x").collect()}
    assert got == {1: 1, 2: 1, 3: 0}
