"""SCD Type 2 dimension maintenance: change detection (null-safe),
no-op-batch idempotence, atomic close+insert versioning, history
immutability across batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from fluss_iceberg_spark.lake.table import LakeCatalog
from fluss_iceberg_spark.operators.scd import scd2_apply


def _dim(spark, tmp_path):
    schema = spark.createDataFrame(
        [], "k long, seg string, valid_from long, valid_to long, "
        "is_current boolean"
    ).schema
    return LakeCatalog(spark, str(tmp_path / "wh")).create_table(
        "d", schema, primary_key=["k", "valid_from"], not_null=["k"]
    )


def test_scd2_versions_close_and_open(spark, tmp_path):
    t = _dim(spark, tmp_path)
    b = lambda rows: spark.createDataFrame(rows, "k long, seg string")
    assert scd2_apply(t, b([(1, "A"), (2, "B")]), 100, "k", ("seg",)) == 2
    # replaying the identical batch is a no-op (change detection)
    assert scd2_apply(t, b([(1, "A"), (2, "B")]), 150, "k", ("seg",)) == 0
    # change key 1, add key 3
    assert scd2_apply(t, b([(1, "X"), (3, "C")]), 200, "k", ("seg",)) == 2
    rows = {(r.k, r.valid_from): r for r in t.read().collect()}
    assert rows[(1, 100)].valid_to == 200 and not rows[(1, 100)].is_current
    assert rows[(1, 200)].seg == "X" and rows[(1, 200)].is_current
    assert rows[(2, 100)].is_current and rows[(2, 100)].valid_to is None
    assert rows[(3, 200)].is_current
    # revert key 1 back to A: a NEW version, not a resurrection
    scd2_apply(t, b([(1, "A")]), 300, "k", ("seg",))
    rows = {(r.k, r.valid_from): r for r in t.read().collect()}
    assert rows[(1, 200)].valid_to == 300
    assert rows[(1, 300)].seg == "A" and rows[(1, 300)].is_current
    # exactly one current row per key, history immutable
    cur = [r for r in rows.values() if r.is_current]
    assert sorted(r.k for r in cur) == [1, 2, 3]
    assert rows[(1, 100)].valid_to == 200  # untouched by later batches


def test_scd2_null_safe_change_detection(spark, tmp_path):
    t = _dim(spark, tmp_path)
    b = lambda rows: spark.createDataFrame(rows, "k long, seg string")
    scd2_apply(t, b([(1, None)]), 100, "k", ("seg",))
    # NULL -> NULL is a no-op; NULL -> value is a change
    assert scd2_apply(t, b([(1, None)]), 200, "k", ("seg",)) == 0
    assert scd2_apply(t, b([(1, "A")]), 300, "k", ("seg",)) == 1
    assert scd2_apply(t, b([(1, None)]), 400, "k", ("seg",)) == 1
    assert t.read().count() == 3


def test_scd2_refuses_non_monotonic_ts(spark, tmp_path):
    """A batch at ts <= a touched key's current valid_from would corrupt
    versioning (PK collision or two open rows) — it must refuse."""
    import pytest

    t = _dim(spark, tmp_path)
    b = lambda rows: spark.createDataFrame(rows, "k long, seg string")
    scd2_apply(t, b([(1, "A")]), 100, "k", ("seg",))
    with pytest.raises(ValueError, match="increasing logical time"):
        scd2_apply(t, b([(1, "B")]), 100, "k", ("seg",))
    with pytest.raises(ValueError, match="increasing logical time"):
        scd2_apply(t, b([(1, "B")]), 50, "k", ("seg",))
    # untouched keys don't constrain the ts: a no-op batch at an old ts
    # is fine (nothing is touched), and new keys carry any ts
    assert scd2_apply(t, b([(1, "A")]), 60, "k", ("seg",)) == 0
    assert scd2_apply(t, b([(2, "Z")]), 60, "k", ("seg",)) == 1
    # state is intact: exactly one current row per key
    cur = [r for r in t.read().collect() if r.is_current]
    assert sorted(r.k for r in cur) == [1, 2]
