"""Merge-on-read position deletes (the Iceberg v2 delete-file role,
``write.delete.mode=merge-on-read``): DELETE commits a tombstone file
instead of rewriting data files; reads anti-join the broadcast
tombstones; compact() materializes them; accounting stays live and
metadata-only. Reference context: the cold path is Iceberg
(trino/iceberg.properties:6) whose v2 spec defines position deletes."""

from __future__ import annotations

import datetime
import decimal
import tempfile

import pytest
from pyspark.sql import types as T

from fluss_iceberg_spark.lake.table import LakeCatalog

SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType(), False),
        T.StructField("d", T.DateType(), True),
        T.StructField("price", T.DecimalType(15, 2), True),
    ]
)

MOR = {"write.delete.mode": "merge-on-read"}


def _rows(lo, hi):
    return [
        (
            i,
            datetime.date(1995, 1, 1) + datetime.timedelta(days=i % 300),
            decimal.Decimal(f"{i}.50"),
        )
        for i in range(lo, hi)
    ]


def _mk(spark, d, name="mor", pk=None, props=MOR):
    return LakeCatalog(spark, d).create_table(
        name, SCHEMA, primary_key=pk, properties=dict(props)
    )


def test_mor_delete_leaves_data_files_untouched(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _mk(spark, d)
        for lo in (0, 100, 200):
            t.append(spark.createDataFrame(_rows(lo, lo + 100), SCHEMA).coalesce(1))
        before = list(t.snapshot().files)
        snap = t.delete([("k", ">=", 250)])
        assert snap.operation == "delete"
        assert snap.summary["mode"] == "merge-on-read"
        assert snap.summary["deleted_positions"] == 50
        assert snap.files == before  # zero data files rewritten
        assert len(snap.delete_files) == 1
        assert snap.total_rows == 250
        assert t.count_rows() == 250
        assert sorted(r.k for r in t.read().collect()) == list(range(250))
        # stats-bounded: only the 200-299 file is referenced
        meta = snap.delete_meta[snap.delete_files[0]]
        assert len(meta["files"]) == 1
        # time travel to the pre-delete snapshot sees every row
        assert t.read(version=snap.snapshot_id - 1).count() == 300


def test_mor_overlapping_deletes_do_not_double_count(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _mk(spark, d)
        t.append(spark.createDataFrame(_rows(0, 100), SCHEMA).coalesce(1))
        t.delete([("k", ">=", 50)])
        snap = t.delete([("k", ">=", 30)])  # overlaps rows already dead
        assert snap.summary["deleted_positions"] == 20  # only 30..49 live
        assert snap.total_rows == 30
        assert sorted(r.k for r in t.read().collect()) == list(range(30))


def test_mor_predicate_on_live_rows_only_after_append(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _mk(spark, d)
        t.append(spark.createDataFrame(_rows(0, 100), SCHEMA).coalesce(1))
        t.delete([("k", "<", 10)])
        t.append(spark.createDataFrame(_rows(100, 150), SCHEMA).coalesce(1))
        assert t.count_rows() == 140
        assert t.read().count() == 140
        # the delete file carried forward across the append commit
        assert len(t.snapshot().delete_files) == 1


def test_mor_where_pushdown_combines_with_tombstones(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _mk(spark, d)
        t.append(spark.createDataFrame(_rows(0, 100), SCHEMA).coalesce(1))
        t.delete([("k", ">=", 90)])
        got = sorted(r.k for r in t.read(where=[("k", ">=", 80)]).collect())
        assert got == list(range(80, 90))


def test_compact_materializes_tombstones(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _mk(spark, d)
        for lo in (0, 100):
            t.append(spark.createDataFrame(_rows(lo, lo + 100), SCHEMA).coalesce(1))
        t.delete([("k", "<", 20)])
        snap = t.compact()
        assert snap.delete_files == []  # tombstones applied and dropped
        assert snap.total_rows == 180
        assert sorted(r.k for r in t.read().collect()) == list(range(20, 200))


def test_mor_min_max_declines_and_rescan_is_exact(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _mk(spark, d)
        t.append(spark.createDataFrame(_rows(0, 100), SCHEMA).coalesce(1))
        assert t.min_max("k") == (0, 99)
        t.delete([("k", "=", 99)])
        assert t.min_max("k") is None  # footer bounds include the dead row


def test_mor_delete_on_pk_table_then_merge(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _mk(spark, d, pk=["k"])
        t.merge(spark.createDataFrame(_rows(0, 100), SCHEMA))
        t.delete([("k", "<", 10)])
        assert t.read().count() == 90
        # upsert back two of the deleted keys: the bucket rewrite reads
        # LIVE rows, so the other eight stay dead
        t.merge(spark.createDataFrame(_rows(0, 2), SCHEMA))
        got = sorted(r.k for r in t.read().collect())
        assert got == [0, 1] + list(range(10, 100))


def test_mor_changelog_emits_deletes(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _mk(spark, d, pk=["k"])
        v0 = t.merge(spark.createDataFrame(_rows(0, 20), SCHEMA)).snapshot_id
        v1 = t.delete([("k", "<", 3)]).snapshot_id
        log = t.changelog(v0, v1).collect()
        assert sorted((r.op, r.k) for r in log) == [
            ("delete", 0), ("delete", 1), ("delete", 2)
        ]


def test_mor_union_read_applies_tombstones(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _mk(spark, d)
        t.append(spark.createDataFrame(_rows(0, 50), SCHEMA).coalesce(1))
        t.delete([("k", "<", 5)])
        t.write_hot_batch(spark.createDataFrame(_rows(50, 60), SCHEMA), 0)
        assert t.union_read().count() == 55


def test_expire_and_orphan_gc_cover_delete_files(spark):
    import os

    with tempfile.TemporaryDirectory() as d:
        t = _mk(spark, d)
        t.append(spark.createDataFrame(_rows(0, 50), SCHEMA).coalesce(1))
        t.append(spark.createDataFrame(_rows(50, 100), SCHEMA).coalesce(1))
        t.delete([("k", "<", 10)])
        assert t.compact() is not None  # tombstones materialized
        res = t.expire_snapshots(keep_last=1)
        assert any(f.startswith("deletes/") for f in res["removed_files"])
        assert t.remove_orphan_files() == []
        assert sorted(r.k for r in t.read().collect()) == list(range(10, 100))


def test_rollback_restores_tombstone_state(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _mk(spark, d)
        t.append(spark.createDataFrame(_rows(0, 50), SCHEMA).coalesce(1))
        t.append(spark.createDataFrame(_rows(50, 100), SCHEMA).coalesce(1))
        v_del = t.delete([("k", "<", 10)]).snapshot_id
        t.compact()
        snap = t.rollback(v_del)
        assert snap.total_rows == 90
        assert len(snap.delete_files) == 1
        assert t.read().count() == 90


def test_cow_remains_default(spark):
    with tempfile.TemporaryDirectory() as d:
        t = LakeCatalog(spark, d).create_table("cow", SCHEMA)
        t.append(spark.createDataFrame(_rows(0, 100), SCHEMA).coalesce(1))
        snap = t.delete([("k", "<", 10)])
        assert snap.delete_files == []
        assert snap.summary.get("mode") is None
        assert t.read().count() == 90
