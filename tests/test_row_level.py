"""Row-level DELETE / UPDATE: copy-on-write correctness, stats-bounded
rewrite scope, SQL surface, NULL-predicate semantics."""

from __future__ import annotations

import datetime
import decimal
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fluss_iceberg_spark.engine import Engine
from fluss_iceberg_spark.lake.table import LakeCatalog

SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType(), False),
        T.StructField("d", T.DateType(), True),
        T.StructField("price", T.DecimalType(15, 2), True),
    ]
)


def _rows(lo, hi):
    return [
        (
            i,
            datetime.date(1995, 1, 1) + datetime.timedelta(days=i),
            decimal.Decimal(f"{i}.50"),
        )
        for i in range(lo, hi)
    ]


def test_delete_rewrites_only_intersecting_files(spark):
    with tempfile.TemporaryDirectory() as d:
        t = LakeCatalog(spark, d).create_table("del", SCHEMA)
        for lo in (0, 100, 200):  # disjoint key-range files
            t.append(spark.createDataFrame(_rows(lo, lo + 100), SCHEMA).coalesce(1))
        snap = t.delete([("k", ">=", 250)])
        assert snap.operation == "delete"
        assert snap.summary["files_rewritten"] == 1  # only the 200-299 file
        assert snap.summary["files_skipped"] == 2
        assert snap.total_rows == 250
        assert sorted(r.k for r in t.read().collect()) == list(range(250))
        # history: pre-delete snapshot still time-travels to 300 rows
        assert t.read(version=snap.snapshot_id - 1).count() == 300


def test_delete_noop_when_stats_prove_no_match(spark):
    with tempfile.TemporaryDirectory() as d:
        t = LakeCatalog(spark, d).create_table("delno", SCHEMA)
        t.append(spark.createDataFrame(_rows(0, 50), SCHEMA))
        before = set(t.snapshot().files)
        snap = t.delete([("k", ">", 1000)])
        assert snap.summary["files_rewritten"] == 0
        assert set(snap.files) == before  # all carried forward untouched


def test_update_applies_set_and_keeps_schema(spark):
    with tempfile.TemporaryDirectory() as d:
        t = LakeCatalog(spark, d).create_table("upd", SCHEMA)
        t.append(spark.createDataFrame(_rows(0, 100), SCHEMA))
        snap = t.update({"price": "price * 2"}, [("k", "<", 10)])
        assert snap.operation == "update"
        assert snap.total_rows == 100
        got = {r.k: r.price for r in t.read().collect()}
        assert got[5] == decimal.Decimal("11.00")  # 5.50 * 2
        assert got[50] == decimal.Decimal("50.50")  # untouched
        # decimal widening cast back: schema unchanged
        assert t.read().schema["price"].dataType == T.DecimalType(15, 2)


def test_update_rejects_pk_and_unknown_columns(spark):
    with tempfile.TemporaryDirectory() as d:
        t = LakeCatalog(spark, d).create_table(
            "updpk", SCHEMA, primary_key=["k"], n_buckets=4
        )
        t.merge(spark.createDataFrame(_rows(0, 20), SCHEMA))
        with pytest.raises(ValueError, match="primary-key"):
            t.update({"k": "k + 1"}, [("k", "<", 5)])
        with pytest.raises(ValueError, match="unknown"):
            t.update({"nope": "1"}, [("k", "<", 5)])
        # PK-table update keeps the bucketed layout mergeable
        t.update({"price": "price + 1"}, [("k", "<", 5)])
        t.merge(
            spark.createDataFrame(
                [(3, datetime.date(2000, 1, 1), decimal.Decimal("9.99"))], SCHEMA
            )
        )
        got = {r.k: r.price for r in t.read().collect()}
        assert got[3] == decimal.Decimal("9.99")  # merge after update works
        assert got[4] == decimal.Decimal("5.50")  # 4.50 + 1
        assert len(got) == 20


def test_delete_null_predicate_rows_survive(spark):
    with tempfile.TemporaryDirectory() as d:
        t = LakeCatalog(spark, d).create_table("delnull", SCHEMA)
        rows = _rows(0, 10) + [(99, None, decimal.Decimal("1.00"))]
        t.append(spark.createDataFrame(rows, SCHEMA))
        t.delete([("d", ">=", datetime.date(1995, 1, 5))])
        ks = sorted(r.k for r in t.read().collect())
        # k=4..9 deleted (d >= jan 5); NULL-date row survives (SQL semantics)
        assert ks == [0, 1, 2, 3, 99]


def test_sql_delete_update_surface(spark):
    with tempfile.TemporaryDirectory() as d:
        eng = Engine(spark, d)
        t = eng.create_table("items", SCHEMA)
        t.append(spark.createDataFrame(_rows(0, 100), SCHEMA))
        eng.refresh("items")
        res = eng.sql("DELETE FROM items WHERE k >= 90").collect()
        assert res[0].name == "items"
        eng.sql(
            "UPDATE items SET price = CAST(price * 2 AS DECIMAL(15,2)) "
            "WHERE d < DATE '1995-01-11'"
        )
        got = {r.k: r.price for r in eng.sql("SELECT * FROM items").collect()}
        assert len(got) == 90
        assert got[0] == decimal.Decimal("1.00")  # 0.50 * 2
        assert got[20] == decimal.Decimal("20.50")  # untouched
        with pytest.raises(ValueError, match="predicate"):
            eng.sql("DELETE FROM items WHERE k IN (1, 2)")


def test_streaming_append_only_refuses_row_level_ops(spark):
    with tempfile.TemporaryDirectory() as d:
        t = LakeCatalog(spark, d).create_table(
            "stream_t", SCHEMA, properties={"streaming.append-only": "true"}
        )
        t.append(spark.createDataFrame(_rows(0, 5), SCHEMA))
        with pytest.raises(ValueError, match="append-only"):
            t.delete([("k", "=", 1)])
        with pytest.raises(ValueError, match="append-only"):
            t.update({"price": "price"}, [("k", "=", 1)])


def test_rollback_restores_and_preserves_history(spark):
    with tempfile.TemporaryDirectory() as d:
        t = LakeCatalog(spark, d).create_table("rb", SCHEMA)
        t.append(spark.createDataFrame(_rows(0, 10), SCHEMA))
        t.append(spark.createDataFrame(_rows(10, 20), SCHEMA))
        t.delete([("k", "<", 5)])
        snap = t.rollback(0)
        assert snap.operation == "rollback"
        assert snap.summary["rollback_to"] == 0
        assert sorted(r.k for r in t.read().collect()) == list(range(10))
        # history preserved: all four snapshots remain time-travelable
        assert t.read(version=2).count() == 15
        assert t.history().count() == 4
        assert t.count_rows() == 10  # metadata-only count tracks rollback


def test_changelog_ops(spark):
    with tempfile.TemporaryDirectory() as d:
        t = LakeCatalog(spark, d).create_table(
            "cdc", SCHEMA, primary_key=["k"], n_buckets=4
        )
        t.merge(spark.createDataFrame(_rows(0, 10), SCHEMA))  # v0
        upd = [
            (2, datetime.date(2001, 1, 1), decimal.Decimal("999.99")),  # update
            (3, datetime.date(1995, 1, 4), decimal.Decimal("3.50")),  # no-op write
            (42, datetime.date(2002, 2, 2), decimal.Decimal("42.00")),  # insert
        ]
        t.merge(spark.createDataFrame(upd, SCHEMA))  # v1
        t.delete([("k", "=", 7)])  # v2
        got = {r.k: r.op for r in t.changelog(0).collect()}
        assert got == {2: "update", 42: "insert", 7: "delete"}
        # identical snapshots → every bucket pruned, empty diff
        assert t.changelog(2, 2).count() == 0
        # delete row carries OLD values
        row = {r.k: r for r in t.changelog(0).collect()}[7]
        assert row.price == decimal.Decimal("7.50")
        with pytest.raises(ValueError, match="PK table"):
            LakeCatalog(spark, d).create_table("cdclog", SCHEMA).changelog(0)


def test_analyze_table_stats(spark):
    with tempfile.TemporaryDirectory() as d:
        eng = Engine(spark, d)
        t = eng.create_table("an", SCHEMA)
        rows = _rows(0, 50) + [(99, None, decimal.Decimal("1.00"))]
        t.append(spark.createDataFrame(rows, SCHEMA))
        stats = t.analyze()
        assert stats["row_count"] == 51
        assert stats["columns"]["d"]["null_count"] == 1
        # HLL++ NDV within its ~5% default error bound
        assert abs(stats["columns"]["k"]["ndv"] - 51) <= 5
        assert t.table_stats()["row_count"] == 51
        # SQL surface returns one row per column
        res = eng.sql("ANALYZE TABLE an").collect()
        assert {r.column for r in res} == set(SCHEMA.fieldNames())
        assert all(r.row_count == 51 for r in res)
        # stats are snapshot-scoped: a rollback hides newer stats files
        t.append(spark.createDataFrame(_rows(50, 60), SCHEMA))
        t.analyze()
        assert t.table_stats()["row_count"] == 61
