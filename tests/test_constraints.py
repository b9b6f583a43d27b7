"""CHECK constraints (Delta-constraints role) + retention-policy
auto-expiry (history.expire.max-snapshots)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import types as T

from fluss_iceberg_spark.lake.table import LakeCatalog

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("amount", T.DoubleType(), True),
        T.StructField("status", T.StringType(), True),
    ]
)


def _t(spark, d, **kw):
    return LakeCatalog(spark, d).create_table("c", SCHEMA, **kw)


def test_violating_write_rejected_and_nothing_committed(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _t(spark, d)
        t.append(spark.createDataFrame([(1, 10.0, "OK")], SCHEMA))
        t.add_constraint("amount_positive", "amount > 0")
        v_before = t.current_version()
        with pytest.raises(Exception, match="CHECK constraint"):
            t.append(spark.createDataFrame([(2, -5.0, "OK")], SCHEMA))
        t2 = LakeCatalog(spark, d).load("c")
        assert t2.current_version() == v_before  # no partial commit
        assert t2.read().count() == 1


def test_valid_write_passes_and_nulls_pass(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _t(spark, d)
        t.add_constraint("amount_positive", "amount > 0")
        # SQL CHECK: NULL evaluation is not a violation
        t.append(spark.createDataFrame([(1, 2.5, "OK"), (2, None, "OK")], SCHEMA))
        assert t.read().count() == 2


def test_add_constraint_validates_existing_rows(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _t(spark, d)
        t.append(spark.createDataFrame([(1, -1.0, "OK")], SCHEMA))
        with pytest.raises(ValueError, match="existing rows violate"):
            t.add_constraint("amount_positive", "amount > 0")
        assert "amount_positive" not in t.constraints


def test_constraint_persists_and_drop_restores_writes(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _t(spark, d)
        t.append(spark.createDataFrame([(1, 1.0, "OK")], SCHEMA))
        t.add_constraint("status_known", "status IN ('OK','BAD')")
        t2 = LakeCatalog(spark, d).load("c")  # fresh metadata read
        assert t2.constraints == {"status_known": "status IN ('OK','BAD')"}
        with pytest.raises(Exception, match="CHECK constraint"):
            t2.append(spark.createDataFrame([(2, 1.0, "???")], SCHEMA))
        t2.drop_constraint("status_known")
        t2.append(spark.createDataFrame([(2, 1.0, "???")], SCHEMA))
        assert t2.read().count() == 2


def test_multiple_constraints_all_enforced(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _t(spark, d)
        t.add_constraint("a_pos", "amount > 0")
        t.add_constraint("id_pos", "id > 0")
        with pytest.raises(Exception, match="CHECK constraint"):
            t.append(spark.createDataFrame([(-1, 1.0, "OK")], SCHEMA))
        t.append(spark.createDataFrame([(1, 1.0, "OK")], SCHEMA))
        assert t.read().count() == 1


def test_sql_surface(spark):
    from fluss_iceberg_spark.engine import Engine

    with tempfile.TemporaryDirectory() as d:
        eng = Engine(spark, warehouse=d)
        eng.sql("CREATE TABLE t_chk (id BIGINT, amount DOUBLE)")
        eng.sql("INSERT INTO t_chk VALUES (1, 5.0)")
        eng.sql("ALTER TABLE t_chk ADD CONSTRAINT amt_pos CHECK (amount > 0)")
        ddl = eng.show_create_table("t_chk")
        assert "CONSTRAINT amt_pos CHECK (amount > 0)" in ddl
        with pytest.raises(Exception, match="CHECK constraint"):
            eng.sql("INSERT INTO t_chk VALUES (2, -1.0)")
        eng.sql("ALTER TABLE t_chk DROP CONSTRAINT amt_pos")
        eng.sql("INSERT INTO t_chk VALUES (2, -1.0)")
        assert eng.sql("SELECT COUNT(1) AS n FROM t_chk").collect()[0].n == 2


def test_auto_expire_policy(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _t(spark, d, properties={"history.expire.max-snapshots": "3"})
        for i in range(6):
            t.append(spark.createDataFrame([(i, 1.0, "OK")], SCHEMA))
        assert len(t.snapshot_versions()) == 6
        res = t.maybe_auto_expire()
        assert res is not None
        assert len(t.snapshot_versions()) == 3
        assert t.read().count() == 6  # data intact
        assert t.maybe_auto_expire() is None  # under the cap → no-op
