"""INSERT INTO t (col, ...) — explicit column lists: positional mapping,
NULL fill for unlisted columns, computed-column stamping preserved."""

from __future__ import annotations

import tempfile

import pytest

from fluss_iceberg_spark.engine import Engine


def test_column_list_maps_positionally_and_fills_null(spark):
    with tempfile.TemporaryDirectory() as d:
        eng = Engine(spark, warehouse=d)
        eng.sql("CREATE TABLE t_ins (a BIGINT, b STRING, c DOUBLE)")
        eng.sql("INSERT INTO t_ins (c, a) VALUES (1.5, 7)")
        r = eng.sql("SELECT a, b, c FROM t_ins").collect()[0]
        assert (r.a, r.b, r.c) == (7, None, 1.5)


def test_column_list_with_select(spark):
    with tempfile.TemporaryDirectory() as d:
        eng = Engine(spark, warehouse=d)
        eng.sql("CREATE TABLE t_src (x BIGINT)")
        eng.sql("INSERT INTO t_src VALUES (1), (2), (3)")
        eng.sql("CREATE TABLE t_dst (a BIGINT, b STRING)")
        eng.sql("INSERT INTO t_dst (a) SELECT x * 10 FROM t_src")
        rows = sorted(
            (r.a, r.b) for r in eng.sql("SELECT a, b FROM t_dst").collect()
        )
        assert rows == [(10, None), (20, None), (30, None)]


def test_unknown_column_rejected(spark):
    with tempfile.TemporaryDirectory() as d:
        eng = Engine(spark, warehouse=d)
        eng.sql("CREATE TABLE t_bad (a BIGINT)")
        with pytest.raises(ValueError, match="not in t_bad"):
            eng.sql("INSERT INTO t_bad (nope) VALUES (1)")


def test_arity_mismatch_rejected(spark):
    with tempfile.TemporaryDirectory() as d:
        eng = Engine(spark, warehouse=d)
        eng.sql("CREATE TABLE t_ar (a BIGINT, b BIGINT)")
        with pytest.raises(ValueError, match="column list has 1"):
            eng.sql("INSERT INTO t_ar (a) VALUES (1, 2)")


def test_plain_insert_still_positional(spark):
    with tempfile.TemporaryDirectory() as d:
        eng = Engine(spark, warehouse=d)
        eng.sql("CREATE TABLE t_plain (a BIGINT, b STRING)")
        eng.sql("INSERT INTO t_plain VALUES (1, 'x')")
        r = eng.sql("SELECT a, b FROM t_plain").collect()[0]
        assert (r.a, r.b) == (1, "x")


def test_omitted_not_null_column_rejected(spark):
    """An INSERT whose column list omits a NOT NULL column must error —
    NULL-filling it would hit the sink's not-null enforcer (which DROPS
    such rows) and silently write nothing."""
    with tempfile.TemporaryDirectory() as d:
        eng = Engine(spark, warehouse=d)
        eng.sql("CREATE TABLE t_nn (a BIGINT NOT NULL, b STRING)")
        with pytest.raises(ValueError, match="omits NOT NULL"):
            eng.sql("INSERT INTO t_nn (b) VALUES ('x')")
        # listing the NOT NULL column still works
        eng.sql("INSERT INTO t_nn (a) VALUES (1)")
        assert eng.sql("SELECT a, b FROM t_nn").collect()[0].a == 1


def test_omitted_pk_column_rejected(spark):
    """PK columns are not-null by the PK⊆not_null rule; omitting one from
    the column list must error, not merge a NULL-keyed row away."""
    with tempfile.TemporaryDirectory() as d:
        eng = Engine(spark, warehouse=d)
        eng.sql(
            "CREATE TABLE t_pk (k BIGINT, v STRING, "
            "PRIMARY KEY (k) NOT ENFORCED)"
        )
        with pytest.raises(ValueError, match="omits NOT NULL"):
            eng.sql("INSERT INTO t_pk (v) VALUES ('x')")
