"""View and materialized-view layer: logical-view freshness, incremental
MV maintenance (SUM/COUNT/MIN/MAX/AVG state merge), persistence, errors."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fluss_iceberg_spark.engine import Engine

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("v", T.LongType(), True),
    ]
)


@pytest.fixture()
def eng(spark, tmp_path):
    wh = str(tmp_path / "wh")
    yield Engine(spark, wh)
    shutil.rmtree(wh, ignore_errors=True)


def _rows(spark, data):
    return spark.createDataFrame(data, SCHEMA)


def test_logical_view_sees_new_appends(spark, eng):
    t = eng.create_table("base", SCHEMA)
    t.append(_rows(spark, [("a", 1)]))
    eng.sql("CREATE VIEW v_tot AS SELECT k, SUM(v) AS s FROM base GROUP BY k")
    assert eng.sql("SELECT * FROM v_tot").collect()[0].s == 1
    t.append(_rows(spark, [("a", 10)]))
    # view re-plans against the CURRENT snapshot, not the one at CREATE
    assert eng.sql("SELECT * FROM v_tot").collect()[0].s == 11


def test_view_replace_and_drop(spark, eng):
    t = eng.create_table("base", SCHEMA)
    t.append(_rows(spark, [("a", 1)]))
    eng.sql("CREATE VIEW v1 AS SELECT k FROM base")
    with pytest.raises(ValueError, match="already exists"):
        eng.sql("CREATE VIEW v1 AS SELECT v FROM base")
    eng.sql("CREATE OR REPLACE VIEW v1 AS SELECT v FROM base")
    assert eng.sql("SELECT * FROM v1").columns == ["v"]
    kinds = {r.name: r.kind for r in eng.sql("SHOW VIEWS").collect()}
    assert kinds == {"v1": "logical"}
    eng.sql("DROP VIEW v1")
    assert eng.sql("SHOW VIEWS").count() == 0


def test_matview_incremental_min_max(spark, eng):
    t = eng.create_table("base", SCHEMA)
    t.append(_rows(spark, [("a", 5), ("a", 7), ("b", 3)]))
    eng.sql(
        "CREATE MATERIALIZED VIEW mv AS SELECT k, MIN(v) AS lo, MAX(v) AS hi, "
        "SUM(v) AS s, COUNT(1) AS n, AVG(v) AS a FROM base GROUP BY k"
    )
    t.append(_rows(spark, [("a", 1), ("b", 9), ("c", 4)]))
    res = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]
    assert res.refreshed
    got = {r.k: r for r in eng.sql("SELECT * FROM mv").collect()}
    assert (got["a"].lo, got["a"].hi, got["a"].s, got["a"].n) == (1, 7, 13, 3)
    assert got["a"].a == pytest.approx(13 / 3)
    assert (got["b"].lo, got["b"].hi) == (3, 9)
    assert (got["c"].lo, got["c"].hi, got["c"].n) == (4, 4, 1)
    # no new appends -> no-op refresh
    assert not eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0].refreshed


def test_matview_refresh_scans_only_delta(spark, eng):
    t = eng.create_table("base", SCHEMA)
    t.append(_rows(spark, [("a", 1)]))
    eng.sql("CREATE MATERIALIZED VIEW mv AS SELECT k, SUM(v) AS s FROM base GROUP BY k")
    v0 = t.current_version()
    t.append(_rows(spark, [("b", 2)]))
    delta = t.incremental_read(v0, t.current_version())
    # the refresh's input is exactly the appended batch
    assert [(r.k, r.v) for r in delta.collect()] == [("b", 2)]
    eng.sql("REFRESH MATERIALIZED VIEW mv")
    got = {r.k: r.s for r in eng.sql("SELECT * FROM mv").collect()}
    assert got == {"a": 1, "b": 2}


def test_matview_persists_across_engine_sessions(spark, eng):
    t = eng.create_table("base", SCHEMA)
    t.append(_rows(spark, [("a", 1)]))
    eng.sql("CREATE MATERIALIZED VIEW mv AS SELECT k, SUM(v) AS s FROM base GROUP BY k")
    eng2 = Engine(spark, eng.warehouse)
    t2 = eng2.load_table("base")
    t2.append(_rows(spark, [("a", 2)]))
    eng2.sql("REFRESH MATERIALIZED VIEW mv")
    assert eng2.sql("SELECT * FROM mv").collect()[0].s == 3


def test_matview_rejects_pk_base_minmax_and_bad_projection(spark, eng):
    # PK bases are supported via the retraction stream since r10 — but
    # only for SUM/COUNT/AVG; MIN/MAX state cannot be retracted
    eng.create_table("pkt", SCHEMA, primary_key=["k"])
    with pytest.raises(ValueError, match="cannot be retracted"):
        eng.sql("CREATE MATERIALIZED VIEW m1 AS SELECT k, MIN(v) AS s FROM pkt GROUP BY k")
    t = eng.create_table("base", SCHEMA)
    t.append(_rows(spark, [("a", 1)]))
    with pytest.raises(ValueError, match="GROUP BY key or AGG"):
        eng.sql("CREATE MATERIALIZED VIEW m2 AS SELECT k, v FROM base GROUP BY k")


def test_matview_where_clause_and_drop(spark, eng):
    t = eng.create_table("base", SCHEMA)
    t.append(_rows(spark, [("a", 1), ("a", -5), ("b", 2)]))
    eng.sql(
        "CREATE MATERIALIZED VIEW mv AS SELECT k, SUM(v) AS s FROM base "
        "WHERE v > 0 GROUP BY k"
    )
    got = {r.k: r.s for r in eng.sql("SELECT * FROM mv").collect()}
    assert got == {"a": 1, "b": 2}
    eng.sql("DROP MATERIALIZED VIEW mv")
    assert eng.sql("SHOW VIEWS").count() == 0
    assert not eng.catalog.exists("__mv_mv")


def test_matview_approx_count_distinct_hll_merge(spark, eng):
    """APPROX_COUNT_DISTINCT keeps a mergeable HLL sketch: refreshing two
    disjoint batches must estimate the union's distinct count (within HLL
    error), not double-count or reset."""
    t = eng.create_table("base", SCHEMA)
    t.append(_rows(spark, [("a", i) for i in range(100)]))
    eng.sql(
        "CREATE MATERIALIZED VIEW mv AS SELECT k, "
        "APPROX_COUNT_DISTINCT(v) AS nd FROM base GROUP BY k"
    )
    # overlap [50, 100) + new [100, 150): union = 150 distincts
    t.append(_rows(spark, [("a", i) for i in range(50, 150)]))
    eng.sql("REFRESH MATERIALIZED VIEW mv")
    nd = eng.sql("SELECT * FROM mv").collect()[0].nd
    assert 140 <= nd <= 160, nd


def test_explain_statement(spark, eng):
    t = eng.create_table("base", SCHEMA)
    t.append(_rows(spark, [("a", 1)]))
    plan = eng.sql("EXPLAIN SELECT k, SUM(v) AS s FROM base GROUP BY k").collect()[0].plan
    assert "Physical Plan" in plan and "HashAggregate" in plan
    fplan = eng.sql(
        "EXPLAIN FORMATTED SELECT k FROM base WHERE v > 0"
    ).collect()[0].plan
    assert "Scan" in fplan


def test_insert_overwrite_and_show_partitions(spark, eng):
    t = eng.create_table("base", SCHEMA)
    t.append(_rows(spark, [("a", 1), ("b", 2)]))
    eng.sql("INSERT OVERWRITE base SELECT 'z' AS k, CAST(9 AS BIGINT) AS v")
    rows = [(r.k, r.v) for r in eng.sql("SELECT * FROM base").collect()]
    assert rows == [("z", 9)]
    # time travel still sees the pre-overwrite snapshot
    old = eng.sql("SELECT * FROM base VERSION AS OF 0").count()
    assert old == 2
    # SHOW PARTITIONS on a partitioned log table
    import datetime

    from pyspark.sql import types as T

    sch = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("d", T.DateType(), True),
        ]
    )
    p = eng.create_table("pt", sch, partition_by=["month(d)"])
    p.append(
        spark.createDataFrame(
            [(1, datetime.date(2024, 1, 2)), (2, datetime.date(2024, 2, 2))], sch
        )
    )
    parts = eng.sql("SHOW PARTITIONS pt").collect()
    assert len(parts) == 2


def test_view_and_explain_reject_non_select(spark, eng):
    t = eng.create_table("base", SCHEMA)
    t.append(_rows(spark, [("a", 1)]))
    with pytest.raises(ValueError, match="SELECT/WITH"):
        eng.sql("CREATE VIEW evil AS DELETE FROM base WHERE v = 1")
    with pytest.raises(ValueError, match="SELECT/WITH"):
        eng.sql("EXPLAIN DELETE FROM base WHERE v = 1")
    with pytest.raises(ValueError, match="GROUP BY"):
        eng.sql("CREATE MATERIALIZED VIEW g AS SELECT SUM(v) AS s FROM base")
    # nothing executed: data intact, no view state left behind
    assert eng.sql("SELECT COUNT(1) AS c FROM base").collect()[0].c == 1
    assert eng.sql("SHOW VIEWS").count() == 0


def test_truncate_table(spark, eng):
    t = eng.create_table("base", SCHEMA)
    t.append(_rows(spark, [("a", 1), ("b", 2)]))
    eng.sql("TRUNCATE TABLE base")
    assert eng.sql("SELECT COUNT(1) AS c FROM base").collect()[0].c == 0
    # truncation is a snapshot: time travel still reads the old rows
    assert eng.sql("SELECT * FROM base VERSION AS OF 0").count() == 2


def test_stale_unrelated_view_does_not_break_other_queries(spark, eng):
    """Only the views a statement actually references are
    re-materialized: a view whose base table vanished must not fail
    queries over a different, healthy view."""
    ta = eng.create_table("t_gone", SCHEMA)
    ta.append(_rows(spark, [("a", 1)]))
    tb = eng.create_table("t_here", SCHEMA)
    tb.append(_rows(spark, [("b", 2)]))
    eng.sql("CREATE VIEW v_stale AS SELECT k FROM t_gone")
    eng.sql("CREATE VIEW v_ok AS SELECT k, v FROM t_here")
    eng.sql("DROP TABLE t_gone")  # v_stale's base is gone
    # healthy view still answers
    assert eng.sql("SELECT * FROM v_ok").collect()[0].v == 2
    # the stale one fails only when itself referenced
    with pytest.raises(Exception):
        eng.sql("SELECT * FROM v_stale").collect()


def test_view_over_view_transitively_materialized(spark, eng):
    t = eng.create_table("vv_base", SCHEMA)
    t.append(_rows(spark, [("a", 1), ("a", 2)]))
    eng.sql("CREATE VIEW vv_inner AS SELECT k, SUM(v) AS s FROM vv_base GROUP BY k")
    eng.sql("CREATE VIEW vv_outer AS SELECT k, s + 1 AS s1 FROM vv_inner")
    assert eng.sql("SELECT * FROM vv_outer").collect()[0].s1 == 4
    t.append(_rows(spark, [("a", 10)]))
    # freshness flows through the dependency chain
    assert eng.sql("SELECT * FROM vv_outer").collect()[0].s1 == 14


def test_drop_recreate_same_name_serves_fresh_data(spark, eng):
    """The registration cache must not serve a stale temp view across a
    drop+recreate of the same table name (the (path, version,
    committed_at_ms) key changes even if version numbers repeat)."""
    t = eng.create_table("rr", SCHEMA)
    t.append(_rows(spark, [("old", 1)]))
    assert eng.sql("SELECT * FROM rr").collect()[0].k == "old"
    eng.sql("DROP TABLE rr")
    t2 = eng.create_table("rr", SCHEMA)
    t2.append(_rows(spark, [("new", 2)]))
    assert eng.sql("SELECT * FROM rr").collect()[0].k == "new"


def test_drop_table_sql_evicts_cache_and_companions(spark, eng):
    t = eng.create_table("ev_t", SCHEMA)
    t.append(_rows(spark, [("a", 1)]))
    assert eng.sql("SELECT COUNT(*) AS n FROM ev_t__snapshots").collect()[0].n == 1
    eng.sql("DROP TABLE ev_t")
    # recreate EMPTY via the direct catalog API (bypasses engine hooks):
    # the cache must not serve the old view
    eng.catalog.create_table("ev_t", SCHEMA)
    assert eng.sql("SELECT COUNT(*) AS n FROM ev_t").collect()[0].n == 0


# ---- join materialized views (incremental view maintenance) ----


def _jmv_rows(spark, data, schema):
    return spark.createDataFrame(data, schema)


def test_join_matview_delta_algebra(spark, eng):
    """ΔA⋈B_new ∪ A_old⋈ΔB: every term exercised, ΔA⋈ΔB counted ONCE,
    final state == one-shot join, duplicates (bag semantics) preserved."""
    a = eng.create_table(
        "jl", T.StructType([T.StructField("ak", T.LongType(), False),
                            T.StructField("av", T.StringType(), True)])
    )
    b = eng.create_table(
        "jr", T.StructType([T.StructField("bk", T.LongType(), False),
                            T.StructField("bv", T.StringType(), True)])
    )
    a.append(spark.createDataFrame([(1, "a1"), (2, "a2")], a.schema))
    b.append(spark.createDataFrame([(1, "b1"), (1, "b1dup")], b.schema))
    eng.sql(
        "CREATE MATERIALIZED VIEW jv AS "
        "SELECT jl.ak AS ak, jl.av AS av, jr.bv AS bv "
        "FROM jl JOIN jr ON jl.ak = jr.bk"
    )
    got = {(r.ak, r.av, r.bv) for r in eng.sql("SELECT * FROM jv").collect()}
    assert got == {(1, "a1", "b1"), (1, "a1", "b1dup")}
    # ΔA and ΔB in the SAME refresh: ΔA joins B_new (so ΔA⋈ΔB lands
    # here), A_old joins ΔB only
    a.append(spark.createDataFrame([(3, "a3"), (2, "a2x")], a.schema))
    b.append(spark.createDataFrame([(2, "b2"), (3, "b3")], b.schema))
    eng.sql("REFRESH MATERIALIZED VIEW jv")
    rows = [(r.ak, r.av, r.bv) for r in eng.sql("SELECT * FROM jv").collect()]
    want_bag = sorted([
        (1, "a1", "b1"), (1, "a1", "b1dup"),
        (2, "a2", "b2"), (2, "a2x", "b2"),
        (3, "a3", "b3"),
    ])
    assert sorted(rows) == want_bag  # exact bag, no double-counted ΔA⋈ΔB
    # no-op refresh appends nothing
    res = eng.views.refresh_matview("jv")
    assert res["refreshed"] is False
    assert sorted(
        (r.ak, r.av, r.bv) for r in eng.sql("SELECT * FROM jv").collect()
    ) == want_bag


def test_join_matview_rejects_pk_base(spark, eng):
    eng.create_table("pl", SCHEMA, primary_key=["k"])
    eng.create_table("ll", SCHEMA)
    with pytest.raises(ValueError, match="PK table"):
        eng.sql(
            "CREATE MATERIALIZED VIEW jv2 AS "
            "SELECT ll.k AS k, pl.v AS v FROM ll JOIN pl ON ll.k = pl.k"
        )


def test_join_matview_where_and_persistence(spark, eng):
    """WHERE folds into every delta; the definition survives a fresh
    Engine over the same warehouse (the _views.json contract)."""
    a = eng.create_table(
        "pa", T.StructType([T.StructField("ak", T.LongType(), False),
                            T.StructField("pri", T.StringType(), True)])
    )
    b = eng.create_table(
        "pb", T.StructType([T.StructField("bk", T.LongType(), False),
                            T.StructField("nm", T.StringType(), True)])
    )
    a.append(spark.createDataFrame([(1, "HI"), (2, "LO")], a.schema))
    b.append(spark.createDataFrame([(1, "x"), (2, "y")], b.schema))
    eng.sql(
        "CREATE MATERIALIZED VIEW jvw AS "
        "SELECT pa.ak AS ak, pb.nm AS nm FROM pa JOIN pb "
        "ON pa.ak = pb.bk WHERE pa.pri = 'HI'"
    )
    assert [(r.ak, r.nm) for r in eng.sql("SELECT * FROM jvw").collect()] == [(1, "x")]
    eng2 = Engine(spark, eng.catalog.warehouse)
    a.append(spark.createDataFrame([(3, "HI")], a.schema))
    b.append(spark.createDataFrame([(3, "z")], b.schema))
    eng2.sql("REFRESH MATERIALIZED VIEW jvw")
    assert sorted(
        (r.ak, r.nm) for r in eng2.sql("SELECT * FROM jvw").collect()
    ) == [(1, "x"), (3, "z")]


# ---- retractable matviews over PK bases (signed deltas) ----


def test_retract_matview_update_delete_cycle(spark, eng):
    t = eng.create_table("acct", SCHEMA, primary_key=["k"])
    t.merge(_rows(spark, [("a", 10), ("b", 5), ("c", 7)]))
    eng.sql(
        "CREATE MATERIALIZED VIEW mv_tot AS "
        "SELECT k, SUM(v) AS s, COUNT(v) AS n FROM acct GROUP BY k"
    )
    got = {r.k: (r.s, r.n) for r in eng.sql("SELECT * FROM mv_tot").collect()}
    assert got == {"a": (10, 1), "b": (5, 1), "c": (7, 1)}
    # upsert: old value must be RETRACTED, not double-counted
    t.merge(_rows(spark, [("a", 100)]))
    eng.sql("REFRESH MATERIALIZED VIEW mv_tot")
    got = {r.k: (r.s, r.n) for r in eng.sql("SELECT * FROM mv_tot").collect()}
    assert got == {"a": (100, 1), "b": (5, 1), "c": (7, 1)}
    # delete: the fully-retracted group disappears (GROUP BY semantics)
    t.delete_by_key(spark.createDataFrame([("b",)], "k string"))
    eng.sql("REFRESH MATERIALIZED VIEW mv_tot")
    got = {r.k: (r.s, r.n) for r in eng.sql("SELECT * FROM mv_tot").collect()}
    assert got == {"a": (100, 1), "c": (7, 1)}
    # re-insert after full retraction resurrects the group
    t.merge(_rows(spark, [("b", 50)]))
    eng.sql("REFRESH MATERIALIZED VIEW mv_tot")
    got = {r.k: (r.s, r.n) for r in eng.sql("SELECT * FROM mv_tot").collect()}
    assert got == {"a": (100, 1), "b": (50, 1), "c": (7, 1)}


def test_retract_matview_rejects_minmax(spark, eng):
    eng.create_table("acct2", SCHEMA, primary_key=["k"])
    with pytest.raises(ValueError, match="cannot be retracted"):
        eng.sql(
            "CREATE MATERIALIZED VIEW mv_bad AS "
            "SELECT k, MAX(v) AS m FROM acct2 GROUP BY k"
        )


def test_changelog_full_mode_pairs(spark, eng):
    t = eng.create_table("cl", SCHEMA, primary_key=["k"])
    t.merge(_rows(spark, [("a", 1), ("b", 2)]))
    v1 = t.current_version()
    t.merge(_rows(spark, [("a", 9), ("z", 3)]))
    rows = sorted(
        (r.op, r.k, r.v)
        for r in t.changelog(v1, mode="full").collect()
    )
    assert rows == [
        ("insert", "z", 3),
        ("update_after", "a", 9),
        ("update_before", "a", 1),
    ]
