"""CBO at the SQL surface: Engine._register consumes ANALYZE stats so
plain ``engine.sql()`` star joins get plan-time broadcast decisions —
the same plans/cbo.py estimate that powers join_with_stats, now applied
where users actually write SQL (reference role: Trino's CBO over
Iceberg table stats, trino/iceberg.properties:2-6)."""

from __future__ import annotations

import pytest

from fluss_iceberg_spark.engine import Engine
from fluss_iceberg_spark.plans.checks import count_nodes


@pytest.fixture()
def eng(spark, tmp_path):
    e = Engine(spark, warehouse=str(tmp_path / "wh"))
    # PK dimension: its MOR read (union + window dedup) denies Catalyst
    # a usable static size, and the wide attr column makes its FILE
    # bytes exceed the test threshold — only row-count × width stats
    # can justify a broadcast. Fact: a plain log table, clearly big.
    # attr must be incompressible (distinct sha chunks, not a repeated
    # uuid) so the dim's FILE bytes genuinely exceed the test threshold
    dim = spark.range(0, 200).selectExpr(
        "id AS k",
        "concat_ws('', transform(sequence(1, 30), "
        "x -> sha2(concat(cast(id AS STRING), '-', cast(x AS STRING)), 256)"
        ")) AS attr",
    )
    e.create_table("d_dim", dim.schema, primary_key=["k"])
    e.catalog.load("d_dim").merge(dim)
    fact = spark.range(0, 20000).selectExpr(
        "id % 200 AS k", "repeat(uuid(), 2) AS payload"
    )
    e.create_table("f_fact", fact.schema)
    e.catalog.load("f_fact").append(fact)
    return e


_JOIN = (
    "SELECT f.k AS k, d.attr AS attr FROM f_fact f "
    "JOIN d_dim d ON f.k = d.k"
)


def test_engine_sql_join_flips_to_bhj_after_analyze(spark, eng):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024))
    try:
        before = eng.sql(_JOIN)
        assert count_nodes(before, "BroadcastHashJoin") == 0, (
            "premise broken: the static path already broadcasts the dim "
            "— widen the attr column"
        )
        eng.sql("ANALYZE TABLE d_dim")
        after = eng.sql(_JOIN)
        assert count_nodes(after, "BroadcastHashJoin") >= 1
        # plans differ, answers don't
        assert after.count() == before.count() == 20000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_hint_withdrawn_when_table_outgrows_threshold(spark, eng):
    """The estimate rescales by CURRENT manifest rows at every
    registration (plans/cbo.estimate_rows' stale-stats guard), so a dim
    that grows far past its ANALYZE-time size loses the hint at its
    next head movement instead of being force-broadcast on stale
    stats."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024))
    try:
        eng.sql("ANALYZE TABLE d_dim")
        assert count_nodes(eng.sql(_JOIN), "BroadcastHashJoin") >= 1
        # grow the dim ~50x: 10_000 rows x 32B estimate = 320KB > 64KB
        more = spark.range(1_000, 11_000).selectExpr(
            "id AS k", "repeat(uuid(), 2) AS attr"
        )
        eng.catalog.load("d_dim").merge(more)
        assert count_nodes(eng.sql(_JOIN), "BroadcastHashJoin") == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_threshold_parsing(spark, eng):
    cases = {
        "10485760": 10 * 1024**2,
        "10485760b": 10 * 1024**2,
        "10MB": 10 * 1024**2,
        "1g": 1024**3,
        "64k": 64 * 1024,
        "-1": -1,
    }
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        for raw, want in cases.items():
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", raw)
            assert eng._auto_broadcast_threshold() == want, raw
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
