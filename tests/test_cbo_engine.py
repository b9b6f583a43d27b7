"""CBO at the SQL surface: Engine._register consumes ANALYZE stats so
plain ``engine.sql()`` joins over analyzed lake tables get a broadcast
hint — but only when the estimate FLOORED AT ACTUAL MANIFEST BYTES fits
the session threshold (the width model prices strings at 24 B; without
the floor a long-text table would be force-broadcast into an OOM)."""

from __future__ import annotations

import pytest

from fluss_iceberg_spark.engine import Engine
from fluss_iceberg_spark.plans.checks import count_nodes


def _view_has_hint(spark, name: str) -> bool:
    return "ResolvedHint" in spark.table(name)._jdf.queryExecution().analyzed().toString()


@pytest.fixture()
def eng(spark, tmp_path):
    e = Engine(spark, warehouse=str(tmp_path / "wh"))
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


def test_analyzed_small_dim_gets_hint_and_bhj(spark, eng):
    """A dim whose true size fits the threshold: after ANALYZE the view
    registers with a broadcast hint and the SQL join plans BHJ."""
    # repeated-uuid attr compresses to almost nothing: manifest bytes
    # stay far under the 64KB test threshold
    dim = spark.range(0, 200).selectExpr("id AS k", "repeat(uuid(), 3) AS attr")
    eng.create_table("d_dim", dim.schema, primary_key=["k"])
    eng.catalog.load("d_dim").merge(dim)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024))
    try:
        eng.sql("SELECT 1")  # registration refresh pass, pre-ANALYZE
        assert not _view_has_hint(spark, "d_dim")
        eng.sql("ANALYZE TABLE d_dim")
        after = eng.sql(_JOIN)
        assert _view_has_hint(spark, "d_dim")
        assert count_nodes(after, "BroadcastHashJoin") >= 1
        assert after.count() == 20000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_long_text_dim_never_force_broadcast(spark, eng):
    """The review scenario the manifest floor exists for: a long-text
    dim whose WIDTH-MODEL estimate fits the threshold (2000 rows x 32 B
    = 62KB < 64KB) but whose actual bytes are megabytes. The hint must
    NOT be applied — broadcasting megabytes at a 64KB budget is the
    width model's unbounded error, not a plan improvement."""
    dim = spark.range(0, 2000).selectExpr(
        "id AS k",
        "concat_ws('', transform(sequence(1, 30), "
        "x -> sha2(concat(cast(id AS STRING), '-', cast(x AS STRING)), 256)"
        ")) AS attr",  # ~1.9KB of incompressible text per row
    )
    eng.create_table("d_dim", dim.schema, primary_key=["k"])
    eng.catalog.load("d_dim").merge(dim)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024))
    try:
        eng.sql("ANALYZE TABLE d_dim")
        eng.sql(_JOIN).count()
        assert not _view_has_hint(spark, "d_dim")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_hint_withdrawn_when_table_outgrows_threshold(spark, eng):
    """The estimate rescales by CURRENT manifest state at every
    registration, so a dim that grows far past its ANALYZE-time size
    loses the hint at its next head movement instead of being
    force-broadcast on stale stats."""
    dim = spark.range(0, 200).selectExpr("id AS k", "repeat(uuid(), 3) AS attr")
    eng.create_table("d_dim", dim.schema, primary_key=["k"])
    eng.catalog.load("d_dim").merge(dim)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024))
    try:
        eng.sql("ANALYZE TABLE d_dim")
        eng.sql(_JOIN).count()
        assert _view_has_hint(spark, "d_dim")
        # grow 50x with incompressible text: both the row-count rescale
        # and the manifest floor now exceed the threshold
        more = spark.range(1_000, 11_000).selectExpr(
            "id AS k",
            "concat_ws('', transform(sequence(1, 4), "
            "x -> sha2(concat(cast(id AS STRING), cast(x AS STRING)), 256))) AS attr",
        )
        eng.catalog.load("d_dim").merge(more)
        eng.sql(_JOIN).count()
        assert not _view_has_hint(spark, "d_dim")
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
