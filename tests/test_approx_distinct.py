"""APPROX_COUNT_DISTINCT through the SQL facade (SURVEY §2.4's last
absent form; reference parity: Trino's approx_distinct over the same
Iceberg tables, README.md:287): the engine rewrites the call to Spark's
built-in Datasketches HLL pair, so estimates share the matview
COUNT(DISTINCT) sketch family and are mergeable."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluss_iceberg_spark.engine import Engine


@pytest.fixture()
def eng(spark, tmp_path):
    return Engine(spark, str(tmp_path / "wh"))


def _ids(spark, n=3000, groups=2):
    return spark.range(n).select(
        (F.col("id") % groups).alias("g"), F.col("id").alias("v")
    )


def test_rewrite_shapes(eng):
    """Text-level rewrite: both spellings, lgK arg, nested expr; the
    float relativeSD form stays native."""
    r = eng._rewrite_approx_distinct
    assert (
        r("SELECT APPROX_COUNT_DISTINCT(x) FROM t")
        == "SELECT CAST(hll_sketch_estimate(hll_sketch_agg(x, 12)) AS BIGINT) FROM t"
    )
    assert (
        r("SELECT approx_distinct(x) FROM t")
        == "SELECT CAST(hll_sketch_estimate(hll_sketch_agg(x, 12)) AS BIGINT) FROM t"
    )
    assert "hll_sketch_agg(UPPER(x), 14)" in r(
        "SELECT APPROX_COUNT_DISTINCT(UPPER(x), 14) FROM t"
    )
    native = "SELECT approx_count_distinct(x, 0.05) FROM t"
    assert r(native) == native  # relativeSD -> Catalyst's HLL++


def test_estimate_within_hll_bound(eng, spark):
    """lgK=12 standard error is 1.04/sqrt(2^12) ~ 1.62%; gate at 3 sigma
    (~4.9%) per group on ~1.5k true distincts."""
    _ids(spark).createOrReplaceTempView("ad_t")
    rows = eng.sql(
        """
        SELECT g,
               APPROX_COUNT_DISTINCT(v) AS approx_v,
               COUNT(DISTINCT v) AS exact_v
        FROM ad_t GROUP BY g
        """
    ).collect()
    assert len(rows) == 2
    for r in rows:
        assert abs(r["approx_v"] - r["exact_v"]) <= 0.049 * r["exact_v"], (
            r["g"], r["approx_v"], r["exact_v"],
        )


def test_trino_spelling_equals_spark_spelling(eng, spark):
    """Same sketch, same estimate: APPROX_DISTINCT == APPROX_COUNT_DISTINCT."""
    _ids(spark, n=800, groups=1).createOrReplaceTempView("ad_t2")
    row = eng.sql(
        "SELECT APPROX_DISTINCT(v) AS a, APPROX_COUNT_DISTINCT(v) AS b FROM ad_t2"
    ).collect()[0]
    assert row["a"] == row["b"]


def test_registered_query_error_bound(spark):
    """The gated query's self-reported err_milli stays inside the 3-sigma
    HLL bound (49 milli-units) for every order status."""
    from fluss_iceberg_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["engine_approx_distinct"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r["approx_custkeys_trino"] == r["approx_custkeys"]
        assert r["err_milli"] <= 49, dict(r.asDict())
