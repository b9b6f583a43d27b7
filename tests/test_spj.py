"""Storage-partitioned join (plans/spj.py): per-bucket joins over
co-bucketed PK tables — correctness vs a plain join, the zero-exchange
probe-side plan property, MoR visibility, and the layout guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluss_iceberg_spark.lake.table import LakeCatalog
from fluss_iceberg_spark.plans.checks import count_nodes
from fluss_iceberg_spark.plans.spj import bucket_aligned_join


@pytest.fixture()
def co_bucketed(spark, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path / "spj_wh"))
    left_df = spark.range(0, 500).selectExpr(
        "CAST(id AS INT) AS k", "CAST(id % 7 AS INT) AS grp"
    )
    right_df = spark.range(0, 400).selectExpr(  # keys 400..499 unmatched
        "CAST(id AS INT) AS k", "CAST(id * 2 AS LONG) AS val"
    )
    lt = cat.create_table("l", left_df.schema, primary_key=["k"], n_buckets=4)
    lt.merge(left_df)
    rt = cat.create_table("r", right_df.schema, primary_key=["k"], n_buckets=4)
    rt.merge(right_df)
    return cat, lt, rt


def test_inner_matches_plain_join(spark, co_bucketed):
    _, lt, rt = co_bucketed
    got = bucket_aligned_join(lt, rt, how="inner")
    want = lt.read().join(rt.read(), on="k", how="inner")
    assert got.count() == want.count() == 400
    assert got.exceptAll(want.select(*got.columns)).count() == 0


def test_left_preserves_unmatched_probe_rows(spark, co_bucketed):
    _, lt, rt = co_bucketed
    got = bucket_aligned_join(lt, rt, how="left")
    assert got.count() == 500
    assert got.filter(F.col("val").isNull()).count() == 100


def test_probe_side_never_exchanges(spark, co_bucketed):
    """The SPJ property: scan -> per-bucket BroadcastHashJoin -> union,
    with NO shuffle Exchange anywhere in the join plan (broadcast
    exchanges are a different node and the build slices are
    1/n_buckets-sized by construction)."""
    _, lt, rt = co_bucketed
    df = bucket_aligned_join(lt, rt, how="inner")
    assert count_nodes(df, "Exchange") == 0
    assert count_nodes(df, "BroadcastHashJoin") == 4  # one per bucket


def test_mor_update_visible_through_bucket_reads(spark, co_bucketed):
    _, lt, rt = co_bucketed
    rt.merge(
        spark.range(0, 10).selectExpr(
            "CAST(id AS INT) AS k", "CAST(999 AS LONG) AS val"
        )
    )
    got = {
        r.k: r.val
        for r in bucket_aligned_join(lt, rt).filter(F.col("k") < 12).collect()
    }
    assert got[0] == 999 and got[9] == 999 and got[10] == 20 and got[11] == 22


def test_layout_guards(spark, co_bucketed):
    cat, lt, rt = co_bucketed
    other = cat.create_table(
        "r16",
        spark.range(1).selectExpr("CAST(id AS INT) AS k", "id AS val").schema,
        primary_key=["k"],
        n_buckets=16,
    )
    with pytest.raises(ValueError, match="bucket counts differ"):
        bucket_aligned_join(lt, other)
    log = cat.create_table(
        "log_t", spark.range(1).selectExpr("CAST(id AS INT) AS k").schema
    )
    with pytest.raises(ValueError, match="PK tables"):
        bucket_aligned_join(lt, log)
    diff_pk = cat.create_table(
        "dpk",
        spark.range(1).selectExpr("CAST(id AS INT) AS other_k", "id AS v").schema,
        primary_key=["other_k"],
        n_buckets=4,
    )
    with pytest.raises(ValueError, match="shared primary key"):
        bucket_aligned_join(lt, diff_pk)
    with pytest.raises(ValueError, match="inner/left"):
        bucket_aligned_join(lt, rt, how="full")


def test_overlapping_non_key_columns_rejected(spark, co_bucketed):
    cat, lt, _ = co_bucketed
    twin = cat.create_table(
        "twin",
        spark.range(1).selectExpr("CAST(id AS INT) AS k", "CAST(id AS INT) AS grp").schema,
        primary_key=["k"],
        n_buckets=4,
    )
    with pytest.raises(ValueError, match="ambiguous"):
        bucket_aligned_join(lt, twin)


def test_max_buckets_fallback_plain_join(spark, co_bucketed):
    """Past ``max_buckets`` the per-bucket form (driver analysis and
    broadcast count linear in n_buckets) falls back to ONE plain join —
    results identical, no per-bucket union in the plan."""
    _, lt, rt = co_bucketed
    got = bucket_aligned_join(lt, rt, how="inner", max_buckets=2)
    want = bucket_aligned_join(lt, rt, how="inner")  # 4 <= default bound
    assert got.columns == want.columns
    assert got.count() == 400
    assert got.exceptAll(want).count() == 0
    assert count_nodes(got, "Union") == 0  # single join, not n slices
    # the guarded form keeps at most one join node of any kind
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Join") <= 2  # one join (name may print twice)
    # left fallback preserves probe rows too
    left = bucket_aligned_join(lt, rt, how="left", max_buckets=2)
    assert left.count() == 500
    assert left.filter(F.col("val").isNull()).count() == 100
