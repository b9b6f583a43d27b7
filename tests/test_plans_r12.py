"""Plan-shape tests for the round-12 second-wave operators: the
triangle wedge join stays equi-join (no cross products), the two-stage
rerank broadcasts its shortlist instead of rescanning pairs, and the
epoch exporter's only full shuffle is the shard write order."""

from __future__ import annotations

from pyspark.sql import functions as F

from fluss_iceberg_spark.operators import graph as G
from fluss_iceberg_spark.operators import similarity as SIM
from fluss_iceberg_spark.operators.text import epoch_materialize
from fluss_iceberg_spark.plans.checks import count_nodes, physical_plan
from fluss_iceberg_spark.sources.tpch import load_table

SF = "/root/testdata/sf0.001"


def test_triangles_all_equi_joins_no_cross_product(spark):
    """Every join in the wedge-close pipeline is an equi-join (the kv<kw
    orientation filter rides the src equi-join as a post-condition) —
    a cross product here would be O(m^2) at scale."""
    docs = load_table(spark, SF, "documents").select("doc_id")
    df = G.triangles(G.synth_link_graph(docs))
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # per-node attribution partially aggregates before its exchange
    assert "partial_count" in plan or "HashAggregate" in plan


def test_sq8_rerank_broadcasts_shortlist_and_queries(spark):
    """Stage 2 joins the corpus against the BROADCAST shortlist and the
    broadcast queries — the corpus-sized side must never shuffle for the
    re-rank (that independence is the operator's reason to exist)."""
    emb = load_table(spark, SF, "embeddings")
    df = SIM.sq8_rerank_topk(
        emb, emb.filter(F.col("vec_id") < 2), k=5, shortlist=20
    )
    plan = physical_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    # the only hash exchanges are the two per-query top-k windows
    # (stage-1 rank, final rank); no corpus hash repartition appears
    assert plan.count("hashpartitioning(query_id") >= 1, plan


def test_epoch_materialize_one_shard_shuffle_and_broadcast_rates(spark):
    """The domain census is #domains rows, rates ride broadcast joins,
    the copy explode is map-side; the ONLY corpus-sized hash exchange is
    the shard partition the epoch write needs anyway."""
    docs = load_table(spark, SF, "documents")
    df = epoch_materialize(docs)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("hashpartitioning(shard") == 1, plan
    # corpus-sized exchanges: only the shard one; the census/target
    # aggregates exchange #domains rows (cheap). Generate (explode)
    # must sit above the broadcast join, not behind an exchange.
    assert count_nodes(df, "Generate") == 1, plan


def test_seasonal_anomaly_broadcasts_both_models(spark):
    """Median and MAD models are #types x 24 rows — both must reach the
    fact side as broadcasts, never as corpus-sized shuffle joins."""
    from fluss_iceberg_spark import registry

    registry.load_all()
    df = registry.QUERIES["events_seasonal_anomaly"](spark, SF)
    plan = physical_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_range_bands_is_hash_join_not_nested_loop(spark):
    """The inequality join must compile to a bucket equi-join with a
    residual filter — a BroadcastNestedLoopJoin here is the O(facts x
    bands) shape the operator exists to avoid."""
    from fluss_iceberg_spark import registry

    registry.load_all()
    df = registry.QUERIES["join_range_bands"](spark, SF)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    # partial aggregation before the single keyed rollup exchange
    assert "partial_count" in plan or "HashAggregate" in plan
