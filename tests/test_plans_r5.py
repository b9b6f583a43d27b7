"""Plan-shape tests for the round-5 operators: shuffle budgets and
broadcast/TakeOrdered shapes the scale designs rely on."""

from __future__ import annotations

from fluss_iceberg_spark import registry
from fluss_iceberg_spark.operators import dedup as DD
from fluss_iceberg_spark.operators import text as TX
from fluss_iceberg_spark.plans.checks import count_nodes, physical_plan
from fluss_iceberg_spark.sources.tpch import load_table

SF = "/root/testdata/sf0.001"
registry.load_all()


def test_passage_dedup_two_content_shuffles(spark):
    """Chunking is a map (slice over the token array, no per-word
    explode); the only hash exchanges are the fp winner pass and the
    doc reassembly, plus the totals join — no extra repartition creeps
    in, and nothing sorts globally."""
    docs = load_table(spark, SF, "documents")
    df = DD.passage_dedup(docs)
    plan = physical_plan(df)
    # exactly the fp winner pass + the doc reassembly; the totals join
    # broadcasts; WindowGroupLimit prunes duplicate passages MAP-SIDE
    # before the fp shuffle (partial row_number limit)
    assert count_nodes(df, "Exchange") <= 3, plan
    assert "posexplode" in plan
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan


def test_shard_assignment_single_shard_exchange(spark):
    """One hash exchange on `shard`, then a within-partition sort — the
    materialize-ready shape (write.partitionBy(shard) adds no movement)."""
    docs = load_table(spark, SF, "documents")
    df = TX.shard_assignment(docs, n_shards=16)
    assert count_nodes(df, "Exchange") == 1
    plan = physical_plan(df)
    assert "hashpartitioning(shard" in plan


def test_ngram_stats_take_ordered_not_full_sort(spark):
    """Top-k uses TakeOrderedAndProject (partial per-partition heaps),
    never a global Sort+Limit; the count is partially aggregated before
    its single exchange."""
    docs = load_table(spark, SF, "documents")
    df = TX.ngram_counts(docs, n=2, top_k=50)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    # one KEY exchange (the partial-aggregated count); spread()'s guarded
    # round-robin repartition over the under-split scan rides on top
    assert plan.count("hashpartitioning") == 1
    assert count_nodes(df, "Exchange") <= 2
    assert "partial_count" in plan or "HashAggregate" in plan


def test_budget_two_phase_broadcast_and_bounded_sort(spark):
    """The scale form's shape: the level table joins back as a
    BROADCAST (it is ≤ groups × 10⁴ rows by construction), and the only
    doc-width windows partition by (group, quality) — the boundary
    level — never by group alone (that would be the whole-group sort
    the plan exists to avoid)."""
    docs = load_table(spark, SF, "documents")
    df = TX.budget_select_two_phase(docs, token_budget=2000)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan
    # the doc-width window partitions by (lang, quality) — the boundary
    # level — and the union of full + boundary halves is plan-visible
    assert "windowspecdefinition(lang" in plan and "quality" in plan
    assert "Union" in plan
