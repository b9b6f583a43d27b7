"""Plan-shape tests: the physical properties each operator is designed
around must hold — correct-but-unscalable plans fail here."""

from __future__ import annotations

from fluss_iceberg_spark import registry
from fluss_iceberg_spark.plans.checks import (
    count_nodes,
    has_pushed_filter,
    physical_plan,
    read_schema_columns,
)

SF = "/root/testdata/sf0.001"
registry.load_all()


def _q(spark, name):
    return registry.QUERIES[name](spark, SF)


def test_q6_filters_reach_scan(spark):
    """Every q6 predicate must push into the parquet scan (row-group
    skipping at scale)."""
    df = _q(spark, "tpch_q6_forecast_revenue")
    assert has_pushed_filter(df, "l_shipdate")
    assert has_pushed_filter(df, "l_discount")
    assert has_pushed_filter(df, "l_quantity")


def test_q6_column_pruning(spark):
    """q6 touches 4 columns; the scan must not read the other 7."""
    cols = set(read_schema_columns(_q(spark, "tpch_q6_forecast_revenue")))
    assert cols == {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}


def test_top5_is_take_ordered(spark):
    """ORDER BY ... LIMIT must plan TakeOrderedAndProject — no global sort."""
    plan = physical_plan(_q(spark, "ref_top5_nations"))
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no full-sort operator


def test_enrichment_joins_are_broadcast(spark):
    """Both dim lookups broadcast: the fact side never shuffles (J1/J2)."""
    df = _q(spark, "ref_enriched_orders")
    plan = physical_plan(df)
    assert count_nodes(df, "BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    assert count_nodes(df, "BroadcastExchange") == 2  # the two dim builds
    assert count_nodes(df, "Exchange") == 0  # no fact-side shuffle
    assert "hashpartitioning" not in plan


def test_q5_single_fact_exchange(spark):
    """q5: dims broadcast; the only hash exchanges allowed are for the
    final aggregation, never a fact-fact sort-merge join."""
    df = _q(spark, "tpch_q5_local_supplier")
    assert "SortMergeJoin" not in physical_plan(df)
    assert count_nodes(df, "BroadcastHashJoin") >= 4


def test_sessionize_single_partitioning(spark):
    """Both windows and the final aggregation key on user_id — Catalyst
    must reuse one hash exchange, not three."""
    df = _q(spark, "events_sessionize")
    assert count_nodes(df, "Exchange") == 1


def test_q1_partial_aggregation(spark):
    """Scan-side partial aggregation (map-side combine) before exchange."""
    assert count_nodes(_q(spark, "tpch_q1_pricing_summary"), "HashAggregate") >= 2


def test_rollup_is_single_shuffle_expand(spark):
    """ROLLUP = Expand (grouping-set fan-out, map-side) + ONE exchange."""
    df = _q(spark, "agg_rollup_status_priority")
    plan = physical_plan(df)
    assert "Expand" in plan
    assert count_nodes(df, "Exchange") == 1


def test_pivot_two_phase_shuffles_only_reduced_data(spark):
    """Explicit pivot value list → no distinct-values pre-job. Spark
    plans pivot as two-phase agg: shuffle 1 reduces on (priority,status),
    shuffle 2 moves only the ≤|priority×status| reduced rows — both fine
    at scale; what must NOT appear is a third exchange or a sort."""
    df = _q(spark, "agg_pivot_status_by_priority")
    assert count_nodes(df, "Exchange") <= 2
    assert "Sort " not in physical_plan(df)


def test_asof_join_is_one_shuffle_no_join(spark):
    """The as-of join must plan as union+window: exactly one hash
    exchange on the key, no join operator at all (that's the point —
    no pairwise blowup at 100 TB)."""
    df = _q(spark, "events_asof_attribution")
    plan = physical_plan(df)
    assert count_nodes(df, "Exchange") == 1
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_range_join_is_equi_join_not_nested_loop(spark):
    """Bucketing must turn the band join into an equi-join: any join
    strategy but never a nested-loop/cartesian theta join."""
    df = _q(spark, "events_error_burst")
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q19_disjunctive_keeps_broadcast(spark):
    """OR-of-ANDs predicate must not force a shuffle join of the dim."""
    df = _q(spark, "tpch_q19_disjunctive")
    plan = physical_plan(df)
    assert "SortMergeJoin" not in plan
    assert count_nodes(df, "BroadcastHashJoin") >= 1


def test_window_running_revenue_single_shuffle(spark):
    """Running-frame window: one exchange on o_custkey, nothing else."""
    df = _q(spark, "window_running_revenue")
    assert count_nodes(df, "Exchange") == 1
