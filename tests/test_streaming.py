"""Streaming pipeline tests: invariants the reference itself asserts
(SURVEY §5) plus the Structured Streaming driver path."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from fluss_iceberg_spark.lake.table import LakeCatalog
from fluss_iceberg_spark.operators.enrichment import enrich_orders
from fluss_iceberg_spark.sources import faker
from fluss_iceberg_spark.streaming.pipeline import ReferencePipeline


def _mini_pipeline(spark, warehouse, n_orders=400, n_batches=4):
    orders = faker.orders_batch(spark, n_orders)
    customers = faker.customers_batch(spark, 50).dropDuplicates(["cust_key"])
    nations = faker.nations_batch(spark, 40).dropDuplicates(["nation_key"])
    pipe = ReferencePipeline(spark, LakeCatalog(spark, warehouse))
    for b in range(n_batches):
        batch = orders.filter(F.pmod(F.col("order_key"), F.lit(n_batches)) == b)
        pipe.process_order_batch(batch, customers, nations, b)
    return pipe, orders, customers, nations


def test_incremental_equals_batch(spark):
    """FIXTURES invariant 4: streaming MERGE-delta == one-shot batch."""
    with tempfile.TemporaryDirectory() as d:
        pipe, orders, customers, nations = _mini_pipeline(spark, d)
        incremental = {
            r.nation_name: r.revenue for r in pipe.revenue.read().collect()
        }
        batch = {
            r.nation_name: r.revenue
            for r in enrich_orders(orders, customers, nations)
            .groupBy("nation_name")
            .agg(F.sum("total_price").cast("decimal(15,2)").alias("revenue"))
            .collect()
        }
        assert incremental == batch
        # PK semantics: one row per nation (FIXTURES invariant 2)
        rows = pipe.revenue.read().collect()
        assert len(rows) == len({r.nation_name for r in rows})


def test_replay_is_idempotent(spark):
    """ST5: a replayed micro-batch must not double-count revenue."""
    with tempfile.TemporaryDirectory() as d:
        pipe, orders, customers, nations = _mini_pipeline(spark, d, n_batches=2)
        before = sorted(map(tuple, pipe.revenue.read().collect()), key=repr)
        batch0 = orders.filter(F.pmod(F.col("order_key"), F.lit(2)) == 0)
        assert not pipe.process_order_batch(batch0, customers, nations, 0)
        after = sorted(map(tuple, pipe.revenue.read().collect()), key=repr)
        assert before == after


def test_cold_le_union_and_monotonic(spark):
    """README.md:307-316 contract: cold count ≤ union count; union count
    nondecreasing as tiering advances."""
    with tempfile.TemporaryDirectory() as d:
        pipe, *_ = _mini_pipeline(spark, d, n_batches=4)
        cold0 = pipe.enriched.read().count()
        union0 = pipe.enriched.union_read().count()
        assert cold0 <= union0
        pipe.tier_enriched()
        cold1 = pipe.enriched.read().count()
        union1 = pipe.enriched.union_read().count()
        assert cold0 <= cold1 and union1 == union0  # tiering moves, never loses
        assert cold1 == union1  # fully tiered now


def test_structured_streaming_rate_pipeline(spark):
    """S2/S15/ST1: the real writeStream path — rate-limited faker orders
    through foreachBatch enrichment+aggregation, a few micro-batches."""
    with tempfile.TemporaryDirectory() as d, tempfile.TemporaryDirectory() as ckpt:
        customers = faker.customers_batch(spark, 50).dropDuplicates(["cust_key"])
        nations = faker.nations_batch(spark, 40).dropDuplicates(["nation_key"])
        pipe = ReferencePipeline(spark, LakeCatalog(spark, d))
        stream = faker.orders_stream(spark, rows_per_second=200, number_of_rows=None)
        q = pipe.run_stream(
            stream, customers, nations, ckpt, trigger={"processingTime": "1 second"}
        )
        try:
            import time

            deadline = time.time() + 30
            while time.time() < deadline:
                if pipe.revenue.snapshot() is not None and pipe.revenue.read().count() > 0:
                    break
                time.sleep(1)
        finally:
            q.stop()
        assert pipe.revenue.snapshot() is not None, "no micro-batch committed"
        rows = pipe.revenue.read().collect()
        assert len(rows) > 0
        assert len(rows) == len({r.nation_name for r in rows})
        # enriched flows through hot store; union read sees them
        assert pipe.enriched.union_read().count() > 0
