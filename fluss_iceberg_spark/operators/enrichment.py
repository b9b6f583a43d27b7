"""Order-enrichment joins — the reference's streaming lookup-join stage.

Reference: ``INSERT INTO enriched_orders SELECT ... FROM fluss_order o LEFT
JOIN fluss_customer FOR SYSTEM_TIME AS OF o.ptime AS c ON o.cust_key =
c.cust_key LEFT JOIN fluss_nation FOR SYSTEM_TIME AS OF o.ptime AS n ON
c.nation_key = n.nation_key`` (README.md:222-239).

Spark form: the temporal (processing-time) lookup join J1/J2 is, per micro
batch, a stream-static LEFT equi-join against the dimension's *current
snapshot*. In batch mode it degenerates to a plain LEFT join. Dimension
tables are small (≤20 live keys in the reference, sql-client.sql:31,46), so
we broadcast them explicitly — at 100 TB fact scale this keeps the
enrichment completely shuffle-free: the only wide exchange in the whole
pipeline is the downstream aggregation.

Null-path contract (FIXTURES.md §A): unmatched cust_key / nation_key
produce NULL enrichment columns and must survive into the aggregation as a
NULL group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_orders(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    with_ingest_ts: bool = False,
) -> DataFrame:
    """Batch / per-micro-batch form of the reference enrichment
    (README.md:222-239): 2 cascaded LEFT lookup joins + 12-col projection.

    ``orders`` columns: order_key, cust_key, total_price, order_date,
    order_priority. ``customer``: cust_key, name, nation_key, acctbal,
    mktsegment. ``nation``: nation_key, name.
    """
    c = customer.select(
        "cust_key",
        F.col("name").alias("cust_name"),
        F.col("nation_key").alias("c_nation_key"),
        F.col("acctbal").alias("cust_acctbal"),
        F.col("mktsegment").alias("cust_mktsegment"),
    )
    n = nation.select(
        F.col("nation_key").alias("n_nation_key"),
        F.col("name").alias("nation_name"),
    )
    out = (
        orders
        # J1 (README.md:236-237): fact LEFT JOIN customer snapshot on cust_key
        .join(F.broadcast(c), on="cust_key", how="left")
        # J2 (README.md:238-239): cascaded LEFT JOIN nation on derived key
        .join(F.broadcast(n), F.col("c_nation_key") == F.col("n_nation_key"), "left")
        .select(
            "order_key",
            "cust_key",
            "total_price",
            "order_date",
            "order_priority",
            "cust_name",
            "cust_acctbal",
            "cust_mktsegment",
            "nation_name",
        )
    )
    if with_ingest_ts:
        # CURRENT_TIMESTAMP ingest stamp (README.md:187,234)
        out = out.withColumn("ingest_ts", F.current_timestamp())
    return out
