"""Lake maintenance (compaction, schema evolution) + skew salting."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fluss_iceberg_spark.lake.table import LakeCatalog
from fluss_iceberg_spark.operators.skew import salted_join

SCHEMA = T.StructType(
    [T.StructField("k", T.IntegerType(), False), T.StructField("v", T.StringType(), True)]
)


def test_compaction_preserves_data_and_history(spark):
    with tempfile.TemporaryDirectory() as d:
        t = LakeCatalog(spark, d).create_table("logc", SCHEMA)
        for i in range(5):  # 5 commits → ≥5 files
            t.append(spark.createDataFrame([(i, f"v{i}")], SCHEMA))
        before = t.snapshot()
        assert len(before.files) >= 5
        snap = t.compact()
        assert snap.operation == "compact"
        assert len(snap.files) < len(before.files)
        assert snap.total_rows == 5
        assert sorted(r.k for r in t.read().collect()) == [0, 1, 2, 3, 4]
        # time travel to pre-compaction snapshot still works
        assert t.read(version=before.snapshot_id).count() == 5
        # appends continue on top of the compacted snapshot
        t.append(spark.createDataFrame([(9, "x")], SCHEMA))
        assert t.read().count() == 6


def test_compaction_pk_table(spark):
    with tempfile.TemporaryDirectory() as d:
        t = LakeCatalog(spark, d).create_table("pkc", SCHEMA, primary_key=["k"], n_buckets=4)
        t.merge(spark.createDataFrame([(i, "a") for i in range(20)], SCHEMA))
        t.merge(spark.createDataFrame([(i, "b") for i in range(5)], SCHEMA))
        snap = t.compact()
        assert snap.total_rows == 20
        state = {r.k: r.v for r in t.read().collect()}
        assert state[3] == "b" and state[10] == "a"


def test_schema_evolution_add_column(spark):
    with tempfile.TemporaryDirectory() as d:
        cat = LakeCatalog(spark, d)
        t = cat.create_table("evo", SCHEMA)
        t.append(spark.createDataFrame([(1, "a")], SCHEMA))
        t.add_column("score", T.DoubleType())
        # old files project the new column as NULL
        t2 = cat.load("evo")
        row = t2.read().collect()[0]
        assert row.score is None
        # new writes carry the column
        t2.append(
            spark.createDataFrame(
                [(2, "b", 0.5)], "k int, v string, score double"
            )
        )
        vals = {r.k: r.score for r in t2.read().collect()}
        assert vals == {1: None, 2: 0.5}
        # duplicate add rejected
        with pytest.raises(ValueError):
            t2.add_column("score", T.DoubleType())


def test_salted_join_equals_plain_join(spark):
    """Salting changes the physical distribution, never the result —
    including a pathological hot key (80% of rows)."""
    import random

    rnd = random.Random(3)
    large = spark.createDataFrame(
        [(1 if rnd.random() < 0.8 else rnd.randint(2, 10), i) for i in range(5000)],
        "key int, payload long",
    )
    small = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(1, 11)], "key int, name string"
    )
    plain = salted = None
    plain = sorted(
        map(tuple, large.join(small, on="key").select("key", "payload", "name").collect())
    )
    salted = sorted(
        map(tuple, salted_join(large, small, "key").select("key", "payload", "name").collect())
    )
    assert plain == salted
    # left join with unmatched keys too
    large2 = large.withColumn("key", F.col("key") + 5)  # keys 6..15, dims stop at 10
    p2 = sorted(map(tuple, large2.join(small, on="key", how="left").select("key", "payload", "name").collect()), key=repr)
    s2 = sorted(map(tuple, salted_join(large2, small, "key", how="left").select("key", "payload", "name").collect()), key=repr)
    assert p2 == s2
