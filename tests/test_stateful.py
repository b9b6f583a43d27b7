"""Custom stateful streaming (applyInPandasWithState) + lake changelog
streaming: incremental results must agree with their batch twins."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import time
import uuid

from pyspark.sql import functions as F

from fluss_iceberg_spark.lake.table import LakeCatalog
from fluss_iceberg_spark.streaming.stateful import streaming_sessionize


def _write_one(df, src, name):
    tmp = os.path.join(src, "_tmp")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    shutil.move(
        glob.glob(os.path.join(tmp, "part-*.parquet"))[0],
        os.path.join(src, f"{name}.parquet"),
    )
    shutil.rmtree(tmp)


def test_streaming_sessionize_matches_batch_closed_sessions(spark):
    """Closed sessions from the stateful streaming operator == batch
    sessionization minus each user's final (still-open) session."""
    rows = []
    eid = 0
    for user in (1, 2):
        # 3 sessions per user: events 10 min apart inside a session,
        # 2 h gaps between sessions
        t0 = 1_700_000_000
        for s in range(3):
            base = t0 + s * 7200 + user * 37
            for j in range(3):
                rows.append((eid, user, base + j * 600, 1.0 * (j + 1)))
                eid += 1
    df = spark.createDataFrame(rows, "event_id long, user_id long, epoch long, value double")
    df = df.select(
        "event_id", "user_id", F.timestamp_seconds("epoch").alias("ts"), "value"
    )
    with tempfile.TemporaryDirectory() as src, tempfile.TemporaryDirectory() as ckpt:
        # two micro-batches split by time (state must carry across)
        _write_one(df.filter(F.col("event_id") % 18 < 9), src, "a")
        time.sleep(1.1)
        _write_one(df.filter(F.col("event_id") % 18 >= 9), src, "b")
        stream = (
            spark.readStream.schema("event_id long, user_id long, ts timestamp, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        sink = f"sess_{uuid.uuid4().hex[:8]}"
        q = (
            streaming_sessionize(stream, gap_seconds=1800)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
            for r in spark.table(sink).collect()
        }
    # batch twin: sessions per user, drop each user's last (still open)
    w = F.window  # noqa: F841
    from pyspark.sql import Window

    win = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(win))
    flagged = df.withColumn(
        "is_new",
        F.when(gap > 1_800_000_000, 1).when(F.lag("ts").over(win).isNull(), 1).otherwise(0),
    )
    sess = flagged.withColumn(
        "sid", F.sum("is_new").over(win.rowsBetween(Window.unboundedPreceding, 0))
    ).groupBy("user_id", "sid").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
    )
    last_sid = sess.groupBy("user_id").agg(F.max("sid").alias("max_sid"))
    closed_batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in sess.join(last_sid, on="user_id")
        .filter(F.col("sid") != F.col("max_sid"))
        .collect()
    }
    assert got == closed_batch
    assert len(got) == 4  # 2 users × 2 closed sessions


def test_lake_changelog_stream(spark):
    """U2: a log table is subscribable — appends committed after the
    stream starts are delivered to the sink."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("k", T.IntegerType()), T.StructField("v", T.StringType())]
    )
    with tempfile.TemporaryDirectory() as wh, tempfile.TemporaryDirectory() as ckpt:
        cat = LakeCatalog(spark, wh)
        t = cat.create_table("log_stream", schema)
        t.append(spark.createDataFrame([(1, "a")], schema))
        sink = f"chg_{uuid.uuid4().hex[:8]}"
        q = (
            t.stream_appends()
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
            assert {r.k for r in spark.table(sink).collect()} == {1}
            t.append(spark.createDataFrame([(2, "b"), (3, "c")], schema))
            q.processAllAvailable()
            assert {r.k for r in spark.table(sink).collect()} == {1, 2, 3}
        finally:
            q.stop()

    # PK tables refuse changelog streaming (COW would re-emit)
    import pytest

    with tempfile.TemporaryDirectory() as wh2:
        cat2 = LakeCatalog(spark, wh2)
        pk = cat2.create_table("pk_stream", schema, primary_key=["k"])
        with pytest.raises(ValueError):
            pk.stream_appends()
