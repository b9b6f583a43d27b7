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


def test_expire_snapshots_log_table(spark):
    with tempfile.TemporaryDirectory() as d:
        t = LakeCatalog(spark, d).create_table("exp", SCHEMA)
        for i in range(4):
            t.append(spark.createDataFrame([(i, f"v{i}")], SCHEMA))
        res = t.expire_snapshots(keep_last=2)
        assert res["expired_snapshots"] == [0, 1]
        assert res["retained_snapshots"] == [2, 3]
        # appends share files: everything an expired snapshot referenced
        # is still referenced by a retained one -> no data deleted
        assert res["removed_files"] == []
        assert t.read().count() == 4
        assert t.read(version=2).count() == 3
        with pytest.raises(ValueError, match="expired"):
            t.read(version=0)
        # $snapshots skips the holes; the oldest retained has no parent
        snaps = {r.snapshot_id: r for r in t.snapshots().collect()}
        assert sorted(snaps) == [2, 3]
        assert snaps[2].parent_id is None
        assert snaps[3].parent_id == 2


def test_expire_after_compact_deletes_rewritten_files(spark):
    with tempfile.TemporaryDirectory() as d:
        t = LakeCatalog(spark, d).create_table("expc", SCHEMA)
        for i in range(3):
            t.append(spark.createDataFrame([(i, f"v{i}")], SCHEMA))
        t.compact()
        res = t.expire_snapshots(keep_last=1)
        # pre-compaction files are only referenced by expired snapshots
        assert len(res["removed_files"]) >= 3
        assert sorted(r.k for r in t.read().collect()) == [0, 1, 2]
        # expiry left nothing dangling
        assert t.remove_orphan_files() == []


def test_remove_orphan_files(spark):
    import os

    with tempfile.TemporaryDirectory() as d:
        t = LakeCatalog(spark, d).create_table("orph", SCHEMA)
        t.append(spark.createDataFrame([(1, "a")], SCHEMA))
        orphan = os.path.join(t.path, "data", "s99", "junk.parquet")
        os.makedirs(os.path.dirname(orphan), exist_ok=True)
        with open(orphan, "wb") as f:
            f.write(b"not a real parquet")
        removed = t.remove_orphan_files()
        assert removed == [os.path.join("data", "s99", "junk.parquet")]
        assert t.read().count() == 1
        # second pass is a no-op
        assert t.remove_orphan_files() == []


def test_incremental_read_deltas_and_guards(spark):
    with tempfile.TemporaryDirectory() as d:
        t = LakeCatalog(spark, d).create_table("inc", SCHEMA)
        for i in range(4):
            t.append(spark.createDataFrame([(i, f"v{i}")], SCHEMA))
        # delta after v1 = appends v2+v3
        assert sorted(r.k for r in t.incremental_read(1).collect()) == [2, 3]
        # bounded range
        assert sorted(r.k for r in t.incremental_read(0, 2).collect()) == [1, 2]
        # from -1 = everything
        assert t.incremental_read(-1).count() == 4
        # empty delta
        assert t.incremental_read(3).count() == 0
        # crossing a compact (rewrite) commit is refused
        t.compact()
        with pytest.raises(ValueError, match="non-append"):
            t.incremental_read(2)
        # but a range strictly before the rewrite still works
        assert sorted(r.k for r in t.incremental_read(1, 3).collect()) == [2, 3]


def test_sql_time_travel_rewrite_leaves_non_lake_tables(spark):
    from fluss_iceberg_spark.engine import Engine

    with tempfile.TemporaryDirectory() as d:
        eng = Engine(spark, d)
        t = eng.create_table("tt", SCHEMA)
        t.append(spark.createDataFrame([(1, "a")], SCHEMA))
        t.append(spark.createDataFrame([(2, "b")], SCHEMA))
        eng.refresh("tt")
        assert eng.sql("SELECT k FROM tt VERSION AS OF 0").collect()[0].k == 1
        assert eng.sql("SELECT COUNT(1) AS c FROM tt VERSION AS OF 1").collect()[0].c == 2
        # plain queries pass through to Catalyst untouched
        spark.range(3).createOrReplaceTempView("plain_view")
        assert eng.sql("SELECT COUNT(1) AS c FROM plain_view").collect()[0].c == 3


def test_refs_metadata_table(spark, tmp_path):
    """$refs lists main + tags + branches from metadata only."""
    from pyspark.sql import types as T

    from fluss_iceberg_spark.lake.table import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path / "refswh"))
    sch = T.StructType([T.StructField("x", T.LongType())])
    t = cat.create_table("rt", sch)
    t.append(spark.createDataFrame([(1,)], sch))
    t.create_tag("v1.0")
    t.create_branch("audit")
    rows = {(r.name, r.type): r.snapshot_id for r in t.refs().collect()}
    assert rows[("main", "BRANCH")] == t.current_version()
    assert ("v1.0", "TAG") in rows
    assert ("audit", "BRANCH") in rows


def test_call_rewrite_zorder(spark, tmp_path):
    """CALL system.rewrite_data_files(t, n, 'zorder:a,b') routes to the
    Z-order clustering rewrite."""
    from pyspark.sql import functions as F

    from fluss_iceberg_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "zwh"))
    df = spark.range(1000).select(
        F.col("id").alias("a"), (F.col("id") * 37 % 1000).alias("b")
    )
    t = eng.create_table("zt", df.schema)
    t.append(df)
    eng.sql("CALL system.rewrite_data_files(zt, 250, 'zorder:a,b')")
    t = eng.load_table("zt")
    assert t.snapshot().operation == "compact"
    assert t.read().count() == 1000


def test_auto_compact_threshold(spark, tmp_path):
    """Auto-compaction fires only past the file-count threshold, bounds
    the file count, preserves data, and keeps time travel intact."""
    from pyspark.sql import types as T

    from fluss_iceberg_spark.lake.table import LakeCatalog

    cat = LakeCatalog(spark, str(tmp_path / "acwh"))
    sch = T.StructType([T.StructField("x", T.LongType())])
    t = cat.create_table(
        "ac", sch, properties={"write.auto-compact.file-threshold": "6"}
    )
    for i in range(4):
        t.append(spark.range(i * 10, i * 10 + 10).toDF("x").coalesce(1))
        assert t.maybe_auto_compact() is None  # under threshold
    n_before = len(t.snapshot().files)
    assert n_before >= 4
    for i in range(4, 8):
        t.append(spark.range(i * 10, i * 10 + 10).toDF("x").coalesce(1))
        t.maybe_auto_compact()
    assert len(t.snapshot().files) < n_before + 4  # bounded, not 8 appends
    assert len(t.snapshot().files) <= 6
    assert t.read().count() == 80
    assert t.snapshot().operation in ("compact", "append")
    # a table without the property never auto-compacts
    t2 = cat.create_table("ac2", sch)
    t2.append(spark.range(5).toDF("x"))
    assert t2.maybe_auto_compact() is None


def test_incremental_read_allows_metadata_only_commits(spark):
    """ALTER TABLE metadata commits (constraints, schema change) keep the
    file list identical, so the file-diff delta stays exact — an
    incremental range crossing one must NOT raise (a matview REFRESH
    after ALTER TABLE on its base would otherwise be stuck forever)."""
    with tempfile.TemporaryDirectory() as d:
        t = LakeCatalog(spark, d).create_table("incm", SCHEMA)
        t.append(spark.createDataFrame([(0, "a")], SCHEMA))          # v0
        t.add_constraint("k_pos", "k >= 0")                          # v1 meta
        t.append(spark.createDataFrame([(1, "b")], SCHEMA))          # v2
        t.add_column("extra", T.LongType())                          # v3 meta
        t.append(spark.createDataFrame(
            [(2, "c", 9)], "k int, v string, extra long"))           # v4
        got = sorted(r.k for r in t.incremental_read(0).collect())
        assert got == [1, 2]
        # MoR deletes in range still refuse (rows vanished, not appended)
        t.properties["write.delete.mode"] = "merge-on-read"
        t.delete([("k", "=", 1)])
        with pytest.raises(ValueError, match="non-append"):
            t.incremental_read(0)


def test_incremental_read_ignores_interleaved_branch_snapshots(spark):
    """Branch commits take ids from the same global sequence; an id
    inside the range that is NOT on main's lineage must not trip the
    non-append guard or pollute the delta."""
    with tempfile.TemporaryDirectory() as d:
        t = LakeCatalog(spark, d).create_table("incb", SCHEMA)
        t.append(spark.createDataFrame([(0, "a")], SCHEMA))          # v0 main
        t.create_branch("side")
        with t.on_branch("side"):
            t.append(spark.createDataFrame([(100, "s")], SCHEMA))    # v1 branch
        t.append(spark.createDataFrame([(1, "b")], SCHEMA))          # v2 main
        got = sorted(r.k for r in t.incremental_read(0).collect())
        assert got == [1]  # branch row invisible, branch id not rejected


def test_small_files_only_compaction(spark):
    """only_smaller_than_bytes: the small-file tail folds; right-sized
    files carry forward byte-identical."""
    with tempfile.TemporaryDirectory() as d:
        t = LakeCatalog(spark, d).create_table("sfc", SCHEMA)
        # one big-ish file, then several tiny commits
        t.append(
            spark.createDataFrame(
                [(i, "x" * 200) for i in range(2000)], SCHEMA
            )
        )
        big = list(t.snapshot().files)
        for i in range(4):
            t.append(spark.createDataFrame([(10_000 + i, "tiny")], SCHEMA))
        before = t.snapshot()
        big_bytes = max(
            int(m.get("bytes", 0)) for m in before.file_meta.values()
        )
        snap = t.compact(only_smaller_than_bytes=big_bytes // 2)
        assert snap.summary["files_rewritten"] == len(before.files) - len(big)
        assert set(big) <= set(snap.files)  # big file untouched
        assert len(snap.files) < len(before.files)
        assert snap.total_rows == before.total_rows
        assert t.read().count() == 2004


def test_system_time_as_of_sql(spark, tmp_path):
    from fluss_iceberg_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "whst"))
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    t = eng.create_table("stt", df.schema)
    t.append(df)
    ts0 = t.snapshot().committed_at_ms
    t.append(spark.createDataFrame([(2, "b")], df.schema))
    n = eng.sql(
        f"SELECT COUNT(*) AS n FROM stt FOR SYSTEM_TIME AS OF {ts0}"
    ).collect()[0].n
    assert n == 1
    assert eng.sql("SELECT COUNT(*) AS n FROM stt").collect()[0].n == 2


def test_create_table_like(spark, tmp_path):
    from fluss_iceberg_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "whlk"))
    df = spark.createDataFrame([(1, 5)], "k int, v long")
    src = eng.create_table(
        "src_t", df.schema, primary_key=["k"], not_null=["k"], n_buckets=4,
        properties={"write.delete.mode": "merge-on-read"},
    )
    src.add_constraint("v_pos", "v >= 0")
    src.merge(df)
    eng.sql("CREATE TABLE dst_t LIKE src_t")
    dst = eng.catalog.load("dst_t")
    assert dst.schema == src.schema
    assert dst.primary_key == ["k"] and dst.n_buckets == 4
    assert dst.properties["write.delete.mode"] == "merge-on-read"
    assert dst.constraints == {"v_pos": "v >= 0"}
    assert eng.sql("SELECT COUNT(*) AS n FROM dst_t").collect()[0].n == 0
    # constraint is live on the clone
    with pytest.raises(Exception):
        dst.merge(spark.createDataFrame([(2, -1)], df.schema))
    # IF NOT EXISTS is a no-op on the second run
    eng.sql("CREATE TABLE IF NOT EXISTS dst_t LIKE src_t")


def test_table_changes_sql(spark, tmp_path):
    """Delta-style TABLE_CHANGES(t, from[, to]) SQL: log tables emit
    tagged inserts from the incremental scan, PK tables the per-commit
    changelog ops."""
    from fluss_iceberg_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "whtc"))
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    t = eng.create_table("tc_log", df.schema)
    t.append(df)  # v0
    t.append(spark.createDataFrame([(2, "b")], df.schema))  # v1
    rows = eng.sql("SELECT op, k FROM TABLE_CHANGES(tc_log, 0)").collect()
    assert [(r.op, r.k) for r in rows] == [("insert", 2)]
    p = eng.create_table("tc_pk", df.schema, primary_key=["k"], n_buckets=2)
    p.merge(df)  # v0
    p.merge(spark.createDataFrame([(1, "a2"), (2, "b")], df.schema))  # v1
    got = {
        (r.op, r.k)
        for r in eng.sql("SELECT op, k FROM TABLE_CHANGES(tc_pk, 0, 1)").collect()
    }
    assert ("insert", 2) in got
    assert any(k == 1 and op != "insert" for op, k in got)


def test_table_changes_negative_from_version(spark, tmp_path):
    """from_version=-1 = full history; the generated view name must be a
    valid identifier (no hyphen)."""
    from fluss_iceberg_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "whtcn"))
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    t = eng.create_table("tcn", df.schema)
    t.append(df)
    t.append(spark.createDataFrame([(2, "b")], df.schema))
    rows = eng.sql(
        "SELECT op, k FROM TABLE_CHANGES(tcn, -1) ORDER BY k"
    ).collect()
    assert [(r.op, r.k) for r in rows] == [("insert", 1), ("insert", 2)]
