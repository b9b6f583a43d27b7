"""Hidden partitioning (the Iceberg partition-spec role): spec parsing,
partition-preserving writes, manifest partition values, partition-value
pruning in plan_scan, the $partitions metadata view, SQL DDL + SHOW CREATE.

Reference role: trino/iceberg.properties:2-6 (the Iceberg cold path);
README.md:187's ingest_ts is the natural partition key.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fluss_iceberg_spark.lake.table import (
    LakeCatalog,
    parse_partition_spec,
)


@pytest.fixture()
def events_df(spark):
    return spark.range(0, 300).select(
        F.col("id").cast("int").alias("k"),
        F.expr(
            "timestampadd(HOUR, CAST(id AS INT), TIMESTAMP '2024-01-01 00:00:00')"
        ).alias("ts"),
        (F.col("id") % 3).cast("int").alias("cat"),
    )


def test_parse_partition_spec():
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("region", T.StringType(), True),
        ]
    )
    spec = parse_partition_spec(["days(ts)", "region"], schema)
    assert spec == [
        {"name": "ts_day", "col": "ts", "transform": "days"},
        {"name": "region", "col": "region", "transform": "identity"},
    ]
    # Iceberg accepts singular and plural transform names
    assert parse_partition_spec(["day(ts)"], schema)[0]["transform"] == "days"
    with pytest.raises(ValueError, match="unknown column"):
        parse_partition_spec(["days(nope)"], schema)
    with pytest.raises(ValueError, match="timestamp/date"):
        parse_partition_spec(["days(region)"], schema)
    with pytest.raises(ValueError, match="bad partition spec"):
        parse_partition_spec(["floor(ts)"], schema)


def test_partitioned_write_read_and_prune(spark, tmp_path, events_df):
    cat = LakeCatalog(spark, str(tmp_path / "wh"))
    t = cat.create_table("ev", events_df.schema, partition_by=["days(ts)"])
    t.append(events_df)  # 300 hourly rows -> 13 day-partitions

    # hidden partitioning: reads see exactly the declared schema
    assert t.read().columns == ["k", "ts", "cat"]
    assert t.read().count() == 300

    # manifest partition values recorded per file
    snap = t.snapshot()
    pvals = {
        (snap.file_meta[f] or {}).get("partition", {}).get("ts_day")
        for f in snap.files
    }
    assert "2024-01-01" in pvals and len(pvals) == 13

    # partition-value pruning: a one-day equality scan plans ~1/13 files
    day3 = datetime.date(2024, 1, 3)
    all_files = t.plan_scan()
    pruned = t.plan_scan(where=[("ts", ">=", datetime.datetime(2024, 1, 3)),
                                ("ts", "<", datetime.datetime(2024, 1, 4))])
    assert len(pruned) < len(all_files)
    assert {t.snapshot().file_meta[f]["partition"]["ts_day"] for f in pruned} == {
        day3.isoformat()
    }
    # and the scan stays exact
    got = t.read(
        where=[
            ("ts", ">=", datetime.datetime(2024, 1, 3)),
            ("ts", "<", datetime.datetime(2024, 1, 4)),
        ]
    ).count()
    assert got == 24


def test_partitioned_range_prune_and_compact(spark, tmp_path, events_df):
    cat = LakeCatalog(spark, str(tmp_path / "wh2"))
    t = cat.create_table("ev2", events_df.schema, partition_by=["days(ts)"])
    # two appends -> 2 files per partition; compact folds them back to 1
    t.append(events_df.filter(F.col("k") % 2 == 0))
    t.append(events_df.filter(F.col("k") % 2 == 1))
    per_part = {}
    snap = t.snapshot()
    for f in snap.files:
        d = snap.file_meta[f]["partition"]["ts_day"]
        per_part[d] = per_part.get(d, 0) + 1
    assert max(per_part.values()) >= 2
    t.compact(sort_by=["ts"])
    snap2 = t.snapshot()
    per_part2 = {}
    for f in snap2.files:
        d = snap2.file_meta[f]["partition"]["ts_day"]
        per_part2[d] = per_part2.get(d, 0) + 1
    assert set(per_part2) == set(per_part)  # layout preserved
    assert max(per_part2.values()) == 1
    assert t.read().count() == 300

    # range predicate prunes at day granularity after compaction too
    pruned = t.plan_scan(where=[("ts", ">=", datetime.datetime(2024, 1, 12))])
    days = {snap2.file_meta[f]["partition"]["ts_day"] for f in pruned}
    assert days == {"2024-01-12", "2024-01-13"}

    # time travel to the pre-compaction snapshot still reads correctly
    assert t.read(version=1).count() == 300


def test_partitions_metadata_view(spark, tmp_path, events_df):
    cat = LakeCatalog(spark, str(tmp_path / "wh3"))
    t = cat.create_table("ev3", events_df.schema, partition_by=["days(ts)"])
    t.append(events_df)
    p = {r.partition: r.record_count for r in t.partitions().collect()}
    assert len(p) == 13
    assert p['{"ts_day": "2024-01-01"}'] == 24
    assert sum(p.values()) == 300
    # unpartitioned tables refuse the view
    t2 = cat.create_table("plain", events_df.schema)
    with pytest.raises(ValueError, match="not partitioned"):
        t2.partitions()


def test_identity_partition_and_multi_spec(spark, tmp_path, events_df):
    cat = LakeCatalog(spark, str(tmp_path / "wh4"))
    t = cat.create_table(
        "ev4", events_df.schema, partition_by=["months(ts)", "cat"]
    )
    t.append(events_df)
    snap = t.snapshot()
    some = snap.file_meta[snap.files[0]]["partition"]
    assert set(some) == {"ts_month", "cat"}
    # identity int value parsed back as int; equality prune works
    pruned = t.plan_scan(where=[("cat", "=", 1)])
    assert pruned and all(
        snap.file_meta[f]["partition"]["cat"] == 1 for f in pruned
    )
    assert t.read(where=[("cat", "=", 1)]).count() == 100


def test_pk_table_rejects_partition_spec(spark, tmp_path, events_df):
    cat = LakeCatalog(spark, str(tmp_path / "wh5"))
    with pytest.raises(ValueError, match="log tables"):
        cat.create_table(
            "pkp", events_df.schema, primary_key=["k"], partition_by=["days(ts)"]
        )


def test_sql_ddl_partitioned(spark, tmp_path):
    from fluss_iceberg_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "wh6"))
    eng.sql(
        "CREATE TABLE pev (k INT, ts TIMESTAMP, cat INT) "
        "PARTITIONED BY (days(ts), cat) WITH ('a' = 'b')"
    )
    t = eng.catalog.load("pev")
    assert [p["name"] for p in t.partition_spec] == ["ts_day", "cat"]
    assert t.properties.get("a") == "b"
    ddl = eng.show_create_table("pev")
    assert "PARTITIONED BY (days(ts), cat)" in ddl
    eng.sql(
        "INSERT INTO pev SELECT * FROM VALUES "
        "(1, TIMESTAMP '2024-02-01 10:00:00', 0), "
        "(2, TIMESTAMP '2024-02-02 11:00:00', 1)"
    )
    # metadata companion view
    rows = eng.sql(
        "SELECT partition, record_count FROM pev__partitions ORDER BY partition"
    ).collect()
    assert len(rows) == 2 and all(r.record_count == 1 for r in rows)


def test_partition_spec_evolution(spark, tmp_path):
    """ADD PARTITION FIELD changes only FUTURE writes: old files keep
    their layout and stay conservatively un-pruned by the new field,
    new files prune by it; DROP PARTITION FIELD reverses for new writes
    while old files keep pruning by their recorded values."""
    import datetime

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from fluss_iceberg_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "pewh"))
    sch = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("ts", T.DateType(), True),
            T.StructField("region", T.StringType(), True),
        ]
    )
    t = eng.create_table("ev", sch)
    jan = [(1, datetime.date(2024, 1, 5), "eu"), (2, datetime.date(2024, 1, 9), "us")]
    feb = [(3, datetime.date(2024, 2, 5), "eu"), (4, datetime.date(2024, 2, 9), "us")]
    t.append(spark.createDataFrame(jan, sch))  # unpartitioned layout
    eng.sql("ALTER TABLE ev ADD PARTITION FIELD month(ts)")
    t = eng.load_table("ev")
    t.append(spark.createDataFrame(feb, sch))  # months(ts) layout
    # predicate on ts: old (jan) file has no recorded partition values ->
    # conservatively kept; feb file prunes by its month value
    kept = t.plan_scan(where=[("ts", ">=", datetime.date(2024, 3, 1))])
    metas = [t.snapshot().file_meta[f] for f in kept]
    assert all(not m.get("partition") for m in metas), (
        "files with a recorded month partition must have been pruned"
    )
    # exactness through mixed layouts
    assert t.read(where=[("ts", ">=", datetime.date(2024, 2, 1))]).count() == 2
    assert t.read().count() == 4
    # evolve again: add identity field, then drop the month field
    eng.sql("ALTER TABLE ev ADD PARTITION FIELD region")
    eng.sql("ALTER TABLE ev DROP PARTITION FIELD month(ts)")
    t = eng.load_table("ev")
    assert [p["name"] for p in t.partition_spec] == ["region"]
    mar = [(5, datetime.date(2024, 3, 2), "ap")]
    t.append(spark.createDataFrame(mar, sch))
    kept = t.plan_scan(where=[("region", "=", "ap")])
    assert t.read(where=[("region", "=", "ap")]).count() == 1
    # the march file prunes by region; jan/feb files keep their own rules
    newest = [f for f in kept if t.snapshot().file_meta[f].get("partition", {}).get("region")]
    assert all(
        t.snapshot().file_meta[f]["partition"]["region"] == "ap" for f in newest
    )
    # dropping a nonexistent field raises
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no partition field"):
        t.drop_partition_field("nope")


def test_where_scoped_compaction_rewrites_only_matching_partition(
    spark, events_df, tmp_path
):
    """CALL rewrite_data_files with a predicate: files of non-matching
    partitions carry forward byte-identical (same relpaths); the
    matching partition's small files collapse; data and time travel
    are unchanged."""
    cat = LakeCatalog(spark, str(tmp_path / "whsc"))
    t = cat.create_table("ev", events_df.schema, partition_by=["cat"])
    # 4 small appends → ≥4 files per partition
    for i in range(4):
        t.append(events_df.filter(F.col("k") % 4 == i))
    before = t.snapshot()
    cat0_before = [f for f in before.files if "cat=0" in f]
    cat1_before = [f for f in before.files if "cat=1" in f]
    assert len(cat0_before) >= 4 and len(cat1_before) >= 4
    pre_rows = sorted(r.k for r in t.read().collect())

    snap = t.compact(where=[("cat", "=", 0)])
    assert snap.operation == "compact"
    assert snap.summary["files_rewritten"] == len(cat0_before)
    cat0_after = [f for f in snap.files if "cat=0" in f]
    cat1_after = [f for f in snap.files if "cat=1" in f]
    assert sorted(cat1_after) == sorted(cat1_before)  # untouched
    assert len(cat0_after) < len(cat0_before)         # collapsed
    assert sorted(r.k for r in t.read().collect()) == pre_rows
    # time travel still sees the pre-compaction layout
    assert sorted(
        r.k for r in t.read(version=before.snapshot_id).collect()
    ) == pre_rows
    # row counts in the manifest stay live-exact
    assert snap.total_rows == before.total_rows


def test_where_scoped_compaction_sql_surface(spark, events_df, tmp_path):
    from fluss_iceberg_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "whsql2"))
    t = eng.create_table("ev2", events_df.schema, partition_by=["cat"])
    for i in range(3):
        t.append(events_df.filter(F.col("k") % 4 == i))  # all cats per append
    t.append(events_df.filter(F.col("k") % 4 == 3))
    res = eng.sql(
        "CALL rewrite_data_files(ev2, 1000000, 'cat = 1')"
    ).collect()[0]
    assert "rewritten=" in res.result
    assert eng.sql("SELECT COUNT(*) AS n FROM ev2").collect()[0].n == 300


def test_call_rewrite_where_with_string_literal(spark, events_df, tmp_path):
    """A where-predicate CALL arg containing a quoted string literal
    keeps its inner quotes (one unquote layer, '' unescapes)."""
    from fluss_iceberg_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "whq"))
    df = spark.range(0, 100).select(
        F.col("id").cast("int").alias("k"),
        F.when(F.col("id") % 2 == 0, "even").otherwise("odd").alias("par"),
    )
    t = eng.create_table("evq", df.schema, partition_by=["par"])
    for i in range(3):
        t.append(df.filter(F.col("k") % 3 == i))
    before = t.snapshot()
    odd_before = [f for f in before.files if "par=odd" in f]
    res = eng.sql(
        "CALL rewrite_data_files(evq, 1000000, 'par = ''even''')"
    ).collect()[0]
    assert "rewritten=" in res.result and "rewritten=all" not in res.result
    after = t.snapshot()
    assert sorted(f for f in after.files if "par=odd" in f) == sorted(odd_before)
    assert eng.sql("SELECT COUNT(*) AS n FROM evq").collect()[0].n == 100
