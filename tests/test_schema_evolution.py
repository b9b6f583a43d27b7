"""Schema evolution part 2: RENAME COLUMN / DROP COLUMN (Iceberg §2.7),
metadata-only over stable field ids — old files resolve via name-history
coalesce, time travel reads each snapshot under its recorded schema, and
tombstoned names cannot be resurrected by a later ADD COLUMN.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fluss_iceberg_spark.lake.table import LakeCatalog


@pytest.fixture()
def t(spark, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path / "wh"))
    df = spark.range(10).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 2).cast("long").alias("v"),
        F.concat(F.lit("n"), F.col("id")).alias("note"),
    )
    t = cat.create_table("evo", df.schema)
    t.append(df)
    return t


def test_rename_column_reads_old_files(spark, t):
    t.rename_column("v", "value")
    assert t.schema.fieldNames() == ["k", "note", "value"] or \
        t.schema.fieldNames() == ["k", "value", "note"]
    got = {r.k: r.value for r in t.read().collect()}
    assert got[3] == 6 and len(got) == 10  # old file data under new name
    # new writes land under the new name and coexist with old files
    t.append(
        spark.createDataFrame([(100, 200, "x")], "k int, value long, note string")
    )
    got = {r.k: r.value for r in t.read().collect()}
    assert got[100] == 200 and got[3] == 6 and len(got) == 11


def test_rename_time_travel_old_schema(spark, t):
    v0 = t.current_version()
    t.rename_column("v", "value")
    # pre-rename snapshot reads under the OLD schema (old column name)
    old = t.read(version=v0)
    assert "v" in old.columns and "value" not in old.columns
    assert {r.v for r in old.collect()} == {2 * i for i in range(10)}
    # current read uses the new name
    assert "value" in t.read().columns


def test_drop_column_and_tombstone(spark, t):
    v0 = t.current_version()
    t.drop_column("note")
    assert "note" not in t.read().columns
    assert t.read().count() == 10
    # time travel still surfaces the dropped column
    assert {r.note for r in t.read(version=v0).collect()} == {
        f"n{i}" for i in range(10)
    }
    # tombstone: the name cannot be resurrected (old bytes still exist)
    with pytest.raises(ValueError, match="previously dropped"):
        t.add_column("note", T.StringType())
    # a fresh name is fine and projects NULL over old files
    t.add_column("note2", T.StringType())
    assert t.read().filter(F.col("note2").isNull()).count() == 10


def test_rename_guards(spark, tmp_path):
    cat = LakeCatalog(spark, str(tmp_path / "whg"))
    df = spark.range(5).select(
        F.col("id").cast("int").alias("k"), F.col("id").alias("v")
    )
    t = cat.create_table("pk", df.schema, primary_key=["k"])
    t.merge(df)
    with pytest.raises(ValueError, match="PK column"):
        t.rename_column("k", "kk")
    with pytest.raises(ValueError, match="PK column"):
        t.drop_column("k")
    t.rename_column("v", "val")  # non-PK columns of PK tables rename fine
    assert {r.val for r in t.read().collect()} == {0, 1, 2, 3, 4}
    with pytest.raises(ValueError, match="history"):
        t.rename_column("val", "v")  # old name is tombstoned
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("val", "k")


def test_rename_then_drop_then_merge(spark, tmp_path):
    """Evolution composes with the PK merge path (hot/cold union intact)."""
    cat = LakeCatalog(spark, str(tmp_path / "whm"))
    df = spark.range(6).select(
        F.col("id").cast("int").alias("k"), F.col("id").alias("v"),
        F.lit("x").alias("tag"),
    )
    t = cat.create_table("pkm", df.schema, primary_key=["k"])
    t.merge(df)
    t.rename_column("v", "val")
    t.drop_column("tag")
    upd = spark.createDataFrame([(2, 999)], "k int, val long")
    t.merge(upd)
    got = {r.k: r.val for r in t.read().collect()}
    assert got[2] == 999 and got[5] == 5 and len(got) == 6
    assert t.read().columns == ["k", "val"]


def test_sql_alter_rename_drop(spark, tmp_path):
    from fluss_iceberg_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "whs"))
    eng.sql("CREATE TABLE s (k INT, v BIGINT, note STRING)")
    eng.sql("INSERT INTO s SELECT * FROM VALUES (1, 10, 'a'), (2, 20, 'b')")
    eng.sql("ALTER TABLE s RENAME COLUMN v TO value")
    got = {r.k: r.value for r in eng.sql("SELECT k, value FROM s").collect()}
    assert got == {1: 10, 2: 20}
    eng.sql("ALTER TABLE s DROP COLUMN note")
    cols = {r.col_name for r in eng.sql("DESCRIBE TABLE s").collect()}
    assert cols == {"k", "value"}


# ---------- part 3: type widening (Iceberg type-promotion matrix) ----------


def test_widen_int_to_long_reads_old_files(spark, t):
    t.widen_column("k", T.LongType())
    assert t.schema["k"].dataType == T.LongType()
    got = sorted(r.k for r in t.read().collect())
    assert got == list(range(10))  # int32 files upcast under long schema
    t.append(
        spark.createDataFrame(
            [(2**40, 1, "big")], "k long, v long, note string"
        )
    )
    assert t.read().filter(F.col("k") > 2**39).count() == 1
    assert t.read().count() == 11


def test_widen_decimal_precision(spark, tmp_path):
    import decimal

    cat = LakeCatalog(spark, str(tmp_path / "whd"))
    df = spark.createDataFrame(
        [(1, decimal.Decimal("12.34"))], "k int, price decimal(10,2)"
    )
    t = cat.create_table("dec", df.schema)
    t.append(df)
    t.widen_column("price", T.DecimalType(20, 2))
    assert t.schema["price"].dataType == T.DecimalType(20, 2)
    t.append(
        spark.createDataFrame(
            [(2, decimal.Decimal("123456789012345678.99"))],
            "k int, price decimal(20,2)",
        )
    )
    got = {r.k: r.price for r in t.read().collect()}
    assert got[1] == decimal.Decimal("12.34")
    assert got[2] == decimal.Decimal("123456789012345678.99")


def test_widen_refuses_narrowing_and_scale_change(spark, t):
    with pytest.raises(ValueError, match="cannot widen"):
        t.widen_column("v", T.IntegerType())  # long -> int narrows
    with pytest.raises(ValueError, match="cannot widen"):
        t.widen_column("note", T.IntegerType())  # string -> int
    t2 = LakeCatalog(spark, t.path + "_d").create_table(
        "d2",
        T.StructType([T.StructField("p", T.DecimalType(10, 2), True)]),
    )
    with pytest.raises(ValueError, match="cannot widen"):
        t2.widen_column("p", T.DecimalType(12, 4))  # scale change


def test_widen_time_travel_reads_old_type(spark, t):
    v0 = t.current_version()
    t.widen_column("k", T.LongType())
    old = t.read(version=v0)
    assert dict(old.dtypes)["k"] == "int"  # snapshot schema preserved
    assert t.read().schema["k"].dataType == T.LongType()


def test_widen_sql_surface(spark, tmp_path):
    from fluss_iceberg_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "whsql"))
    df = spark.range(5).select(F.col("id").cast("int").alias("k"))
    t = eng.create_table("wsql", df.schema)
    t.append(df)
    eng.refresh("wsql")
    eng.sql("ALTER TABLE wsql ALTER COLUMN k TYPE BIGINT")
    t = eng.catalog.load("wsql")
    assert t.schema["k"].dataType == T.LongType()
    assert eng.sql("SELECT SUM(k) AS s FROM wsql").collect()[0].s == 10


def test_rename_drop_refuse_constraint_and_sort_order_refs(spark, t):
    """A metadata-only rename/drop of a column referenced by a CHECK
    constraint or write.sort-order would brick every later write (the
    stored expression names the old column); it must be refused."""
    t.add_constraint("v_pos", "v >= 0")
    with pytest.raises(ValueError, match="CHECK"):
        t.rename_column("v", "val")
    with pytest.raises(ValueError, match="CHECK"):
        t.drop_column("v")
    t.drop_constraint("v_pos")
    t.properties["write.sort-order"] = "note"
    with pytest.raises(ValueError, match="sort-order"):
        t.rename_column("note", "comment")
    del t.properties["write.sort-order"]
    # with the references gone, evolution proceeds and writes still work
    t.rename_column("v", "val")
    t.append(
        spark.createDataFrame([(100, 1, "x")], "k int, val long, note string")
    )
    assert t.read().count() == 11


def test_set_unset_tblproperties_sql(spark, tmp_path):
    """SET/UNSET TBLPROPERTIES: persisted across sessions, landed as a
    metadata snapshot, write-path specs validated eagerly."""
    from fluss_iceberg_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "whp"))
    df = spark.range(5).select(
        F.col("id").cast("int").alias("k"), F.col("id").alias("v")
    )
    t = eng.create_table("props_t", df.schema)
    t.append(df)
    eng.sql(
        "ALTER TABLE props_t SET TBLPROPERTIES "
        "('write.sort-order' = 'k', 'history.expire.max-snapshots' = '10')"
    )
    # persisted: a fresh catalog load sees them
    t2 = LakeCatalog(spark, str(tmp_path / "whp")).load("props_t")
    assert t2.properties["write.sort-order"] == "k"
    # the property is live: sorted append still works, and the
    # metadata snapshot recorded the change
    assert t2.snapshot().operation == "schema-change"
    t2.append(spark.createDataFrame([(9, 9)], df.schema))
    # unknown sort column refused at ALTER time
    with pytest.raises(ValueError, match="not in schema"):
        eng.sql("ALTER TABLE props_t SET TBLPROPERTIES ('write.sort-order' = 'nope')")
    eng.sql("ALTER TABLE props_t UNSET TBLPROPERTIES ('write.sort-order')")
    t3 = LakeCatalog(spark, str(tmp_path / "whp")).load("props_t")
    assert "write.sort-order" not in t3.properties
