"""Iceberg v2 metadata export (lake/iceberg_meta.py — the format third
of S18): a committed snapshot exports as spec table-metadata JSON +
Avro manifest list/manifests + spec-schema position-delete parquet, an
ENGINE-FREE subprocess (stdlib + duckdb, no pyspark) resolves and scans
it through the spec chain, re-exports chain through metadata-log, and —
when pyiceberg is importable — StaticTable.from_metadata plans the same
files. Reference context: the export is the cross-engine interchange
contract (trino/iceberg.properties:2-6, README.md:129-133)."""

from __future__ import annotations

import datetime
import decimal
import json
import os
import subprocess
import sys
import tempfile
import textwrap

import pytest
from pyspark.sql import types as T

from fluss_iceberg_spark.lake.iceberg_meta import (
    MANIFEST_ENTRY_SCHEMA,
    MANIFEST_FILE_SCHEMA,
    read_avro,
    write_avro,
)
from fluss_iceberg_spark.lake.table import LakeCatalog

SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType(), False),
        T.StructField("d", T.DateType(), True),
        T.StructField("price", T.DecimalType(15, 2), True),
        T.StructField("tags", T.ArrayType(T.StringType()), True),
    ]
)


def _rows(lo, hi):
    return [
        (
            i,
            datetime.date(1995, 1, 1) + datetime.timedelta(days=i % 300),
            decimal.Decimal(f"{i}.50"),
            [f"t{i % 3}"],
        )
        for i in range(lo, hi)
    ]


def _mk(spark, d, name="ice", pk=None, props=None):
    return LakeCatalog(spark, d).create_table(
        name, SCHEMA, primary_key=pk, properties=dict(props or {})
    )


# ---------- stdlib Avro codec ----------


def test_avro_container_roundtrip(tmp_path):
    recs = [
        {
            "manifest_path": "/w/m0.avro",
            "manifest_length": 123,
            "partition_spec_id": 0,
            "content": 1,
            "sequence_number": -3,  # negative long exercises zigzag
            "min_sequence_number": 0,
            "added_snapshot_id": 9007199254740993,  # > 2^53: long fidelity
            "added_files_count": 2,
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": 10,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
            "partitions": [
                {
                    "contains_null": True,
                    "contains_nan": None,
                    "lower_bound": b"\x00\x01",
                    "upper_bound": None,
                }
            ],
            "key_metadata": None,
        },
        {
            "manifest_path": "/w/m1.avro",
            "manifest_length": 0,
            "partition_spec_id": 0,
            "content": 0,
            "sequence_number": 1,
            "min_sequence_number": 1,
            "added_snapshot_id": 1,
            "added_files_count": 0,
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": 0,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
            "partitions": [],  # empty array block form
            "key_metadata": b"kk",
        },
    ]
    p = str(tmp_path / "list.avro")
    write_avro(p, MANIFEST_FILE_SCHEMA, recs, metadata={"x": "y"})
    schema, got, meta = read_avro(p)
    assert schema["name"] == "manifest_file"
    assert meta["x"] == "y" and meta["avro.codec"] == "null"
    assert got == recs


def test_avro_empty_file_roundtrip(tmp_path):
    p = str(tmp_path / "empty.avro")
    write_avro(p, MANIFEST_ENTRY_SCHEMA, [])
    _, got, _ = read_avro(p)
    assert got == []


# ---------- plain-table export ----------


def test_export_resolves_current_snapshot(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _mk(spark, d)
        t.append(spark.createDataFrame(_rows(0, 60), SCHEMA).coalesce(2))
        t.append(spark.createDataFrame(_rows(60, 100), SCHEMA).coalesce(1))
        mloc = t.export_iceberg_metadata()
        assert mloc.endswith("v1.metadata.json") and os.path.exists(mloc)
        with open(mloc) as f:
            doc = json.load(f)
        # spec invariants
        assert doc["format-version"] == 2
        assert doc["current-schema-id"] == 0
        assert doc["refs"]["main"]["snapshot-id"] == doc["current-snapshot-id"]
        names = [f["name"] for f in doc["schemas"][0]["fields"]]
        assert names == ["k", "d", "price", "tags"]
        ids = [f["id"] for f in doc["schemas"][0]["fields"]]
        assert ids == [1, 2, 3, 4]  # stand-in field_ids + 1
        tags = doc["schemas"][0]["fields"][3]["type"]
        assert tags["type"] == "list" and tags["element"] == "string"
        assert tags["element-id"] > max(ids[:3])
        nm = json.loads(doc["properties"]["schema.name-mapping.default"])
        assert [e["names"] for e in nm] == [["k"], ["d"], ["price"], ["tags"]]
        assert nm[3]["fields"][0]["names"] == ["element"]
        # manifest chain resolves the snapshot's exact files
        snap = [s for s in doc["snapshots"]
                if s["snapshot-id"] == doc["current-snapshot-id"]][0]
        _, manifests, _ = read_avro(snap["manifest-list"])
        assert [m["content"] for m in manifests] == [0]
        mschema, entries, mmeta = read_avro(manifests[0]["manifest_path"])
        assert mmeta["format-version"] == "2" and mmeta["content"] == "data"
        got = sorted(e["data_file"]["file_path"] for e in entries)
        want = sorted(os.path.join(t.path, f) for f in t.snapshot().files)
        assert got == want
        assert all(os.path.isabs(p) and os.path.exists(p) for p in got)
        assert sum(e["data_file"]["record_count"] for e in entries) == 100
        assert manifests[0]["added_rows_count"] == 100
        assert all(
            e["data_file"]["file_size_in_bytes"]
            == os.path.getsize(e["data_file"]["file_path"])
            for e in entries
        )
        # version-hint points at the export
        with open(os.path.join(t.path, "metadata", "version-hint.text")) as f:
            assert f.read().strip() == "1"


def test_reexport_chains_metadata_log(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _mk(spark, d)
        t.append(spark.createDataFrame(_rows(0, 10), SCHEMA))
        m1 = t.export_iceberg_metadata()
        t.append(spark.createDataFrame(_rows(10, 20), SCHEMA))
        m2 = t.export_iceberg_metadata()
        assert m2.endswith("v2.metadata.json")
        d1, d2 = (json.load(open(p)) for p in (m1, m2))
        assert d2["table-uuid"] == d1["table-uuid"]
        assert d2["current-snapshot-id"] > d1["current-snapshot-id"]
        assert [e["metadata-file"] for e in d2["metadata-log"]] == [m1]
        snap = d2["snapshots"][0]
        assert snap["parent-snapshot-id"] == d1["current-snapshot-id"]
        assert d2["last-sequence-number"] > d1["last-sequence-number"]


def test_export_empty_table_raises(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _mk(spark, d)
        with pytest.raises(ValueError, match="no committed snapshot"):
            t.export_iceberg_metadata()


# ---------- position deletes ----------


def _export_doc(t):
    mloc = t.export_iceberg_metadata()
    with open(mloc) as f:
        doc = json.load(f)
    snap = [s for s in doc["snapshots"]
            if s["snapshot-id"] == doc["current-snapshot-id"]][0]
    _, manifests, _ = read_avro(snap["manifest-list"])
    return mloc, doc, manifests


def test_export_position_deletes(spark):
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        t = _mk(spark, d, props={"write.delete.mode": "merge-on-read"})
        t.append(spark.createDataFrame(_rows(0, 100), SCHEMA).coalesce(2))
        t.delete([("k", ">=", 80)])
        _, doc, manifests = _export_doc(t)
        assert [m["content"] for m in manifests] == [0, 1]
        _, dentries, dmeta = read_avro(manifests[1]["manifest_path"])
        assert dmeta["content"] == "deletes"
        assert all(e["data_file"]["content"] == 1 for e in dentries)
        # rewritten tombstones carry the spec schema + reserved ids
        deleted = []
        for e in dentries:
            pf = pq.read_table(e["data_file"]["file_path"])
            assert pf.column_names == ["file_path", "pos"]
            fid = pf.schema.field("file_path").metadata[b"PARQUET:field_id"]
            assert fid == b"2147483546"
            assert (
                pf.schema.field("pos").metadata[b"PARQUET:field_id"]
                == b"2147483545"
            )
            deleted += list(
                zip(pf.column("file_path").to_pylist(),
                    pf.column("pos").to_pylist())
            )
        assert len(deleted) == 20
        # spec read = data files minus (file_path, pos) tombstones,
        # reconstructed with pyarrow only — must equal the engine read
        _, entries, _ = read_avro(manifests[0]["manifest_path"])
        dead = set(deleted)
        live = []
        for e in entries:
            p = e["data_file"]["file_path"]
            for i, k in enumerate(pq.read_table(p).column("k").to_pylist()):
                if (p, i) not in dead:
                    live.append(k)
        assert sorted(live) == sorted(r.k for r in t.read().collect())


def test_export_equality_delete_gate(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _mk(spark, d, pk=["k"])
        t.merge(spark.createDataFrame(_rows(0, 50), SCHEMA))
        t.delete_by_key(spark.createDataFrame([(7,), (8,)], "k int"))
        with pytest.raises(ValueError, match="active equality delete"):
            t.export_iceberg_metadata()
        # a full-bucket rewrite materializes the delete → export works
        t.merge(spark.createDataFrame(_rows(0, 50), SCHEMA))
        _, doc, manifests = _export_doc(t)
        assert [m["content"] for m in manifests] == [0]


# ---------- engine-free consumer + facade + SQL surface ----------

READER = textwrap.dedent(
    """
    import importlib.util, json, os, sys
    import duckdb
    # load the codec module by FILE (the package __init__ imports pyspark;
    # the module itself is pyspark-free — prove it)
    spec = importlib.util.spec_from_file_location("ice_meta", sys.argv[2])
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    read_avro = mod.read_avro
    assert "pyspark" not in sys.modules
    tpath = sys.argv[1]
    with open(os.path.join(tpath, "metadata", "version-hint.text")) as f:
        k = int(f.read().strip())
    with open(os.path.join(tpath, "metadata", f"v{k}.metadata.json")) as f:
        doc = json.load(f)
    snap = [s for s in doc["snapshots"]
            if s["snapshot-id"] == doc["current-snapshot-id"]][0]
    _, manifests, _ = read_avro(snap["manifest-list"])
    data, deletes = [], []
    for m in manifests:
        _, entries, _ = read_avro(m["manifest_path"])
        for e in entries:
            (deletes if m["content"] == 1 else data).append(
                e["data_file"]["file_path"])
    q = "SELECT COUNT(*) c, SUM(k) s FROM read_parquet($d, file_row_number=true, filename=true) t"
    if deletes:
        q += (" ANTI JOIN read_parquet($x) del"
              " ON t.filename = del.file_path AND t.file_row_number = del.pos")
    row = duckdb.sql(q, params={"d": data, "x": deletes or ["-"]}).fetchone()
    print(json.dumps({"rows": int(row[0]), "sum": int(row[1])}))
    """
)


def test_engine_free_spec_reader(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _mk(spark, d, props={"write.delete.mode": "merge-on-read"})
        t.append(spark.createDataFrame(_rows(0, 100), SCHEMA).coalesce(2))
        t.delete([("k", "<", 10)])
        t.export_iceberg_metadata()
        mod_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "fluss_iceberg_spark", "lake", "iceberg_meta.py",
        )
        out = subprocess.run(
            [sys.executable, "-c", READER, t.path, mod_path],
            capture_output=True, text=True, timeout=120, check=True,
        )
        got = json.loads(out.stdout.strip().splitlines()[-1])
        assert got == {"rows": 90, "sum": sum(range(10, 100))}


def test_facade_surfaces_metadata_location(spark):
    from fluss_iceberg_spark.lake.rest_catalog import (
        RestCatalogServer,
        fetch_table,
    )

    with tempfile.TemporaryDirectory() as d:
        t = _mk(spark, d)
        t.append(spark.createDataFrame(_rows(0, 5), SCHEMA))
        srv = RestCatalogServer(d).start()
        try:
            assert "metadata-location" not in fetch_table(srv.endpoint, "ice")
            mloc = t.export_iceberg_metadata()
            assert fetch_table(srv.endpoint, "ice")["metadata-location"] == mloc
        finally:
            srv.stop()


def test_call_export_iceberg_metadata(spark):
    from fluss_iceberg_spark.engine import Engine

    with tempfile.TemporaryDirectory() as d:
        eng = Engine(spark, d)
        t = eng.create_table("ice", SCHEMA)
        t.append(spark.createDataFrame(_rows(0, 5), SCHEMA))
        row = eng.sql("CALL system.export_iceberg_metadata('ice')").collect()[0]
        assert row.procedure == "export_iceberg_metadata"
        assert row.result.endswith("v1.metadata.json")
        assert os.path.exists(row.result)


# ---------- optional pyiceberg validation (the PIL-seam pattern) ----------


def test_pyiceberg_static_table_plans_same_files(spark):
    pyiceberg_table = pytest.importorskip("pyiceberg.table")
    with tempfile.TemporaryDirectory() as d:
        t = _mk(spark, d)
        t.append(spark.createDataFrame(_rows(0, 40), SCHEMA).coalesce(2))
        mloc = t.export_iceberg_metadata()
        st = pyiceberg_table.StaticTable.from_metadata(mloc)
        planned = sorted(
            task.file.file_path for task in st.scan().plan_files()
        )
        want = sorted(os.path.join(t.path, f) for f in t.snapshot().files)
        assert planned == want
        assert st.schema().column_names == ["k", "d", "price", "tags"]
