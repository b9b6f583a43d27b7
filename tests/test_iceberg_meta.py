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


def test_export_converts_equality_deletes(spark):
    """Active equality deletes export as spec-schema POSITION deletes
    (r10): the spec-chain read must reproduce the engine's post-delete
    row set exactly, with no equality-delete entries anywhere."""
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        t = _mk(spark, d, pk=["k"])
        t.merge(spark.createDataFrame(_rows(0, 50), SCHEMA))
        t.delete_by_key(spark.createDataFrame([(7,), (8,), (31,)], "k int"))
        _, doc, manifests = _export_doc(t)
        assert [m["content"] for m in manifests] == [0, 1]
        _, dentries, _ = read_avro(manifests[1]["manifest_path"])
        # every exported delete is a position delete (content=1 data_file
        # with the reserved-id spec schema), never an equality delete
        dead = set()
        for e in dentries:
            assert e["data_file"]["content"] == 1
            assert e["data_file"]["equality_ids"] is None
            pf = pq.read_table(e["data_file"]["file_path"])
            assert pf.column_names == ["file_path", "pos"]
            dead |= set(
                zip(pf.column("file_path").to_pylist(),
                    pf.column("pos").to_pylist())
            )
        assert len(dead) == 3
        _, entries, _ = read_avro(manifests[0]["manifest_path"])
        live = []
        for e in entries:
            p = e["data_file"]["file_path"]
            for i, k in enumerate(pq.read_table(p).column("k").to_pylist()):
                if (p, i) not in dead:
                    live.append(k)
        assert sorted(live) == sorted(r.k for r in t.read().collect())
        assert set(live) & {7, 8, 31} == set()


def test_export_equality_then_reinsert_survives(spark):
    """The sequence rule: a key re-inserted AFTER the equality delete
    lives in a newer file (seq >= delete seq) — the conversion must not
    tombstone it."""
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        t = _mk(spark, d, pk=["k"])
        t.merge(spark.createDataFrame(_rows(0, 30), SCHEMA))
        t.delete_by_key(spark.createDataFrame([(5,)], "k int"))
        t.merge(spark.createDataFrame(_rows(5, 6), SCHEMA))  # re-insert 5
        engine = sorted(r.k for r in t.read().collect())
        assert 5 in engine
        _, doc, manifests = _export_doc(t)
        dead = set()
        for m in manifests:
            if m["content"] != 1:
                continue
            _, dentries, _ = read_avro(m["manifest_path"])
            for e in dentries:
                pf = pq.read_table(e["data_file"]["file_path"])
                dead |= set(
                    zip(pf.column("file_path").to_pylist(),
                        pf.column("pos").to_pylist())
                )
        _, entries, _ = read_avro(
            [m for m in manifests if m["content"] == 0][0]["manifest_path"]
        )
        live = []
        for e in entries:
            p = e["data_file"]["file_path"]
            for i, k in enumerate(pq.read_table(p).column("k").to_pylist()):
                if (p, i) not in dead:
                    live.append(k)
        assert sorted(live) == engine


# ---------- partition-spec export ----------


def test_export_partition_spec(spark):
    """Partitioned stand-in tables export a REAL Iceberg partition spec
    (r10): spec fields with epoch-domain transforms, typed per-file
    partition records, and manifest-list field summaries."""
    with tempfile.TemporaryDirectory() as d:
        t = LakeCatalog(spark, d).create_table(
            "ice", SCHEMA, partition_by=["months(d)"]
        )
        t.append(spark.createDataFrame(_rows(0, 100), SCHEMA))
        _, doc, manifests = _export_doc(t)
        assert doc["default-spec-id"] == 1
        specs = {s["spec-id"]: s["fields"] for s in doc["partition-specs"]}
        assert specs[0] == []
        assert specs[1] == [
            {
                "name": "d_month",
                "transform": "month",
                "source-id": 2,  # field id of `d`
                "field-id": 1000,
            }
        ]
        assert doc["last-partition-id"] == 1000
        dm = [m for m in manifests if m["content"] == 0][0]
        assert dm["partition_spec_id"] == 1
        mschema, entries, mmeta = read_avro(dm["manifest_path"])
        assert json.loads(mmeta["partition-spec"]) == specs[1]
        assert mmeta["partition-spec-id"] == "1"
        # every entry carries the epoch-month value of its own rows
        import pyarrow.parquet as pq

        for e in entries:
            pv = e["data_file"]["partition"]["d_month"]
            months = {
                (dd.year - 1970) * 12 + (dd.month - 1)
                for dd in pq.read_table(
                    e["data_file"]["file_path"]
                ).column("d").to_pylist()
            }
            assert months == {pv}
        # manifest-list summaries bound the value domain (4-byte LE ints)
        lo, hi = (
            int.from_bytes(dm["partitions"][0][b], "little", signed=True)
            for b in ("lower_bound", "upper_bound")
        )
        vals = [e["data_file"]["partition"]["d_month"] for e in entries]
        assert (lo, hi) == (min(vals), max(vals))
        assert dm["partitions"][0]["contains_null"] is False


def test_export_identity_partition_values(spark):
    """Identity partitions keep the source domain (date → epoch days in
    the spec record)."""
    with tempfile.TemporaryDirectory() as d:
        t = LakeCatalog(spark, d).create_table(
            "ice", SCHEMA, partition_by=["d"]
        )
        t.append(spark.createDataFrame(_rows(0, 8), SCHEMA))
        _, doc, manifests = _export_doc(t)
        spec = [s for s in doc["partition-specs"] if s["spec-id"] == 1][0]
        assert spec["fields"][0]["transform"] == "identity"
        _, entries, _ = read_avro(manifests[0]["manifest_path"])
        import datetime as _dt

        import pyarrow.parquet as pq

        for e in entries:
            days = {
                (dd - _dt.date(1970, 1, 1)).days
                for dd in pq.read_table(
                    e["data_file"]["file_path"]
                ).column("d").to_pylist()
            }
            assert days == {e["data_file"]["partition"]["d"]}


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


PRUNING_READER = textwrap.dedent(
    """
    import importlib.util, json, os, sys
    import duckdb
    spec = importlib.util.spec_from_file_location("ice_meta", sys.argv[2])
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert "pyspark" not in sys.modules
    tpath, target_month = sys.argv[1], int(sys.argv[3])
    with open(os.path.join(tpath, "metadata", "version-hint.text")) as f:
        k = int(f.read().strip())
    with open(os.path.join(tpath, "metadata", f"v{k}.metadata.json")) as f:
        doc = json.load(f)
    # resolve the default spec purely from metadata
    spec_fields = [s["fields"] for s in doc["partition-specs"]
                   if s["spec-id"] == doc["default-spec-id"]][0]
    assert [f["transform"] for f in spec_fields] == ["month"]
    pname = spec_fields[0]["name"]
    snap = [s for s in doc["snapshots"]
            if s["snapshot-id"] == doc["current-snapshot-id"]][0]
    _, manifests, _ = mod.read_avro(snap["manifest-list"])
    scanned, pruned = [], 0
    for m in manifests:
        if m["content"] != 0:
            continue
        # manifest-level pruning from the field summaries
        s = m["partitions"][0]
        lo = int.from_bytes(s["lower_bound"], "little", signed=True)
        hi = int.from_bytes(s["upper_bound"], "little", signed=True)
        if target_month < lo or target_month > hi:
            pruned += 1
            continue
        _, entries, _ = mod.read_avro(m["manifest_path"])
        for e in entries:
            if e["data_file"]["partition"][pname] == target_month:
                scanned.append(e["data_file"]["file_path"])
            else:
                pruned += 1
    row = duckdb.sql(
        "SELECT COUNT(*) c, COALESCE(SUM(k), 0) s FROM read_parquet($d)",
        params={"d": scanned or ["-"]},
    ).fetchone() if scanned else (0, 0)
    print(json.dumps({"files": len(scanned), "pruned": pruned,
                      "rows": int(row[0]), "sum": int(row[1])}))
    """
)


def test_spec_reader_partition_pruning(spark):
    """A spec reader plans a partition-filtered scan from the exported
    metadata alone: only files whose partition record matches are
    opened, and the result equals the engine's filtered read."""
    with tempfile.TemporaryDirectory() as d:
        t = LakeCatalog(spark, d).create_table(
            "ice", SCHEMA, partition_by=["months(d)"]
        )
        t.append(spark.createDataFrame(_rows(0, 100), SCHEMA))
        t.export_iceberg_metadata()
        # target = the month of d(0) = 1995-01 → (1995-1970)*12 + 0
        target = (1995 - 1970) * 12
        mod_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "fluss_iceberg_spark", "lake", "iceberg_meta.py",
        )
        out = subprocess.run(
            [sys.executable, "-c", PRUNING_READER, t.path, mod_path,
             str(target)],
            capture_output=True, text=True, timeout=120, check=True,
        )
        got = json.loads(out.stdout.strip().splitlines()[-1])
        import datetime

        want = [
            r.k
            for r in t.read().collect()
            if (r.d.year, r.d.month) == (1995, 1)
        ]
        assert got["rows"] == len(want) and got["sum"] == sum(want)
        assert got["pruned"] > 0  # other months' files were never opened
        # and the reader opened strictly fewer files than exist
        assert got["files"] < len(t.snapshot().files)


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


# ---------- fast-append manifest reuse ----------


def test_reexport_reuses_manifests_on_append(spark):
    """Append-only evolution: the second export must reference the first
    export's data manifest AS-IS and write only a delta manifest; the
    combined chain still resolves the exact current file set."""
    with tempfile.TemporaryDirectory() as d:
        t = _mk(spark, d)
        t.append(spark.createDataFrame(_rows(0, 30), SCHEMA).coalesce(1))
        _, _, m1st = _export_doc(t)
        assert len(m1st) == 1
        first_manifest = m1st[0]["manifest_path"]
        t.append(spark.createDataFrame(_rows(30, 50), SCHEMA).coalesce(1))
        _, doc2, m2nd = _export_doc(t)
        paths = [m["manifest_path"] for m in m2nd]
        assert first_manifest in paths  # reused verbatim
        delta = [m for m in m2nd if m["manifest_path"] != first_manifest]
        assert len(delta) == 1
        # delta manifest holds ONLY the new files, at the new sequence
        _, dentries, _ = read_avro(delta[0]["manifest_path"])
        assert sum(e["data_file"]["record_count"] for e in dentries) == 20
        assert all(
            e["sequence_number"] == doc2["last-sequence-number"]
            for e in dentries
        )
        # reused manifest keeps its ORIGINAL snapshot/sequence numbers
        reused = [m for m in m2nd if m["manifest_path"] == first_manifest][0]
        assert reused["sequence_number"] < doc2["last-sequence-number"]
        # the full chain still resolves the exact live file set
        got = set()
        for m in m2nd:
            _, entries, _ = read_avro(m["manifest_path"])
            got |= {e["data_file"]["file_path"] for e in entries}
        assert got == {os.path.join(t.path, f) for f in t.snapshot().files}


def test_reexport_full_rewrite_after_compaction(spark):
    """A rewrite (compaction) invalidates prior manifests — the export
    must fall back to a full rewrite, never referencing dead files."""
    with tempfile.TemporaryDirectory() as d:
        t = _mk(spark, d)
        t.append(spark.createDataFrame(_rows(0, 30), SCHEMA).coalesce(2))
        _, _, m1st = _export_doc(t)
        old_manifest = m1st[0]["manifest_path"]
        t.compact()
        _, _, m2nd = _export_doc(t)
        assert old_manifest not in [m["manifest_path"] for m in m2nd]
        live = set()
        for m in m2nd:
            _, entries, _ = read_avro(m["manifest_path"])
            live |= {e["data_file"]["file_path"] for e in entries}
        assert live == {os.path.join(t.path, f) for f in t.snapshot().files}
        assert all(os.path.exists(p) for p in live)
