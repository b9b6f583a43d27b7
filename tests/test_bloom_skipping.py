"""Bloom-filter file skipping (``write.bloom-columns``): equality
pruning on HIGH-cardinality columns where lexicographic min/max bounds
span the domain and value sets (cap 64) refuse to record."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import types as T

from fluss_iceberg_spark.lake.table import (
    LakeCatalog,
    _bloom_positions,
    _file_may_match,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("code", T.StringType(), True),
    ]
)


def _rows(shard: int, n: int = 200):
    # interleaved lexicographic codes: every file's [min,max] spans nearly
    # the whole domain, so bounds can never prune; 200 distincts/file
    # exceeds the value-set cap — blooms are the only pruning lever
    return [
        (shard * 1000 + i, f"req-{i:04d}-{shard:02d}") for i in range(n)
    ]


def _make(spark, d):
    t = LakeCatalog(spark, d).create_table(
        "blooms", SCHEMA, properties={"write.bloom-columns": "code,id"}
    )
    for shard in range(3):
        t.append(spark.createDataFrame(_rows(shard), SCHEMA))
    return t


def test_bloom_prunes_to_single_file(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _make(spark, d)
        snap = t.snapshot()
        assert all("blooms" in m for m in snap.file_meta.values())
        assert len(snap.files) >= 3
        # a value present in exactly one shard
        touched = t.plan_scan(where=[("code", "=", "req-0007-01")])
        assert len(touched) < len(snap.files)
        got = t.read(where=[("code", "=", "req-0007-01")]).collect()
        assert [(r.id, r.code) for r in got] == [(1007, "req-0007-01")]


def test_bloom_absent_value_scans_nothing(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _make(spark, d)
        assert t.plan_scan(where=[("code", "=", "req-9999-99")]) == []
        assert t.read(where=[("code", "=", "req-9999-99")]).count() == 0


def test_bloom_on_integer_column(spark):
    with tempfile.TemporaryDirectory() as d:
        t = _make(spark, d)
        # ids are disjoint ranges so bounds ALSO prune; assert bloom is
        # consulted via a value inside every file's bounds-gap... use
        # plan_scan equivalence instead: present value → >=1 file,
        # absent value inside global range → bloom prunes where bounds
        # cannot (1500 is in no file but inside [0, 2199])
        assert t.plan_scan(where=[("id", "=", 1500)]) == []
        assert len(t.plan_scan(where=[("id", "=", 1007)])) >= 1


def test_bloom_never_false_negative(spark):
    """Every written value must pass its own file's bloom (completeness:
    pruning is only ever sound, never lossy)."""
    with tempfile.TemporaryDirectory() as d:
        t = _make(spark, d)
        for shard in range(3):
            for i in (0, 99, 199):
                code = f"req-{i:04d}-{shard:02d}"
                rows = t.read(where=[("code", "=", code)]).collect()
                assert len(rows) == 1 and rows[0].code == code


def test_non_equality_predicates_ignore_bloom(spark):
    meta = {"blooms": {"code": "0"}}  # empty bloom: nothing present
    # range ops never consult the bloom (no stats either → keep file)
    assert _file_may_match(meta, "code", ">", "a") is True
    assert _file_may_match(meta, "code", "=", "a") is False


def test_bloom_positions_deterministic_and_typed():
    assert _bloom_positions("x") == _bloom_positions("x")
    assert _bloom_positions(7) == _bloom_positions(7)
    assert _bloom_positions("7") == _bloom_positions(7)  # canon: str(int)
    assert _bloom_positions(1.5) is None  # floats excluded by design
    assert _bloom_positions(True) is None  # bools excluded
