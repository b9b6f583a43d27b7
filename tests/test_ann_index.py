"""Persistent IVF index (operators/ann_index.py): build + append ==
one-shot parity (the frozen-quantizer guarantee), brute-force recall,
manifest pruning of the postings scan, and output shape."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from fluss_iceberg_spark.lake.table import LakeCatalog
from fluss_iceberg_spark.operators import similarity as SIM
from fluss_iceberg_spark.operators.ann_index import IvfIndex

DIM = 16


@pytest.fixture(scope="module")
def emb(spark):
    rnd = random.Random(11)
    rows = [
        (i, [rnd.uniform(-1, 1) for _ in range(DIM)]) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    df.persist().count()
    yield df
    df.unpersist()


def _build_split(spark, tmp_path, emb, name, splits):
    idx = IvfIndex(LakeCatalog(spark, str(tmp_path / name)), "ix")
    idx.build(emb.filter(splits[0]), n_lists=8, dim=DIM)
    for cond in splits[1:]:
        idx.append(emb.filter(cond), dim=DIM)
    return idx


def test_incremental_append_equals_one_shot(spark, tmp_path, emb):
    """build(half)+append(half) must search EXACTLY like an index whose
    postings were all written at build time with the same quantizer —
    appends assign against the frozen model, so postings are a pure
    union. Both indexes seed the quantizer from the same first-K
    vectors (build set contains them), so the models coincide."""
    q = emb.filter(F.col("vec_id") < 5)
    inc = _build_split(
        spark, tmp_path, emb, "inc",
        [F.col("vec_id") < 150, F.col("vec_id").between(150, 219),
         F.col("vec_id") >= 220],
    )
    # one-shot: build on the SAME seed prefix, append the rest in one go
    one = _build_split(
        spark, tmp_path, emb, "one", [F.col("vec_id") < 150, F.col("vec_id") >= 150]
    )
    a = [tuple(r) for r in inc.search(q, k=10, n_probe=3, dim=DIM)
         .orderBy("query_id", "rank").collect()]
    b = [tuple(r) for r in one.search(q, k=10, n_probe=3, dim=DIM)
         .orderBy("query_id", "rank").collect()]
    assert a == b and len(a) == 50


def test_recall_vs_brute_force(spark, tmp_path, emb):
    q = emb.filter(F.col("vec_id") < 5)
    idx = _build_split(spark, tmp_path, emb, "rec", [F.lit(True)])
    got = idx.search(q, k=10, n_probe=4, dim=DIM)
    brute = SIM.brute_force_topk(emb, q, k=10, dim=DIM)
    g = {(r.query_id, r.nn_id) for r in got.collect()}
    b = {(r.query_id, r.nn_id) for r in brute.collect()}
    recall = len(g & b) / len(b)
    assert recall >= 0.5, f"IVF recall {recall} below floor at n_probe=4/8"
    # full probe degenerates to exact brute force
    full = idx.search(q, k=10, n_probe=8, dim=DIM)
    f = {(r.query_id, r.nn_id) for r in full.collect()}
    assert f == b


def test_postings_scan_prunes_to_probed_lists(spark, tmp_path, emb):
    idx = _build_split(
        spark, tmp_path, emb, "prune",
        [F.col("vec_id") < 100, F.col("vec_id").between(100, 199),
         F.col("vec_id") >= 200],
    )
    total = len(idx.postings.plan_scan())
    pruned = len(idx.postings.plan_scan(where=[("list_id", "in", [0])]))
    assert total >= 3  # three writes really landed
    assert pruned < total, "probing one list must skip postings files"


def test_search_output_shape(spark, tmp_path, emb):
    idx = _build_split(spark, tmp_path, emb, "shape", [F.lit(True)])
    out = idx.search(emb.filter(F.col("vec_id") < 2), k=7, n_probe=2, dim=DIM)
    assert out.columns == ["query_id", "nn_id", "cosine", "rank"]
    rows = out.collect()
    assert len(rows) == 14
    assert all(1 <= r.rank <= 7 and r.query_id != r.nn_id for r in rows)


def test_cdc_sync_matches_frozen_model_assignment(spark, tmp_path, emb):
    """After consuming a changelog with inserts, updates, and deletes,
    the postings must equal EXACTLY the frozen model's assignment of the
    source table's final state — no stale vectors, no duplicates, every
    upsert reassigned."""
    from fluss_iceberg_spark.operators.similarity import (
        _as_double,
        _assign_clusters,
    )

    rnd = random.Random(29)
    cat = LakeCatalog(spark, str(tmp_path / "cdc_wh"))
    src = cat.create_table(
        "emb_src",
        emb.schema,
        primary_key=["vec_id"],
        n_buckets=4,
    )
    src.merge(emb.filter(F.col("vec_id") < 250))
    v0 = src.current_version()
    idx = IvfIndex(cat, "cdc").build(src.read(), n_lists=8, dim=DIM)
    # CDC traffic: 20 vector updates, a range delete, 50 inserts
    updates = spark.createDataFrame(
        [(i, [rnd.uniform(-1, 1) for _ in range(DIM)]) for i in range(20)],
        emb.schema,
    )
    src.merge(updates)
    src.delete(where=[("vec_id", ">=", 230)])  # 230..249 leave
    src.merge(emb.filter(F.col("vec_id").between(250, 299)))
    res = idx.sync_from_changelog(src, from_version=v0, dim=DIM)
    assert res["deleted"] >= 20 and res["upserted"] == 70
    model = idx._model_df()
    want = {
        (r.cid, r.vec_id)
        for r in _assign_clusters(
            _as_double(src.read()), model, DIM
        ).collect()
    }
    got_rows = idx.postings.read().select("list_id", "vec_id").collect()
    got = {(r.list_id, r.vec_id) for r in got_rows}
    assert len(got_rows) == len(got) == 280  # no duplicate postings
    assert got == want
    # search serves the fresh corpus: an updated vector's old position
    # is gone (its nn set reflects the new embedding)
    out = idx.search(src.read().filter(F.col("vec_id") < 2), k=5, dim=DIM)
    assert out.count() == 10
    # idempotence: nothing new to sync
    res2 = idx.sync_from_changelog(src, from_version=res["synced_to_version"], dim=DIM)
    assert res2["deleted"] == 0 and res2["upserted"] == 0
