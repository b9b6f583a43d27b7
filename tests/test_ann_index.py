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


def test_load_restores_build_dim_and_dense_lists(spark, tmp_path, emb):
    """The build-time dim rides the centroids table (index.dim) so a
    FRESH handle that only load()s searches correctly without the
    caller re-passing dim — before r8 it silently fell back to dim=64,
    truncating/null-padding every dot product. list_ids are dense
    0..K-1 (remapped from seed vec_ids), so they always fit the
    postings' int column."""
    cat = LakeCatalog(spark, str(tmp_path / "dimwh"))
    built = IvfIndex(cat, "ix").build(emb, n_lists=8, dim=DIM)
    assert built.centroids.properties["index.dim"] == str(DIM)
    assert built.centroids.properties["index.n-lists"] == "8"
    lists = {r.list_id for r in built.postings.read().select("list_id").distinct().collect()}
    assert lists <= set(range(8))
    q = emb.filter(F.col("vec_id") < 3)
    want = [tuple(r) for r in built.search(q, k=5, n_probe=3, dim=DIM)
            .orderBy("query_id", "rank").collect()]
    fresh = IvfIndex(cat, "ix").load()
    assert fresh._dim == DIM
    got = [tuple(r) for r in fresh.search(q, k=5, n_probe=3)  # NO dim arg
           .orderBy("query_id", "rank").collect()]
    assert got == want and len(got) == 15
    # append without dim on the fresh handle assigns correctly too
    fresh2 = IvfIndex(cat, "ix")  # not even load()ed — appends self-load
    before = built.postings.read().count()
    fresh2.append(
        emb.filter(F.col("vec_id") < 0)  # empty: just exercises the path
    )
    assert built.postings.read().count() == before


def test_huge_vec_ids_stay_int_safe(spark, tmp_path):
    """Seed vec_ids past 2^31 must not wrap the postings' int list_id
    (pre-r8 the non-ANSI cast corrupted list assignment silently)."""
    rnd = random.Random(7)
    base = 5_000_000_000  # > 2^31
    rows = [(base + i, [rnd.uniform(-1, 1) for _ in range(DIM)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    idx = IvfIndex(LakeCatalog(spark, str(tmp_path / "hugewh")), "ix")
    idx.build(df, n_lists=4, dim=DIM)
    got = idx.postings.read().select("list_id", "vec_id").collect()
    assert len(got) == 60
    assert {r.list_id for r in got} <= {0, 1, 2, 3}
    out = idx.search(df.filter(F.col("vec_id") < base + 2), k=5, n_probe=2, dim=DIM)
    assert out.count() == 10


def test_distributed_routing_matches_driver_loop(spark, tmp_path, emb):
    """Past ROUTE_DRIVER_MAX queries, query->list routing runs as a
    Spark job (broadcast centroids + top-n_probe window); the probe
    sets must equal the driver numpy loop's exactly, and search results
    must be identical on both paths."""
    idx = IvfIndex(LakeCatalog(spark, str(tmp_path / "routewh")), "ix")
    idx.build(emb, n_lists=8, dim=DIM)
    q = emb.filter(F.col("vec_id") < 30)
    probe_drv, small = idx._route_queries(q, n_probe=3, dim=DIM)
    assert small is True
    orig = IvfIndex.ROUTE_DRIVER_MAX
    IvfIndex.ROUTE_DRIVER_MAX = 10  # force the distributed path
    try:
        probe_dist, small2 = idx._route_queries(q, n_probe=3, dim=DIM)
        assert small2 is False
        a = {(r.query_id, r.list_id) for r in probe_drv.collect()}
        b = {(r.query_id, r.list_id) for r in probe_dist.collect()}
        assert a == b and len(a) == 90
        got = [tuple(r) for r in idx.search(q, k=5, n_probe=3, dim=DIM)
               .orderBy("query_id", "rank").collect()]
    finally:
        IvfIndex.ROUTE_DRIVER_MAX = orig
    want = [tuple(r) for r in idx.search(q, k=5, n_probe=3, dim=DIM)
            .orderBy("query_id", "rank").collect()]
    assert got == want and len(got) == 150


def test_sync_fallback_counts_deleted_rows(spark, tmp_path, emb):
    """A stale-key backlog past max_inline_keys takes the anti-join
    overwrite path; ``deleted`` must report the ACTUAL stale postings
    rows removed (pre-r8 it returned the -1 sentinel)."""
    cat = LakeCatalog(spark, str(tmp_path / "fbwh"))
    src = cat.create_table(
        "s", emb.schema, primary_key=["vec_id"], n_buckets=4
    )
    src.merge(emb.filter(F.col("vec_id") < 250))
    v0 = src.current_version()
    idx = IvfIndex(cat, "fb").build(src.read(), n_lists=8, dim=DIM)
    src.delete(where=[("vec_id", ">=", 200)])  # 50 keys leave
    res = idx.sync_from_changelog(src, from_version=v0, dim=DIM, max_inline_keys=10)
    assert res["deleted"] == 50 and res["upserted"] == 0
    assert idx.postings.read().count() == 200
    # postings still equal the frozen model's view of the final state
    out = idx.search(src.read().filter(F.col("vec_id") < 2), k=5, dim=DIM)
    assert out.count() == 10


def test_adaptive_delete_path_choice(spark, tmp_path, emb):
    """The sync delete strategy is chosen from the MANIFEST (r8
    crossover run, SCALE.md): stale keys concentrated in a minority of
    postings files -> inline manifest-pruned delete; keys bloom-hitting
    most files -> one anti-join rewrite (the inline IN-list would
    rewrite everything anyway plus pay O(keys x files) driver probes)."""
    cat = LakeCatalog(spark, str(tmp_path / "adwh"))
    src = cat.create_table(
        "s", emb.schema, primary_key=["vec_id"], n_buckets=4
    )
    src.merge(emb.filter(F.col("vec_id") < 100))
    idx = IvfIndex(cat, "ad").build(src.read(), n_lists=4, dim=DIM)
    # three more appends of DISJOINT vec_id ranges: per-file vec_id
    # bounds then isolate each range's keys to its own files
    for lo, hi in ((100, 170), (170, 240), (240, 300)):
        v0 = src.current_version()
        src.merge(emb.filter(F.col("vec_id").between(lo, hi - 1)))
        idx.sync_from_changelog(src, from_version=v0, dim=DIM)
    assert idx.postings.read().count() == 300
    n_files = len(idx.postings.plan_scan())
    assert n_files >= 4
    # concentrated delta: only the LAST range changes -> its keys prune
    # to a minority of files -> inline
    v0 = src.current_version()
    src.delete(where=[("vec_id", ">=", 280)])
    res = idx.sync_from_changelog(src, from_version=v0, dim=DIM)
    assert res["delete_path"] == "inline" and res["deleted"] == 20
    # scattered delta: every 3rd key across ALL ranges -> hits most
    # files -> rewrite
    v0 = src.current_version()
    upd = emb.filter(
        (F.col("vec_id") < 280) & (F.pmod("vec_id", F.lit(3)) == 0)
    ).select("vec_id", F.reverse("embedding").alias("embedding"))
    src.merge(upd)
    res = idx.sync_from_changelog(src, from_version=v0, dim=DIM)
    assert res["delete_path"] == "rewrite"
    assert res["deleted"] == res["upserted"] == upd.count()
    assert idx.postings.read().count() == 280
    # both paths land on the same invariant: postings == frozen-model
    # assignment of the source's final state
    from fluss_iceberg_spark.operators.similarity import (
        _as_double,
        _assign_clusters,
    )
    want = {
        (r.cid, r.vec_id)
        for r in _assign_clusters(
            _as_double(src.read()), idx._model_df(), DIM
        ).collect()
    }
    got = {
        (r.list_id, r.vec_id)
        for r in idx.postings.read().select("list_id", "vec_id").collect()
    }
    assert got == want
