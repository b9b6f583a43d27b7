"""CDC-sync backlog scale run (r8, verdict item 7): put a REAL number on
``IvfIndex.sync_from_changelog``'s two delete paths —

- inline: stale keys fit ``max_inline_keys`` → row-level IN-list delete,
  manifest-pruned to the files actually holding a changed vector
  (O(changed files));
- fallback: backlog past the bound → ONE anti-join overwrite, a full
  postings rewrite (O(corpus) — the compaction-sized trade a >100k-key
  backlog warrants anyway).

Builds a synthetic corpus far past the sf fixtures (default 300k
vectors, dim 16 — deterministic from xxhash64 with literal salts, no
RNG), then times two SCATTERED backlogs (which the adaptive rule must
route to the rewrite — their keys bloom-hit every list-clustered file)
and one CONCENTRATED delta (a disjoint appended vec_id range deleted
again — its keys isolate to a minority of files, so the inline
manifest-pruned path runs). Each record carries ``delete_path`` so the
numbers are attributable. Prints one JSON line per scenario plus a
SUMMARY line for SCALE.md.

Usage: python scripts/cdc_sync_backlog_run.py [n_vectors] [dim]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fluss_iceberg_spark.lake.table import LakeCatalog
from fluss_iceberg_spark.operators.ann_index import IvfIndex
from fluss_iceberg_spark.session import get_spark


def synth(spark, n: int, dim: int, salt: int):
    """Deterministic pseudo-embeddings: dim values in [-1, 1) from
    xxhash64(id, k, salt) — different salt = a genuinely new vector."""
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda k: (
            F.pmod(F.xxhash64("id", k, F.lit(salt)), F.lit(2000)).cast("double")
            / F.lit(1000.0)
            - F.lit(1.0)
        ),
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark(app_name="cdc-sync-backlog")
    wh = f"/tmp/cdc_backlog_{uuid.uuid4().hex[:8]}"
    cat = LakeCatalog(spark, wh)
    base = synth(spark, n, dim, salt=1)
    src = cat.create_table(
        "emb", base.schema, primary_key=["vec_id"], n_buckets=16
    )
    t0 = time.perf_counter()
    src.merge(base)
    t_load = time.perf_counter() - t0
    t0 = time.perf_counter()
    idx = IvfIndex(cat, "ix").build(src.read(), n_lists=32, dim=dim)
    t_build = time.perf_counter() - t0
    print(json.dumps({
        "phase": "setup", "n_vectors": n, "dim": dim,
        "load_sec": round(t_load, 1), "build_sec": round(t_build, 1),
        "postings_files": len(idx.postings.plan_scan()),
    }), flush=True)

    results = []
    # Scattered backlogs (updates spread across vec_id space — every
    # postings file bloom-hits): the adaptive rule must route BOTH to
    # the anti-join rewrite, whatever their size. Salts are literal
    # integers so every run generates identical vectors.
    for label, n_changed, salt in (
        ("scattered_80k", 80_000, 2),
        ("scattered_150k", 150_000, 3),
    ):
        v0 = src.current_version()
        upd = synth(spark, n, dim, salt=salt).filter(
            F.col("vec_id") < n_changed
        )
        src.merge(upd)
        files_before = len(idx.postings.plan_scan())
        t0 = time.perf_counter()
        res = idx.sync_from_changelog(src, from_version=v0, dim=dim)
        dt = time.perf_counter() - t0
        rec = {
            "scenario": label,
            "changed_keys": n_changed,
            "sync_sec": round(dt, 1),
            "delete_path": res["delete_path"],
            "deleted": res["deleted"],
            "upserted": res["upserted"],
            "postings_files_before": files_before,
            "postings_files_after": len(idx.postings.plan_scan()),
            "postings_rows": idx.postings.read().count(),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
        assert rec["postings_rows"] == n, rec  # no dup/lost postings
        assert rec["delete_path"] == "rewrite", rec  # scattered → rewrite

    # Concentrated delta: append a fresh disjoint vec_id range (its
    # postings land in new files whose vec_id bounds isolate them), then
    # delete exactly that range — the manifest probe finds the stale
    # keys in a minority of files and the INLINE path runs.
    v0 = src.current_version()
    extra = synth(spark, n + 5_000, dim, salt=4).filter(F.col("vec_id") >= n)
    src.merge(extra)
    idx.sync_from_changelog(src, from_version=v0, dim=dim)
    v1 = src.current_version()
    src.delete(where=[("vec_id", ">=", n)])
    t0 = time.perf_counter()
    res = idx.sync_from_changelog(src, from_version=v1, dim=dim)
    rec = {
        "scenario": "concentrated_5k",
        "changed_keys": 5_000,
        "sync_sec": round(time.perf_counter() - t0, 1),
        "delete_path": res["delete_path"],
        "deleted": res["deleted"],
        "postings_rows": idx.postings.read().count(),
    }
    results.append(rec)
    print(json.dumps(rec), flush=True)
    assert rec["postings_rows"] == n, rec
    assert rec["delete_path"] == "inline", rec  # concentrated → inline

    # the synced index still serves: postings == frozen-model view
    q = src.read().filter(F.col("vec_id") < 4)
    hits = idx.search(q, k=5, n_probe=4, dim=dim).count()
    print("SUMMARY " + json.dumps({
        "n_vectors": n,
        "scattered_80k_sec": results[0]["sync_sec"],
        "scattered_150k_sec": results[1]["sync_sec"],
        "concentrated_inline_sec": results[2]["sync_sec"],
        "paths": [r["delete_path"] for r in results],
        "search_rows_after": hits,
    }), flush=True)
    shutil.rmtree(wh, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
