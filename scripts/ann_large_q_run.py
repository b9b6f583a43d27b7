"""Large-|Q| ANN search timing (r9, verdict item 7): put a REAL number
on the distributed probe-routing path (``IvfIndex._route_queries`` past
``ROUTE_DRIVER_MAX = 1024`` queries — broadcast centroids + top-n_probe
window as a Spark job) vs the driver numpy loop at the boundary.

Probe-set equality across the two paths is already unit-gated
(tests/test_ann_index.py); what this run records is WALL: the driver
loop is O(|Q|·K) python on one core plus a |Q|-row createDataFrame,
so past the boundary the distributed route must not regress — and at
4-16x the boundary it must scale sub-linearly in |Q| (one scan job,
whole-stage codegen) while a hypothetical unbounded driver loop would
grow linearly and serialize a |Q|-row routing table through the
driver.

Corpus geometry matches the sf1 embeddings fixture scale (default 300k
vectors, dim 16, 32 lists — deterministic from xxhash64 with literal
salts, no RNG). Query sets slice the corpus itself. Each search is
timed to full materialization (count of the top-k result). Prints one
JSON line per scenario plus a SUMMARY line for SCALE.md.

Usage: python scripts/ann_large_q_run.py [n_vectors] [dim]
"""

from __future__ import annotations

import json
import os
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
    xxhash64(id, k, salt) — identical across runs."""
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
    spark = get_spark(app_name="ann-large-q")
    wh = f"/tmp/ann_largeq_{uuid.uuid4().hex[:8]}"
    cat = LakeCatalog(spark, wh)
    base = synth(spark, n, dim, salt=1)

    t0 = time.perf_counter()
    idx = IvfIndex(cat, "ix").build(base, n_lists=32, dim=dim)
    t_build = time.perf_counter() - t0
    print(json.dumps({
        "phase": "setup", "n_vectors": n, "dim": dim, "n_lists": 32,
        "build_sec": round(t_build, 1),
        "route_driver_max": IvfIndex.ROUTE_DRIVER_MAX,
    }), flush=True)

    # warm-up: JVM/codegen caches, postings manifest reads
    idx.search(base.limit(64), k=5, n_probe=4).count()

    results = []
    for n_q in (1024, 1025, 4096, 16384):
        # filter, NOT limit: limit collapses the query side to one
        # partition, which is a harness artifact a real query table
        # doesn't have
        queries = base.filter(F.col("vec_id") < n_q)
        t0 = time.perf_counter()
        rows = idx.search(queries, k=5, n_probe=4).count()
        dt = time.perf_counter() - t0
        path = "driver" if n_q <= IvfIndex.ROUTE_DRIVER_MAX else "distributed"
        rec = {
            "n_queries": n_q, "route_path": path,
            "search_sec": round(dt, 2), "result_rows": rows,
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
        assert rows == n_q * 5, rec  # full top-k for every query

    by_q = {r["n_queries"]: r["search_sec"] for r in results}
    print("SUMMARY " + json.dumps({
        "boundary_ratio_1025_vs_1024": round(by_q[1025] / by_q[1024], 2),
        "growth_16x_queries": round(by_q[16384] / by_q[1024], 2),
        "all": by_q,
    }), flush=True)
    import shutil

    shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    main()
