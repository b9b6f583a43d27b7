"""Admission-control scale demonstration (r6 verdict item 2): run the
streaming near-dup admission workload for enough ticks that the bucket
state crosses the adaptive prune threshold (16 files) and the
manifest-bloom IN-pushdown branch executes in anger; record per-tick
wall time, per-phase attribution, state size, and scanned-vs-total
state files. Prints one JSON line per tick plus a SUMMARY line.

Usage:  python scripts/admission_scale_run.py [n_ticks] [compact_every]
Env:    SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)

``compact_every`` > 0 adds the LSM-style maintenance a long-running
admission stream needs: every N ticks the bucket/owner-set state tables
binpack-compact (sorted by their probe key, so post-compaction files
carry disjoint key ranges AND right-sized blooms) — state file count
then sawtooths around N instead of growing one file per tick forever,
bounding scan-planning work over an unbounded stream. Amortized cost is
the standard LSM write amplification; per-tick admission work stays
O(batch + collisions).
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
from fluss_iceberg_spark.operators import dedup as DD
from fluss_iceberg_spark.session import get_spark
from fluss_iceberg_spark.sources.tpch import load_table


def main() -> None:
    n_ticks = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    compact_every = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="admission-scale")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    wh = f"/tmp/admission_scale_{uuid.uuid4().hex[:8]}"
    cat = LakeCatalog(spark, wh)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.persist().count()
    buckets = cat.create_table(
        "nd_buckets",
        spark.createDataFrame([], "bkey string, owner long").schema,
        properties={"write.bloom-columns": "bkey"},
    )
    owner_sets = cat.create_table(
        "nd_sets",
        spark.createDataFrame([], "doc_id long, shset array<long>, n int").schema,
        properties={"write.bloom-columns": "doc_id"},
    )
    admitted = cat.create_table(
        "nd_admitted",
        spark.createDataFrame([], "doc_id long, batch int").schema,
    )

    ticks = []
    for b in range(n_ticks):
        batch = docs.filter(F.pmod("doc_id", F.lit(n_ticks)) == b)
        profile: dict = {}
        t0 = time.perf_counter()
        n_adm = DD.neardup_admit_batch(
            buckets, owner_sets, admitted, batch, b, profile=profile
        )
        dt = time.perf_counter() - t0
        compact_sec = 0.0
        if compact_every and (b + 1) % compact_every == 0:
            c0 = time.perf_counter()
            buckets.compact(sort_by=["bkey"])
            owner_sets.compact(sort_by=["doc_id"])
            compact_sec = time.perf_counter() - c0
        # diagnostics (outside the timed window): how many state files
        # would THIS tick's key set scan, vs total state files
        state_files = len(buckets.plan_scan())
        probe = DD.band_keys(DD.minhash_signatures(DD.shingle_sets(batch)))
        keys = [r.bkey for r in probe.select("bkey").distinct().collect()]
        scanned = len(buckets.plan_scan(where=[("bkey", "in", keys)]))
        rec = {
            "tick": b,
            "sec": round(dt, 2),
            "compact_sec": round(compact_sec, 2),
            "admitted": n_adm,
            "state_files": state_files,
            "files_probe_would_scan": scanned,
            "pruned_branch": state_files > 16,
            "phases": {k: round(v, 2) for k, v in profile.items()},
        }
        ticks.append(rec)
        print(json.dumps(rec), flush=True)

    pruned = [t["sec"] for t in ticks if t["pruned_branch"]]
    unpruned = [t["sec"] for t in ticks if not t["pruned_branch"]]
    print(
        "SUMMARY "
        + json.dumps(
            {
                "sf_dir": sf_dir,
                "n_ticks": n_ticks,
                "total_admitted": sum(t["admitted"] for t in ticks),
                "mean_sec_unpruned": round(sum(unpruned) / len(unpruned), 2)
                if unpruned
                else None,
                "mean_sec_pruned": round(sum(pruned) / len(pruned), 2)
                if pruned
                else None,
                "last4_sec": [t["sec"] for t in ticks[-4:]],
                "last4_scanned": [
                    t["files_probe_would_scan"] for t in ticks[-4:]
                ],
                "final_state_files": ticks[-1]["state_files"],
            }
        ),
        flush=True,
    )
    docs.unpersist()
    shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    main()
