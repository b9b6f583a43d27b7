"""Standalone per-query timing: fresh session, noop sink, best-of-N.

Usage: python scripts/standalone_time.py q1 q2 ... [-- runs]
One fresh session for the whole list (bench-comparable warm JVM), each
query best-of-N with cache clear between runs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fluss_iceberg_spark import registry
from fluss_iceberg_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    args = sys.argv[1:]
    runs = 2
    if "--" in args:
        i = args.index("--")
        runs = int(args[i + 1])
        args = args[:i]
    registry.load_all()
    spark = get_spark(app_name="standalone-time")
    spark.read.parquet(f"{SF}/nation.parquet").count()
    out = {}
    for name in args:
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            registry.QUERIES[name](spark, SF).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
        out[name] = round(best, 3)
        print(f"TIMING {name}: {out[name]}", flush=True)
    print("RESULT", out)
    spark.stop()


if __name__ == "__main__":
    main()
