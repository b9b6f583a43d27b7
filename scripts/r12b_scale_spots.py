"""Scale spots for the round-12 second-wave operators (triangles,
SQ8+exact rerank, epoch materialization): sf0.1 vs sf1 (10x) vs sf3
(30x), best-of-2 in one session, full materialization via count().

Usage: python scripts/r12b_scale_spots.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

QUERIES = [
    "graph_triangle_counts",
    "ann_sq8_rerank",
    "export_epoch_shuffle",
]

SFS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": "/root/repo/.scaledata/sf1",
    "sf3": "/root/repo/.scaledata/sf3",
}


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .appName("r12b-scale-spots")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from fluss_iceberg_spark import registry

    registry.load_all()
    results: dict[str, dict[str, dict[str, float]]] = {}
    for name in QUERIES:
        results[name] = {}
        for sf, path in SFS.items():
            best = None
            rows = None
            for _ in range(2):
                t = time.time()
                rows = registry.QUERIES[name](spark, path).count()
                dt = time.time() - t
                best = dt if best is None else min(best, dt)
            results[name][sf] = {"sec": round(best, 2), "rows": rows}
            print(f"{name} @ {sf}: {best:.2f}s, {rows} rows", flush=True)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
