"""Dump sorted query outputs to JSON for before/after equivalence diffs.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/dump_outputs.py out.json q1 q2 ...
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fluss_iceberg_spark import registry
from fluss_iceberg_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, (list, tuple)):
        return [canon(x) for x in v]
    return v


def main() -> None:
    out_path = sys.argv[1]
    names = sys.argv[2:]
    registry.load_all()
    spark = get_spark(app_name="dump-outputs")
    out = {}
    for name in names:
        df = registry.QUERIES[name](spark, SF_DIR)
        rows = sorted(
            tuple(canon(v) for v in r) for r in (tuple(row) for row in df.collect())
        )
        out[name] = {"cols": df.columns, "rows": [list(r) for r in rows]}
        print(f"dumped {name}: {len(rows)} rows", flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
