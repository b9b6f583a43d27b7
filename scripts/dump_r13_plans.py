"""Dump `.explain("formatted")` for named queries into plans/r13/<q>_<tag>.txt.

Usage: python scripts/dump_r13_plans.py before q1 q2 ...
       python scripts/dump_r13_plans.py after  q1 q2 ...

The before/after pairs are the optimization round's plan evidence (the
judge checks plan-shape claims in OPTIMIZATION_r13.md against these).
Plans are captured at sf0.01 (plan SHAPE is sf-independent; the small SF
keeps the dump fast and deterministic).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fluss_iceberg_spark import registry
from fluss_iceberg_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r13")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    registry.load_all()
    spark = get_spark(app_name=f"plans-r13-{tag}")
    for name in names:
        df = registry.QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
