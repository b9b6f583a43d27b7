"""Driver-contract simulator: fresh plain SparkSession, registry-order
sweep of queries() vs oracle_sql() via tests/oracle_harness.compare,
plus a gated-window (first 50) output-type audit (no bare DECIMAL /
array / map / struct cells in positions <= 50)."""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = os.environ.get("DRIVER_SIM_SF", "/root/testdata/sf0.01")
ONLY = sys.argv[1:]  # optional query-name filters


def main() -> int:
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("driver-sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from tests.oracle_harness import compare, duck_connection

    t0 = time.time()
    df = entrymod.entry(spark)
    n = df.count()
    print(f"entry(): {n} rows, schema={df.schema.simpleString()[:200]}", flush=True)

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duck_connection(SF_DIR)

    bad_types = ("decimal", "array", "map", "struct")
    failures = []
    no_oracle = []
    for pos, (name, fn) in enumerate(queries.items(), start=1):
        if ONLY and not any(f in name for f in ONLY):
            continue
        t1 = time.time()
        try:
            qdf = fn(spark, SF_DIR)
            if pos <= 50:
                for f in qdf.schema.fields:
                    low = f.dataType.simpleString()
                    if any(low.startswith(b) for b in bad_types):
                        failures.append(
                            (name, f"GATED-TYPE pos={pos} {f.name}:{low}")
                        )
            if name in oracles:
                ok, msg = compare(qdf, con, oracles[name])
                status = "OK" if ok else f"FAIL {msg}"
                if not ok:
                    failures.append((name, msg))
            else:
                cnt = qdf.count()
                status = f"rows-only ({cnt} rows)"
                no_oracle.append(name)
        except Exception as exc:  # noqa: BLE001
            status = f"ERROR {exc}"
            failures.append((name, traceback.format_exc(limit=3)))
        print(f"[{pos:3d}] {name:45s} {time.time() - t1:6.1f}s  {status}",
              flush=True)

    print(f"\nswept {len(queries)} queries in {time.time() - t0:.0f}s "
          f"at {SF_DIR}; {len(no_oracle)} rows-only; "
          f"{len(failures)} FAILURES", flush=True)
    for name, msg in failures:
        print(f"  FAIL {name}: {str(msg)[:300]}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
