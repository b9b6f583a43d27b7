"""Build a scaled copy of the driver's sf0.1 fixtures for scale validation.

Replicates /root/testdata/sf0.1 N times (default 10x -> "sf1") into
OUT_DIR, offsetting primary AND foreign keys per replica so join
selectivity, PK cardinality, and group counts all scale with the data
(a pure row-copy would collapse PK-upsert workloads to the original key
space and turn joins into 10x fan-outs). Dimension tables region/nation
are tiny reference data in TPC-H and stay as-is; everything keyed scales.

Usage: python scripts/make_scaled_data.py [factor] [out_dir]
Then:  SPARK_GRAFT_SF_DIR=<out_dir> python bench.py

This is a benchmarking utility only -- correctness oracles still run on
the driver's own fixtures (never synthesized data).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scaledata", "sf1"
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE reps AS SELECT range AS r FROM range({factor})")

    # (table, [(column, offset-source-table)]): each replica r shifts the
    # column by r * (max over the source table's key) so replica key spaces
    # are disjoint but referential integrity is preserved within a replica.
    plans = {
        "region": None,
        "nation": None,
        "supplier": [("s_suppkey", "supplier.s_suppkey")],
        "part": [("p_partkey", "part.p_partkey")],
        "customer": [("c_custkey", "customer.c_custkey")],
        "orders": [("o_orderkey", "orders.o_orderkey"), ("o_custkey", "customer.c_custkey")],
        "lineitem": [
            ("l_orderkey", "orders.o_orderkey"),
            ("l_partkey", "part.p_partkey"),
            ("l_suppkey", "supplier.s_suppkey"),
        ],
        "events": [("event_id", "events.event_id"), ("user_id", "events.user_id")],
        "documents": [("doc_id", "documents.doc_id")],
        "embeddings": [("vec_id", "embeddings.vec_id")],
    }

    maxes: dict[str, int] = {}
    for spec in plans.values():
        for _, src_key in spec or []:
            if src_key not in maxes:
                tbl, col = src_key.split(".")
                maxes[src_key] = con.execute(
                    f"SELECT max({col}) + 1 FROM read_parquet('{SRC}/{tbl}.parquet')"
                ).fetchone()[0]

    for tbl, spec in plans.items():
        src = f"read_parquet('{SRC}/{tbl}.parquet')"
        dst = os.path.join(out, f"{tbl}.parquet")
        if spec is None:
            con.execute(f"COPY (SELECT * FROM {src}) TO '{dst}' (FORMAT PARQUET)")
        else:
            cols = con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()
            types = {name: typ for name, typ, *_ in cols}
            shifted = {c: f"CAST({c} + r * {maxes[sk]} AS {types[c]})" for c, sk in spec}
            sel = ", ".join(
                f"{shifted[name]} AS {name}" if name in shifted else name
                for name, *_ in cols
            )
            con.execute(
                f"COPY (SELECT {sel} FROM {src}, reps) TO '{dst}' "
                f"(FORMAT PARQUET, ROW_GROUP_SIZE 262144)"
            )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"{tbl}: {n} rows -> {dst}", flush=True)


if __name__ == "__main__":
    main()
