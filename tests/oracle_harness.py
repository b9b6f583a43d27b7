"""Local re-implementation of the driver's correctness gate.

Runs a registered Spark query and its DuckDB oracle on the same parquet
tables and compares row count, column names, and order-insensitive values.
Stricter than the driver (exact value equality after canonicalization), so
passing here should imply passing CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    """Canonicalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))  # repr: exact shortest round-trip
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, dt.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if hasattr(v, "isoformat"):  # pandas.Timestamp etc.
        return ("ts", v.isoformat())
    return v


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    """Return (ok, message). Column order follows sorted names (like the
    driver); rows compared as order-insensitive multisets."""
    sdf = spark_df
    scols = sorted(sdf.columns)
    srows = [tuple(_canon(r[c]) for c in scols) for r in sdf.collect()]

    dres = con.execute(sql)
    dcols_raw = [d[0] for d in dres.description]
    drows_raw = dres.fetchall()
    dorder = sorted(range(len(dcols_raw)), key=lambda i: dcols_raw[i])
    dcols = [dcols_raw[i] for i in dorder]
    drows = [tuple(_canon(row[i]) for i in dorder) for row in drows_raw]

    if scols != dcols:
        return False, f"columns differ: spark={scols} duck={dcols}"
    if len(srows) != len(drows):
        return False, f"row count differs: spark={len(srows)} duck={len(drows)}"
    if sorted(map(repr, srows)) != sorted(map(repr, drows)):
        sset = sorted(map(repr, srows))
        dset = sorted(map(repr, drows))
        diffs = [(a, b) for a, b in zip(sset, dset) if a != b][:3]
        return False, f"values differ; first diffs: {diffs}"
    return True, f"ok ({len(srows)} rows)"
