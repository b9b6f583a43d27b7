"""Snapshot-log Parquet table format (Iceberg-equivalent contract).

Layout per table, under a catalog warehouse directory::

    {warehouse}/{table}/
        meta/table.json          # schema DDL, primary key, bucket count, props
        meta/v{N}.json           # snapshot N: operation, file list, counters
        meta/VERSION             # current snapshot pointer (atomic os.replace)
        data/s{N}/...parquet     # files added by snapshot N (immutable)
        hot/batch={B}/...parquet # staged stream batches not yet tiered

Semantics mirrored from the reference:

- **Log table** (no PK): append-only; each commit adds files
  (fluss_order, README.md:141-149).
- **PK table**: MERGE upsert keyed by the primary key — later writes win
  (``PRIMARY KEY ... NOT ENFORCED``, README.md:160,168,199). Implemented
  as *bucketed copy-on-write*: rows are hash-bucketed by PK
  (``pmod(hash(pk), n_buckets)``); a merge rewrites only the buckets that
  contain updated keys and carries the untouched buckets' files forward
  into the new snapshot. At 100 TB this bounds a merge's I/O to
  (table_size / n_buckets) × touched_buckets instead of a full rewrite,
  and reads stay file-pruned per bucket.
- **NOT NULL enforcement = DROP** (sql-client.sql:50): rows with NULLs in
  declared not-null columns are silently dropped at the sink.
- **Snapshot metadata** (``t$snapshots``, README.md:274-275): the
  ``snapshots()`` DataFrame; **time travel** via ``read(version=N)``.
- **Hot∪cold union read** (README.md:296-316): ``write_hot_batch`` stages
  stream micro-batches; ``tier()`` drains staged batches ≤ a new watermark
  into the lake atomically with the snapshot commit; ``union_read()``
  returns lake ∪ still-hot batches. The watermark lives *inside* the
  snapshot json, so the dedup boundary is exactly-once: a batch is visible
  either via the lake (batch ≤ watermark) or via hot (batch > watermark),
  never both (SURVEY §4 "hardest correctness spot").

Commit protocol: data files are written first, then the snapshot json,
then the VERSION pointer flips via ``os.replace`` (atomic on POSIX). This
is single-writer per table — the role a real deployment gives the Iceberg
REST catalog's CAS (docker-compose.yml:126-137); swapping the pointer
flip for a catalog-service CAS is the only change a cluster needs.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
import uuid
import datetime
import decimal
import functools

from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Arrow-path local frames for metadata tables (guide §6): the classic
# list path pickles rows into a 32-partition Python RDD — every read of
# $snapshots/$files/$history then pays Python workers for metadata
from fluss_iceberg_spark.operators.util import arrow_local_df
from pyspark.sql import types as T


class CommitConflictError(RuntimeError):
    """Optimistic-concurrency commit rejection — the role the Iceberg REST
    catalog's compare-and-swap plays (docker-compose.yml:126-137). Raised
    when a commit is based on a stale table version (logical CAS) or when
    a racing writer already claimed the target snapshot file (physical
    CAS via exclusive-create)."""


class CommitStateUnknownError(RuntimeError):
    """A routed commit whose outcome the client could NOT resolve — the
    Iceberg ``CommitStateUnknownException`` role: the staged snapshot
    was already consumed, but neither the pointer nor a published
    snapshot confirms the commit. The caller must NOT blindly retry
    (a retry could double-apply the write); it must inspect the table
    or re-derive the write idempotently."""


def _atomic_write(path: str, payload: str) -> None:
    tmp = f"{path}.{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as f:
        f.write(payload)
    os.replace(tmp, path)


@contextmanager
def _commit_lock(table_path: str):
    """Serialize VERSION-pointer flips across every writer of a catalog
    (the filesystem stand-in for the REST catalog's commit CAS,
    docker-compose.yml:126-137), held across each check→flip. Closes
    the lost-update window between a commit's pointer re-verify and its
    flip — in particular a CatalogTransaction publish racing a
    single-table commit. Cost: pointer flips are tiny metadata writes,
    so serializing them is free at any scale — data writes stay fully
    concurrent.

    Two implementations behind the same seam (lake/coordinator.py):
    a warehouse that wrote ``_catalog.json`` acquires the section from
    the COORDINATOR SERVICE at its endpoint (the REST-catalog topology:
    the catalog process is the serialization point, lease released on
    connection death); otherwise an ``flock`` on a warehouse-level lock
    file (single-host default, released by the OS on process death).
    Either way a crashed holder can never wedge the catalog. The
    table's parent dir IS the warehouse root — ``table_path`` rejects
    path separators in names, so the derivation cannot alias."""
    import fcntl

    lock_dir = os.path.dirname(os.path.abspath(table_path).rstrip(os.sep))
    os.makedirs(lock_dir, exist_ok=True)
    from fluss_iceberg_spark.lake import coordinator

    endpoint = coordinator.endpoint_for(lock_dir)
    if endpoint:
        client = coordinator.CoordinatorClient(endpoint, scope=lock_dir)
        try:
            yield
        finally:
            client.close()
        return
    fd = os.open(os.path.join(lock_dir, "_commit.lock"), os.O_CREAT | os.O_RDWR)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)


def _warehouse_of(table_path: str) -> str:
    """The warehouse root = the table dir's parent (names are validated
    to contain no path separators, so this cannot alias)."""
    return os.path.dirname(os.path.abspath(table_path).rstrip(os.sep))


def _rest_catalog_endpoint(warehouse: str) -> str | None:
    """The REST catalog facade a warehouse routes its pointer commits
    through (``_catalog.json`` key "rest-catalog"), or None (direct
    filesystem CAS under the commit lock)."""
    try:
        with open(os.path.join(warehouse, "_catalog.json")) as f:
            return json.load(f).get("rest-catalog") or None
    except (OSError, ValueError):
        return None


def _exclusive_write(path: str, payload: str) -> None:
    """Write ``payload`` to ``path`` all-or-nothing, failing with
    CommitConflictError if ``path`` already exists. The payload is written
    to a temp file first, then linked into place — ``os.link`` is atomic
    and fails on an existing target, so a racing same-version writer loses
    the race instead of silently overwriting, and a crash mid-write can
    never leave a partial snapshot visible."""
    tmp = f"{path}.{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as f:
        f.write(payload)
    try:
        os.link(tmp, path)
    except FileExistsError:
        raise CommitConflictError(
            f"concurrent writer already committed {os.path.basename(path)}"
        ) from None
    finally:
        os.unlink(tmp)


def _list_parquet(d: str) -> list[str]:
    if not os.path.isdir(d):
        return []
    return sorted(
        os.path.join(d, f)
        for f in os.listdir(d)
        if f.endswith(".parquet") and not f.startswith("_")
    )


def _stat_encode(v):
    """Encode a parquet-footer min/max value as a JSON-safe tagged value.
    Dates/timestamps become ISO strings (lexicographic == chronological),
    decimals keep their exact digits as strings. Unsupported types (bytes,
    nested) encode as None = "no stat", which pruning treats as
    "may contain anything"."""
    if isinstance(v, bool):
        return None
    if isinstance(v, (int, float, str)):
        return v
    if isinstance(v, decimal.Decimal):
        return {"d": str(v)}
    if isinstance(v, (datetime.datetime, datetime.date)):
        return {"t": v.isoformat()}
    return None


def _stat_decode(v):
    """Decode to a Python value comparable against a user literal run
    through ``_stat_canon``."""
    if isinstance(v, dict):
        return decimal.Decimal(v["d"]) if "d" in v else v["t"]
    return v


def _stat_canon(lit):
    """Canonicalize a predicate literal into the ``_stat_decode`` domain."""
    if isinstance(lit, (datetime.datetime, datetime.date)):
        return lit.isoformat()
    return lit


def _file_column_stats(abspath: str) -> dict:
    """Per-file metadata from the parquet footer: row count, byte size, and
    per-column [min, max] aggregated across row groups — the record an
    Iceberg manifest entry carries (lower_bounds/upper_bounds). Reading is
    footer-only (O(KB) per file, no data pages). On a cluster the writer
    tasks would report these with the commit message; the stand-in reads
    the footer at commit time, which is still O(#new files) metadata I/O.
    parquet-mr truncates long binary stats but keeps them valid bounds, so
    pruning against them stays conservative."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(abspath).metadata
    cols = [md.schema.column(i) for i in range(md.num_columns)]
    names = [c.name for c in cols]
    # pyarrow can't logically cast DECIMAL stats (raises); decode the raw
    # unscaled representation (INT64 or big-endian FLBA) ourselves
    dec_scale = {
        c.name: c.scale for c in cols if c.logical_type.type == "DECIMAL"
    }

    def _decode_raw_decimal(raw, scale: int) -> decimal.Decimal:
        unscaled = (
            int.from_bytes(raw, "big", signed=True) if isinstance(raw, bytes) else raw
        )
        return decimal.Decimal(unscaled).scaleb(-scale)

    mins: dict = {}
    maxs: dict = {}
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        for i, name in enumerate(names):
            try:
                st = rg.column(i).statistics
                if st is None or not st.has_min_max:
                    raise ValueError("no stats")
                if name in dec_scale:
                    lo = _stat_encode(_decode_raw_decimal(st.min_raw, dec_scale[name]))
                    hi = _stat_encode(_decode_raw_decimal(st.max_raw, dec_scale[name]))
                else:
                    lo, hi = _stat_encode(st.min), _stat_encode(st.max)
            except Exception:  # stats not extractable for this physical type
                mins[name] = maxs[name] = None
                continue
            if lo is None or hi is None or name in mins and mins[name] is None:
                mins[name] = maxs[name] = None
                continue
            if name not in mins:
                mins[name], maxs[name] = lo, hi
            else:
                mins[name] = min(mins[name], lo, key=_stat_decode_key)
                maxs[name] = max(maxs[name], hi, key=_stat_decode_key)
    stats = {
        n: [mins[n], maxs[n]] for n in names if mins.get(n) is not None
    }
    return {
        "rows": md.num_rows,
        "bytes": os.path.getsize(abspath),
        "stats": stats,
    }


def _stat_decode_key(v):
    return _stat_decode(v)


_VALUE_SET_CAP = 64


def _file_value_sets(abspath: str, cols: list[str], cap: int = _VALUE_SET_CAP) -> dict:
    """Per-file distinct-value sets for declared low-cardinality STRING
    or INTEGER columns (table property ``write.value-set-columns``) —
    the pruning complement to min/max bounds. Lexicographic [min,max]
    ranges over codes like src1/src10/src2 span nearly the whole domain,
    and hash-scattered integer ids (an IVF index's list_id after a hash
    repartition) span it numerically — equality predicates can't prune
    on bounds; the exact value set can. Columns exceeding ``cap``
    distincts record no set (falls back to bounds). Integer sets store
    native JSON ints; the probe side compares in the int domain (a
    string literal never matches an int set, and vice versa). Mirrors
    what a writer task would report alongside its footer stats on a
    cluster; the stand-in reads just the listed columns of each NEW file
    at commit time (column-pruned, dictionary-encoded — O(file's
    distinct values), not a data scan of the table)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import pyarrow.types as pat

    sch = pq.read_schema(abspath)
    want = [
        c for c in cols
        if c in sch.names
        and (sch.field(c).type == "string"
             or sch.field(c).type == "large_string"
             or pat.is_integer(sch.field(c).type))
    ]
    if not want:
        return {}
    tbl = pq.read_table(abspath, columns=want)
    out = {}
    for c in want:
        uniq = pc.unique(tbl.column(c).combine_chunks()).drop_null().to_pylist()
        if 0 < len(uniq) <= cap:
            out[c] = sorted(uniq)
    return out


_BLOOM_BITS = 2048   # 256 B/column/file in the manifest — negligible
_BLOOM_K = 4         # legacy hash count (r6 manifests; kept for reads)
# v2 bloom parameters, sized for IN-LIST probing: a micro-batch state
# probe tests THOUSANDS of keys per file, so the per-key FPR must be
# << 1/|probe| or false positives keep every file (measured: at 10
# bits/key + k=4 a 3,300-key probe kept 97% of state files — the probe
# pruned nothing). At 32 bits/key + k=20 the per-key FPR is ~2e-7, so
# even a 10k-key probe keeps a non-colliding file with p < 1%. Probe
# cost stays O(1) per miss (the all() early-exits after ~2 bit tests at
# 0.46 fill); write cost is 20 cheap double-hash positions per value.
_BLOOM_BITS_PER_VALUE = 32
_BLOOM_K_V2 = 20


def _bloom_canon(value) -> str | None:
    """Canonical hash input for a bloomable value. Strings and integers
    only: their textual form is identical on the write side (pyarrow
    python values) and the predicate side (SQL literal), so both hash
    alike. Floats/timestamps are excluded — representation drift between
    writer and predicate would silently break membership."""
    if isinstance(value, str):
        return value
    if isinstance(value, int) and not isinstance(value, bool):
        return str(value)
    return None


def _bloom_positions(value, m: int = _BLOOM_BITS, k: int = _BLOOM_K):
    """k bit positions via Kirsch–Mitzenmacher double hashing over one
    blake2b digest (deterministic across processes — unlike hash()).
    Memoized on (canonical value, m, k): IN-list pruning re-tests every
    probe key against EVERY candidate file's bloom, and re-digesting
    per (file × member) pair would serialize millions of driver-side
    hashes per planning call."""
    s = _bloom_canon(value)
    if s is None:
        return None
    return list(_bloom_positions_cached(s, m, k))


@functools.lru_cache(maxsize=1 << 17)
def _bloom_positions_cached(s: str, m: int, k: int) -> tuple:
    import hashlib

    d = hashlib.blake2b(s.encode("utf-8"), digest_size=16).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1
    return tuple((h1 + i * h2) % m for i in range(k))


def _file_blooms(abspath: str, cols: list[str]) -> dict:
    """Per-file bloom filters for declared HIGH-cardinality columns
    (table property ``write.bloom-columns``) — equality pruning where
    both min/max bounds (wide lexicographic ranges) and value sets
    (capped at {cap} distincts) give up. This is Iceberg/Parquet's
    bloom-filter role (write.parquet.bloom-filter-enabled.column.*):
    a writer task computes it alongside footer stats; the stand-in
    reads just the listed columns of each NEW file at commit time.
    Stored as a hex bitmap; absence of the value's k bits PROVES the
    file holds no matching row (false positives only cost a read).
    """.format(cap=_VALUE_SET_CAP)
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import pyarrow.types as pat

    sch = pq.read_schema(abspath)
    want = [
        c for c in cols
        if c in sch.names
        and (pat.is_string(sch.field(c).type)
             or pat.is_large_string(sch.field(c).type)
             or pat.is_integer(sch.field(c).type))
    ]
    if not want:
        return {}
    tbl = pq.read_table(abspath, columns=want)
    out = {}
    for c in want:
        uniq = pc.unique(tbl.column(c).combine_chunks()).drop_null().to_pylist()
        # size the filter to the file's actual distinct count at
        # _BLOOM_BITS_PER_VALUE (IN-probe-grade FPR — see the constant's
        # note): a fixed 2048-bit filter saturates (all-ones, prunes
        # nothing) on files with thousands of distincts — e.g. LSH
        # bucket-state files at 16 keys/doc. Cap at 2^21 bits = 256 KB
        # of hex worst-case in the manifest per file/column (full
        # strength to ~65k distincts; beyond that the filter degrades
        # gracefully toward keep-everything rather than bloating every
        # snapshot read — files that large should be clustered or
        # served from the hot store anyway).
        m = _BLOOM_BITS
        while m < _BLOOM_BITS_PER_VALUE * len(uniq) and m < (1 << 21):
            m *= 2
        # accumulate in a bytearray: setting a bit in a Python big int
        # copies the whole integer (O(m) per bit — tens of GB of memcpy
        # for a 2^20-bit filter over a 60k-distinct state file); the
        # bytearray write is O(1) per bit, one big-int conversion at end
        buf = bytearray(m // 8)
        for v in uniq:
            pos = _bloom_positions(v, m=m, k=_BLOOM_K_V2)
            if pos is None:
                buf = None
                break
            for p in pos:
                buf[p >> 3] |= 1 << (p & 7)
        bits = int.from_bytes(bytes(buf), "little") if buf is not None else None
        if bits:
            # manifest forms, all readable: bare hex (r5: m=2048, k=4),
            # {m, bits} (r6: adaptive m, k=4), {m, k, bits} (current)
            out[c] = {"m": m, "k": _BLOOM_K_V2, "bits": f"{bits:x}"}
    return out


@functools.lru_cache(maxsize=64)
def _bloom_hex_cached(bloom_hex: str) -> bytes:
    """Parse a manifest bloom bitmap once per distinct filter, as
    little-endian bytes. An IN-list probe calls ``_file_may_match`` once
    per (file × member); re-parsing a 2^20-bit filter's ~262K-char hex
    per member is O(keys × m) driver time where O(keys + m) is
    available — and even on a parsed big int, ``(bits >> p) & 1`` copies
    O(p) words per test, so membership reads index bytes instead.
    CPython memoizes str hashes, so cache hits cost O(1) after a
    string's first lookup. maxsize bounds driver memory, not hit rate:
    an adaptive 2^20-bit filter pins ~131KB of parsed bytes plus its
    ~262KB hex key per entry, so 64 entries cap the cache at ~25MB
    (1024 would allow ~400MB); a probe touches one bloom per
    (file, column), so 64 covers any realistic per-query working set."""
    v = int(bloom_hex, 16)
    return v.to_bytes((v.bit_length() + 7) // 8, "little")


def _file_may_match(meta: dict | None, col: str, op: str, lit) -> bool:
    """Conservative file-skip test: False only when the footer min/max
    range PROVES no row can satisfy ``col op lit``. Files with no stats
    for the column (all-null, unsupported type, pre-stats snapshot) are
    kept. NULL rows never satisfy a comparison predicate, so ignoring
    them (as parquet stats do) is sound. ``op == "in"`` (iterable
    literal) keeps the file iff ANY member may match — the IN-list
    pushdown an LSH bucket-state probe needs."""
    if op == "in":
        return any(_file_may_match(meta, col, "=", v) for v in lit)
    vset = (meta or {}).get("value_sets", {}).get(col)
    if (
        vset is not None
        and op == "="
        and isinstance(lit, (str, int))
        and not isinstance(lit, bool)
    ):
        # exact membership beats range bounds; compare in the set's own
        # domain (JSON round-trips str and int losslessly, never mixes)
        if lit in vset:
            return True
        # a miss is definitive only when the literal lives in the set's
        # domain: Spark's row filter cast-coerces a type-mismatched
        # literal ('5' vs an int column) and can still match rows the
        # typed membership test rejects — fall through to bounds/bloom
        # (keep-conservative) then. One element decides: a set built
        # from a single parquet column is type-homogeneous. An empty
        # set (all-null file) stays definitive — NULL never compares.
        if not vset or type(next(iter(vset))) is type(lit):
            return False
    bloom = (meta or {}).get("blooms", {}).get(col)
    if bloom is not None and op == "=":
        if isinstance(bloom, dict):  # adaptive-size form
            # k absent = r6 vintage (k=4); present = current (k=20)
            m, k, bloom_hex = (
                int(bloom["m"]), int(bloom.get("k", _BLOOM_K)), bloom["bits"]
            )
        else:  # legacy bare-hex form
            m, k, bloom_hex = _BLOOM_BITS, _BLOOM_K, bloom
        pos = _bloom_positions(lit, m=m, k=k)
        if pos is not None:
            buf = _bloom_hex_cached(bloom_hex)
            if not all(
                p >> 3 < len(buf) and buf[p >> 3] & (1 << (p & 7))
                for p in pos
            ):
                return False  # definitive: value not in this file
            # bloom says "maybe" — bounds below may still prune
    stats = (meta or {}).get("stats", {}).get(col)
    if not stats:
        return True
    lo, hi = _stat_decode(stats[0]), _stat_decode(stats[1])
    v = _stat_canon(lit)
    try:
        if _bounds_may_match(lo, hi, v, op):
            return True
    except TypeError:
        return True  # incomparable literal/stat types — never prune
    # Mixed numeric representations (float literal vs decimal bounds or
    # vice versa): Python compares them EXACTLY, but the engines compare
    # after casting decimal→double. Re-check in the double domain so
    # boundary values stay conservative under BOTH semantics.
    numeric = (int, float, decimal.Decimal)
    if isinstance(v, numeric) and isinstance(lo, numeric):
        try:
            return _bounds_may_match(float(lo), float(hi), float(v), op)
        except (TypeError, OverflowError):
            return True
    return False


def _bounds_may_match(lo, hi, v, op: str) -> bool:
    if op == "=":
        return bool(lo <= v <= hi)
    if op == "<":
        return bool(lo < v)
    if op == "<=":
        return bool(lo <= v)
    if op == ">":
        return bool(hi > v)
    if op == ">=":
        return bool(hi >= v)
    raise ValueError(f"unsupported scan predicate op: {op!r}")


# ---------- hidden partitioning (the Iceberg partition-spec role) ----------
#
# A partition spec is a list of {"name", "col", "transform"} entries stored
# in table.json. Transforms are Iceberg's time transforms plus identity:
# identity | years | months | days | hours. Like Iceberg (and unlike Hive),
# partitioning is HIDDEN: the source column stays in the data files — the
# derived value only names the directory and is recorded per-file in the
# manifest, so queries filter on the source column and pruning happens
# from metadata without the user ever referencing a partition column.

_PARTITION_SPEC_RE = re.compile(
    r"^(?:(year|years|month|months|day|days|hour|hours)\s*\(\s*`?(\w+)`?\s*\)|`?(\w+)`?)$",
    re.I,
)

_TRANSFORM_CANON = {
    "year": "years", "years": "years",
    "month": "months", "months": "months",
    "day": "days", "days": "days",
    "hour": "hours", "hours": "hours",
}


def parse_partition_spec(specs: list[str], schema: T.StructType) -> list[dict]:
    """``["days(ts)", "region"]`` → canonical spec entries. Partition
    names follow Iceberg's convention (``ts_day``, ``region``)."""
    out = []
    for s in specs:
        m = _PARTITION_SPEC_RE.match(s.strip())
        if not m:
            raise ValueError(f"bad partition spec {s!r}")
        if m.group(3):
            col, transform = m.group(3), "identity"
            pname = col
        else:
            transform = _TRANSFORM_CANON[m.group(1).lower()]
            col = m.group(2)
            pname = f"{col}_{transform[:-1]}"  # ts_day, ts_month, ...
        if col not in schema.fieldNames():
            raise ValueError(f"partition spec {s!r}: unknown column {col!r}")
        if transform != "identity" and not isinstance(
            schema[col].dataType, (T.TimestampType, T.TimestampNTZType, T.DateType)
        ):
            raise ValueError(
                f"partition spec {s!r}: {transform}() needs a timestamp/date "
                f"column, got {schema[col].dataType.simpleString()}"
            )
        out.append({"name": pname, "col": col, "transform": transform})
    return out


def _partition_expr(p: dict) -> F.Column:
    """The derived directory-value column for one spec entry. All
    transforms are monotonic in the source column, which is what makes
    range predicates prunable at transform granularity."""
    c = F.col(p["col"])
    t = p["transform"]
    if t == "identity":
        return c
    if t == "years":
        return F.year(c)
    if t == "months":
        return F.date_format(c, "yyyy-MM")
    if t == "days":
        return F.to_date(c).cast("string")
    return F.date_format(c, "yyyy-MM-dd-HH")  # hours


def _partition_canon(p: dict, lit):
    """Map a predicate literal into the same domain ``_partition_expr``
    writes, so file partition values compare correctly against it.
    Returns None when the literal can't be mapped (→ no pruning)."""
    t = p["transform"]
    if t == "identity":
        # date partition dirs are written as ISO strings
        if isinstance(lit, datetime.date) and not isinstance(lit, datetime.datetime):
            return lit.isoformat()
        return lit
    if isinstance(lit, str):
        try:
            lit = datetime.datetime.fromisoformat(lit)
        except ValueError:
            return None
    if isinstance(lit, datetime.datetime):
        dt = lit
    elif isinstance(lit, datetime.date):
        dt = datetime.datetime(lit.year, lit.month, lit.day)
    else:
        return None
    if t == "years":
        return dt.year
    if t == "months":
        return f"{dt.year:04d}-{dt.month:02d}"
    if t == "days":
        return dt.date().isoformat()
    return f"{dt.year:04d}-{dt.month:02d}-{dt.day:02d}-{dt.hour:02d}"  # hours


def _parse_partition_path_value(raw: str):
    """Decode one ``name=value`` directory component value the way Spark
    wrote it (URL-escaped; __HIVE_DEFAULT_PARTITION__ for null)."""
    import urllib.parse

    v = urllib.parse.unquote(raw)
    if v == "__HIVE_DEFAULT_PARTITION__":
        return None
    try:
        return int(v)
    except ValueError:
        return v


def _partition_may_match(pvals: dict | None, spec: list[dict], col: str, op: str, lit) -> bool:
    """Conservative partition pruning: False only when the file's
    recorded partition value PROVES no row satisfies ``col op lit``.
    Sound because every transform is monotonic: x < lit ⟹
    t(x) <= t(lit), x > lit ⟹ t(x) >= t(lit), x = lit ⟹ t(x) = t(lit)."""
    if not pvals:
        return True
    if op == "in":
        return any(_partition_may_match(pvals, spec, col, "=", v) for v in lit)
    for p in spec:
        if p["col"] != col or p["name"] not in pvals:
            continue
        pv = pvals[p["name"]]
        if pv is None:  # null partition: comparison predicates never match
            return False
        tl = _partition_canon(p, lit)
        if tl is None or type(pv) is not type(tl):
            continue  # un-mappable literal — leave pruning to footer stats
        if op == "=" and pv != tl:
            return False
        if op in ("<", "<=") and pv > tl:
            return False
        if op in (">", ">=") and pv < tl:
            return False
    return True


_FILE_SEQ_RE = re.compile(r"data/s(\d+)/")


def _file_seq(relpath: str) -> int:
    """Write-sequence of a data file = the snapshot id in its path
    (data/s{N}/...) — the Iceberg data-sequence-number role that scopes
    equality deletes to files written BEFORE the delete."""
    m = _FILE_SEQ_RE.match(relpath)
    return int(m.group(1)) if m else -1


def _bucket_of_path(relpath: str) -> int | None:
    for part in relpath.split(os.sep):
        if part.startswith("__bucket="):
            return int(part.split("=", 1)[1])
    return None


def _where_filter(where: list[tuple]) -> F.Column:
    """The Spark filter for a scan predicate — always applied to the
    scanned rows, so results are independent of how well pruning did."""
    cond = None
    for col, op, lit in where:
        c = F.col(col)
        if op == "in":
            e = c.isin(list(lit))
        else:
            e = {
                "=": c == F.lit(lit),
                "<": c < F.lit(lit),
                "<=": c <= F.lit(lit),
                ">": c > F.lit(lit),
                ">=": c >= F.lit(lit),
            }[op]
        cond = e if cond is None else cond & e
    return cond


@dataclass
class Snapshot:
    snapshot_id: int
    committed_at_ms: int
    operation: str  # append | merge | overwrite | tier
    files: list[str]  # table-relative data file paths
    total_rows: int
    added_rows: int
    hot_watermark: int  # highest hot batch id tiered into this snapshot
    summary: dict
    # per-file {"rows", "bytes", "stats": {col: [min, max]}} — the
    # manifest-entry record backing file skipping and the $files table
    file_meta: dict = field(default_factory=dict)
    # schema at commit time (StructType.jsonValue) + {name: field_id} —
    # what makes time travel read each snapshot under ITS schema after
    # later RENAME/DROP COLUMN evolution (Iceberg's schema-id role).
    # None on legacy snapshots → reads fall back to the current schema.
    schema_json: dict | None = None
    field_ids: dict | None = None
    # merge-on-read position deletes (the Iceberg v2 delete-file role):
    # table-relative paths of parquet files holding (__file, __pos)
    # tombstones, plus per-delete-file metadata
    # {"rows": n, "files": {data_relpath: n_positions}} so live-row
    # accounting and pruning stay metadata-only. Entries referencing a
    # data file absent from ``files`` are inert (the file was rewritten
    # or dropped), which is what lets delete files carry forward
    # unchanged across copy-on-write commits.
    delete_files: list = field(default_factory=list)
    delete_meta: dict = field(default_factory=dict)
    # id of the snapshot this one chained from (-1 = first commit on an
    # empty table, None = legacy snapshot written before lineage existed).
    # What makes fast_forward's ancestry check possible (Iceberg's
    # parent-snapshot-id role).
    parent_id: int | None = None

    def to_json(self) -> str:
        return json.dumps(self.__dict__)

    @staticmethod
    def from_json(s: str) -> "Snapshot":
        d = json.loads(s)
        d.setdefault("file_meta", {})
        d.setdefault("schema_json", None)
        d.setdefault("field_ids", None)
        d.setdefault("delete_files", [])
        d.setdefault("delete_meta", {})
        d.setdefault("parent_id", None)
        return Snapshot(**d)

    def active_delete_count(self, files: list[str] | None = None) -> int:
        """Number of tombstoned rows hidden by delete files still active
        against files present in this snapshot (or the given list) —
        metadata-only. Position deletes count per referenced file;
        equality deletes count their per-bucket exact hide counts while
        that bucket still holds any file older than the delete's
        sequence (a bucket rewrite materializes them, making the entry
        inert there)."""
        present = set(self.files if files is None else files)
        total = 0
        for d in self.delete_files:
            meta = self.delete_meta.get(d) or {}
            if meta.get("kind") == "equality":
                seq = meta.get("seq", -1)
                live_buckets = {
                    str(_bucket_of_path(f))
                    for f in present
                    if _file_seq(f) < seq
                }
                total += sum(
                    n
                    for b, n in meta.get("hides", {}).items()
                    if b in live_buckets
                )
            else:
                total += sum(
                    n
                    for f, n in meta.get("files", {}).items()
                    if f in present
                )
        return total


class LakeTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        with open(os.path.join(path, "meta", "table.json")) as f:
            meta = json.load(f)
        self.name: str = meta["name"]
        self.schema: T.StructType = T.StructType.fromJson(meta["schema"])
        self.primary_key: list[str] = meta.get("primary_key") or []
        self.n_buckets: int = meta.get("n_buckets", 16)
        self.not_null: list[str] = meta.get("not_null") or []
        self.partition_spec: list[dict] = meta.get("partition_spec") or []
        self.properties: dict = meta.get("properties") or {}
        self.constraints: dict[str, str] = meta.get("constraints") or {}
        # Stable field ids (the Iceberg schema-evolution backbone): names
        # are labels over permanent ids, so RENAME is metadata-only and
        # old files resolve by the names they were written under.
        # Lazily initialized for legacy tables; persisted on first change.
        self.field_ids: dict[str, int] = meta.get("field_ids") or {
            f: i for i, f in enumerate(self.schema.fieldNames())
        }
        self.name_log: dict[str, list[str]] = meta.get("name_log") or {
            str(i): [f] for f, i in self.field_ids.items()
        }
        self.retired_names: list[str] = meta.get("retired_names") or []
        self.next_field_id: int = meta.get(
            "next_field_id", max(self.field_ids.values(), default=-1) + 1
        )
        # state the next _commit() folds into its atomic snapshot write
        self._pending_commit_extra: dict | None = None
        # when set (on_branch), snapshot()/commits target this branch ref
        self.write_branch: str | None = None
        # when set (CatalogTransaction.table), commits stage instead of
        # publishing — the transaction flips all VERSION pointers at once
        self._txn: "CatalogTransaction | None" = None

    # ---------- snapshot log ----------

    def _meta(self, *parts: str) -> str:
        return os.path.join(self.path, "meta", *parts)

    def current_version(self) -> int:
        vf = self._meta("VERSION")
        if not os.path.exists(vf):
            return -1
        with open(vf) as f:
            return int(f.read().strip())

    def _head(self) -> int:
        """The snapshot id the table's active ref points at: the branch
        head inside ``on_branch``, else main's VERSION pointer."""
        if self.write_branch:
            return self._refs()["branches"].get(self.write_branch, -1)
        if self._txn is not None:
            staged = self._txn.staged_version(self)
            if staged is not None:
                return staged  # read-your-own-writes inside the txn
        return self.current_version()

    def _next_version(self) -> int:
        """Next snapshot id: ids are unique across ALL refs (branch
        commits interleave with main's), so the next id clears every
        existing snapshot file, not just the active ref's head — plus
        this transaction's own staged (not yet visible) snapshots, plus
        any rest-v{N}.json a crashed facade-routed commit left behind
        (invisible to readers but holding its exclusive-create name; a
        successor must skip past it like any other orphan debris)."""
        staged = self._txn.staged_all(self) if self._txn is not None else ()
        rest_staged = -1
        meta_dir = self._meta()
        if os.path.isdir(meta_dir):
            for f in os.listdir(meta_dir):
                if f.startswith("rest-v") and f.endswith(".json"):
                    try:
                        rest_staged = max(rest_staged, int(f[6:-5]))
                    except ValueError:
                        continue
        return max(self.current_version(),
                   max(self.snapshot_versions(), default=-1),
                   max(staged, default=-1), rest_staged) + 1

    def snapshot(self, version: int | str | None = None) -> Snapshot | None:
        v = self._head() if version is None else version
        if isinstance(v, str):
            v = self.resolve_ref(v)
        if v < 0:
            return None
        # read-your-own-writes inside a transaction: this session's
        # staged (unpublished) snapshots live under txn-v{N}.json. The
        # staged name must resolve FIRST — a concurrent non-txn writer
        # can independently claim the same PUBLIC version number
        # (staged ids are invisible to its _next_version), and the txn
        # must keep reading its own stage, not the foreign snapshot
        # (the publish-time exclusive link arbitrates the collision).
        if self._txn is not None and v in self._txn.staged_all(self):
            with open(self._meta(f"txn-v{v}.json")) as f:
                return Snapshot.from_json(f.read())
        try:
            with open(self._meta(f"v{v}.json")) as f:
                return Snapshot.from_json(f.read())
        except FileNotFoundError:
            raise ValueError(
                f"snapshot {v} does not exist (expired or never committed); "
                f"retained: {self.snapshot_versions()}"
            ) from None

    def snapshot_versions(self) -> list[int]:
        """Versions whose snapshot metadata still exists (expiry leaves
        holes below the newest retained version)."""
        out = []
        meta_dir = self._meta()
        if os.path.isdir(meta_dir):
            for f in os.listdir(meta_dir):
                if f.startswith("v") and f.endswith(".json"):
                    out.append(int(f[1:-5]))
        return sorted(out)

    # ---------- named refs (Iceberg tag role) ----------

    def _refs(self) -> dict:
        p = self._meta("refs.json")
        if not os.path.exists(p):
            return {"tags": {}, "branches": {}}
        with open(p) as f:
            d = json.load(f)
        return {
            "tags": {k: int(v) for k, v in d.get("tags", {}).items()},
            "branches": {k: int(v) for k, v in d.get("branches", {}).items()},
        }

    def _write_refs(self, refs: dict) -> None:
        _atomic_write(self._meta("refs.json"), json.dumps(refs))

    def tags(self) -> dict[str, int]:
        """Named immutable snapshot refs (the Iceberg tag role). Stored
        in meta/refs.json; tagged snapshots are exempt from expiry."""
        return self._refs()["tags"]

    def create_tag(self, name: str, version: int | None = None) -> int:
        """Tag a snapshot version (default: current). Tags are immutable:
        re-tagging an existing name raises; drop_tag first."""
        v = self.current_version() if version is None else version
        if self.snapshot(v) is None:
            raise ValueError(f"{self.name}: cannot tag nonexistent snapshot v{v}")
        refs = self._refs()
        if name in refs["tags"]:
            raise ValueError(
                f"{self.name}: tag {name!r} already exists (at v{refs['tags'][name]})"
            )
        if name in refs["branches"]:
            raise ValueError(f"{self.name}: {name!r} is already a branch")
        refs["tags"][name] = v
        self._write_refs(refs)
        return v

    def drop_tag(self, name: str) -> None:
        refs = self._refs()
        refs["tags"].pop(name, None)
        self._write_refs(refs)

    def resolve_ref(self, ref: str) -> int:
        """Resolve a named ref: tags first, then branch heads."""
        refs = self._refs()
        if ref in refs["tags"]:
            return refs["tags"][ref]
        if ref in refs["branches"]:
            return refs["branches"][ref]
        raise ValueError(
            f"{self.name}: unknown ref {ref!r}; tags: {sorted(refs['tags'])}, "
            f"branches: {sorted(refs['branches'])}"
        )

    # ---------- branch refs (Iceberg branch / WAP role) ----------

    def branches(self) -> dict[str, int]:
        """Named MUTABLE snapshot refs (the Iceberg branch role): each
        maps to its head snapshot id; branch commits advance the ref,
        not the table's main VERSION pointer."""
        return self._refs()["branches"]

    def create_branch(self, name: str, version: int | None = None) -> int:
        """Branch from a snapshot (default: current main head). The
        write-audit-publish pattern (Iceberg's spark.wap.branch):
        ``on_branch(name)`` writes land on the branch, readers of main
        see nothing until ``fast_forward(name)`` publishes it."""
        refs = self._refs()
        if name in refs["branches"]:
            raise ValueError(f"{self.name}: branch {name!r} already exists")
        if name in refs["tags"]:
            raise ValueError(f"{self.name}: {name!r} is already a tag")
        v = self.current_version() if version is None else version
        if v >= 0 and self.snapshot(v) is None:
            raise ValueError(f"{self.name}: cannot branch from nonexistent v{v}")
        refs["branches"][name] = v
        self._write_refs(refs)
        return v

    def drop_branch(self, name: str) -> None:
        refs = self._refs()
        refs["branches"].pop(name, None)
        self._write_refs(refs)

    @contextmanager
    def on_branch(self, name: str):
        """Scope reads AND writes to a branch: ``snapshot()`` resolves
        the branch head, so read()/append()/merge() inside the block see
        and advance the branch while main stays untouched."""
        if name not in self._refs()["branches"]:
            raise ValueError(f"{self.name}: unknown branch {name!r}")
        prev = self.write_branch
        self.write_branch = name
        try:
            yield self
        finally:
            self.write_branch = prev

    def fast_forward(self, branch: str) -> int:
        """Publish a branch: flip main's VERSION pointer to the branch
        head (the WAP 'publish' step). Fast-forward only — main's current
        head must be an ANCESTOR of the branch head. Comparing ids alone
        is not enough: ids are global across refs, so a branch commit can
        outnumber a main commit it never saw, and an id-only publish
        would silently discard those main rows (Iceberg's fast_forward
        makes the same ancestry check)."""
        heads = self._refs()["branches"]
        if branch not in heads:
            raise ValueError(f"{self.name}: unknown branch {branch!r}")
        head = heads[branch]

        def _descends_from(cur: int) -> bool:
            v = head
            while True:
                if v == cur:
                    return True
                if v < 0:
                    return False  # reached the empty-table root
                try:
                    s = self.snapshot(v)
                except ValueError:
                    return False  # chain expired mid-walk: unverifiable
                if s.parent_id is None:
                    # pre-lineage snapshot mid-walk: descent is
                    # UNVERIFIABLE — id ordering is not ancestry (ids
                    # are global across refs, a diverged branch can
                    # outnumber main commits it never saw), so refuse
                    # rather than risk silently discarding main rows
                    return False
                v = s.parent_id

        # walk the (possibly long) ancestry chain OUTSIDE the commit
        # lock — the lock serializes tiny pointer flips, not O(history)
        # metadata walks. Re-verify under the lock only if main moved
        # between the walk and the flip (rare; the re-walk is then the
        # price of the race, not of every publish).
        cur0 = self.current_version()
        if head == cur0:
            return head
        verified = _descends_from(cur0)
        with _commit_lock(self.path):
            cur = self.current_version()
            if head == cur:
                return head
            if cur != cur0:
                verified = _descends_from(cur)
            if not verified:
                raise ValueError(
                    f"{self.name}: branch {branch!r} head v{head} does not "
                    f"descend from main v{cur} — main advanced since the "
                    "branch point (or the chain predates lineage "
                    "tracking); not a fast-forward (re-branch and replay)"
                )
            _atomic_write(self._meta("VERSION"), str(head))
        return head

    def version_as_of_timestamp(self, ts_ms: int) -> int:
        """Resolve ``TIMESTAMP AS OF`` to a snapshot version: the newest
        retained snapshot committed at or before ``ts_ms`` (Iceberg's
        snapshot-log resolution; every snapshot carries committed_at_ms)."""
        cands = [
            v
            for v in self.snapshot_versions()
            if self.snapshot(v).committed_at_ms <= ts_ms
        ]
        if not cands:
            raise ValueError(
                f"{self.name}: no snapshot committed at or before "
                f"timestamp {ts_ms} ms (earliest retained: "
                f"{self.snapshot_versions()[:1]})"
            )
        return max(cands)

    def _commit(
        self,
        operation: str,
        files: list[str],
        total_rows: int,
        added_rows: int,
        hot_watermark: int | None = None,
        summary: dict | None = None,
        expected_version: int | None = None,
        delete_files: list | None = None,
        delete_meta: dict | None = None,
    ) -> Snapshot:
        """``total_rows`` is on the FOOTER basis (sum of data-file row
        counts); _commit deducts active merge-on-read tombstones itself so
        the snapshot's recorded total is always LIVE rows — one place owns
        that arithmetic. ``delete_files=None`` inherits the parent's
        delete files, dropping any whose every referenced data file has
        left the new file list (fully inert after a rewrite)."""
        if self._txn is not None and self.write_branch:
            raise ValueError(
                "transactions do not combine with branch writes "
                "(on_branch inside a CatalogTransaction)"
            )
        base = self._head()
        if expected_version is not None and expected_version != base:
            raise CommitConflictError(
                f"commit based on stale version {expected_version}; "
                f"current is {base}"
            )
        parent = self.snapshot()
        version = self._next_version()
        # A caller (tier(), the streaming pipeline) may ask the *next*
        # commit to carry extra state — watermark advance, idempotence
        # batch id — so it lands in the snapshot json in the same atomic
        # write as the commit itself (no post-commit rewrite window in
        # which a crash could double-expose or double-apply a batch).
        extra = self._pending_commit_extra
        self._pending_commit_extra = None
        if extra:
            operation = extra.get("operation", operation)
            if hot_watermark is None:
                hot_watermark = extra.get("hot_watermark")
            summary = {**(summary or {}), **extra.get("summary", {})}
        # manifest stats: unchanged files carry their entry forward; only
        # files new to this snapshot get a footer scan (O(#added files))
        prev_meta = parent.file_meta if parent else {}
        file_meta = {}
        for f in files:
            m = prev_meta.get(f)
            if m is None:
                m = _file_column_stats(os.path.join(self.path, f))
                if self.partition_spec:
                    m["partition"] = self._partition_values_from_path(f)
                vcols = self.properties.get("write.value-set-columns")
                if vcols:
                    vs = _file_value_sets(
                        os.path.join(self.path, f),
                        [c.strip() for c in vcols.split(",") if c.strip()],
                    )
                    if vs:
                        m["value_sets"] = vs
                bcols = self.properties.get("write.bloom-columns")
                if bcols:
                    bl = _file_blooms(
                        os.path.join(self.path, f),
                        [c.strip() for c in bcols.split(",") if c.strip()],
                    )
                    if bl:
                        m["blooms"] = bl
            file_meta[f] = m
        if delete_files is None:
            files_set = set(files)

            def _still_active(d: str) -> bool:
                meta = (parent.delete_meta or {}).get(d) or {}
                if meta.get("kind") == "equality":
                    seq = meta.get("seq", -1)
                    hides = meta.get("hides", {})
                    return any(
                        _file_seq(f) < seq
                        and str(_bucket_of_path(f)) in hides
                        for f in files_set
                    )
                return any(f in files_set for f in meta.get("files", {}))

            delete_files = [
                d for d in (parent.delete_files if parent else [])
                if _still_active(d)
            ]
            delete_meta = {
                d: (parent.delete_meta or {}).get(d, {}) for d in delete_files
            }
        probe = Snapshot(
            snapshot_id=-1, committed_at_ms=0, operation="", files=files,
            total_rows=0, added_rows=0, hot_watermark=-1, summary={},
            delete_files=delete_files, delete_meta=delete_meta or {},
        )
        total_rows -= probe.active_delete_count()
        snap = Snapshot(
            snapshot_id=version,
            committed_at_ms=int(time.time() * 1000),
            operation=operation,
            files=files,
            total_rows=total_rows,
            added_rows=added_rows,
            schema_json=self.schema.jsonValue(),
            field_ids=dict(self.field_ids),
            hot_watermark=(
                hot_watermark
                if hot_watermark is not None
                else (parent.hot_watermark if parent else -1)
            ),
            summary=summary or {},
            file_meta=file_meta,
            delete_files=delete_files,
            delete_meta=delete_meta or {},
            parent_id=(parent.snapshot_id if parent else -1),
        )
        # physical CAS: exclusive-create the snapshot file BEFORE flipping
        # the VERSION pointer — a racing same-version writer raises
        # CommitConflictError here and the table stays consistent at base.
        # Transactional commits stage under a DISTINCT name
        # (txn-v{N}.json): snapshot_versions()/snapshots()/time travel
        # list only v*.json, so uncommitted transaction work is invisible
        # to every other reader (not just pointer-following ones) — the
        # staged file is linked into place at publish time.
        # facade-routed commits stage under rest-v{N}.json — like txn
        # staging, a name NO reader lists — and the catalog service
        # links it into its public v{N}.json place inside the commit
        # section. A transport failure can then never leave a phantom
        # readable snapshot, and the client's cleanup of the staged
        # NAME is always safe (the public hard link, if the commit did
        # land, is unaffected).
        rest_endpoint = None
        if self._txn is None and not self.write_branch:
            rest_endpoint = _rest_catalog_endpoint(_warehouse_of(self.path))
        snap_name = (
            f"txn-v{version}.json" if self._txn is not None
            else f"rest-v{version}.json" if rest_endpoint
            else f"v{version}.json"
        )
        try:
            _exclusive_write(self._meta(snap_name), snap.to_json())
        except CommitConflictError:
            if extra:  # let a retry carry the watermark/batch-id forward
                self._pending_commit_extra = extra
            raise
        if self._txn is not None:
            # transactional stage: the staged file exists (exclusive-
            # create above arbitrates same-version transactions) but
            # nothing is published until the transaction links every
            # staged snapshot into place and flips every pointer under
            # the commit lock. A concurrent non-txn commit is detected
            # here the same way as below (and again at publish).
            cur = self.current_version()
            if cur != self._txn.base_version(self, cur):
                os.remove(self._meta(snap_name))
                if extra:
                    self._pending_commit_extra = extra
                raise CommitConflictError(
                    f"concurrent commit advanced {self.name} to v{cur} "
                    f"during the transaction"
                )
            self._txn.stage(self, cur, version)
            return snap
        if self.write_branch:
            # branch commit: advance the branch ref, main stays put (WAP)
            refs = self._refs()
            refs["branches"][self.write_branch] = version
            self._write_refs(refs)
        else:
            # pointer CAS: snapshot ids skip past orphan files (crash
            # debris must not wedge the table), so same-base racers may
            # pick DIFFERENT ids — exclusive-create alone no longer
            # serializes them. Re-check the pointer before flipping
            # UNDER the catalog commit lock: exactly one same-base
            # writer wins, the loser removes its unpublished snapshot
            # and raises (the Iceberg catalog compare-and-swap).
            #
            # A warehouse that opted into a REST catalog facade
            # (_catalog.json "rest-catalog") instead POSTs the CAS to
            # the catalog SERVICE — the real deployment topology, where
            # writers never touch the pointer themselves (multi-table
            # txn publishes route through the facade's
            # /v1/transactions/commit; WAP fast_forward keeps its
            # direct lock-held flip; the facade takes the same section,
            # so all entry points serialize against each other).
            if rest_endpoint:
                self._cas_via_rest(rest_endpoint, base, version, extra)
            else:
                with _commit_lock(self.path):
                    cur = self.current_version()
                    if cur != base:
                        os.remove(self._meta(f"v{version}.json"))
                        if extra:
                            self._pending_commit_extra = extra
                        raise CommitConflictError(
                            f"concurrent commit advanced {self.name} to "
                            f"v{cur} (this commit was based on v{base})"
                        )
                    _atomic_write(self._meta("VERSION"), str(version))
        return snap

    def _cas_via_rest(
        self, endpoint: str, base: int, version: int, extra: dict | None
    ) -> None:
        """Publish the staged rest-v{version}.json by asking the catalog
        facade to link it into its public place and compare-and-swap the
        pointer (lake/rest_catalog.py). 409 = lost the race: same error
        as the direct path.

        Failure handling is DETERMINATE on this stand-in, not merely
        conservative: the staged NAME is removed under the local commit
        lock (the same section the facade applies inside, same
        filesystem), so any not-yet-applied request finds its staged
        file gone at link time and aborts, while an already-applied one
        left a public hard link the removal cannot touch — after the
        locked remove, WHO removed the staged name discriminates the
        outcome even when a concurrent commit has already advanced the
        pointer past ``version``: we removed it ⇒ the CAS never
        applied; already gone + public v{version}.json present ⇒ it
        applied and only the response was lost. A REMOTE catalog (no
        shared lock) cannot close this window; the one residual local
        case (staged gone, no public snapshot — external interference)
        surfaces CommitStateUnknownError, Iceberg's
        CommitStateUnknownException semantics."""
        import http.client

        from fluss_iceberg_spark.lake import rest_catalog

        staged = self._meta(f"rest-v{version}.json")

        def _cleanup_staged() -> bool:
            """Remove the staged name; True if WE removed it, False if it
            was already gone (= the facade consumed it via the link)."""
            try:
                os.remove(staged)
                return True
            except FileNotFoundError:
                return False

        err: Exception | None = None
        status, body = 0, {}
        try:
            status, body = rest_catalog.cas_commit(
                endpoint, self.name, expected=base, target=version
            )
        except (OSError, http.client.HTTPException, ValueError) as e:
            err = e
        if status == 200:
            _cleanup_staged()  # normally already consumed by the link
            return
        if status == 409:
            _cleanup_staged()  # definitive: the CAS never linked it
            if extra:
                self._pending_commit_extra = extra
            raise CommitConflictError(
                f"catalog rejected commit of {self.name} v{version}: "
                f"{body.get('error')}"
            )
        # transport error, garbled response, or an intermediary status
        # (502/504) — the origin MAY have applied the CAS. Resolve under
        # the shared section (see docstring): remove the staged name
        # (poisons any not-yet-applied request), then read the pointer.
        # The pointer alone is NOT the discriminator: a commit that DID
        # apply can be followed by a concurrent v{version+1} commit
        # before this lock is acquired, so "pointer != version" must not
        # be reported as determinate failure. The staged name is the
        # discriminator — the facade consumes it (link + remove) at the
        # exact moment it publishes, so: staged still present ⇒ the CAS
        # never linked it (determinate failure, and removing it poisons
        # any still-in-flight request); staged gone AND the public
        # snapshot exists ⇒ the commit landed, only the response was
        # lost.
        with _commit_lock(self.path):
            we_removed_staged = _cleanup_staged()
            if self.current_version() == version:
                return  # applied; only the response was lost
            if not we_removed_staged and os.path.exists(
                self._meta(f"v{version}.json")
            ):
                return  # applied, then a later commit advanced the pointer
        if extra:
            self._pending_commit_extra = extra
        if not we_removed_staged:
            # staged name gone but no public snapshot: an outcome this
            # client cannot resolve (e.g. external cleanup raced us) —
            # surface Iceberg's CommitStateUnknown semantics, NOT a
            # determinate failure that would invite a double-applying
            # retry.
            raise CommitStateUnknownError(
                f"REST catalog at {endpoint}: commit of {self.name} "
                f"v{version} is in an unknown state ({err or f'HTTP {status}: {body}'}; "
                "staged snapshot already consumed but neither the pointer "
                "nor a published snapshot confirms it)"
            ) from err
        raise RuntimeError(
            f"REST catalog at {endpoint} failed committing {self.name} "
            f"v{version} ({err or f'HTTP {status}: {body}'}; resolved "
            "under the commit section: pointer unchanged, staged "
            "snapshot removed)"
        ) from err

    # ---------- writes ----------

    def _enforce_not_null(self, df: DataFrame) -> DataFrame:
        """S16: sink not-null enforcer = DROP (sql-client.sql:50)."""
        cols = [c for c in self.not_null if c in df.columns]
        return df.na.drop(subset=cols) if cols else df

    def _prepare(self, df: DataFrame) -> DataFrame:
        """Project to the table schema, materializing computed columns a
        write doesn't supply — e.g. a ``PROCTIME()`` column (README.md:148)
        declared via DDL is stamped with the write's processing time."""
        for f in self.schema.fieldNames():
            if f not in df.columns:
                expr = self.properties.get(f"engine.computed.{f}")
                if expr and expr.upper() == "PROCTIME()":
                    df = df.withColumn(f, F.current_timestamp())
                elif expr:
                    df = df.withColumn(f, F.expr(expr))
        # CHECK constraints (the Delta-constraints role; Iceberg has an
        # open spec discussion): enforced INLINE in the write projection
        # — a violating row raises during the write job itself, so there
        # is no extra validation pass over the batch and no partial
        # commit (the snapshot only lands after the write succeeds).
        # SQL CHECK semantics: NULL evaluations pass (coalesce TRUE).
        first = self.schema.fieldNames()[0] if self.schema.fields else None
        guard = None
        for cexpr in self.constraints.values():
            ok = F.coalesce(F.expr(cexpr), F.lit(True))
            guard = ok if guard is None else (guard & ok)
        if guard is not None and first is not None:
            msgs = "; ".join(
                f"{n}: CHECK ({e})" for n, e in self.constraints.items()
            )
            df = df.withColumn(
                first,
                F.when(guard, F.col(first)).otherwise(
                    F.raise_error(
                        F.lit(
                            f"[{self.name}] CHECK constraint violated ({msgs})"
                        )
                    ).cast(df.schema[first].dataType if first in df.columns
                           else self.schema[first].dataType)
                ),
            )
        # cast to the declared column types (Iceberg-style write coercion):
        # SQL arithmetic widens decimals (15,2)+(15,2) → (16,2), and a file
        # written at the widened type is unreadable under the table schema
        return df.select(
            *[
                F.col(f.name).cast(f.dataType).alias(f.name)
                for f in self.schema.fields
            ]
        )

    def _bucket_col(self) -> F.Column:
        return F.pmod(F.hash(*[F.col(k) for k in self.primary_key]), F.lit(self.n_buckets))

    # logical-plan node names that mark a delta lineage as expensive to
    # re-execute AND re-plan (multi-join changelog diffs, aggregations,
    # Python kernels); matched at line starts of the analyzed plan tree
    _HEAVY_PLAN_RE = re.compile(
        r"^[\s+:\-]*(Join|Aggregate|Window|Generate|Expand|"
        r"(?:Arrow|Batch)EvalPython|MapInPandas|PythonMapInArrow|"
        r"FlatMapGroupsInPandas|GlobalLimit|Sort|Union)\b",
        re.M,
    )

    def _materialize_delta(self, df: DataFrame):
        """Delta-frame policy for multi-action consumers (merge/delete):
        the frame feeds 2-3 separate Spark actions (stats/guard collect,
        then the write).

        - HEAVY lineage (joins/aggregates/Python — IVM refreshes, CDC
          mirror diffs): eager ``localCheckpoint`` — the lineage executes
          exactly ONCE and is truncated, so every downstream action
          analyzes a leaf scan instead of re-running Catalyst over the
          changelog tree per action (measured r13: 42-56% of merge-family
          wall was BETWEEN jobs, i.e. per-action planning; guide §5
          "localCheckpoint is a cheaper way to cut lineage").
        - TRIVIAL lineage (scan/local frame + row-level ops only): no
          materialization. Re-executing a delta-sized scan per action is
          cheaper than building and re-reading 32 cached partitions (the
          r12 unconditional persist regressed exactly these consumers —
          lake_scd2_dimension, stream_txn_two_sinks; adjudicated by the
          interleaved A/B in OPTIMIZATION_r13.md).

        ``FLUSS_MERGE_DELTA=persist`` restores the r12 unconditional
        persist (the A/B toggle). Returns ``(frame, release_fn)``."""
        mode = os.environ.get("FLUSS_MERGE_DELTA", "auto")
        if mode == "persist":
            p = df.persist()
            return p, p.unpersist
        try:
            heavy = bool(
                self._HEAVY_PLAN_RE.search(
                    df._jdf.queryExecution().analyzed().toString()
                )
            )
        except Exception:
            heavy = True  # unknown plan shape: materializing is the safe default
        if not heavy:
            return df, lambda: None
        cp = df.localCheckpoint(eager=True)

        def _release() -> None:
            # free the checkpoint blocks now rather than waiting for the
            # ContextCleaner (best-effort — internal seam, cleaner still
            # reclaims on drift); same pattern as neardup_admit_batch
            try:
                cp._jdf.queryExecution().analyzed().rdd().unpersist(False)
            except Exception:
                pass

        return cp, _release

    @contextmanager
    def _micros_timestamps(self):
        """Scoped ``spark.sql.parquet.outputTimestampType=TIMESTAMP_MICROS``.

        Spark's default parquet timestamp encoding is legacy INT96, which
        carries NO footer min/max statistics — every timestamp predicate
        would lose file skipping. Lake writes need INT64 micros (the
        modern encoding, what Iceberg mandates) so stats exist — but the
        writer API ignores a per-write ``outputTimestampType`` option, so
        the session conf is the only lever; save/restore it here so lake
        writes don't silently change the timestamp encoding of unrelated
        DataFrame writes in the same session."""
        key = "spark.sql.parquet.outputTimestampType"
        prev = self.spark.conf.get(key)
        self.spark.conf.set(key, "TIMESTAMP_MICROS")
        try:
            yield
        finally:
            self.spark.conf.set(key, prev)

    def _writer(self, df: DataFrame):
        """DataFrameWriter honoring the table's
        ``write.parquet.compression-codec`` property (the Iceberg write
        property; zstd/snappy/gzip/lz4/uncompressed). Codec choice is a
        per-table storage contract: zstd for cold archival slices, snappy
        (Spark default) for hot scan-heavy tables. Callers executing the
        write must hold ``_micros_timestamps()`` (footer-stats contract)."""
        w = df.write
        codec = self.properties.get("write.parquet.compression-codec")
        return w.option("compression", codec) if codec else w

    def _write_files(self, df: DataFrame, snapshot_id: int, bucketed: bool) -> list[str]:
        """Write df as parquet under data/s{snapshot_id}; returns
        table-relative paths. PK tables write one directory per PK-hash
        bucket so merges can prune untouched buckets."""
        rel = f"data/s{snapshot_id}"
        out = os.path.join(self.path, rel)
        if bucketed:
            with self._micros_timestamps():
                (
                    self._writer(
                        df.withColumn("__bucket", self._bucket_col()).repartition(
                            self.n_buckets, "__bucket"
                        )
                    )
                    .partitionBy("__bucket")
                    .mode("overwrite")
                    .parquet(out)
                )
            files = []
            for b in os.listdir(out):
                if b.startswith("__bucket="):
                    files += [
                        os.path.join(rel, b, f)
                        for f in os.listdir(os.path.join(out, b))
                        if f.endswith(".parquet")
                    ]
            return sorted(files)
        order = self._write_order_cols()
        if self.partition_spec:
            # Hidden partitioning: the derived value names the directory;
            # the source column stays in the data file (Iceberg §4 —
            # queries never reference partition columns). One shuffle on
            # the partition tuple concentrates each partition's rows so
            # the write emits one file per partition per micro-batch
            # instead of #tasks × #partitions fragments; at 100 TB a
            # fanout writer (no shuffle) plus compaction is the
            # alternative when single partitions exceed executor memory.
            pnames = [f"__p_{p['name']}" for p in self.partition_spec]
            pdf = df.select(
                "*",
                *[
                    _partition_expr(p).alias(f"__p_{p['name']}")
                    for p in self.partition_spec
                ],
            ).repartition(*[F.col(n) for n in pnames])
            if order:
                pdf = pdf.sortWithinPartitions(*pnames, *order)
            with self._micros_timestamps():
                self._writer(pdf).partitionBy(*pnames).mode("overwrite").parquet(out)
            files = []
            for root, _dirs, fnames in os.walk(out):
                for fn in fnames:
                    if fn.endswith(".parquet"):
                        files.append(
                            os.path.relpath(os.path.join(root, fn), self.path)
                        )
            return sorted(files)
        if order:
            # range-cluster every append on the declared sort order (the
            # Iceberg write.sort-order role): files get near-disjoint
            # [min,max] ranges from the FIRST write, so manifest skipping
            # works continuously instead of only after a sort compaction.
            # One extra range shuffle per append, amortized across every
            # subsequent pruned scan.
            n = self.properties.get("write.cluster-partitions")
            rcols = [F.col(c) for c in order]
            df = (
                df.repartitionByRange(int(n), *rcols)
                if n
                else df.repartitionByRange(*rcols)
            ).sortWithinPartitions(*order)
        with self._micros_timestamps():
            self._writer(df).mode("overwrite").parquet(out)
        return [os.path.join(rel, os.path.basename(f)) for f in _list_parquet(out)]

    def _write_order_cols(self) -> list[str]:
        """Columns of the ``write.sort-order`` table property (log tables;
        PK tables are bucket-clustered by key hash instead). Unknown
        columns raise at write time, not silently no-op."""
        spec = self.properties.get("write.sort-order")
        if not spec or self.primary_key:
            return []
        cols = [c.strip().strip("`") for c in spec.split(",") if c.strip()]
        for c in cols:
            if c not in self.schema.fieldNames():
                raise ValueError(
                    f"{self.name}: write.sort-order column {c!r} not in schema"
                )
        return cols

    def _partition_values_from_path(self, relpath: str) -> dict:
        """Manifest partition record for one data file, parsed from its
        ``__p_<name>=<value>`` directory components (the writer's
        directory layout IS the authoritative value — every row in the
        file shares it by construction)."""
        vals: dict = {}
        for comp in relpath.split(os.sep)[:-1]:
            if comp.startswith("__p_") and "=" in comp:
                k, _, raw = comp[4:].partition("=")
                vals[k] = _parse_partition_path_value(raw)
        return vals

    _CLUSTER_SPEC_RE = re.compile(
        r"^(?:(?:day|hour|month|year)\s*\(\s*(\w+)\s*\)|(\w+))$"
    )

    def _cluster_column(self) -> str | None:
        """Column named by the ``write.clustered-by`` table property
        (Iceberg's write.distribution-mode=range + sort-order role).
        Accepted forms: ``col`` or ``day(col)``/``hour(col)`` etc. — the
        transform names document intent; range partitioning clusters at
        whatever granularity the data has, so only the column matters."""
        spec = self.properties.get("write.clustered-by")
        if not spec:
            return None
        m = self._CLUSTER_SPEC_RE.match(spec.strip())
        if not m:
            raise ValueError(f"{self.name}: bad write.clustered-by spec {spec!r}")
        col = m.group(1) or m.group(2)
        if col not in self.schema.fieldNames():
            raise ValueError(f"{self.name}: write.clustered-by unknown column {col!r}")
        return col

    def append(self, df: DataFrame) -> Snapshot:
        """Log-table append (S14 batch form). New snapshot = parent files +
        newly written files; existing data is never rewritten.

        If the table declares ``write.clustered-by``, rows are
        range-repartitioned and sorted on that column before writing, so
        each file covers a tight, non-overlapping value range — that is
        what makes the manifest min/max file skipping (``read(where=)``)
        prune to O(matching slice) on time-series tables at 100 TB,
        instead of every file straddling the full time range.

        ``write.zorder-by`` ("colA,colB") is the two-dimensional form:
        rows are laid out along a Morton curve over the rank-bucketed
        column pair (operators/zorder.py — Iceberg's
        ``rewrite_data_files(sort_order => 'zorder(a, b)')``), so range
        predicates on EITHER column prune files, not just the leading
        one."""
        if self.primary_key:
            raise ValueError(f"{self.name}: PK table requires merge(), not append()")
        df = self._enforce_not_null(self._prepare(df))
        zcols = self.properties.get("write.zorder-by")
        ccol = self._cluster_column()
        if zcols is not None:
            from fluss_iceberg_spark.operators.zorder import zorder_layout

            # validate eagerly (mirrors _cluster_column): a typo'd column
            # or wrong arity should fail with a named error here, not an
            # opaque one deep inside approxQuantile / tuple unpacking
            pair = [c.strip() for c in zcols.split(",") if c.strip()]
            if len(pair) != 2:
                raise ValueError(
                    f"{self.name}: write.zorder-by must name exactly two "
                    f"columns ('colA,colB'), got {zcols!r}"
                )
            unknown = [c for c in pair if c not in df.columns]
            if unknown:
                raise ValueError(
                    f"{self.name}: write.zorder-by columns {unknown} not in "
                    f"table columns {df.columns}"
                )
            a, b = pair
            n = int(self.properties.get("write.cluster-partitions", "16"))
            df = zorder_layout(df, a, b, n)
        elif ccol is not None:
            # partition count: explicit property, else the session default
            # (AQE then sizes the write by bytes — at scale that is the
            # right behavior; small writes may coalesce to few files)
            n = self.properties.get("write.cluster-partitions")
            if n is not None:
                df = df.repartitionByRange(int(n), F.col(ccol))
            else:
                df = df.repartitionByRange(F.col(ccol))
            df = df.sortWithinPartitions(ccol)
        version = self._next_version()
        files = self._write_files(df, version, bucketed=False)
        added = self._rows_in(files)
        parent = self.snapshot()
        all_files = (parent.files if parent else []) + files
        # footer basis: _commit re-deducts active tombstones itself
        prev = (
            parent.total_rows + parent.active_delete_count() if parent else 0
        )
        return self._commit("append", all_files, prev + added, added)

    def _check_rewrite_allowed(self, op: str) -> None:
        """Log-table rewrites (compact/overwrite) re-emit existing rows to
        any active ``stream_appends()`` file stream (the stream tails
        ``data/*``). A table declared 'streaming.append-only' refuses them
        so the stream's exactly-once contract can't be silently broken."""
        if (
            not self.primary_key
            and self.properties.get("streaming.append-only") == "true"
        ):
            raise ValueError(
                f"{self.name}: {op}() is disabled on a 'streaming.append-only' "
                "table — rewritten files would be re-emitted by active "
                "stream_appends() readers"
            )

    def overwrite(self, df: DataFrame) -> Snapshot:
        self._check_rewrite_allowed("overwrite")
        df = self._enforce_not_null(self._prepare(df))
        version = self._next_version()
        files = self._write_files(df, version, bucketed=bool(self.primary_key))
        n = self._rows_in(files)
        return self._commit("overwrite", files, n, n)

    def merge(self, updates: DataFrame, deletes: DataFrame | None = None) -> Snapshot:
        """PK-upsert (MERGE): last write per key wins (ST4, README.md:247-250).

        Bucketed copy-on-write: only buckets containing updated keys are
        rewritten (anti-join old ∪ new within the bucket); files of
        untouched buckets carry forward into the new snapshot unchanged.

        ``deletes`` (optional): a frame of primary-key values whose rows
        are dropped in the SAME commit — the WHEN MATCHED THEN DELETE arm
        of SQL MERGE, and the scale path for key-targeted deletion (the
        touched-bucket rewrite is bounded by the delete key set, never
        the table).
        """
        if not self.primary_key:
            raise ValueError(f"{self.name}: merge() requires a primary key")
        updates = self._enforce_not_null(self._prepare(updates))
        # collapse intra-batch duplicates: last occurrence per key wins is
        # undefined without order, so use an arbitrary-but-deterministic
        # max-by over all columns via row_number on a monotonic id
        #
        # merge() consumes the collapsed batch through 2-3 SEPARATE
        # actions (conflict guard, touched-bucket collect, the bucket
        # write) — _materialize_delta decides per lineage whether to
        # checkpoint it once or recompute it per action (see its doc)
        updates, rel_u = self._materialize_delta(
            updates.dropDuplicates(self.primary_key)
        )
        rel_d = lambda: None  # noqa: E731
        if deletes is not None:
            deletes, rel_d = self._materialize_delta(
                deletes.select(*self.primary_key).dropDuplicates()
            )
        try:
            return self._merge_inner(updates, deletes)
        finally:
            rel_u()
            rel_d()

    def _merge_inner(
        self, updates: DataFrame, deletes: DataFrame | None
    ) -> Snapshot:
        parent = self.snapshot()
        version = self._next_version()
        touch_keys = updates.select(*self.primary_key)
        if deletes is not None:
            touch_keys = touch_keys.unionByName(deletes)
        if deletes is not None:
            # ONE stats job answers both driver questions (r13, guide §2
            # "remove actions outright"): the touched-bucket set AND the
            # ambiguity guard (a key in both updates and deletes is
            # ambiguous — Iceberg MERGE likewise rejects multi-action
            # matches). Both sides are already key-distinct, so a key
            # seen from both sources groups to min=0/max=1.
            tagged = (
                updates.select(*self.primary_key)
                .withColumn("__src", F.lit(0))
                .unionByName(deletes.withColumn("__src", F.lit(1)))
            )
            stat = (
                tagged.groupBy(*self.primary_key)
                .agg(
                    F.min("__src").alias("__mn"),
                    F.max("__src").alias("__mx"),
                )
                .withColumn("__bucket", self._bucket_col())
                .agg(
                    F.collect_set("__bucket").alias("bks"),
                    F.max((F.col("__mn") == 0) & (F.col("__mx") == 1)).alias(
                        "amb"
                    ),
                )
                .collect()[0]
            )
            if stat["amb"]:
                raise ValueError(
                    f"{self.name}: merge() key appears in both updates and deletes"
                )
            touched = list(stat["bks"] or [])
        else:
            upd = touch_keys.withColumn("__bucket", self._bucket_col())
            touched = [
                r["__bucket"] for r in upd.select("__bucket").distinct().collect()
            ]

        if parent is None or not parent.files:
            files = self._write_files(updates, version, bucketed=True)
            n = self._rows_in(files)
            return self._commit("merge", files, n, n, summary={"touched_buckets": touched})

        # split parent files into touched vs untouched buckets
        def bucket_of(relpath: str) -> int | None:
            for part in relpath.split(os.sep):
                if part.startswith("__bucket="):
                    return int(part.split("=", 1)[1])
            return None

        touched_set = set(touched)
        keep_files = [f for f in parent.files if bucket_of(f) not in touched_set]
        old_touched = [f for f in parent.files if bucket_of(f) in touched_set]

        rel = f"data/s{version}"
        out = os.path.join(self.path, rel)
        if old_touched:
            old_df = self._read_live(
                old_touched, self.schema, self.field_ids, parent
            )
            # null-safe key equality: NULL is a legal PK value (the
            # reference's NULL nation group, FIXTURES.md invariant 3).
            # Anti-join against updated AND deleted keys — deleted keys
            # simply have no replacement row in new_state.
            upd_keys = touch_keys.select(
                *[F.col(k).alias(f"__u_{k}") for k in self.primary_key]
            )
            cond = None
            for k in self.primary_key:
                c = old_df[k].eqNullSafe(upd_keys[f"__u_{k}"])
                cond = c if cond is None else (cond & c)
            survivors = old_df.join(upd_keys, on=cond, how="left_anti")
            new_state = survivors.unionByName(updates)
        else:
            new_state = updates
        with self._micros_timestamps():
            (
                self._writer(
                    new_state.withColumn("__bucket", self._bucket_col()).repartition(
                        len(touched_set) or 1, "__bucket"
                    )
                )
                .partitionBy("__bucket")
                .mode("overwrite")
                .parquet(out)
            )
        new_files = []
        for b in os.listdir(out):
            if b.startswith("__bucket="):
                new_files += [
                    os.path.join(rel, b, f)
                    for f in os.listdir(os.path.join(out, b))
                    if f.endswith(".parquet")
                ]
        files = sorted(keep_files + new_files)
        # footer-basis total in O(touched) footers, not O(table): the
        # untouched files' counts are already in the parent's footer total
        # (r13 — a merge on a wide table must not re-open every footer)
        added = self._rows_in(new_files)
        prev_footer = parent.total_rows + parent.active_delete_count()
        total = prev_footer - self._rows_in(old_touched) + added
        return self._commit(
            "merge", files, total, added, summary={"touched_buckets": touched}
        )

    def delete(self, where: list[tuple]) -> Snapshot:
        """Row-level DELETE (the Iceberg copy-on-write v2 role): remove
        rows matching the conjunctive predicate ``[(col, op, lit), ...]``.

        Manifest-stats-bounded rewrite: files whose min/max bounds PROVE
        no row matches carry forward into the new snapshot untouched;
        only intersecting files are read back, anti-filtered, and
        rewritten. On a date-clustered 100 TB table a retention delete
        rewrites one time slice, not the table. SQL NULL semantics: rows
        where the predicate is NULL survive (DELETE removes only TRUE).

        ``write.delete.mode=merge-on-read`` (table property, the Iceberg
        v2 write-mode property): instead of rewriting intersecting files,
        write a position-delete file — O(deleted rows) write cost
        regardless of how wide the touched files are. Readers anti-join
        the (broadcast) tombstones; ``compact()`` materializes them."""
        if self.properties.get("write.delete.mode") == "merge-on-read":
            return self._mor_delete(where)
        return self._row_level_rewrite("delete", where, set_exprs=None)

    def delete_by_key(self, keys: DataFrame) -> Snapshot:
        """Key-targeted DELETE on a PK table via an EQUALITY-DELETE file
        (the Iceberg v2 equality-delete role — what a streaming CDC
        writer emits for retractions): the commit writes only the key
        set, never reading or rewriting data files beyond one bounded
        count of the touched buckets. A row is hidden when its file's
        write sequence predates the delete's sequence and its key
        matches; a later re-insert of the key (newer file) survives.
        The NEXT merge() touching a bucket materializes its tombstones
        (the bucket rewrite reads live rows), after which the entry is
        inert there — exactly Iceberg's sequence-number semantics.

        Scale shape: write cost O(|keys|); read cost one broadcast
        anti-join; the exact hide-count scan is bounded to the touched
        buckets (needed so COUNT(*) stays metadata-exact afterwards)."""
        if not self.primary_key:
            raise ValueError(
                f"{self.name}: delete_by_key() requires a primary key; "
                "log tables use delete(where=)"
            )
        snap = self.snapshot()
        # the key set feeds THREE actions (bucket routing collect, the
        # delete-file write, the hide-count semi-join) — same
        # multi-action reuse as merge(); _materialize_delta picks
        # checkpoint vs recompute per lineage (see its doc)
        keys, rel = self._materialize_delta(
            keys.select(*self.primary_key).dropDuplicates()
        )
        try:
            return self._delete_by_key_inner(keys, snap)
        finally:
            rel()

    def _delete_by_key_inner(self, keys: DataFrame, snap) -> Snapshot:
        if snap is None or not snap.files:
            return self._commit(
                "delete", [], 0, 0, summary={"mode": "equality", "hidden_rows": 0}
            )
        footer_total = snap.total_rows + snap.active_delete_count()
        version = self._next_version()
        # bucket routing: only buckets holding a delete key can hide rows
        keyed = keys.withColumn("__bucket", self._bucket_col())
        buckets = {
            r["__bucket"] for r in keyed.select("__bucket").distinct().collect()
        }
        touched = [f for f in snap.files if _bucket_of_path(f) in buckets]
        rel_dir = f"deletes/s{version}"
        out = os.path.join(self.path, rel_dir)
        keys.coalesce(1).write.mode("overwrite").parquet(out)
        new_del = [
            os.path.join(rel_dir, os.path.basename(p))
            for p in _list_parquet(out)
        ]
        # exact per-bucket hide counts: semi-join LIVE rows of touched
        # buckets against the keys (bounded by the key set's buckets)
        if touched:
            live = self._read_live(
                touched, self.schema, self.field_ids, snap
            )
            kk = keys.select(
                *[F.col(k).alias(f"__dk_{k}") for k in self.primary_key]
            )
            cond = None
            for k in self.primary_key:
                c = live[k].eqNullSafe(F.col(f"__dk_{k}"))
                cond = c if cond is None else cond & c
            hit = live.join(F.broadcast(kk), on=cond, how="left_semi")
            per_bucket = {
                str(r["__bucket"]): r["n"]
                for r in hit.withColumn("__bucket", self._bucket_col())
                .groupBy("__bucket")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
        else:
            per_bucket = {}
        n_hidden = sum(per_bucket.values())
        delete_files = list(snap.delete_files) + new_del
        delete_meta = {
            **snap.delete_meta,
            **{
                d: {
                    "kind": "equality",
                    "seq": version,
                    "rows": n_hidden,
                    "hides": per_bucket,
                    "key": list(self.primary_key),
                }
                for d in new_del
            },
        }
        return self._commit(
            "delete",
            list(snap.files),
            footer_total,
            0,
            summary={
                "mode": "equality",
                "hidden_rows": n_hidden,
                "buckets_touched": sorted(int(b) for b in per_bucket),
            },
            delete_files=delete_files,
            delete_meta=delete_meta,
        )

    def _mor_delete(self, where: list[tuple]) -> Snapshot:
        """Merge-on-read DELETE: commit a position-delete file, never
        touching data files. The scan is stats-bounded like the CoW path
        (only files whose bounds intersect the predicate are read), and
        only LIVE rows are tombstoned (prior deletes applied first), so
        repeated overlapping deletes never double-count."""
        if not where:
            raise ValueError(f"{self.name}: delete() requires a predicate")
        snap = self.snapshot()
        if snap is None or not snap.files:
            return self._commit("delete", [], 0, 0, summary={"files_rewritten": 0})
        touched = self.plan_scan(where, snapshot=snap)
        footer_total = snap.total_rows + snap.active_delete_count()
        if not touched:
            return self._commit(
                "delete", list(snap.files), footer_total, 0,
                summary={"mode": "merge-on-read", "deleted_positions": 0},
            )
        matched = F.coalesce(_where_filter(where), F.lit(False))
        pos_df = (
            self._tagged_live_rows(touched, snap)
            .filter(matched)
            .select("__file", "__pos")
        )
        version = self._next_version()
        # a delete file is O(matched rows) of (path, long) — single file
        new_del, per_file = self._write_delete_file(pos_df, version)
        n_del = sum(per_file.values())
        delete_files = list(snap.delete_files) + new_del
        delete_meta = {
            **snap.delete_meta,
            **{
                d: {"rows": n_del, "files": per_file} for d in new_del
            },
        }
        return self._commit(
            "delete",
            list(snap.files),
            footer_total,
            0,
            summary={
                "mode": "merge-on-read",
                "deleted_positions": n_del,
                "delete_files_added": len(new_del),
                "files_touched": len(touched),
            },
            delete_files=delete_files,
            delete_meta=delete_meta,
        )

    def update(self, set_exprs: dict[str, str], where: list[tuple]) -> Snapshot:
        """Row-level UPDATE ... SET (copy-on-write): apply the SET
        expressions (Spark SQL strings, e.g. ``{"price": "price * 2"}``)
        to rows matching the predicate; same stats-bounded rewrite as
        ``delete``. PK columns cannot be updated (bucket layout is keyed
        on them — Iceberg likewise forbids identity-partition mutation)."""
        bad = [c for c in set_exprs if c in self.primary_key]
        if bad:
            raise ValueError(f"{self.name}: cannot UPDATE primary-key columns {bad}")
        unknown = [c for c in set_exprs if c not in self.schema.fieldNames()]
        if unknown:
            raise ValueError(f"{self.name}: UPDATE of unknown columns {unknown}")
        if self.properties.get("write.update.mode") == "merge-on-read":
            return self._mor_update(set_exprs, where)
        return self._row_level_rewrite("update", where, set_exprs=set_exprs)

    def _tagged_live_rows(self, files: list[str], snap: Snapshot):
        """Live rows of ``files`` with (__file, __pos) provenance columns —
        the shared scan under both merge-on-read write paths."""
        ext, cols = self._alias_projection(self.schema, self.field_ids)
        raw = self.spark.read.schema(ext).parquet(
            *[os.path.join(self.path, f) for f in files]
        )
        rel = F.regexp_extract(
            F.col("_metadata.file_path"), r"(data/s\d+/.+)$", 1
        )
        tagged = raw.select(
            *cols,
            rel.alias("__file"),
            F.col("_metadata.row_index").alias("__pos"),
        )
        prior = self._active_deletes_df(snap, files)
        if prior is not None:
            tagged = tagged.join(
                F.broadcast(prior), on=["__file", "__pos"], how="left_anti"
            )
        eqs = self._eq_deletes_for(snap, files)
        if eqs:
            tagged = self._apply_eq_deletes(tagged, eqs)
        return tagged

    def _write_delete_file(self, pos_df: DataFrame, version: int) -> tuple:
        """Write (__file, __pos) tombstones under deletes/s{version};
        returns (relpaths, per_file_counts)."""
        rel_dir = f"deletes/s{version}"
        out = os.path.join(self.path, rel_dir)
        pos_df.coalesce(1).write.mode("overwrite").parquet(out)
        new_del = [
            os.path.join(rel_dir, os.path.basename(p))
            for p in _list_parquet(out)
        ]
        per_file = {
            r["__file"]: r["n"]
            for r in self.spark.read.parquet(out)
            .groupBy("__file").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        return new_del, per_file

    def _mor_update(
        self, set_exprs: dict[str, str], where: list[tuple]
    ) -> Snapshot:
        """Merge-on-read UPDATE (``write.update.mode=merge-on-read``):
        one commit carrying a position-delete file tombstoning the
        matched rows PLUS a new data file with their updated images —
        write cost O(matched rows), untouched files never rewritten
        (the Iceberg v2 update write-mode). Readers see exactly one
        version of each row: the tombstone hides the old image, the
        appended file supplies the new one."""
        if not where:
            raise ValueError(f"{self.name}: update() requires a predicate")
        snap = self.snapshot()
        if snap is None or not snap.files:
            return self._commit("update", [], 0, 0, summary={"files_rewritten": 0})
        touched = self.plan_scan(where, snapshot=snap)
        footer_total = snap.total_rows + snap.active_delete_count()
        if not touched:
            return self._commit(
                "update", list(snap.files), footer_total, 0,
                summary={"mode": "merge-on-read", "updated_rows": 0},
            )
        matched = F.coalesce(_where_filter(where), F.lit(False))
        rows = self._tagged_live_rows(touched, snap).filter(matched)
        # one pass: persist so the tombstone write and the data write
        # don't re-scan (model-sized: only matched rows)
        rows = rows.persist()
        try:
            version = self._next_version()
            new_del, per_file = self._write_delete_file(
                rows.select("__file", "__pos"), version
            )
            n_upd = sum(per_file.values())
            updated = rows.select(
                *[
                    F.expr(set_exprs[f.name]).cast(f.dataType).alias(f.name)
                    if f.name in set_exprs
                    else F.col(f.name)
                    for f in self.schema.fields
                ]
            )
            new_files = self._write_files(
                updated, version, bucketed=bool(self.primary_key)
            )
        finally:
            rows.unpersist()
        files = sorted(list(snap.files) + new_files)
        delete_files = list(snap.delete_files) + new_del
        delete_meta = {
            **snap.delete_meta,
            **{d: {"rows": n_upd, "files": per_file} for d in new_del},
        }
        return self._commit(
            "update",
            files,
            footer_total + self._rows_in(new_files),
            self._rows_in(new_files),
            summary={
                "mode": "merge-on-read",
                "updated_rows": n_upd,
                "files_touched": len(touched),
            },
            delete_files=delete_files,
            delete_meta=delete_meta,
        )

    def _row_level_rewrite(
        self, op: str, where: list[tuple], set_exprs: dict[str, str] | None
    ) -> Snapshot:
        self._check_rewrite_allowed(op)
        if not where:
            raise ValueError(f"{self.name}: {op}() requires a predicate")
        snap = self.snapshot()
        if snap is None or not snap.files:
            return self._commit(op, [], 0, 0, summary={"files_rewritten": 0})
        touched = self.plan_scan(where, snapshot=snap)
        touched_set = set(touched)
        keep = [f for f in snap.files if f not in touched_set]
        if not touched:
            return self._commit(
                op,
                list(snap.files),
                snap.total_rows + snap.active_delete_count(),
                0,
                summary={"files_rewritten": 0, "files_skipped": len(keep)},
            )
        old = self._read_live(
            touched, self.schema, self.field_ids, snap
        ).select(*self.schema.fieldNames())
        matched = F.coalesce(_where_filter(where), F.lit(False))
        if op == "delete":
            new_df = old.filter(~matched)
        else:
            # SET results cast back to the declared column type so the
            # physical schema never drifts (e.g. decimal widening in *2)
            new_df = old.select(
                *[
                    F.when(matched, F.expr(set_exprs[f.name]))
                    .otherwise(F.col(f.name))
                    .cast(f.dataType)
                    .alias(f.name)
                    if f.name in set_exprs
                    else F.col(f.name)
                    for f in self.schema.fields
                ]
            )
        version = self._next_version()
        new_files = self._write_files(
            new_df, version, bucketed=bool(self.primary_key)
        )
        files = sorted(keep + new_files)
        total = self._rows_in(files)
        return self._commit(
            op,
            files,
            total,
            self._rows_in(new_files),
            summary={"files_rewritten": len(touched), "files_skipped": len(keep)},
        )

    def _rows_in(self, files: list[str]) -> int:
        """Exact row count from parquet footers — no plan re-execution.
        (The Iceberg analogue: manifest-recorded record counts.)"""
        import pyarrow.parquet as pq

        return sum(
            pq.ParquetFile(os.path.join(self.path, f)).metadata.num_rows for f in files
        )

    # ---------- reads ----------

    def read(
        self,
        version: int | str | None = None,
        where: list[tuple] | None = None,
        prune_only: bool = False,
    ) -> DataFrame:
        """Snapshot read (cold-only — the reference's Trino view,
        README.md:257-292). ``version`` = time travel (M1-adjacent); a
        string resolves as a named tag (Iceberg ref).

        ``where`` = optional conjunctive scan predicate
        ``[(col, op, literal), ...]`` with op in ``= < <= > >=``. Files
        whose manifest min/max range provably excludes the predicate are
        skipped before Spark ever sees them (the Iceberg manifest-pruning
        role): planning cost O(#files) of in-memory metadata, zero footer
        or data I/O for skipped files. The same predicate is then applied
        to the scanned rows, so the result is exact regardless of how
        coarse the surviving files' ranges are — unless ``prune_only``:
        then the predicate only PRUNES and surviving files return whole
        (for callers whose next operation is already exact, e.g. a join
        on the probed key — a large IN-list as a row filter would cost
        more than it removes)."""
        snap = self.snapshot(version)
        # time travel reads under the schema THAT snapshot recorded
        # (RENAME/DROP evolution); current reads use the current schema
        if version is not None and snap is not None and snap.schema_json:
            sch = T.StructType.fromJson(snap.schema_json)
            fids = snap.field_ids or self.field_ids
        else:
            sch, fids = self.schema, self.field_ids
        files = self.plan_scan(where, snapshot=snap) if snap is not None else []
        row_filter = where if (where and not prune_only) else None
        if not files:
            df = self.spark.createDataFrame([], sch)
            return df.filter(_where_filter(row_filter)) if row_filter else df
        df = self._read_live(files, sch, fids, snap)
        return df.filter(_where_filter(row_filter)) if row_filter else df

    def read_bucket(self, bucket: int, version: int | str | None = None) -> DataFrame:
        """Snapshot read of ONE PK-hash bucket's rows (MoR deletes
        applied, same semantics as ``read`` restricted to the bucket's
        files). The physical handle a storage-partitioned join needs:
        rows of bucket b can only ever match bucket b of a co-bucketed
        table, so per-bucket reads join with no repartitioning of
        either side (plans/spj.py). O(#files) metadata to slice; no
        data I/O beyond the bucket's own files."""
        if not self.primary_key:
            raise ValueError(
                f"{self.name}: read_bucket applies to PK tables "
                "(log tables are not bucket-clustered)"
            )
        snap = self.snapshot(version)
        if snap is None:
            return self.spark.createDataFrame([], self.schema)
        files = [f for f in snap.files if _bucket_of_path(f) == bucket]
        if not files:
            return self.spark.createDataFrame([], self.schema)
        return self._read_live(files, self.schema, self.field_ids, snap)

    def _project_files(
        self, paths: list[str], sch: T.StructType, fids: dict[str, int]
    ) -> DataFrame:
        """Read parquet files under a target schema, resolving each field
        across its whole NAME HISTORY (RENAME COLUMN evolution): the read
        schema is extended with the field's former names and the
        projection coalesces new-name → old-names, so files written
        before a rename resolve without any rewrite. Files lacking every
        name project NULL (ADD COLUMN); extra columns in old files are
        never decoded (DROP COLUMN, parquet column pruning)."""
        ext, cols = self._alias_projection(sch, fids)
        return self.spark.read.schema(ext).parquet(*paths).select(*cols)

    def _active_deletes_df(
        self, snap: Snapshot | None, files: list[str]
    ) -> DataFrame | None:
        """(__file, __pos) tombstones referencing any of ``files``, or
        None when the scan has no active deletes (the common case — the
        anti-join then never enters the plan)."""
        if snap is None or not snap.delete_files:
            return None
        present = set(files)
        hit = [
            d
            for d in snap.delete_files
            if any(
                f in present
                for f in (snap.delete_meta.get(d) or {}).get("files", {})
            )
        ]
        if not hit:
            return None
        return (
            self.spark.read.schema("__file string, __pos long")
            .parquet(*[os.path.join(self.path, d) for d in hit])
            .filter(F.col("__file").isin(list(present)))
        )

    def _eq_deletes_for(
        self, snap: Snapshot | None, files: list[str]
    ) -> list[tuple[str, dict]]:
        """Equality-delete files still active against any scanned file
        (some scanned file is older than the delete's sequence and lives
        in a bucket the delete recorded hides for)."""
        if snap is None or not snap.delete_files:
            return []
        out = []
        for d in snap.delete_files:
            meta = snap.delete_meta.get(d) or {}
            if meta.get("kind") != "equality":
                continue
            seq = meta.get("seq", -1)
            hides = meta.get("hides", {})
            if any(
                _file_seq(f) < seq and str(_bucket_of_path(f)) in hides
                for f in files
            ):
                out.append((d, meta))
        return out

    def _apply_eq_deletes(
        self, tagged: DataFrame, eqs: list[tuple[str, dict]]
    ) -> DataFrame:
        """Anti-join broadcast equality-delete keys against rows from
        files OLDER than each delete's sequence (rows re-inserted later
        survive — the Iceberg sequence-number scoping)."""
        key_frames = []
        for d, meta in eqs:
            kdf = self.spark.read.parquet(os.path.join(self.path, d)).select(
                *[F.col(k).alias(f"__ek_{k}") for k in self.primary_key],
                F.lit(int(meta.get("seq", -1))).alias("__dseq"),
            )
            key_frames.append(kdf)
        keys = key_frames[0]
        for kf in key_frames[1:]:
            keys = keys.unionByName(kf)
        tagged = tagged.withColumn(
            "__fseq",
            F.regexp_extract(F.col("__file"), r"data/s(\d+)/", 1).cast("long"),
        )
        cond = F.col("__fseq") < F.col("__dseq")
        for k in self.primary_key:
            cond = cond & tagged[k].eqNullSafe(F.col(f"__ek_{k}"))
        return tagged.join(F.broadcast(keys), on=cond, how="left_anti").drop(
            "__fseq"
        )

    def _read_live(
        self,
        files: list[str],
        sch: T.StructType,
        fids: dict[str, int],
        snap: Snapshot | None,
    ) -> DataFrame:
        """Read data files under the target schema with merge-on-read
        deletes applied (the Iceberg v2 read path). Position tombstones
        are file-scoped (__file, __pos) pairs anti-joined on the exact
        position; equality tombstones are PK keys anti-joined against
        rows from files older than the delete's sequence. Both delete
        sides are O(deleted rows) and BROADCAST, so at 100 TB the
        anti-join side stays model-sized while data files are never
        rewritten. Scans of snapshots without deletes skip the joins
        entirely."""
        paths = [os.path.join(self.path, f) for f in files]
        dels = self._active_deletes_df(snap, files)
        eqs = self._eq_deletes_for(snap, files)
        if dels is None and not eqs:
            return self._project_files(paths, sch, fids)
        ext, cols = self._alias_projection(sch, fids)
        raw = self.spark.read.schema(ext).parquet(*paths)
        # table-relative path from the scan's file metadata: manifests
        # record paths as data/s{N}/..., so extract that suffix
        rel = F.regexp_extract(
            F.col("_metadata.file_path"), r"(data/s\d+/.+)$", 1
        )
        tagged = raw.select(
            *cols,
            rel.alias("__file"),
            F.col("_metadata.row_index").alias("__pos"),
        )
        if dels is not None:
            tagged = tagged.join(
                F.broadcast(dels), on=["__file", "__pos"], how="left_anti"
            )
        if eqs:
            tagged = self._apply_eq_deletes(tagged, eqs)
        return tagged.drop("__file", "__pos")

    def _alias_projection(
        self, sch: T.StructType, fids: dict[str, int]
    ) -> tuple[T.StructType, list[F.Column]]:
        """(extended read schema, projection columns) for name-history
        resolution — shared by batch and streaming file reads."""
        ext_fields = list(sch.fields)
        alias_map: dict[str, list[str]] = {}
        for f in sch.fields:
            fid = fids.get(f.name)
            names = self.name_log.get(str(fid), []) if fid is not None else []
            aliases = [n for n in names if n != f.name]
            if aliases:
                alias_map[f.name] = aliases
                ext_fields += [T.StructField(a, f.dataType, True) for a in aliases]
        cols = [
            F.coalesce(F.col(f.name), *[F.col(a) for a in alias_map[f.name]])
            .alias(f.name)
            if f.name in alias_map
            else F.col(f.name)
            for f in sch.fields
        ]
        return T.StructType(ext_fields), cols

    def plan_scan(
        self,
        where: list[tuple] | None = None,
        snapshot: Snapshot | None = None,
    ) -> list[str]:
        """The file list a ``read(where=...)`` would scan, after manifest
        min/max pruning — exposed for observability and tests."""
        snap = snapshot if snapshot is not None else self.snapshot()
        if snap is None:
            return []
        if not where:
            return list(snap.files)
        return [
            f
            for f in snap.files
            if all(
                _partition_may_match(
                    (snap.file_meta.get(f) or {}).get("partition"),
                    self.partition_spec, col, op, lit,
                )
                and _file_may_match(snap.file_meta.get(f), col, op, lit)
                for col, op, lit in where
            )
        ]

    def snapshots(self) -> DataFrame:
        """The ``t$snapshots`` metadata table (M1, README.md:274-275).

        Columns mirror Iceberg's ``$snapshots`` shape (the reference's
        observability query, README.md:275): parent lineage, operation,
        a manifest-list stand-in (the snapshot json path), and a summary
        map (added/total counts + operation-specific keys), plus the
        engine's tiering watermark."""
        rows = []
        versions = self.snapshot_versions()
        retained = set(versions)
        for v in versions:
            s = self.snapshot(v)
            # summary serialized as a JSON string: nested map/array cells
            # crash the driver's pandas canonicalizer (CORRECTNESS_r01)
            summary = json.dumps(
                {
                    "added-records": str(s.added_rows),
                    "total-records": str(s.total_rows),
                    "total-data-files": str(len(s.files)),
                    **{k: json.dumps(v2) for k, v2 in s.summary.items()},
                },
                sort_keys=True,
            )
            # real lineage when the snapshot recorded it (branch commits
            # don't chain from id-1); legacy snapshots fall back to the
            # id-adjacency heuristic. Expired parents display as None,
            # matching Iceberg's $snapshots.
            if s.parent_id is not None:
                shown_parent = s.parent_id if s.parent_id in retained else None
            else:
                shown_parent = (
                    s.snapshot_id - 1
                    if s.snapshot_id > 0 and s.snapshot_id - 1 in retained
                    else None
                )
            rows.append(
                (
                    s.snapshot_id,
                    shown_parent,
                    s.committed_at_ms,
                    s.operation,
                    self._meta(f"v{s.snapshot_id}.json"),
                    summary,
                    len(s.files),
                    s.total_rows,
                    s.added_rows,
                    s.hot_watermark,
                )
            )
        return arrow_local_df(
            self.spark,
            rows,
            "snapshot_id long, parent_id long, committed_at_ms long, "
            "operation string, manifest_list string, summary string, "
            "n_files int, total_rows long, added_rows long, hot_watermark long",
        )

    def files(self, version: int | None = None) -> DataFrame:
        """The ``t$files`` metadata table (Iceberg's per-data-file view):
        one row per data file in the snapshot with its manifest-recorded
        row count, byte size, and column bounds. ``column_stats`` is the
        {col: [min, max]} map serialized as a JSON string (nested cells
        crash the driver's canonicalizer — CORRECTNESS_r01)."""
        snap = self.snapshot(version)
        rows = []
        for f in snap.files if snap else []:
            m = snap.file_meta.get(f) or {}
            rows.append(
                (
                    f,
                    "data",
                    int(m.get("bytes", -1)),
                    int(m.get("rows", -1)),
                    json.dumps(m.get("stats", {}), sort_keys=True),
                )
            )
        for d in snap.delete_files if snap else []:
            m = snap.delete_meta.get(d) or {}
            rows.append(
                (
                    d,
                    "position-deletes",
                    -1,
                    int(m.get("rows", -1)),
                    json.dumps({}, sort_keys=True),
                )
            )
        return arrow_local_df(
            self.spark,
            rows,
            "file_path string, content string, file_size_bytes long, "
            "record_count long, column_stats string",
        )

    def partitions(self, version: int | None = None) -> DataFrame:
        """The ``t$partitions`` metadata table (Iceberg's per-partition
        rollup): one row per live partition with its record/file/byte
        counts — answered entirely from manifest metadata, zero data I/O
        (at 100 TB, the partition census is a catalog question, not a
        scan). Matches Iceberg's contract: ``record_count`` is the
        DATA-FILE record count (footer basis); merge-on-read tombstones
        are surfaced separately as ``position_delete_record_count`` so
        the two never silently disagree with ``read().count()``.
        ``partition`` is the {name: value} dict serialized as a JSON
        string (nested cells crash the driver's canonicalizer)."""
        if not self.partition_spec:
            raise ValueError(f"{self.name}: table is not partitioned")
        snap = self.snapshot(version)
        # exact per-file position-tombstone counts (equality deletes are
        # PK-bucket-scoped, and PK tables don't take a partition spec)
        pos_by_file: dict[str, int] = {}
        if snap:
            present = set(snap.files)
            for d in snap.delete_files:
                meta = snap.delete_meta.get(d) or {}
                if meta.get("kind") != "equality":
                    for f, n in (meta.get("files") or {}).items():
                        if f in present:
                            pos_by_file[f] = pos_by_file.get(f, 0) + int(n)
        agg: dict[str, dict] = {}
        for f in snap.files if snap else []:
            m = snap.file_meta.get(f) or {}
            key = json.dumps(m.get("partition", {}), sort_keys=True)
            a = agg.setdefault(
                key, {"rows": 0, "files": 0, "bytes": 0, "dels": 0}
            )
            a["rows"] += int(m.get("rows", 0))
            a["files"] += 1
            a["bytes"] += int(m.get("bytes", 0))
            a["dels"] += pos_by_file.get(f, 0)
        rows = [
            (k, v["rows"], v["files"], v["bytes"], v["dels"])
            for k, v in sorted(agg.items())
        ]
        return arrow_local_df(
            self.spark,
            rows,
            "partition string, record_count long, file_count int, "
            "size_bytes long, position_delete_record_count long",
        )

    def delete_files(self, version: int | None = None) -> DataFrame:
        """The ``t$delete_files`` metadata table (Iceberg v2): one row
        per ACTIVE delete file in the snapshot — kind (position /
        equality), tombstone record count, and the data files it still
        references — answered from manifest metadata, zero data I/O."""
        snap = self.snapshot(version)
        rows = []
        for d in (snap.delete_files if snap else []):
            meta = (snap.delete_meta or {}).get(d) or {}
            refs = sorted((meta.get("files") or {}).keys())
            rows.append(
                (
                    d,
                    meta.get("kind", "position"),
                    int(meta.get("rows", 0)),
                    len(refs),
                    json.dumps(refs),
                )
            )
        return arrow_local_df(
            self.spark,
            rows,
            "path string, kind string, record_count long, "
            "referenced_data_files int, references string",
        )

    def refs(self) -> DataFrame:
        """The ``t$refs`` metadata table (Iceberg's named-ref view): one
        row per tag/branch plus the implicit ``main`` head — answered
        from meta/refs.json, zero data I/O."""
        refs = self._refs()
        rows = [("main", "BRANCH", self.current_version())]
        rows += [(n, "TAG", v) for n, v in sorted(refs["tags"].items())]
        rows += [(n, "BRANCH", v) for n, v in sorted(refs["branches"].items())]
        return arrow_local_df(
            self.spark,
            rows, "name string, type string, snapshot_id long"
        )

    def history(self) -> DataFrame:
        """The ``t$history`` metadata table: the commit log as Iceberg
        reports it — when each snapshot became current and whether it is
        an ancestor of the current table state (always true here: the
        stand-in has no branch/rollback, history is linear)."""
        cur = self.current_version()
        rows = [
            (
                self.snapshot(v).committed_at_ms,
                v,
                v - 1 if v - 1 in set(self.snapshot_versions()) else None,
                v == cur,
            )
            for v in self.snapshot_versions()
        ]
        return arrow_local_df(
            self.spark,
            rows,
            "made_current_at_ms long, snapshot_id long, parent_id long, "
            "is_current boolean",
        )

    # ---------- maintenance ----------

    def _zorder_col(self, df: DataFrame, cols: list[str], bits: int = 10) -> F.Column:
        """Z-value (Morton code) over numeric columns: per-column uniform
        bucket id in [0, 2^bits) from a single min/max aggregate (a tiny
        driver-side model, like the IVF centroids), bit-interleaved so
        nearby (c1, c2, …) tuples get nearby z-values. Pure JVM arithmetic
        — the only extra job is the one-row min/max agg."""
        n = 1 << bits
        bounds = df.agg(
            *[F.min(c).cast("double").alias(f"lo_{c}") for c in cols],
            *[F.max(c).cast("double").alias(f"hi_{c}") for c in cols],
        ).first()
        z = F.lit(0).cast("long")
        for idx, c in enumerate(cols):
            lo, hi = bounds[f"lo_{c}"], bounds[f"hi_{c}"]
            if lo is None or hi is None or hi == lo:
                continue  # constant / all-null column adds no ordering bits
            bucket = F.least(
                F.lit(n - 1),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col(c).cast("double") - F.lit(lo))
                        / F.lit((hi - lo))
                        * n
                    ),
                ),
            ).cast("long")
            bucket = F.coalesce(bucket, F.lit(0))
            for b in range(bits):
                z = z + F.shiftleft(
                    F.shiftright(bucket, b).bitwiseAND(F.lit(1)),
                    b * len(cols) + idx,
                )
        return z

    def compact(
        self,
        target_file_rows: int = 1_000_000,
        sort_by: list[str] | None = None,
        zorder_by: list[str] | None = None,
        where: list[tuple] | None = None,
        only_smaller_than_bytes: int | None = None,
    ) -> Snapshot | None:
        """Small-file compaction (the Iceberg rewrite_data_files role):
        rewrite the current snapshot's files into ~target_file_rows-sized
        files. Data is unchanged — only the file layout; time travel to
        pre-compaction snapshots still sees the old files (file GC is a
        separate, explicitly-invoked step on a real deployment).

        Streaming lakehouses accrete small files from frequent commits
        (30 s freshness → 2,880 commits/day); periodic compaction is what
        keeps scan planning and open-file overhead bounded at scale.

        ``sort_by`` (log tables): range-partition + sort the rewrite on
        the given columns (Iceberg's sort-order rewrite strategy). Files
        then hold disjoint key ranges, so the manifest min/max bounds
        turn ``read(where=...)`` file skipping from best-effort into
        near-exact — the clustering that makes a 100 TB time-range scan
        touch only its slice. A single compaction shuffle buys every
        subsequent scan's pruning.

        ``zorder_by`` (log tables, numeric columns): cluster by the
        interleaved-bit Morton code instead (the Delta/Iceberg OPTIMIZE
        ZORDER role) — every listed column's min/max bounds tighten
        per-file, so predicates on ANY of them prune, where a plain sort
        only serves its leading column.

        ``where`` (log tables): scope the rewrite to the files the
        conjunctive predicate ``[(col, op, lit), ...]`` can touch
        (Iceberg's ``rewrite_data_files(where => ...)``): matched files
        are rewritten IN FULL (they are dropped from the snapshot, so
        every row they hold must move), all other files carry forward
        untouched. At 100 TB compaction runs partition-by-partition on
        the freshly-written slice — rewriting the whole table per
        maintenance tick is not a plan.

        ``only_smaller_than_bytes`` (log tables): bin-pack SELECTION
        (Iceberg's binpack strategy with its size threshold): only files
        below the byte threshold rewrite; already-right-sized files
        carry forward untouched — the steady-state maintenance shape
        where each tick folds the small-file tail, never the table."""
        self._check_rewrite_allowed("compact")
        if sort_by and zorder_by:
            raise ValueError(f"{self.name}: sort_by and zorder_by are exclusive")
        if where is not None and only_smaller_than_bytes is not None:
            raise ValueError(
                f"{self.name}: where and only_smaller_than_bytes are exclusive"
            )
        return self._compact_impl(
            target_file_rows, sort_by, zorder_by, where, only_smaller_than_bytes
        )

    def maybe_auto_compact(self) -> "Snapshot | None":
        """Commit-cadence small-file control (the Paimon/Delta
        auto-compaction role): when the table property
        ``write.auto-compact.file-threshold`` is set and the CURRENT
        snapshot references at least that many data files, rewrite them
        toward ``write.auto-compact.target-rows`` rows per file (default
        sizes files so the count lands near HALF the threshold —
        hysteresis, so the trigger doesn't re-fire on every subsequent
        commit). A streaming lakehouse at 30 s
        freshness commits 2,880 times/day (README.md:189-190); without a
        file-count trigger the scan-planning and open-file cost grows
        linearly with uptime. Call sites: the tiering pipeline and MV
        refresh invoke this after their commits — the check is
        metadata-only (one file-count read), so it is free when the
        threshold isn't crossed."""
        thr = self.properties.get("write.auto-compact.file-threshold")
        if not thr:
            return None
        self._check_rewrite_allowed("auto-compact")
        snap = self.snapshot()
        if snap is None or len(snap.files) < int(thr):
            return None
        target = self.properties.get("write.auto-compact.target-rows")
        rows = (
            int(target)
            if target
            else max(1, snap.total_rows * 2 // max(1, int(thr)))
        )
        return self._compact_impl(rows, None, None)

    def maybe_auto_expire(self) -> dict | None:
        """Retention-policy expiry on commit cadence (the
        ``history.expire.*`` Iceberg table-property role): when
        ``history.expire.max-snapshots`` is set and more snapshots are
        retained, expire down to that count. The check is one metadata
        listing — free when under the cap; tags, branch heads, and the
        current snapshot are always exempt (``expire_snapshots``'s
        contract). A 30 s-freshness pipeline commits 2,880×/day — without
        a policy the metadata directory grows without bound."""
        cap = self.properties.get("history.expire.max-snapshots")
        if not cap:
            return None
        if len(self.snapshot_versions()) <= int(cap):
            return None
        return self.expire_snapshots(keep_last=int(cap))

    def _compact_impl(
        self,
        target_file_rows: int,
        sort_by: list[str] | None,
        zorder_by: list[str] | None,
        where: list[tuple] | None = None,
        only_smaller_than_bytes: int | None = None,
    ) -> "Snapshot | None":
        cluster = sort_by or zorder_by
        snap = self.snapshot()
        if snap is None:
            return None
        if where is not None or only_smaller_than_bytes is not None:
            if self.primary_key:
                raise ValueError(
                    f"{self.name}: scoped compaction applies to log "
                    "tables; PK tables compact whole (bucket layout)"
                )
            if where is not None:
                touched = self.plan_scan(where, snapshot=snap)
            else:
                touched = [
                    f
                    for f in snap.files
                    if int((snap.file_meta.get(f) or {}).get("bytes", 0))
                    < only_smaller_than_bytes
                ]
            keep = [f for f in snap.files if f not in set(touched)]
            if not touched or (len(touched) <= 1 and not cluster):
                return None
            df = self._read_live(touched, self.schema, self.field_ids, snap)
            # live rows of the rewritten slice: footer rows minus the
            # tombstones active against exactly these files (log tables
            # carry position deletes only, which count per file)
            n = sum(
                int((snap.file_meta.get(f) or {}).get("rows", 0))
                for f in touched
            ) - snap.active_delete_count(touched)
        else:
            if len(snap.files) <= 1 and not cluster:
                return None
            touched, keep = snap.files, []
            df = self.read()
            n = snap.total_rows
        n_files = max(1, -(-n // target_file_rows))
        version = self._next_version()
        rel = f"data/s{version}"
        out = os.path.join(self.path, rel)
        if self.primary_key:
            if cluster:
                raise ValueError(
                    f"{self.name}: sort_by/zorder_by compaction applies to log "
                    "tables; PK tables are clustered by bucket"
                )
            files = self._write_files(df, version, bucketed=True)
        elif self.partition_spec:
            # partitioned compact: rewrite WITHIN the partition layout
            # (one shuffle on the partition tuple; in-partition order
            # follows sort_by/zorder_by), so partition dirs and manifest
            # partition values survive the rewrite
            if zorder_by:
                df = df.withColumn("__z", self._zorder_col(df, zorder_by))
            pnames = [f"__p_{p['name']}" for p in self.partition_spec]
            pdf = df.select(
                "*",
                *[
                    _partition_expr(p).alias(f"__p_{p['name']}")
                    for p in self.partition_spec
                ],
            ).repartition(*[F.col(n) for n in pnames])
            if zorder_by:
                pdf = pdf.sortWithinPartitions("__z").drop("__z")
            elif sort_by:
                pdf = pdf.sortWithinPartitions(*sort_by)
            with self._micros_timestamps():
                self._writer(pdf).partitionBy(*pnames).mode("overwrite").parquet(out)
            files = sorted(
                os.path.relpath(os.path.join(root, fn), self.path)
                for root, _dirs, fnames in os.walk(out)
                for fn in fnames
                if fn.endswith(".parquet")
            )
        else:
            if zorder_by:
                df = (
                    df.withColumn("__z", self._zorder_col(df, zorder_by))
                    .repartitionByRange(n_files, "__z")
                    .sortWithinPartitions("__z")
                    .select(*self.schema.fieldNames())
                )
            elif sort_by:
                df = df.repartitionByRange(n_files, *sort_by).sortWithinPartitions(
                    *sort_by
                )
            else:
                df = df.coalesce(n_files)
            with self._micros_timestamps():
                self._writer(df).mode("overwrite").parquet(out)
            files = [os.path.join(rel, os.path.basename(f)) for f in _list_parquet(out)]
        summary = {"files_before": len(snap.files)}
        if sort_by:
            summary["sort_by"] = sort_by
        if zorder_by:
            summary["zorder_by"] = zorder_by
        if where is not None:
            summary["files_rewritten"] = len(touched)
            summary["where"] = [[c, o, str(v)] for c, o, v in where]
        elif only_smaller_than_bytes is not None:
            summary["files_rewritten"] = len(touched)
            summary["small_file_threshold_bytes"] = only_smaller_than_bytes
        total_footer = n + sum(
            int((snap.file_meta.get(f) or {}).get("rows", 0)) for f in keep
        )
        return self._commit("compact", keep + files, total_footer, 0, summary=summary)

    def analyze(self, columns: list[str] | None = None) -> dict:
        """ANALYZE TABLE (the Iceberg puffin/table-stats role): one scan
        computing per-column approx NDV (HLL++) and null counts, stored
        beside the current snapshot (``meta/stats_v{N}.json``) for a
        cost-based planner to pick join orders / broadcast sides. Row
        count comes from manifest metadata, not the scan."""
        snap = self.snapshot()
        cols = columns or self.schema.fieldNames()
        stats: dict = {"snapshot_id": snap.snapshot_id if snap else -1,
                       "row_count": self.count_rows(), "columns": {}}
        if snap and snap.files:
            df = self.read()
            aggs = []
            for c in cols:
                aggs.append(F.approx_count_distinct(c).alias(f"ndv_{c}"))
                aggs.append(
                    F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
                )
            row = df.agg(*aggs).first()
            for c in cols:
                stats["columns"][c] = {
                    "ndv": int(row[f"ndv_{c}"]),
                    "null_count": int(row[f"nulls_{c}"]),
                }
        _atomic_write(
            self._meta(f"stats_v{stats['snapshot_id']}.json"), json.dumps(stats)
        )
        return stats

    def table_stats(self) -> dict | None:
        """Most recent ANALYZE result at or before the current snapshot."""
        versions = [
            int(f[len("stats_v"):-len(".json")])
            for f in os.listdir(self._meta())
            if f.startswith("stats_v") and f.endswith(".json")
        ]
        usable = [v for v in versions if v <= self.current_version()]
        if not usable:
            return None
        with open(self._meta(f"stats_v{max(usable)}.json")) as f:
            return json.load(f)

    def rollback(self, version: int) -> Snapshot:
        """Roll the table back to an earlier snapshot (the Iceberg
        ``rollback_to_snapshot`` role): commits a NEW snapshot that
        points at the old snapshot's file list, so history is preserved
        and the rollback itself is time-travelable/auditable. The tiering
        watermark keeps its CURRENT value — hot batches already tiered
        stay deduplicated in union reads regardless of lake rollback."""
        target = self.snapshot(version)
        if target is None:
            raise ValueError(f"{self.name}: no snapshot v{version} to roll back to")
        return self._commit(
            "rollback",
            list(target.files),
            target.total_rows + target.active_delete_count(),
            0,
            summary={"rollback_to": version},
            delete_files=list(target.delete_files),
            delete_meta=dict(target.delete_meta),
        )

    def count_rows(self) -> int:
        """``SELECT COUNT(*)`` answered from manifest metadata alone
        (the Iceberg aggregate-pushdown role): O(1) driver-side, zero
        data I/O — at 100 TB the difference between a catalog lookup
        and a full scan."""
        snap = self.snapshot()
        return snap.total_rows if snap else 0

    def min_max(self, col: str) -> tuple | None:
        """``SELECT MIN(col), MAX(col)`` answered from manifest min/max
        bounds alone (the other half of Iceberg's aggregate pushdown):
        O(#files) driver-side metadata, zero data I/O. Returns None when
        any file lacks bounds for the column (all-null file, pre-stats
        snapshot, unsupported type) — the exact answer then needs a scan,
        and a wrong fast answer is worse than a slow right one. NULL
        semantics match SQL MIN/MAX (ignores nulls; parquet stats do
        too)."""
        if col not in self.schema.fieldNames():
            raise KeyError(f"{self.name}: no such column {col!r}")
        # Parquet writers TRUNCATE long string/binary footer stats: the
        # truncated bound is still valid for pruning but need not be a
        # value present in the table, so returning it as an EXACT MIN/MAX
        # would be wrong (and pyarrow 16 exposes no is_*_value_exact flag
        # to tell). Fall back to a scan for those types; pruning
        # (_file_may_match) keeps using the bounds, which stays sound.
        if isinstance(self.schema[col].dataType, (T.StringType, T.BinaryType)):
            return None
        snap = self.snapshot()
        if snap is None or not snap.files:
            return None
        if snap.active_delete_count():
            # a merge-on-read tombstone may cover the extreme row; footer
            # bounds still include it, so the fast answer could be wrong
            return None
        lo = hi = None
        for f in snap.files:
            meta = snap.file_meta.get(f) or {}
            if meta.get("rows") == 0:
                continue  # an empty file cannot hold the extreme
            stats = meta.get("stats", {}).get(col)
            if not stats:
                return None  # a file without bounds could hold the extreme
            flo, fhi = _stat_decode(stats[0]), _stat_decode(stats[1])
            lo = flo if lo is None else min(lo, flo)
            hi = fhi if hi is None else max(hi, fhi)
        return (lo, hi)

    def changelog(
        self, from_version: int, to_version: int | None = None,
        mode: str = "compact",
    ) -> DataFrame:
        """CDC diff scan for PK tables (the Fluss/Paimon changelog-read
        role; log tables use ``incremental_read``): one row per key whose
        state changed between the two snapshots, with
        ``op ∈ {insert, update, delete}`` and the key's NEW values
        (OLD values for deletes).

        ``mode="full"`` emits the Flink retraction-stream form instead:
        an update becomes TWO rows — ``update_before`` carrying the old
        values and ``update_after`` the new — so downstream consumers
        can maintain signed-delta state (the retractable-matview path);
        inserts/deletes are unchanged. Same scan, no extra I/O: the
        full-outer diff join already holds both images.

        Scale shape: buckets whose file sets are identical between the
        snapshots cannot contain changes and are pruned from the scan
        entirely (file-list set compare, zero I/O); only changed buckets
        are read and full-outer-joined on the key — and both sides are
        bucketed on that key, so at scale the join co-locates instead of
        shuffling the table."""
        if not self.primary_key:
            raise ValueError(
                f"{self.name}: changelog() requires a PK table; "
                "log tables stream deltas via incremental_read()"
            )
        to_v = self.current_version() if to_version is None else to_version
        old_snap, new_snap = self.snapshot(from_version), self.snapshot(to_v)
        if new_snap is None:
            raise ValueError(f"{self.name}: no snapshot v{to_v}")
        old_files = set(old_snap.files) if old_snap else set()
        new_files = set(new_snap.files)

        def bucket_of(relpath: str) -> int | None:
            for part in relpath.split(os.sep):
                if part.startswith("__bucket="):
                    return int(part.split("=", 1)[1])
            return None

        def by_bucket(files: set[str]) -> dict:
            d: dict = {}
            for f in files:
                d.setdefault(bucket_of(f), set()).add(f)
            return d

        def tomb_counts(snap: Snapshot | None) -> dict:
            """file → active tombstone count: a bucket whose file set is
            unchanged can still differ via a merge-on-read delete file,
            so pruning must compare tombstones too (metadata-only)."""
            out: dict = {}
            if snap is None:
                return out
            present = set(snap.files)
            for d in snap.delete_files:
                for f, c in (snap.delete_meta.get(d) or {}).get("files", {}).items():
                    if f in present:
                        out[f] = out.get(f, 0) + c
            return out

        def eq_state(snap: Snapshot | None) -> dict:
            """bucket → frozenset of (delete_file, seq) equality deletes
            active there — an equality delete changes a bucket without
            touching its file set, so pruning compares this too."""
            out: dict = {}
            if snap is None:
                return out
            for d in snap.delete_files:
                meta = snap.delete_meta.get(d) or {}
                if meta.get("kind") != "equality":
                    continue
                seq = meta.get("seq", -1)
                for f in snap.files:
                    b = _bucket_of_path(f)
                    if (
                        _file_seq(f) < seq
                        and str(b) in meta.get("hides", {})
                    ):
                        out.setdefault(b, set()).add((d, seq))
            return out

        ob, nb = by_bucket(old_files), by_bucket(new_files)
        ot, nt = tomb_counts(old_snap), tomb_counts(new_snap)
        oe, ne = eq_state(old_snap), eq_state(new_snap)
        changed = {
            b
            for b in set(ob) | set(nb)
            if ob.get(b) != nb.get(b)
            or oe.get(b) != ne.get(b)
            or any(
                ot.get(f, 0) != nt.get(f, 0)
                for f in (ob.get(b, set()) | nb.get(b, set()))
            )
        }
        o_scan = sorted(f for b in changed for f in ob.get(b, ()))
        n_scan = sorted(f for b in changed for f in nb.get(b, ()))

        fields = self.schema.fieldNames()
        val_cols = [c for c in fields if c not in self.primary_key]

        def load(files: list[str], snap: Snapshot | None) -> DataFrame:
            if not files:
                return self.spark.createDataFrame([], self.schema)
            return self._read_live(
                files, self.schema, self.field_ids, snap
            ).select(*fields)

        # presence markers added BEFORE the join: a join miss leaves the
        # whole side NULL including the marker (PK columns themselves are
        # NULL-able here, so they can't serve as presence flags)
        o = load(o_scan, old_snap).withColumn("__present", F.lit(1)).alias("o")
        n = load(n_scan, new_snap).withColumn("__present", F.lit(1)).alias("n")
        cond = None
        for k in self.primary_key:
            c = F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
            cond = c if cond is None else cond & c
        j = o.join(n, on=cond, how="full_outer")
        o_present = F.col("o.__present").isNotNull()
        n_present = F.col("n.__present").isNotNull()
        same_vals = None
        for c in val_cols:
            e = F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
            same_vals = e if same_vals is None else same_vals & e
        op = (
            F.when(~o_present, F.lit("insert"))
            .when(~n_present, F.lit("delete"))
            .when(same_vals if same_vals is not None else F.lit(True), F.lit(None))
            .otherwise(F.lit("update"))
        )
        out_cols = [
            F.coalesce(F.col(f"n.{c}"), F.col(f"o.{c}")).alias(c)
            if c in self.primary_key
            else F.when(op == "delete", F.col(f"o.{c}"))
            .otherwise(F.col(f"n.{c}"))
            .alias(c)
            for c in fields
        ]
        compact = j.select(op.alias("op"), *out_cols).filter(
            F.col("op").isNotNull()
        )
        if mode == "compact":
            return compact
        if mode != "full":
            raise ValueError(f"changelog mode {mode!r}: compact|full")
        # retraction form: update → (update_before: old values,
        # update_after: new values); insert/delete pass through
        before_cols = [
            F.coalesce(F.col(f"o.{c}"), F.col(f"n.{c}")).alias(c)
            if c in self.primary_key
            else F.col(f"o.{c}").alias(c)
            for c in fields
        ]
        upd = j.filter(op == "update")
        return (
            compact.filter(F.col("op") != "update")
            .unionByName(
                upd.select(F.lit("update_before").alias("op"), *before_cols)
            )
            .unionByName(
                upd.select(F.lit("update_after").alias("op"), *out_cols)
            )
        )

    def incremental_read(self, from_version: int, to_version: int | None = None) -> DataFrame:
        """Incremental append scan (the Iceberg ``incremental read``
        role): rows ADDED strictly after ``from_version`` up to and
        including ``to_version``. Implemented as the file-set difference
        of the two snapshots — planning cost is O(#files) metadata only,
        and the scan reads exactly the delta files, never the table.
        Raises if the range crosses a commit that rewrote or deleted
        data (overwrite / merge / compact / MoR delete — "added rows" is
        not defined by file difference there) — Iceberg's incremental
        scan refuses replace/overwrite snapshots the same way. Judged by
        what each commit DID to the file set, not its operation name, so
        metadata-only commits (ALTER TABLE schema-change, constraint,
        partition-spec evolution) pass through: their file diff is
        exactly the appended files. Walks main's parent chain, so branch
        snapshots whose ids interleave with the range are ignored."""
        to_v = self.current_version() if to_version is None else to_version
        if from_version > to_v:
            raise ValueError(f"from_version {from_version} > to_version {to_v}")
        chain: list[Snapshot] = []
        v = to_v
        legacy = False
        while v > from_version and v >= 0:
            try:
                s = self.snapshot(v)
            except ValueError:
                # mid-chain snapshot expired: lineage unverifiable, fall
                # back to the retained-range operation check (the old
                # behavior, which serves append-only ranges correctly —
                # appended files stay referenced by retained snapshots)
                legacy = True
                break
            chain.append(s)
            if s.parent_id is None:
                legacy = True  # pre-lineage snapshot: can't walk further
                break
            v = s.parent_id
        if legacy:
            # conservative fallback over the id range (old behavior plus
            # metadata-only ops, which never move files)
            for sv in self.snapshot_versions():
                if (
                    from_version < sv <= to_v
                    and self.snapshot(sv).operation
                    not in ("append", "schema-change")
                ):
                    raise ValueError(
                        f"incremental read range crosses non-append snapshot "
                        f"{sv} ({self.snapshot(sv).operation})"
                    )
        else:
            if v != from_version and not (v < 0 and from_version < 0):
                raise ValueError(
                    f"{self.name}: v{from_version} is not an ancestor of "
                    f"v{to_v} — incremental read needs a lineage range"
                )
            for i, s in enumerate(chain):
                if i + 1 < len(chain):
                    par = chain[i + 1]
                elif s.parent_id is not None and s.parent_id >= 0:
                    par = self.snapshot(s.parent_id)
                else:
                    par = None
                removed = (set(par.files) if par else set()) - set(s.files)
                new_dels = set(s.delete_files) - set(par.delete_files if par else [])
                if removed or new_dels:
                    raise ValueError(
                        f"incremental read range crosses non-append rewrite "
                        f"snapshot {s.snapshot_id} ({s.operation}: "
                        f"{len(removed)} file(s) removed, "
                        f"{len(new_dels)} delete file(s) added)"
                    )
        base = set(self.snapshot(from_version).files) if from_version >= 0 else set()
        delta = [f for f in self.snapshot(to_v).files if f not in base]
        if not delta:
            return self.spark.createDataFrame([], self.schema)
        return (
            self.spark.read.schema(T.StructType(self.schema.fields))
            .parquet(*[os.path.join(self.path, f) for f in delta])
            .select(*self.schema.fieldNames())
        )

    def changelog_stream(
        self, from_version: int = 0, to_version: int | None = None
    ) -> DataFrame:
        """Subscribable per-commit changelog for PK tables — the piece the
        reference's union-read contract covers for datalake PK tables
        continuously (README.md:296-316) and ``stream_appends()`` refuses:
        one ``changelog(v, v')`` diff per consecutive retained snapshot
        pair, tagged ``change_version`` (the commit that produced the
        change), in deterministic micro-batch-replay form like the rest of
        the streaming surface.

        Scale shape: each step diff scans only that commit's changed
        buckets (changelog()'s file-set pruning), so the whole stream
        reads O(total changed data), never O(#commits × table)."""
        if not self.primary_key:
            raise ValueError(f"{self.name}: changelog_stream() requires a PK table")
        to_v = self.current_version() if to_version is None else to_version
        versions = [v for v in self.snapshot_versions() if from_version <= v <= to_v]
        out: DataFrame | None = None
        for a, b in zip(versions, versions[1:]):
            step = self.changelog(a, b).withColumn("change_version", F.lit(b))
            out = step if out is None else out.unionByName(step)
        if out is None:
            empty = T.StructType(
                [T.StructField("op", T.StringType())]
                + list(self.schema.fields)
                + [T.StructField("change_version", T.LongType())]
            )
            return self.spark.createDataFrame([], empty)
        return out

    def compose_changelog(self, log: DataFrame) -> DataFrame:
        """Compact a multi-commit changelog stream to net per-key changes
        (Kafka-compaction / Debezium-squash semantics): insert→…→delete
        cancels, insert→update stays insert, update→delete is delete,
        otherwise update carrying the LAST change's values. One shuffle on
        the primary key (min_by/max_by hash aggregation) — no window sort.

        Caveat (documented, inherent to op-only composition): an
        update chain that exactly reverts to the starting values still
        emits an update, where a base-state diff would emit nothing."""
        pk = self.primary_key
        val_cols = [c for c in self.schema.fieldNames() if c not in pk]
        agg = log.groupBy(*pk).agg(
            F.expr("min_by(op, change_version)").alias("__first_op"),
            F.expr("max_by(op, change_version)").alias("__last_op"),
            *[
                F.expr(f"max_by(`{c}`, change_version)").alias(c)
                for c in val_cols
            ],
        )
        first_op, last_op = F.col("__first_op"), F.col("__last_op")
        op = (
            F.when((last_op == "delete") & (first_op == "insert"), F.lit(None))
            .when(last_op == "delete", F.lit("delete"))
            .when(first_op == "insert", F.lit("insert"))
            .otherwise(F.lit("update"))
        )
        return (
            agg.select(op.alias("op"), *self.schema.fieldNames())
            .filter(F.col("op").isNotNull())
        )

    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """The Iceberg ``expire_snapshots`` role: drop all but the newest
        ``keep_last`` snapshots' metadata, then delete data files no
        retained snapshot references. Time travel to an expired version
        raises; the current snapshot (and everything it references) is
        never touched. Metadata and file deletion are driver-side O(#files)
        operations on this table's directory — no data is read.

        Expiry order is crash-safe: a metadata json is removed before its
        newly-unreferenced files, so a crash mid-expiry can leave garbage
        files (cleaned by ``remove_orphan_files``) but never a retained
        snapshot with missing files."""
        versions = self.snapshot_versions()
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        refs = self._refs()  # tags, branch heads, and main's current
        # snapshot never expire (branch commits can outnumber main's, so
        # "newest keep_last" alone could otherwise drop main's head)
        tagged = (
            set(refs["tags"].values())
            | set(refs["branches"].values())
            | {self.current_version()}
        )
        # a branch's whole ANCESTRY down to main's current head is also
        # protected: fast_forward verifies descent by walking parent ids,
        # and an expired mid-chain snapshot would make a legitimate
        # publish unverifiable (wedging the WAP pipeline). O(branch
        # length) metadata reads, no data I/O.
        cur = self.current_version()
        retained_set = set(versions)
        for head in refs["branches"].values():
            v = head
            while v >= 0 and v != cur and v in retained_set:
                tagged.add(v)
                s = self.snapshot(v)
                if s.parent_id is None:
                    break
                v = s.parent_id
        expired = [v for v in versions[:-keep_last] if v not in tagged]
        retained = [v for v in versions if v not in expired]
        keep_files = set()
        for v in retained:
            s = self.snapshot(v)
            keep_files.update(s.files)
            keep_files.update(s.delete_files)
        removed_files = []
        for v in expired:
            snap = self.snapshot(v)
            os.remove(self._meta(f"v{v}.json"))
            for f in list(snap.files) + list(snap.delete_files):
                if f not in keep_files:
                    p = os.path.join(self.path, f)
                    if os.path.exists(p):
                        os.remove(p)
                    removed_files.append(f)
        return {
            "expired_snapshots": expired,
            "retained_snapshots": retained,
            "removed_files": sorted(set(removed_files)),
        }

    def remove_orphan_files(self, older_than_hours: float | None = None) -> list[str]:
        """The Iceberg ``remove_orphan_files`` role: delete parquet files
        under ``data/`` that no existing snapshot references — debris
        from writes whose commit never landed (the commit protocol writes
        files first, metadata last) or from a crash mid-expiry. Hot
        staging batches live under ``hot/`` and are never candidates.

        ``older_than_hours`` bounds the sweep of STAGED transaction
        metadata (``txn-v{N}.json``): staged snapshots younger than the
        horizon are presumed to belong to a live transaction and are
        kept (the Iceberg ``older_than`` discipline — mirrors the
        ``gc.orphan.older-than-hours`` table property, which is the
        default when the argument is omitted; falls back to 24h). A
        transaction whose staged snapshot IS swept (it outlived the
        horizon) fails at publish with a descriptive
        ``CommitConflictError`` rather than a raw OSError."""
        if older_than_hours is None:
            older_than_hours = float(
                self.properties.get("gc.orphan.older-than-hours", 24)
            )
        referenced = set()
        for v in self.snapshot_versions():
            s = self.snapshot(v)
            referenced.update(s.files)
            referenced.update(s.delete_files)
        # LIVE staged snapshots — a transaction's txn-v{N}.json or a
        # facade-routed commit's rest-v{N}.json — are not listed by
        # snapshot_versions() but their data files are not orphans:
        # protect them, and only sweep staged metadata old enough that
        # no commit can still be in flight (the Iceberg
        # remove_orphan_files `older_than` discipline)
        stale_staged = []
        now_ms = int(time.time() * 1000)
        for fname in os.listdir(self._meta()):
            if fname.startswith(("txn-v", "rest-v")) and fname.endswith(".json"):
                try:
                    with open(self._meta(fname)) as f:
                        staged = Snapshot.from_json(f.read())
                except (OSError, ValueError, KeyError):
                    continue  # unreadable staged debris: keep data-safe
                referenced.update(staged.files)
                referenced.update(staged.delete_files)
                if now_ms - staged.committed_at_ms > older_than_hours * 3600 * 1000:
                    stale_staged.append(fname)
        removed = []
        for sub in ("data", "deletes"):
            for dirpath, _dirs, files in os.walk(os.path.join(self.path, sub)):
                for fname in files:
                    full = os.path.join(dirpath, fname)
                    rel = os.path.relpath(full, self.path)
                    if fname.endswith(".parquet") and rel not in referenced:
                        os.remove(full)
                        removed.append(rel)
        for fname in stale_staged:
            os.remove(self._meta(fname))
            removed.append(os.path.join("meta", fname))
        return sorted(removed)

    def export_iceberg_metadata(self) -> str:
        """Export the CURRENT snapshot in the Iceberg v2 on-disk format
        under ``{path}/metadata/`` (table-metadata JSON + Avro manifest
        list/manifests + version-hint) so engine-free Iceberg readers
        can resolve it — the interchange contract the reference's
        cross-engine topology demands (trino/iceberg.properties:2-6,
        README.md:129-133). Returns the metadata-location; the REST
        facade surfaces it on table GETs. See lake/iceberg_meta.py."""
        from fluss_iceberg_spark.lake import iceberg_meta

        return iceberg_meta.export_iceberg_metadata(self)

    def _persist_schema_meta(self) -> None:
        meta_path = os.path.join(self.path, "meta", "table.json")
        with open(meta_path) as f:
            meta = json.load(f)
        meta["schema"] = self.schema.jsonValue()
        meta["not_null"] = self.not_null
        meta["field_ids"] = self.field_ids
        meta["name_log"] = self.name_log
        meta["retired_names"] = self.retired_names
        meta["next_field_id"] = self.next_field_id
        meta["constraints"] = self.constraints
        _atomic_write(meta_path, json.dumps(meta))

    def _persist_properties(self) -> None:
        meta_path = os.path.join(self.path, "meta", "table.json")
        with open(meta_path) as f:
            meta = json.load(f)
        meta["properties"] = self.properties
        _atomic_write(meta_path, json.dumps(meta))

    def set_properties(self, props: dict) -> None:
        """``ALTER TABLE t SET TBLPROPERTIES (...)``: persisted to table
        metadata and landed as a metadata-only snapshot, so write-path
        properties (write.sort-order, bloom/value-set columns,
        auto-compact thresholds, retention, delete/update modes) take
        effect for every subsequent write from any session. Write-path
        column specs are validated eagerly — a typo fails at ALTER, not
        at the next append."""
        before = dict(self.properties)
        self.properties.update({str(k): str(v) for k, v in props.items()})
        try:
            self._write_order_cols()
            self._cluster_column()
        except ValueError:
            self.properties = before
            raise
        self._persist_properties()
        self._commit_schema_change(
            "set-properties " + ",".join(sorted(map(str, props)))
        )

    def unset_properties(self, keys: list) -> None:
        """``ALTER TABLE t UNSET TBLPROPERTIES (...)`` — removing an
        absent key is a no-op, matching Spark/Iceberg."""
        for k in keys:
            self.properties.pop(str(k), None)
        self._persist_properties()
        self._commit_schema_change(
            "unset-properties " + ",".join(sorted(map(str, keys)))
        )

    def _persist_partition_spec(self) -> None:
        meta_path = os.path.join(self.path, "meta", "table.json")
        with open(meta_path) as f:
            meta = json.load(f)
        meta["partition_spec"] = self.partition_spec
        _atomic_write(meta_path, json.dumps(meta))

    def add_partition_field(self, spec: str) -> None:
        """Partition-spec evolution, add (Iceberg ``ALTER TABLE ... ADD
        PARTITION FIELD``): future writes lay out under the extended
        spec; EXISTING files keep their write-time layout and their
        manifest partition record. Pruning stays sound without any
        rewrite because ``_partition_may_match`` evaluates each file
        against the partition values THAT FILE recorded — spec entries a
        file predates are simply non-pruning for it (conservative), and
        footer min/max still applies. This is exactly Iceberg's
        spec-evolution contract: no data migration, old partitions keep
        the old scheme."""
        if self.primary_key:
            raise ValueError(
                f"{self.name}: partition spec applies to log tables "
                "(PK tables are bucket-partitioned by key hash)"
            )
        entry = parse_partition_spec([spec], self.schema)[0]
        if any(p["name"] == entry["name"] for p in self.partition_spec):
            raise ValueError(
                f"{self.name}: partition field {entry['name']!r} already exists"
            )
        self.partition_spec = self.partition_spec + [entry]
        self._persist_partition_spec()
        self._commit_schema_change(f"add-partition-field {entry['name']}")

    def drop_partition_field(self, name_or_spec: str) -> None:
        """Partition-spec evolution, drop: future writes stop deriving
        the field; existing files keep and keep pruning by their recorded
        values (their manifest record is self-describing)."""
        target = name_or_spec.strip()
        try:
            target = parse_partition_spec([target], self.schema)[0]["name"]
        except ValueError:
            pass  # already a partition-field name, not a spec expression
        keep = [p for p in self.partition_spec if p["name"] != target]
        if len(keep) == len(self.partition_spec):
            raise ValueError(
                f"{self.name}: no partition field {target!r} "
                f"(have {[p['name'] for p in self.partition_spec]})"
            )
        self.partition_spec = keep
        self._persist_partition_spec()
        self._commit_schema_change(f"drop-partition-field {target}")

    def _commit_schema_change(self, what: str) -> None:
        """Schema evolution lands as a snapshot (same files, zero data
        I/O), so time travel to any earlier snapshot reads under the
        schema THAT snapshot recorded — Iceberg's metadata-version
        semantics. No-op before the first data commit."""
        self._persist_schema_meta()
        snap = self.snapshot()
        if snap is not None:
            self._commit(
                "schema-change",
                list(snap.files),
                snap.total_rows + snap.active_delete_count(),
                0,
                summary={"change": what},
            )

    def add_constraint(self, name: str, expr: str) -> None:
        """CHECK constraint (Delta-constraints role; SQL ``ALTER TABLE t
        ADD CONSTRAINT name CHECK (expr)``). Existing rows are validated
        first — one predicate-pushed scan counting violations (FALSE
        evaluations; NULLs pass, per SQL CHECK) — then the constraint
        lands as a metadata-only snapshot and every subsequent write
        enforces it inline in the write projection (``_prepare``): a
        violating batch fails before any file is committed."""
        if name in self.constraints:
            raise ValueError(f"constraint {name!r} already exists")
        try:
            F.expr(expr)
        except Exception as ex:
            raise ValueError(f"cannot parse CHECK expression {expr!r}: {ex}")
        n_bad = (
            self.read()
            .filter(~F.coalesce(F.expr(expr), F.lit(True)))
            .limit(1)
            .count()
        )
        if n_bad:
            raise ValueError(
                f"cannot add constraint {name!r}: existing rows violate "
                f"CHECK ({expr})"
            )
        self.constraints[name] = expr
        self._commit_schema_change(f"add-constraint {name}")

    def drop_constraint(self, name: str) -> None:
        if name not in self.constraints:
            raise ValueError(f"no such constraint {name!r}")
        del self.constraints[name]
        self._commit_schema_change(f"drop-constraint {name}")

    def add_column(self, name: str, dtype: T.DataType) -> None:
        """Schema evolution: append a nullable column. Existing parquet
        files simply lack the column — snapshot reads project it as NULL
        (read-schema projection), exactly Iceberg's add-column semantics.
        No data rewrite. A name that ever belonged to a dropped/renamed
        column is refused: old files still carry data under it, and this
        engine resolves columns by name (Iceberg's field ids allow reuse;
        the tombstone guard buys the same safety)."""
        if name in self.schema.fieldNames():
            raise ValueError(f"column {name} already exists")
        if name in self.retired_names:
            raise ValueError(
                f"column name {name!r} was previously dropped/renamed; old "
                "data files still carry it — pick a fresh name"
            )
        self.schema = T.StructType(
            self.schema.fields + [T.StructField(name, dtype, True)]
        )
        fid = self.next_field_id
        self.next_field_id += 1
        self.field_ids[name] = fid
        self.name_log[str(fid)] = [name]
        self._commit_schema_change(f"add_column {name}")

    # legal type promotions (the Iceberg schema-evolution matrix §4.1:
    # a promotion must be exact — every old value representable in the
    # new type — so reads of un-rewritten files just upcast)
    _WIDEN_OK = (
        (T.IntegerType, T.LongType),
        (T.ShortType, T.IntegerType),
        (T.ShortType, T.LongType),
        (T.FloatType, T.DoubleType),
    )

    def widen_column(self, name: str, new_type: T.DataType) -> None:
        """Schema evolution: TYPE WIDENING, metadata-only (Iceberg's
        type-promotion rules): int→bigint, float→double, and
        decimal(P,S)→decimal(P',S) with P'>=P. Old parquet files keep
        their narrow physical type; reads resolve them under the widened
        read schema (parquet upcast — exact by construction, so no
        rewrite and no value change). Narrowing and scale changes are
        refused: they can lose values, which Iceberg likewise forbids."""
        if name not in self.schema.fieldNames():
            raise KeyError(f"{self.name}: no such column {name!r}")
        old_t = self.schema[name].dataType
        ok = any(
            isinstance(old_t, a) and isinstance(new_type, b)
            for a, b in self._WIDEN_OK
        )
        if (
            isinstance(old_t, T.DecimalType)
            and isinstance(new_type, T.DecimalType)
            and new_type.scale == old_t.scale
            and new_type.precision >= old_t.precision
        ):
            ok = True
        if old_t == new_type:
            return  # idempotent no-op
        if not ok:
            raise ValueError(
                f"{self.name}: cannot widen {name} from "
                f"{old_t.simpleString()} to {new_type.simpleString()} — "
                "only int→bigint, float→double, and same-scale decimal "
                "precision growth are exact promotions"
            )
        self.schema = T.StructType(
            [
                T.StructField(name, new_type, f.nullable, f.metadata)
                if f.name == name
                else f
                for f in self.schema.fields
            ]
        )
        self._commit_schema_change(
            f"widen_column {name} {old_t.simpleString()}->{new_type.simpleString()}"
        )

    def _guard_column_references(self, col: str, action: str) -> None:
        """Refuse a metadata-only column change that would brick later
        writes: CHECK constraints, write.sort-order, and
        write.clustered-by all store column references by NAME and are
        evaluated in the write path (_prepare / _write_files), so a
        rename/drop of a referenced column would make every subsequent
        append/merge raise. Word-boundary text match on constraint
        expressions — conservative (a name inside a string literal also
        refuses), which errs on the safe side."""
        pat = re.compile(rf"\b{re.escape(col)}\b")
        for cname, expr in self.constraints.items():
            if pat.search(expr):
                raise ValueError(
                    f"{self.name}: cannot {action} column {col!r} — CHECK "
                    f"constraint {cname!r} references it ({expr}); DROP "
                    "CONSTRAINT first"
                )
        spec = self.properties.get("write.sort-order") or ""
        if col in [c.strip().strip("`") for c in spec.split(",") if c.strip()]:
            raise ValueError(
                f"{self.name}: cannot {action} column {col!r} — it is in "
                "write.sort-order; unset the property first"
            )
        cspec = self.properties.get("write.clustered-by")
        if cspec and pat.search(cspec):
            raise ValueError(
                f"{self.name}: cannot {action} column {col!r} — it is in "
                "write.clustered-by; unset the property first"
            )

    def rename_column(self, old: str, new: str) -> None:
        """Schema evolution: RENAME COLUMN, metadata-only (Iceberg §2.7).
        The field keeps its id; old data files keep their data under the
        old name and reads coalesce across the field's name history, so
        no rewrite happens and un-evolved files stay readable."""
        if old not in self.schema.fieldNames():
            raise KeyError(f"{self.name}: no such column {old!r}")
        if new in self.schema.fieldNames():
            raise ValueError(f"{self.name}: column {new!r} already exists")
        if new in self.retired_names or any(
            new in names for names in self.name_log.values()
        ):
            raise ValueError(
                f"{self.name}: name {new!r} appears in column history; old "
                "files may carry it — pick a fresh name"
            )
        if old in self.primary_key:
            raise ValueError(f"{self.name}: cannot rename PK column {old!r}")
        if any(p["col"] == old for p in self.partition_spec):
            raise ValueError(
                f"{self.name}: cannot rename partition source column {old!r}"
            )
        self._guard_column_references(old, "rename")
        fid = self.field_ids.pop(old)
        self.field_ids[new] = fid
        self.name_log.setdefault(str(fid), [old])
        if new not in self.name_log[str(fid)]:
            self.name_log[str(fid)].append(new)
        if old not in self.retired_names:
            self.retired_names.append(old)
        self.schema = T.StructType(
            [
                T.StructField(new, f.dataType, f.nullable, f.metadata)
                if f.name == old
                else f
                for f in self.schema.fields
            ]
        )
        self.not_null = [new if c == old else c for c in self.not_null]
        self._commit_schema_change(f"rename_column {old}->{new}")

    def drop_column(self, name: str) -> None:
        """Schema evolution: DROP COLUMN, metadata-only (Iceberg §2.7).
        Old files keep the bytes; reads simply stop projecting the
        column (parquet column pruning — dropped data is never even
        decoded). The name and its history are tombstoned so a future
        add_column can't resurrect old values."""
        if name not in self.schema.fieldNames():
            raise KeyError(f"{self.name}: no such column {name!r}")
        if name in self.primary_key:
            raise ValueError(f"{self.name}: cannot drop PK column {name!r}")
        if any(p["col"] == name for p in self.partition_spec):
            raise ValueError(
                f"{self.name}: cannot drop partition source column {name!r}"
            )
        self._guard_column_references(name, "drop")
        if len(self.schema.fields) == 1:
            raise ValueError(f"{self.name}: cannot drop the only column")
        fid = self.field_ids.pop(name)
        for n in self.name_log.get(str(fid), [name]):
            if n not in self.retired_names:
                self.retired_names.append(n)
        self.schema = T.StructType(
            [f for f in self.schema.fields if f.name != name]
        )
        self.not_null = [c for c in self.not_null if c != name]
        self._commit_schema_change(f"drop_column {name}")

    # ---------- hot staging + tiering + union read ----------

    def _hot_dir(self, batch_id: int) -> str:
        return os.path.join(self.path, "hot", f"batch={batch_id}")

    def hot_batches(self) -> list[int]:
        hot = os.path.join(self.path, "hot")
        if not os.path.isdir(hot):
            return []
        return sorted(
            int(d.split("=", 1)[1]) for d in os.listdir(hot) if d.startswith("batch=")
        )

    def write_hot_batch(self, df: DataFrame, batch_id: int) -> None:
        """Stage a stream micro-batch in the hot store (the Fluss role).
        Idempotent per batch_id: a retried batch overwrites itself."""
        df = self._enforce_not_null(self._prepare(df))
        df.write.mode("overwrite").parquet(self._hot_dir(batch_id))

    def _read_hot_batches(self, batches: list[int], with_batch_id: bool) -> DataFrame:
        """Read the given staged batches; optionally tag each row with its
        batch id (one read per batch dir — batch counts are small by
        construction, the tiering loop drains them every freshness tick)."""
        if not with_batch_id:
            return self._project_files(
                [self._hot_dir(b) for b in batches], self.schema, self.field_ids
            )
        parts = [
            self._project_files([self._hot_dir(b)], self.schema, self.field_ids)
            .withColumn("__batch_id", F.lit(b))
            for b in batches
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    def read_hot(
        self, after_watermark: int | None = None, with_batch_id: bool = False
    ) -> DataFrame:
        wm = (
            after_watermark
            if after_watermark is not None
            else (self.snapshot().hot_watermark if self.snapshot() else -1)
        )
        batches = [b for b in self.hot_batches() if b > wm]
        if not batches:
            df = self.spark.createDataFrame([], self.schema)
            return df.withColumn("__batch_id", F.lit(-1)) if with_batch_id else df
        return self._read_hot_batches(batches, with_batch_id)

    def tier(self, up_to_batch: int | None = None) -> Snapshot | None:
        """Lake tiering (S17/ST5): drain staged hot batches ≤ up_to_batch
        into the lake, advancing the watermark atomically with the commit.
        Append semantics for log tables, MERGE for PK tables — matching
        the reference tiering job (docker-compose.yml:95-111).

        The watermark advance rides the merge/append commit itself (via
        ``_pending_commit_extra``), so a crash can never leave a batch
        visible in both the lake and the hot store: either the snapshot
        (files + watermark) landed atomically, or neither did.

        Cross-batch ordering: for PK tables the reference's tiering is
        log-ordered — a key written in batch 5 and again in batch 7 must
        end at batch 7's value. Duplicate keys are resolved by descending
        batch id *before* the merge.
        """
        current_wm = self.snapshot().hot_watermark if self.snapshot() else -1
        batches = [b for b in self.hot_batches() if b > current_wm]
        if up_to_batch is not None:
            batches = [b for b in batches if b <= up_to_batch]
        if not batches:
            return None
        new_wm = max(batches)
        df = self._read_hot_batches(batches, with_batch_id=bool(self.primary_key))
        self._pending_commit_extra = {
            "operation": "tier",
            "hot_watermark": new_wm,
            "summary": {"tiered_batches": batches},
        }
        try:
            if self.primary_key:
                from pyspark.sql.window import Window

                w = Window.partitionBy(*self.primary_key).orderBy(
                    F.col("__batch_id").desc()
                )
                resolved = (
                    df.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1)
                    .select(*self.schema.fieldNames())
                )
                return self.merge(resolved)
            return self.append(df.select(*self.schema.fieldNames()))
        finally:
            self._pending_commit_extra = None

    def stream_appends(self) -> DataFrame:
        """U2: subscribe to a log table as a stream — the reference's
        streaming read of a Fluss log table (README.md:296-302). A parquet
        file stream over the data directory picks up each append commit's
        files as they land; exactly-once via the file-source log +
        downstream checkpoints. Log tables only (PK tables rewrite bucket
        files on merge, which would re-emit rows)."""
        if self.primary_key:
            raise ValueError(
                f"{self.name}: changelog streaming of PK tables is not "
                "supported (copy-on-write rewrites would re-emit rows)"
            )
        return (
            self.spark.readStream.schema(T.StructType(self.schema.fields))
            .option("pathGlobFilter", "*.parquet")
            .parquet(os.path.join(self.path, "data", "*"))
        )

    # Hot bytes above which PK union_read falls back to the full-shuffle
    # window plan instead of broadcasting the hot key set. Hot data is
    # bounded by the tiering freshness budget, so in steady state it is
    # far below this; the guard only matters when tiering has stalled.
    _HOT_BROADCAST_MAX_BYTES = 256 * 1024 * 1024

    def _hot_bytes(self) -> int:
        """Driver-side size of un-tiered hot batches (os.stat only — no
        Spark job), used to pick the union_read plan."""
        wm = self.snapshot().hot_watermark if self.snapshot() else -1
        total = 0
        for b in self.hot_batches():
            if b <= wm:
                continue
            d = self._hot_dir(b)
            for f in os.listdir(d):
                if f.endswith(".parquet"):
                    total += os.path.getsize(os.path.join(d, f))
        return total

    def union_read(self) -> DataFrame:
        """Hot∪cold union read (U1, README.md:296-316): lake snapshot plus
        hot batches beyond the snapshot's watermark. The watermark makes
        the boundary exactly-once: no dup, no gap.

        Log tables: plain union. PK tables (the reference's
        datalake-enabled ``nation_revenue``, README.md:196-203, 296-316):
        last value per key — a key updated in a hot batch after tiering
        must surface once, at its hot value. Resolution order: higher hot
        batch id > lower > lake snapshot.

        Scale shape: the hot side is a few freshness-ticks of data, the
        cold side is the table — so the exchange must be bounded by HOT
        volume, never cold. The hot key set is broadcast; cold rows
        without a hot match (the overwhelming majority) pass through with
        NO shuffle (broadcast anti-join), and only hot ∪ contested-cold
        rows enter the last-writer window. Null-safe key equality (NULL
        is a legal PK value, FIXTURES invariant 3). If tiering has
        stalled and hot bytes exceed the broadcast guard, falls back to
        the one-full-shuffle window plan."""
        cold = self.read()
        if not self.primary_key:
            return cold.unionByName(self.read_hot())
        hot = self.read_hot(with_batch_id=True)
        from pyspark.sql.window import Window

        w = Window.partitionBy(*self.primary_key).orderBy(F.col("__batch_id").desc())
        if self._hot_bytes() > self._HOT_BROADCAST_MAX_BYTES:
            merged = cold.withColumn("__batch_id", F.lit(-1)).unionByName(hot)
            return (
                merged.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .select(*self.schema.fieldNames())
            )
        hot_keys = F.broadcast(
            hot.select(
                *[F.col(k).alias(f"__hk_{k}") for k in self.primary_key]
            ).dropDuplicates()
        )

        def _cond(left: DataFrame):
            cond = None
            for k in self.primary_key:
                c = left[k].eqNullSafe(F.col(f"__hk_{k}"))
                cond = c if cond is None else cond & c
            return cond

        untouched = cold.join(hot_keys, on=_cond(cold), how="left_anti")
        contested = cold.join(hot_keys, on=_cond(cold), how="left_semi")
        resolved = (
            contested.withColumn("__batch_id", F.lit(-1))
            .unionByName(hot)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(*self.schema.fieldNames())
        )
        return untouched.select(*self.schema.fieldNames()).unionByName(resolved)


class CatalogTransaction:
    """Multi-table ATOMIC transaction (the capability single-table
    Iceberg lacks and catalog-level systems — Nessie, a transactional
    REST catalog — add): writes against any number of this catalog's
    tables become visible together or not at all.

    Protocol (write-ahead intent + roll-forward, the standard 2-phase
    shape):

    1. STAGE — each table commit runs its normal machinery (conflict
       CAS, manifest stats, constraint enforcement) and exclusive-
       creates its snapshot json under the staged name
       ``txn-v{N}.json`` — a name no reader lists, so uncommitted work
       is invisible to EVERY other reader: pointer-following reads,
       ``$snapshots`` listings, and explicit ``read(version=N)`` time
       travel alike. The txn's own tables read their staged head
       (read-your-own-writes via the staged-name fallback).
    2. LINK + INTENT (under the catalog commit lock) — re-verify no
       pointer moved, hard-link every staged json into its public
       ``v{N}.json`` place (exclusive — a racing writer that claimed
       the same id loses here), then atomically write
       ``_txn/txn-<id>.json`` listing every (table, version). The
       intent file is the commit point.
    3. PUBLISH — flip each table's VERSION pointer, delete the intent
       file, drop the staged names.

    Crash before INTENT: staged/linked jsons are orphan debris the
    pointer CAS already skips past (cleaned by remove_orphan_files).
    Crash after INTENT: ``LakeCatalog.__init__`` ROLLS FORWARD — it
    re-applies every pointer flip idempotently (skipping tables a later
    commit already advanced) and deletes the intent file. Readers
    therefore never observe a partially-published transaction across a
    process restart. Single-table commits flip their pointer under the
    same commit lock, so a concurrent commit can never be silently
    overwritten by the publish step. In a real deployment steps 2-3
    are one catalog CAS (the same stand-in boundary as S18's
    snapshot-log protocol). Known filesystem-stand-in leak at that
    boundary: between a table's ``v{N}.json`` link and the intent
    write there is a brief window where an explicit
    ``read(version=N)`` / ``snapshot_versions()`` can observe a
    snapshot that would be aborted if a LATER table's link or the
    re-verify fails — pointer-following reads are unaffected (the
    VERSION pointer only moves post-intent), and a real catalog CAS
    collapses the window to zero. Accepted as documented behavior of
    the stand-in.

    Not combinable with branch writes (``on_branch`` has its own
    publish path — WAP already gives staged isolation there).
    """

    def __init__(self, catalog: "LakeCatalog"):
        self.catalog = catalog
        self._tables: dict[str, LakeTable] = {}
        # path -> {"first_base": int, "latest": int, "all": [versions]}
        self._staged: dict[str, dict] = {}
        self._done = False
        # callers may stage DIFFERENT tables from concurrent threads
        # (the admission claim phase overlaps its three state writes);
        # the registry mutation itself must stay atomic
        import threading

        self._stage_lock = threading.Lock()

    def table(self, name: str) -> LakeTable:
        if name not in self._tables:
            t = self.catalog.load(name)
            if t.write_branch:
                raise ValueError("transactions do not combine with branches")
            t._txn = self
            self._tables[name] = t
        return self._tables[name]

    def staged_version(self, t: LakeTable) -> int | None:
        s = self._staged.get(t.path)
        return s["latest"] if s else None

    def staged_all(self, t: LakeTable) -> list[int]:
        """Every snapshot version this txn has staged for ``t`` (the
        set whose metadata lives under txn-v{N}.json until publish)."""
        s = self._staged.get(t.path)
        return list(s["all"]) if s else []

    def base_version(self, t: LakeTable, cur: int) -> int:
        """The pointer value this table must still hold for the txn's
        stage to be conflict-free: its value at first stage (or now)."""
        s = self._staged.get(t.path)
        return s["first_base"] if s else cur

    def stage(self, t: LakeTable, base: int, version: int) -> None:
        with self._stage_lock:
            s = self._staged.setdefault(
                t.path, {"first_base": base, "latest": version, "all": []}
            )
            s["latest"] = version
            s["all"].append(version)

    def commit(self) -> None:
        if self._done:
            raise ValueError("transaction already finished")
        self._done = True
        try:
            # A warehouse that opted into a REST catalog facade routes
            # the whole multi-table publish through the catalog SERVICE
            # (the Iceberg REST commitTransaction shape) — the facade
            # runs the same verify→link→intent→publish protocol under
            # the same commit section, so crash recovery is shared.
            endpoint = _rest_catalog_endpoint(self.catalog.warehouse)
            if endpoint and self._staged:
                self._commit_via_rest(endpoint)
                return
            # The whole verify→intent→publish sequence runs under the
            # catalog commit lock: single-table commits flip their
            # pointer under the same lock, so no concurrent commit can
            # land between the re-verify below and the pointer flips —
            # the lost-update window is closed, not just narrowed.
            # (Crash-with-lock-held is safe: flock dies with the
            # process, and the intent file decides commit vs abort.)
            with _commit_lock(os.path.join(self.catalog.warehouse, "_")):
                # Pre-intent phase: any failure here aborts (staged
                # snapshot jsons are unpublished, so deleting is safe).
                try:
                    # re-verify no table moved since its first stage
                    for path, s in self._staged.items():
                        t = self._tables_by_path(path)
                        if t.current_version() != s["first_base"]:
                            raise CommitConflictError(
                                f"concurrent commit advanced {t.name} "
                                "during the transaction"
                            )
                    # link every staged txn-v{N}.json into its public
                    # v{N}.json place — still pre-intent, still under
                    # the lock, exclusive (a racing non-txn writer that
                    # claimed the same id pre-lock loses here or we
                    # do). Linked-but-unpublished files on a crash are
                    # the orphan debris the id-skipping pointer CAS
                    # already tolerates.
                    for path, s in self._staged.items():
                        for v in s["all"]:
                            staged_p = os.path.join(
                                path, "meta", f"txn-v{v}.json"
                            )
                            try:
                                os.link(
                                    staged_p,
                                    os.path.join(path, "meta", f"v{v}.json"),
                                )
                            except FileExistsError:
                                raise CommitConflictError(
                                    f"concurrent writer claimed snapshot "
                                    f"v{v} of {os.path.basename(path)} "
                                    "during the transaction"
                                ) from None
                            except FileNotFoundError:
                                raise CommitConflictError(
                                    f"transaction expired: staged snapshot "
                                    f"txn-v{v}.json of "
                                    f"{os.path.basename(path)} was swept "
                                    "(remove_orphan_files ran past its "
                                    "older_than horizon while this "
                                    "transaction was still open)"
                                ) from None
                    intent_dir = os.path.join(self.catalog.warehouse, "_txn")
                    os.makedirs(intent_dir, exist_ok=True)
                    intent = {
                        "entries": [
                            {"path": path, "version": s["latest"]}
                            for path, s in self._staged.items()
                        ]
                    }
                    intent_path = os.path.join(
                        intent_dir, f"txn-{uuid.uuid4().hex}.json"
                    )
                    _atomic_write(intent_path, json.dumps(intent))  # commit point
                except Exception:
                    self._abort()
                    raise
                # Post-intent phase: the transaction IS durably
                # committed. A failure mid-publish must roll FORWARD,
                # never abort — some VERSION pointers may already
                # reference staged snapshots, so deleting them would
                # dangle live pointers.
                publish_failed = False
                try:
                    for path, s in self._staged.items():
                        _atomic_write(
                            os.path.join(path, "meta", "VERSION"),
                            str(s["latest"]),
                        )
                    os.remove(intent_path)
                except Exception:
                    publish_failed = True
                # the public v{N}.json links are live; drop the staged
                # names (best-effort — leftovers are invisible debris)
                for path, s in self._staged.items():
                    for v in s["all"]:
                        try:
                            os.remove(
                                os.path.join(path, "meta", f"txn-v{v}.json")
                            )
                        except FileNotFoundError:
                            pass
            if publish_failed:
                # finish the publish in-process if possible — OUTSIDE
                # the lock above (recovery takes the lock itself; flock
                # between two fds of one process would deadlock)
                try:
                    self.catalog._recover_transactions()
                except Exception:
                    pass  # intent remains; next open rolls forward
        finally:
            self._detach()

    def _commit_via_rest(self, endpoint: str) -> None:
        """Publish every staged table atomically through the catalog
        facade (rest_catalog._txn_commit — verify→link→intent→publish
        under the shared commit section). Failure resolution mirrors
        LakeTable._cas_via_rest: on transport loss the staged
        ``txn-v{N}.json`` names discriminate — the facade consumes them
        all at publish time, so all-present ⇒ never applied
        (determinate failure), all-gone + every pointer at/past its
        target ⇒ applied with the response lost; anything mixed is
        first given to the intent roll-forward sweep, then surfaced as
        CommitStateUnknownError if still unresolved."""
        import http.client

        from fluss_iceberg_spark.lake import rest_catalog

        changes = [
            {
                "name": os.path.basename(path.rstrip(os.sep)),
                "expected": s["first_base"],
                "target": s["latest"],
                "staged_versions": s["all"],
            }
            for path, s in self._staged.items()
        ]
        err: Exception | None = None
        status, body = 0, {}
        try:
            status, body = rest_catalog.commit_transaction(endpoint, changes)
        except (OSError, http.client.HTTPException, ValueError) as e:
            err = e
        if status == 200:
            # the facade consumed every staged name and flipped every
            # pointer — nothing left for abort/cleanup to touch
            self._staged.clear()
            return
        if status in (400, 409):
            self._abort()
            raise CommitConflictError(
                f"catalog rejected transaction publish: {body.get('error')}"
            )
        # transport error / intermediary status — the facade MAY have
        # applied the transaction. Resolve under the shared section
        # (the facade holds it while processing, so post-lock state is
        # quiescent).
        with _commit_lock(os.path.join(self.catalog.warehouse, "_")):
            staged_flags = [
                os.path.exists(os.path.join(path, "meta", f"txn-v{v}.json"))
                for path, s in self._staged.items()
                for v in s["all"]
            ]
            applied = all(
                self._tables_by_path(path).current_version() >= s["latest"]
                for path, s in self._staged.items()
            )
            if applied and not any(staged_flags):
                self._staged.clear()
                return  # committed; only the response was lost
            if all(staged_flags) and not applied:
                # nothing linked, nothing flipped: determinate failure
                self._abort()
                raise RuntimeError(
                    f"REST catalog at {endpoint} failed the transaction "
                    f"publish ({err or f'HTTP {status}: {body}'}; resolved "
                    "under the commit section: no table advanced, staged "
                    "snapshots removed)"
                ) from err
        # mixed state: an intent MAY exist — let the roll-forward sweep
        # finish a committed-but-unpublished transaction, then re-check
        try:
            self.catalog._recover_transactions()
        except Exception:
            pass
        if all(
            self._tables_by_path(path).current_version() >= s["latest"]
            for path, s in self._staged.items()
        ):
            self._staged.clear()
            return
        raise CommitStateUnknownError(
            f"REST catalog at {endpoint}: transaction publish is in an "
            f"unknown state ({err or f'HTTP {status}: {body}'}); staged "
            "snapshots partially consumed and no intent resolved it"
        ) from err

    def abort(self) -> None:
        if self._done:
            return
        self._done = True
        self._abort()
        self._detach()

    def _abort(self) -> None:
        for path, s in self._staged.items():
            for v in s["all"]:
                staged_p = os.path.join(path, "meta", f"txn-v{v}.json")
                public_p = os.path.join(path, "meta", f"v{v}.json")
                # a public link created by a publish attempt that
                # conflicted mid-linking is OURS only if it is the same
                # inode as the staged file — a racing non-txn writer's
                # own v{N}.json must never be deleted
                try:
                    if os.path.exists(public_p) and os.path.samefile(
                        staged_p, public_p
                    ):
                        os.remove(public_p)
                except FileNotFoundError:
                    pass
                try:
                    os.remove(staged_p)
                except FileNotFoundError:
                    pass
        self._staged.clear()

    def _detach(self) -> None:
        for t in self._tables.values():
            t._txn = None

    def _tables_by_path(self, path: str) -> LakeTable:
        for t in self._tables.values():
            if t.path == path:
                return t
        raise KeyError(path)

    def __enter__(self) -> "CatalogTransaction":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if exc_type is not None:
            self.abort()
        else:
            self.commit()


class LakeCatalog:
    """Directory-per-table catalog (the Iceberg-REST-catalog role, S8/S18)."""

    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)
        self._recover_transactions()

    def transaction(self) -> CatalogTransaction:
        """Begin a multi-table atomic transaction (see
        CatalogTransaction). Use as a context manager."""
        return CatalogTransaction(self)

    def _recover_transactions(self) -> None:
        """Roll FORWARD any transaction that crashed after its intent
        write: re-apply each pointer flip idempotently (a table whose
        pointer already advanced past the txn's version is skipped),
        then drop the intent file."""
        intent_dir = os.path.join(self.warehouse, "_txn")
        if not os.path.isdir(intent_dir):
            return
        for fn in sorted(os.listdir(intent_dir)):
            p = os.path.join(intent_dir, fn)
            try:
                with open(p) as f:
                    intent = json.load(f)
            except (OSError, json.JSONDecodeError):
                continue
            for e in intent.get("entries", []):
                vf = os.path.join(e["path"], "meta", "VERSION")
                snap_f = os.path.join(e["path"], "meta", f"v{e['version']}.json")
                if not os.path.exists(snap_f):
                    continue
                # check-then-flip under the same commit lock every other
                # pointer writer holds: two concurrent recoveries (or a
                # recovery racing a fresh commit) must not let a stale
                # re-read regress the pointer past a newer commit
                with _commit_lock(e["path"]):
                    cur = -1
                    if os.path.exists(vf):
                        with open(vf) as f:
                            cur = int(f.read().strip())
                    if cur < e["version"]:
                        _atomic_write(vf, str(e["version"]))
            os.remove(p)

    def table_path(self, name: str) -> str:
        # _commit_lock derives the catalog-wide lock file from the table
        # path's PARENT dir; a name containing a path separator (or the
        # traversal names '.'/'..', which escape the warehouse without
        # one) would make that parent something other than the warehouse
        # root and silently serialize against a different lock — reject
        # here, the single choke point for create/load/exists/drop.
        if (
            not name
            or name in (".", "..")
            or os.sep in name
            or (os.altsep and os.altsep in name)
        ):
            raise ValueError(
                f"invalid table name {name!r}: tables are direct children "
                "of the warehouse (no path separators, '.' or '..')"
            )
        return os.path.join(self.warehouse, name)

    def exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self.table_path(name), "meta", "table.json"))

    def create_table(
        self,
        name: str,
        schema: T.StructType,
        primary_key: list[str] | None = None,
        not_null: list[str] | None = None,
        n_buckets: int = 16,
        properties: dict | None = None,
        replace: bool = False,
        partition_by: list[str] | None = None,
    ) -> LakeTable:
        """S9/S10/S11: CREATE TABLE (log / PK / datalake-enabled). Datalake
        properties (freshness etc., README.md:189-190) go into
        ``properties`` and drive the tiering scheduler.

        ``partition_by``: Iceberg-style hidden partition spec for log
        tables — ``["days(ts)", "region"]`` with transforms
        identity|years|months|days|hours (trino/iceberg.properties:6's
        cold-path role; README.md:187's ingest_ts is the natural key).
        PK tables are laid out by PK-hash bucket instead (the
        Fluss/Paimon model) — combining both would fragment every bucket
        across every partition, so it's rejected."""
        path = self.table_path(name)
        if self.exists(name):
            if not replace:
                raise ValueError(f"table {name} already exists")
            shutil.rmtree(path)
        spec = parse_partition_spec(partition_by, schema) if partition_by else []
        if spec and primary_key:
            raise ValueError(
                f"table {name}: partition_by applies to log tables; "
                "PK tables are bucketed by key"
            )
        os.makedirs(os.path.join(path, "meta"), exist_ok=True)
        meta = {
            "name": name,
            "schema": schema.jsonValue(),
            "primary_key": primary_key or [],
            "not_null": not_null or [],
            "n_buckets": n_buckets,
            "partition_spec": spec,
            "properties": properties or {},
        }
        _atomic_write(os.path.join(path, "meta", "table.json"), json.dumps(meta))
        return LakeTable(self.spark, path)

    def load(self, name: str) -> LakeTable:
        if not self.exists(name):
            raise KeyError(f"no such table: {name}")
        return LakeTable(self.spark, self.table_path(name))

    def drop(self, name: str) -> None:
        if self.exists(name):
            shutil.rmtree(self.table_path(name))

    def tables(self) -> list[str]:
        """Names of all tables in this warehouse (SHOW TABLES role)."""
        return sorted(
            d
            for d in os.listdir(self.warehouse)
            if self.exists(d)
        )
