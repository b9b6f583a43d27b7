"""Storage-partitioned join (SPJ) over co-bucketed PK tables.

The Iceberg/Spark SPJ role (Spark 3.3+ DSv2 `KeyGroupedPartitioning`,
Iceberg's bucket-transform joins): when two tables are hash-bucketed
the SAME way on the join key, bucket b of one side can only ever match
bucket b of the other — the join needs NO repartitioning of either
side. Catalyst can't see the lake layout through a plain parquet scan
(the stand-in has no DSv2 connector to report partitioning), so this
module enforces the property structurally: one join PER BUCKET over
``LakeTable.read_bucket`` slices, unioned.

Two shapes, chosen by the build side's estimated size:

- **bucket-sliced broadcast** (the default win): broadcast each build
  BUCKET separately into its probe bucket's join. Network cost =
  size(build side) once — vs a shuffle join moving BOTH sides — and
  each broadcast slice is 1/n_buckets of the build table, so the
  pattern survives builds far past the whole-table broadcast threshold
  (a 100 GB dim over 256 buckets broadcasts 400 MB slices). The probe
  side NEVER exchanges: scan → n BroadcastHashJoins → union, all
  map-side (the plan test pins zero probe-side Exchange).
- With ``broadcast=False`` each per-bucket join plans normally
  (1/n-sized shuffles) — still useful for skew isolation, rarely for
  cost.

Correctness requires identical bucketing on both sides: same
``n_buckets``, same hash function (``pmod(hash(*pk), n)`` —
lake/table._bucket_col), and the join keys must BE the primary key of
both tables (equal keys → equal bucket; joining on a non-PK column
would silently drop cross-bucket matches, so it's rejected).

Reference role: Fluss/Paimon PK tables are bucket-distributed exactly
so downstream engines can do this (README.md:150-156 bucket model);
Iceberg's SPJ is the cold-path equivalent.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluss_iceberg_spark.lake.table import LakeTable


def bucket_aligned_join(
    probe: LakeTable,
    build: LakeTable,
    how: str = "inner",
    broadcast: bool = True,
    max_buckets: int = 64,
) -> DataFrame:
    """Join two co-bucketed PK tables on their (shared) primary key,
    one bucket at a time. ``probe`` is the preserved/large side (its
    scan never exchanges); ``build`` is broadcast per bucket.

    ``how``: inner | left (left preserves ``probe`` rows — broadcasting
    the build side stays legal for both).

    ``max_buckets`` bounds the plan: the per-bucket form unions
    n_buckets independent joins, so driver-side analysis time and (with
    ``broadcast``) the number of independent broadcasts grow LINEARLY in
    the bucket count — the right shape at the demo's 8–64 buckets,
    unbounded at 256+. Past the bound this falls back to ONE plain
    whole-table join on the PK (results identical — the per-bucket form
    is just a physical strategy; AQE then plans the single join from
    actual sizes). A real DSv2 connector reports KeyGroupedPartitioning
    instead and needs no such guard; the bound is the stand-in's
    documented plan-size ceiling."""
    if how not in ("inner", "left"):
        raise ValueError(f"bucket_aligned_join supports inner/left, got {how!r}")
    if not probe.primary_key or not build.primary_key:
        raise ValueError("bucket_aligned_join requires PK tables on both sides")
    if probe.primary_key != build.primary_key:
        raise ValueError(
            "join keys must be the shared primary key (identical bucketing): "
            f"{probe.primary_key} vs {build.primary_key}"
        )
    if probe.n_buckets != build.n_buckets:
        raise ValueError(
            f"bucket counts differ ({probe.n_buckets} vs {build.n_buckets}) — "
            "co-bucketed joins need identical layouts"
        )
    on = list(probe.primary_key)
    build_cols = [c for c in build.schema.fieldNames() if c not in on]
    clash = sorted(set(build_cols) & set(probe.schema.fieldNames()))
    if clash:
        raise ValueError(
            f"non-key columns {clash} exist on both sides — the per-bucket "
            "join output would be ambiguous; rename or project one side "
            "before joining"
        )
    if probe.n_buckets > max_buckets:
        # plan-size guard: one whole-table join instead of n unions
        out = probe.read().join(build.read(), on=on, how=how)
        return out.select(*probe.schema.fieldNames(), *build_cols)
    parts: list[DataFrame] = []
    for b in range(probe.n_buckets):
        pdf = probe.read_bucket(b)
        bdf = build.read_bucket(b)
        if broadcast:
            bdf = F.broadcast(bdf)
        parts.append(pdf.join(bdf, on=on, how=how))
    out = reduce(DataFrame.unionByName, parts)
    # stable column order: probe columns then build's non-key columns
    return out.select(*probe.schema.fieldNames(), *build_cols)
