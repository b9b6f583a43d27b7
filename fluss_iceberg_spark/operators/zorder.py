"""Z-order (Morton-curve) file clustering for the lake layer.

A linear sort clusters files on ONE column: min/max footer stats prune
scans filtered on the leading column and nothing else. Interleaving the
bits of two rank-bucketed columns makes each written file cover a
compact RECTANGLE in (a, b) space, so range predicates on EITHER column
(or both) prune ~sqrt-fraction of the files — the multi-dimensional
clustering Iceberg ships as
``rewrite_data_files(strategy => 'sort', sort_order => 'zorder(a, b)')``
(public Apache Iceberg Spark procedure; the reference's lake tables are
Iceberg, trino/iceberg.properties:1-9). This is the engine-native
equivalent wired to the repo's manifest min/max skipping
(lake/table.py plan_scan).

Relationship to the compact path: ``LakeTable.compact(zorder_by=...)``
(lake/table.py:_zorder_col) z-orders REWRITES with uniform-width
buckets from a one-row min/max aggregate — the right cost model inside
a partition-preserving rewrite. This module is the APPEND-time layout
(table property ``write.zorder-by``) and pays one approxQuantile for
equi-depth buckets instead, because unsorted skewed ingest is exactly
where uniform-width bucketing collapses the curve to a linear sort.

Spark-first construction, all whole-stage codegen:

1. per column: 2^bits - 1 equi-depth boundaries via ``approxQuantile``
   (driver receives a bounded float list — the same device as the CBO's
   NDV sampling, never data rows). Equi-depth (rank) bucketing, not
   uniform-width: skewed columns would otherwise collapse into few
   buckets and the curve degenerates to a linear sort.
2. bucket id = branch-free comparison sum against the boundary array
   (``F.aggregate`` over a literal array — no UDF, no shuffle).
3. z-value = bit interleave of the two bucket ids (shift/or expression
   tree), then ``repartitionByRange(n_files, z)`` so each output file
   owns a contiguous z-range = a compact rectangle.

100 TB: the layout pass is one range-shuffle of the data (the same cost
as any sort-based rewrite, amortized over every future scan);
approxQuantile is a single aggregate. File count scales with data
volume; pruning stays ~|files| * (selectivity_a + selectivity_b) for
rectangle queries instead of |files| for the non-leading column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def equidepth_bucket(col: Column, boundaries: list) -> Column:
    """Rank bucket of ``col`` against sorted equi-depth boundaries:
    the count of boundaries <= value (branch-free comparison sum,
    stays in codegen). NULLs land in bucket 0."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    return F.aggregate(
        arr,
        F.lit(0),
        lambda acc, b: acc + F.when(col >= b, 1).otherwise(0),
    )


def interleave_bits(a: Column, b: Column, bits: int) -> Column:
    """Morton interleave of two ``bits``-wide non-negative ints:
    z = a_{n-1} b_{n-1} ... a_0 b_0 (a in the odd positions)."""
    z = F.lit(0)
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return z


def zorder_morton_local(a_bucket: int, b_bucket: int, bits: int = 8) -> int:
    """Pure-Python reference of the interleave (unit gate)."""
    z = 0
    for i in range(bits):
        z |= ((a_bucket >> i) & 1) << (2 * i + 1)
        z |= ((b_bucket >> i) & 1) << (2 * i)
    return z


def zorder_layout(
    df: DataFrame,
    col_a: str,
    col_b: str,
    n_files: int,
    bits: int = 6,
) -> DataFrame:
    """Repartition ``df`` so each partition (= written file) covers a
    compact rectangle in (col_a, col_b) space. Returns the reordered
    frame (schema unchanged); write it with one file per partition.

    2^bits buckets per dimension only needs to out-resolve the file
    count (bucket-pairs >> n_files); 64x64 resolves thousands of files.
    Boundary estimation is one approxQuantile aggregate at 1% rank
    error — layout precision, not result correctness, so at 100 TB a
    sampled estimate is equally sound."""
    n_bounds = (1 << bits) - 1
    probes = [(i + 1) / (1 << bits) for i in range(n_bounds)]
    bounds = {
        c: df.stat.approxQuantile(c, probes, 0.01) for c in (col_a, col_b)
    }
    a = equidepth_bucket(F.col(col_a).cast("double"), bounds[col_a])
    b = equidepth_bucket(F.col(col_b).cast("double"), bounds[col_b])
    z = interleave_bits(a, b, bits)
    return df.repartitionByRange(n_files, z)
