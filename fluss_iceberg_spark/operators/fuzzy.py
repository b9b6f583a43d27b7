"""Fuzzy (edit-distance) string matching — set-similarity's sibling for
short strings (names, titles, codes), where shingle Jaccard is too
coarse. Completes the dedup family beside exact/minhash/simhash/n-gram
(operators/dedup.py); the reference's relational surface implies this
for entity-style columns the same way it implies document dedup
(fluss-iceberg README.md:187 demo tables carry name-like columns).

Candidate generation is the DELETION NEIGHBORHOOD (FastSS): for
edit distance ≤ 1, two strings must share a member of
{s} ∪ {s minus one character} — a complete, exact filter (no recall
loss), with |s|+1 signatures per string. Candidates are then verified
with the true Levenshtein distance, so precision is exact too.

Scale shape: signatures are built MAP-SIDE (array transform in
whole-stage codegen), the candidate join is a string equi-join on the
signature (per-signature fanout bounded by how many distinct strings
collapse onto one deletion — vocabulary-shaped, not corpus-shaped),
and verification touches candidate pairs only. Run it on the DISTINCT
string vocabulary, never raw rows: exact duplicates are exact-dedup's
job (one groupBy), and the fuzzy join's output then maps back through
the exact groups.

For distance k ≥ 2 the deletion neighborhood grows O(|s|^k) (≈200
signatures for a 20-char string at k=2), so ``fuzzy_pairs`` switches to
PASSJOIN segment filters (Li/Deng/Feng, ICDE 2011): the shorter string
of a candidate pair is evenly partitioned into k+1 segments; k edits
can touch at most k of them, so some segment survives VERBATIM as a
substring of the longer string, displaced by at most k positions (net
insertions/deletions before it). Index side emits k+1 (segment_no,
segment, length) keys per string; probe side emits the substrings that
could match — (k+1 candidate lengths) × (k+1 segments) × (≤2k+1
starts) ≈ 45 keys per string at k=2, an order of magnitude below the
deletion neighborhood. Both sides are MAP-SIDE array transforms in
whole-stage codegen; the candidate join is an equi-join on the segment
key (fanout vocabulary-shaped); exact Levenshtein verification keeps
precision exact, and segment completeness keeps recall exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_signatures(s) -> "F.Column":
    """{s} ∪ {s with one char deleted}, deduped — the complete ed≤1
    candidate-signature set, built map-side from a string Column."""
    variants = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            s.substr(F.lit(1), i - F.lit(1)),
            s.substr(i + F.lit(1), F.length(s) - i),
        ),
    )
    return F.array_union(F.array(s), variants)


def _passjoin_index_segments(k: int) -> str:
    """SQL array expr: the k+1 (seg_i, seg, slen) keys of string ``s``
    under the even partition (first ``m - l%m`` segments get ⌊l/m⌋
    chars, the rest one extra — lengths accumulate to l)."""
    m = k + 1
    return f"""
    transform(sequence(0, {k}), i -> named_struct(
      'seg_i', i,
      'seg', substring(s,
        1 + i * (length(s) div {m})
          + greatest(0, i - ({m} - length(s) % {m})),
        (length(s) div {m})
          + IF(i >= {m} - length(s) % {m}, 1, 0)),
      'slen', length(s)))
    """


def _passjoin_probe_segments(k: int) -> str:
    """SQL array expr: every (seg_i, seg, slen) key of string ``t`` that
    a within-distance-k SHORTER-OR-EQUAL string s (|s| = slen ∈
    [|t|-k, |t|]) could share: segment i of s, displaced at most k
    positions (net insertions/deletions before an edit-untouched
    segment cannot exceed the total edit budget). Empty start windows
    guard against Spark's descending ``sequence(a, b)`` when a > b."""
    m = k + 1
    # per (candidate index length l, segment i): start p and length sl
    p = f"i * (l div {m}) + greatest(0, i - ({m} - l % {m}))"
    sl = f"(l div {m}) + IF(i >= {m} - l % {m}, 1, 0)"
    return f"""
    flatten(flatten(
      transform(sequence(greatest(0, length(t) - {k}), length(t)), l ->
        transform(sequence(0, {k}), i ->
          IF(greatest(0, {p} - {k}) <= least(length(t) - ({sl}), {p} + {k}),
             transform(
               sequence(greatest(0, {p} - {k}),
                        least(length(t) - ({sl}), {p} + {k})),
               j -> named_struct(
                 'seg_i', i,
                 'seg', substring(t, j + 1, {sl}),
                 'slen', l)),
             array())))))
    """


def fuzzy_pairs(
    strings: DataFrame, col: str = "name", max_dist: int = 1
) -> DataFrame:
    """All unordered pairs of ``strings[col]`` within Levenshtein
    distance ``max_dist``: deletion-neighborhood signatures at k=1,
    PassJoin segment filters at k ≥ 2 (see module docstring). Input
    should already be distinct on ``col``.

    Returns (name_a, name_b, dist) with name_a < name_b.
    """
    if max_dist == 1:
        sig = strings.select(
            F.col(col).alias("s"),
            F.explode(deletion_signatures(F.col(col))).alias("sig"),
        )
        cand = (
            sig.alias("x")
            .join(sig.alias("y"), on="sig")
            .filter(F.col("x.s") < F.col("y.s"))
            .select(F.col("x.s").alias("name_a"), F.col("y.s").alias("name_b"))
            .distinct()
        )
    else:
        k = int(max_dist)
        if k < 1:
            raise ValueError("max_dist must be >= 1")
        idx = strings.select(F.col(col).alias("s")).select(
            "s", F.explode(F.expr(_passjoin_index_segments(k))).alias("g")
        ).select("s", "g.seg_i", "g.seg", "g.slen")
        probe = strings.select(F.col(col).alias("t")).select(
            "t", F.explode(F.expr(_passjoin_probe_segments(k))).alias("g")
        ).select("t", "g.seg_i", "g.seg", "g.slen")
        # |s| < |t| pairs appear once (s indexed, t probing); equal
        # lengths would appear in both directions — keep s < t only
        cand = (
            idx.join(probe, on=["seg_i", "seg", "slen"])
            .filter(
                (F.col("slen") < F.length("t"))
                | ((F.col("slen") == F.length("t")) & (F.col("s") < F.col("t")))
            )
            .select(
                F.least("s", "t").alias("name_a"),
                F.greatest("s", "t").alias("name_b"),
            )
            .distinct()
        )
    return (
        cand.withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_dist)
        .select("name_a", "name_b", F.col("dist").cast("int").alias("dist"))
    )
