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
the exact groups. For distance k ≥ 2, compose k rounds of the deletion
neighborhood (size O(|s|^k)) or switch to PassJoin segment filters —
documented, not implemented: short-string vocabularies rarely need it.
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


def fuzzy_pairs(
    strings: DataFrame, col: str = "name", max_dist: int = 1
) -> DataFrame:
    """All unordered pairs of ``strings[col]`` within Levenshtein
    distance ``max_dist`` (currently 1 — see module docstring for the
    k ≥ 2 path). Input should already be distinct on ``col``.

    Returns (name_a, name_b, dist) with name_a < name_b.
    """
    if max_dist != 1:
        raise NotImplementedError(
            "deletion-neighborhood signatures implemented for max_dist=1; "
            "compose rounds or use PassJoin segments for k >= 2"
        )
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
    return (
        cand.withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_dist)
        .select("name_a", "name_b", F.col("dist").cast("int").alias("dist"))
    )
