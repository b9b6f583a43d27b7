"""operators/fuzzy.py — deletion-neighborhood edit-distance join.

The signature scheme must be COMPLETE for distance <= 1 (no missed
pairs) and the verify step EXACT (no false pairs); the reference is a
brute-force O(n^2) Levenshtein DP in plain Python.
"""

from __future__ import annotations

import pytest

from fluss_iceberg_spark.operators.fuzzy import fuzzy_pairs


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


CORPUS = [
    "red widget",
    "red widgets",      # insertion
    "rad widget",       # substitution
    "red widge",        # deletion
    "blue bolt",
    "blue bole",        # substitution at end
    "glue bolt",        # substitution at start
    "bolt",
    "bol",              # short strings
    "b",
    "anchor",           # isolated
    "red  widget",      # double space (distance 1 by insertion)
]


def test_matches_bruteforce_reference(spark):
    expect = {
        (min(a, b), max(a, b), _lev(a, b))
        for i, a in enumerate(CORPUS)
        for b in CORPUS[i + 1:]
        if _lev(a, b) <= 1
    }
    df = spark.createDataFrame([(s,) for s in CORPUS], "name string")
    got = {
        (r.name_a, r.name_b, r.dist)
        for r in fuzzy_pairs(df, col="name").collect()
    }
    assert got == expect
    assert expect, "corpus must contain at least one close pair"


def test_no_false_positives_on_distant_corpus(spark):
    df = spark.createDataFrame(
        [("alpha",), ("bravo",), ("charlie",), ("delta",)], "name string"
    )
    assert fuzzy_pairs(df, col="name").count() == 0


def test_bad_max_dist_rejected(spark):
    df = spark.createDataFrame([("x",)], "name string")
    with pytest.raises(ValueError):
        fuzzy_pairs(df, col="name", max_dist=0)


def test_passjoin_k2_matches_bruteforce(spark):
    """fuzzy_pairs(max_dist=2) — the PassJoin path — must equal the
    quadratic Levenshtein self-join exactly (candidate completeness ×
    exact verify), including length-difference-2 and equal-length
    pairs."""
    words = [
        "grid", "grind", "grinds", "brine", "shine", "shrine", "shrines",
        "a", "ab", "abc", "", "x", "xy", "grud", "grad", "braid",
        "linen", "line", "liner", "miner", "mined",
    ]
    df = spark.createDataFrame([(w,) for w in words], "name string")
    got = {
        (r.name_a, r.name_b, r.dist)
        for r in fuzzy_pairs(df, col="name", max_dist=2).collect()
    }
    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]
    want = {
        (min(a, b), max(a, b), lev(a, b))
        for a in words for b in words
        if a < b and lev(a, b) <= 2
    }
    assert got == want
