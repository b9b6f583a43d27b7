"""Bucketized band join: exact equivalence with a nested-loop reference
on overlapping/edge-touching ranges; leakage-safe split: duplicate
groups never straddle the split."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from fluss_iceberg_spark.operators.dedup import leakage_safe_split
from fluss_iceberg_spark.operators.rangejoin import band_join_agg


def test_band_join_matches_nested_loop_reference(spark):
    # overlapping bands incl. bucket-boundary-touching edges
    bands = [("a", 0, 150), ("b", 100, 300), ("c", 299, 301), ("d", 500, 600)]
    vals = [0, 99, 100, 149, 150, 299, 300, 305, 499, 500, 599, 600]
    bdf = spark.createDataFrame(bands, "band string, lo_c long, hi_c long")
    fdf = spark.createDataFrame([(v,) for v in vals], "cents long")
    got = {
        r["band"]: (r["n_items"], r["sum_value"])
        for r in band_join_agg(fdf, bdf, bucket_width=100).collect()
    }
    want: dict = {}
    for band, lo, hi in bands:
        hits = [v for v in vals if lo <= v < hi]
        if hits:
            want[band] = (len(hits), sum(hits))
    assert got == want


def test_band_join_fact_in_overlapping_bands_counts_in_each(spark):
    bdf = spark.createDataFrame(
        [("x", 0, 200), ("y", 50, 250)], "band string, lo_c long, hi_c long"
    )
    fdf = spark.createDataFrame([(100,)], "cents long")
    out = band_join_agg(fdf, bdf, bucket_width=64).collect()
    assert sorted((r["band"], r["n_items"]) for r in out) == [("x", 1), ("y", 1)]


def test_leakage_safe_split_keeps_groups_together(spark):
    # doc 1/2 duplicate doc 0 (whitespace/case variants normalize equal)
    rows = [
        (0, "The Quick  Fox"),
        (1, "the quick fox"),
        (2, "  THE QUICK FOX  "),
        *[(10 + i, f"unique text number {i}") for i in range(50)],
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = leakage_safe_split(df).collect()
    assert len(out) == len(rows)
    grp = {r["doc_id"]: r for r in out}
    assert (
        grp[0]["split"] == grp[1]["split"] == grp[2]["split"]
    ), "duplicate group must not straddle the split"
    assert grp[0]["rep_doc_id"] == grp[1]["rep_doc_id"] == 0
    assert grp[0]["n_copies"] == 3
    # the split decision replays in pure Python from the representative
    for r in out:
        b = (
            int(
                hashlib.md5(f"split-v1:{r['rep_doc_id']}".encode()).hexdigest()[
                    :8
                ],
                16,
            )
            % 100
        )
        assert r["split"] == ("holdout" if b < 10 else "train")


def test_split_fraction_tracks_holdout_pct(spark):
    rows = [(i, f"doc body {i}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = leakage_safe_split(df, holdout_pct=25).collect()
    frac = sum(1 for r in out if r["split"] == "holdout") / len(out)
    assert 0.15 < frac < 0.35
