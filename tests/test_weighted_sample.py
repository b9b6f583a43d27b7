"""Weighted reservoir sampling (Efraimidis-Spirakis over deterministic
md5 uniforms): exact-k per stratum, weight-proportional inclusion, and
salt-driven re-mixing."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from fluss_iceberg_spark.operators.text import weighted_reservoir_sample


def _docs(spark):
    rows = [
        (i, "en" if i % 2 == 0 else "de", "tok " * (1 + i % 17))
        for i in range(400)
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def _expected(rows, k, salt="wrs-v1"):
    """Pure-Python replay of the exact same draw."""
    by_stratum: dict = {}
    for doc_id, lang, text in rows:
        w = max(len(text.split()), 1)
        h = int(hashlib.md5(f"{salt}{doc_id}".encode()).hexdigest()[:8], 16)
        u = (h + 1.0) / 4294967297.0
        key = round(math.pow(u, 1.0 / w), 12)
        by_stratum.setdefault(lang, []).append((-key, doc_id))
    out = set()
    for lang, lst in by_stratum.items():
        for _, doc_id in sorted(lst)[:k]:
            out.add((doc_id, lang))
    return out


def test_matches_pure_python_replay(spark):
    df = _docs(spark)
    got = {
        (r.doc_id, r.stratum)
        for r in weighted_reservoir_sample(df, k=25).collect()
    }
    rows = [(r.doc_id, r.lang, r.text) for r in df.collect()]
    assert got == _expected(rows, 25)
    # exact k per stratum
    per = weighted_reservoir_sample(df, k=25).groupBy("stratum").count().collect()
    assert {r["count"] for r in per} == {25}


def test_salt_remixes_and_weights_bias_inclusion(spark):
    df = _docs(spark)
    a = {r.doc_id for r in weighted_reservoir_sample(df, k=25).collect()}
    b = {
        r.doc_id
        for r in weighted_reservoir_sample(df, k=25, salt="wrs-v2").collect()
    }
    assert a != b  # a new salt is a fresh draw
    # weight proportionality: across 6 salts, the heaviest-quartile docs
    # must be sampled substantially more often than the lightest quartile
    heavy_hits = light_hits = 0
    for s in range(6):
        sel = {
            r.doc_id: r.weight
            for r in weighted_reservoir_sample(df, k=25, salt=f"s{s}").collect()
        }
        heavy_hits += sum(1 for w in sel.values() if w >= 13)
        light_hits += sum(1 for w in sel.values() if w <= 5)
    assert heavy_hits > 2 * light_hits
