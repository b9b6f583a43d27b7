"""Passage-level dedup: the Spark operator must equal a straightforward
Python reference on duplicate-rich corpora (winner = first corpus-wide
(doc_id, chunk_idx) occurrence; docs reassemble from survivors in order)."""

from __future__ import annotations

import re

from pyspark.sql import types as T

from fluss_iceberg_spark.operators import dedup as DD

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)


def _reference(docs, chunk=20):
    chunks = []
    for doc_id, text in docs:
        words = re.split(r"\s+", text.strip())
        n = max(1, -(-len(words) // chunk))
        for i in range(n):
            chunks.append((doc_id, i, " ".join(words[i * chunk : (i + 1) * chunk])))
    first = {}
    for doc_id, idx, passage in sorted(chunks):
        first.setdefault(passage, (doc_id, idx))
    out = {}
    for doc_id, text in docs:
        words = re.split(r"\s+", text.strip())
        n = max(1, -(-len(words) // chunk))
        kept = [
            " ".join(words[i * chunk : (i + 1) * chunk])
            for i in range(n)
            if first[" ".join(words[i * chunk : (i + 1) * chunk])] == (doc_id, i)
        ]
        out[doc_id] = (" ".join(kept), len(kept), n)
    return out


def _check(spark, docs, chunk=20):
    df = spark.createDataFrame(docs, SCHEMA)
    got = {
        r.doc_id: (r.kept_text, r.n_kept_chunks, r.n_total_chunks)
        for r in DD.passage_dedup(df, chunk_tokens=chunk).collect()
    }
    assert got == _reference(docs, chunk)


def test_matches_reference_duplicate_rich(spark):
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    unique = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    docs = [
        (1, f"{boiler} {unique}"),
        (2, f"{boiler} nu xi omicron pi rho sigma tau upsilon phi chi psi omega"),
        (3, boiler),                       # fully duplicated vs doc 1's chunks?
        (4, unique + " " + boiler),        # same passages, different offsets
        (5, "short"),
        (6, "short"),                      # exact duplicate doc
    ]
    _check(spark, docs, chunk=4)


def test_matches_reference_offset_shifts(spark):
    # duplicated content at different chunk alignments must NOT collide
    # (passage identity is the token window, not the source span)
    base = " ".join(f"w{i}" for i in range(40))
    docs = [(1, base), (2, "pad " + base), (3, base + " tail")]
    _check(spark, docs, chunk=8)


def test_empty_and_whitespace_docs(spark):
    docs = [(1, "x y z"), (2, "   x y z   "), (3, "x")]
    _check(spark, docs, chunk=2)
