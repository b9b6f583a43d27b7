"""Perplexity filter: fixed-point ilog2 properties + operator gates.
The full Spark==DuckDB equality runs in tests/test_oracle_parity.py
(text_perplexity_filter is oracle-registered); here the kernel's math."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from fluss_iceberg_spark.operators.text import (
    ilog2_local,
    ilog2_np,
    ilog2_steps,
    perplexity_oracle_sql,
)


@given(st.integers(min_value=1, max_value=2**62))
@settings(max_examples=300, deadline=None)
def test_ilog2_accuracy_and_monotone(c):
    v = ilog2_local(c)
    assert abs(v / 65536 - math.log2(c)) < 0.002
    # monotone: the property that makes num<=den imply bits>=0
    assert ilog2_local(c + 1) >= v


@given(st.lists(st.integers(min_value=1, max_value=2**62), min_size=1, max_size=50))
@settings(max_examples=200, deadline=None)
def test_ilog2_np_bitwise_equals_local(vals):
    # The vectorized kernel must replay the recurrence bit-for-bit —
    # it substitutes for the SQL chain inside an oracle-gated query.
    got = ilog2_np(vals).tolist()
    assert got == [ilog2_local(v) for v in vals]


def test_ilog2_np_edge_values():
    edges = [1, 2, 3, (1 << 16) - 1, 1 << 16, (1 << 16) + 1, (1 << 62) - 1, 1 << 62]
    assert ilog2_np(edges).tolist() == [ilog2_local(v) for v in edges]


def test_ilog2_exact_on_powers_of_two():
    for e in range(0, 63):
        assert ilog2_local(1 << e) == e * 65536


def test_ilog2_steps_render_both_dialects():
    spark_steps = ilog2_steps("x", "p", lambda a, b: f"({a} div {b})")
    duck_steps = ilog2_steps("x", "p", lambda a, b: f"({a} // {b})")
    assert [n for n, _ in spark_steps] == [n for n, _ in duck_steps]
    assert spark_steps[-1][0] == "p"
    assert " div " in spark_steps[2][1] and " // " in duck_steps[2][1]


def test_duckdb_ilog_chain_equals_local():
    """The SQL rendering of the recurrence IS the local function —
    checked value-for-value over a spread of magnitudes in DuckDB."""
    import duckdb

    vals = [1, 2, 3, 5, 7, 100, 12345, 65535, 65536, 10**9, 10**12 + 7]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT UNNEST($v) AS num", {"v": vals}
    )
    sql = "WITH s0 AS (SELECT CAST(num AS BIGINT) AS num FROM t)"
    prev = "s0"
    for i, (n, e) in enumerate(
        ilog2_steps("num", "iln", lambda a, b: f"({a} // {b})"), start=1
    ):
        sql += f", s{i} AS (SELECT *, {e} AS {n} FROM {prev})"
        prev = f"s{i}"
    sql += f" SELECT num, iln FROM {prev} ORDER BY num"
    got = dict(con.execute(sql).fetchall())
    assert got == {v: ilog2_local(v) for v in vals}


def test_spark_ilog_chain_equals_local(spark):
    from pyspark.sql import functions as F

    vals = [1, 3, 7, 100, 65536, 10**9, 10**12 + 7]
    df = spark.createDataFrame([(v,) for v in vals], "num long")
    for n, e in ilog2_steps("num", "iln", lambda a, b: f"({a} div {b})"):
        df = df.withColumn(n, F.expr(e))
    got = {r["num"]: r["iln"] for r in df.select("num", "iln").collect()}
    assert got == {v: ilog2_local(v) for v in vals}


def test_perplexity_keep_splits_and_is_exact(spark):
    """End-to-end on a tiny corpus: Spark == DuckDB oracle == invariants
    (bits >= 0, keep consistent with avg <= thr)."""
    import duckdb

    from fluss_iceberg_spark.operators.text import perplexity_scores

    docs = [
        (1, "the cat sat on the mat and the cat ran"),
        (2, "the cat sat on the mat"),
        # word salad over the SAME vocabulary: every w1 context is
        # corpus-frequent but the transitions are novel → high bits.
        # (A salad of hapax words would score LOW — its only observed
        # continuation is itself, the self-trained-LM convention the
        # operator docstring states.)
        (3, "mat the on cat sat the ran and cat"),
        (4, "one"),  # no bigrams: drops out
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll_q16"], r["avg_nll_q16"], r["keep"])
        for r in perplexity_scores(df).collect()
    }
    assert 4 not in got and set(got) == {1, 2, 3}
    assert all(v[1] >= 0 for v in got.values())
    # the word-salad doc scores strictly worse than the repetitive one
    assert got[3][2] > got[1][2]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    want = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(perplexity_oracle_sql()).fetchall()
    }
    assert got == want
