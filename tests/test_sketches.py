"""KMV sketch math: estimator accuracy, exact-below-k, merge property.
Cross-engine equality runs via the registered oracle (test_oracle_parity)."""

from __future__ import annotations

import hashlib

from fluss_iceberg_spark.operators.sketches import (
    HASH_BITS,
    kmv_estimate_local,
)


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def test_exact_below_k():
    hs = [_h(f"x{i}") for i in range(40)]
    assert kmv_estimate_local(hs, k=64) == 40


def test_estimator_accuracy_large_sets():
    for n in (1_000, 10_000, 50_000):
        hs = [_h(f"item-{i}") for i in range(n)]
        est = kmv_estimate_local(hs, k=64)
        # k=64 → relative std ≈ 1/sqrt(k-2) ≈ 13%; allow 4 sigma
        assert abs(est - n) < 0.5 * n, (n, est)


def test_sketch_merge_is_union_sketch():
    """KMV mergeability: k smallest of (sketch(A) ∪ sketch(B)) equals
    the sketch of A ∪ B — the property that makes per-partition
    sketches combinable without touching the data again."""
    k = 32
    a = {_h(f"a{i}") for i in range(500)}
    b = {_h(f"b{i}") for i in range(700)} | set(list(a)[:200])
    sk = lambda s: sorted(s)[:k]  # noqa: E731
    merged = sorted(set(sk(a)) | set(sk(b)))[:k]
    assert merged == sk(a | b)


def test_hash_width_is_int64_safe():
    assert (64 - 1) * (1 << HASH_BITS) < 2**63


def test_quantile_sketch_local_accuracy():
    from fluss_iceberg_spark.operators.sketches import quantile_sketch_local

    pairs = [(i, (i * 37) % 10_000) for i in range(5_000)]
    for q in (500, 900, 990):
        est = quantile_sketch_local(pairs, k=128, q_milli=q)
        true = sorted(v for _, v in pairs)[(5_000 - 1) * q // 1000]
        # k=128 sample: order-statistic error ~ 1/sqrt(k) of the range
        assert abs(est - true) < 1_500, (q, est, true)


def test_quantile_sketch_exact_when_group_below_k():
    from fluss_iceberg_spark.operators.sketches import quantile_sketch_local

    pairs = [(i, i * 10) for i in range(50)]
    assert quantile_sketch_local(pairs, k=128, q_milli=500) == sorted(
        v for _, v in pairs
    )[(50 - 1) * 500 // 1000]


def test_quantile_sketch_spark_matches_local(spark):
    from pyspark.sql import functions as F

    from fluss_iceberg_spark.operators.sketches import (
        quantile_sketch_local,
        quantile_sketch_report,
    )

    rows = [(i, "g", (i * 37) % 997) for i in range(800)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, v int")
    got = quantile_sketch_report(df, "v", "lang", k=64).collect()[0]
    pairs = [(i, v) for i, _g, v in rows]
    assert got["p500_est"] == quantile_sketch_local(pairs, k=64, q_milli=500)
    assert got["p900_est"] == quantile_sketch_local(pairs, k=64, q_milli=900)
    assert got["m_est"] == 64 and got["m_exact"] == 800
    assert got["p500_exact"] == sorted(v for _, v in pairs)[(800 - 1) // 2]
    _ = F


def test_cms_never_undercounts_and_is_tight_for_heavy():
    from fluss_iceberg_spark.operators.sketches import cms_estimate_local

    stream = (["the"] * 500 + ["cat"] * 120
              + [f"rare{i}" for i in range(800)])
    assert cms_estimate_local(stream, "the") >= 500
    assert cms_estimate_local(stream, "cat") >= 120
    # 4x1024 over ~1.4k items: collision mass is tiny for heavy hitters
    assert cms_estimate_local(stream, "the") <= 500 + 20
    assert cms_estimate_local(stream, "cat") <= 120 + 20


def test_cms_spark_matches_local(spark):
    from fluss_iceberg_spark.operators.sketches import (
        cms_estimate_local,
        cms_heavy_hitters,
    )

    docs = [("the cat sat on the mat the end",), ("the cat ran",)]
    df = spark.createDataFrame(docs, "text string")
    got = {r["tok"]: (r["true_cnt"], r["est_cnt"])
           for r in cms_heavy_hitters(df, top=5).collect()}
    stream = " ".join(t for t, in docs).split()
    assert got["the"][0] == 4
    assert got["the"][1] == cms_estimate_local(stream, "the")
    assert all(est >= true for true, est in got.values())


def test_cms_build_scans_corpus_once(spark, tmp_path):
    """The r10 finding: the sketch build must derive its counters from
    the aggregated vocabulary, not re-explode the corpus depth+1 times.
    Gate: the FINAL adaptive plan contains exactly ONE parquet scan of
    the corpus (the exact token-count aggregate) and the repeated
    tok_counts subtree is a ReusedExchange."""
    from fluss_iceberg_spark.operators.sketches import cms_heavy_hitters

    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(f"tok{i % 7} tok{i % 3} filler{i}",) for i in range(200)],
        "text string",
    ).write.mode("overwrite").parquet(p)
    out = cms_heavy_hitters(spark.read.parquet(p), top=5)
    out.collect()  # materialize so AQE settles the final plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 1, final
    assert final.count("ReusedExchange") >= 1, final


def test_hll_union_merge_equals_sketch_of_union(spark):
    """Register-maxima identity: estimate(hll_union_agg(per-group
    sketches)) == estimate(hll_sketch_agg(everything)) — EXACT equality,
    the merge property the dedup_hll_distinct union row rests on."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(f"s{i % 3}", f"item-{i % 4000}") for i in range(20_000)],
        "src string, g string",
    )
    per = df.groupBy("src").agg(F.hll_sketch_agg("g", F.lit(12)).alias("sk"))
    merged = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0]["est"]
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("g", F.lit(12))).alias("est")
    ).collect()[0]["est"]
    assert merged == direct


def test_hll_error_bound_lgk12(spark):
    """lgK=12 → relative std ≈ 1.04/sqrt(4096) ≈ 1.6%; allow 5%."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(f"item-{i}",) for i in range(30_000)], "g string"
    )
    est = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("g", F.lit(12))).alias("est")
    ).collect()[0]["est"]
    assert abs(est - 30_000) < 0.05 * 30_000, est


def test_hll_distinct_query_rows_are_self_reporting(spark):
    from fluss_iceberg_spark.workloads.dedup import hll_distinct

    rows = hll_distinct(spark, "/root/testdata/sf0.001").collect()
    srcs = [r["src"] for r in rows]
    assert "__union__" in srcs and len(srcs) >= 2
    for r in rows:
        assert r["exact_distinct"] > 0
        assert r["err_milli"] <= 50, (r["src"], r["err_milli"])  # ≤5%


def test_stream_sketch_refresh_equals_batch_sketch(spark):
    """Merge-equality across micro-batch boundaries: the foreachBatch-
    maintained KMV state's set-ops == the one-shot batch build's
    (bit-identical rows — the KMV union property end-to-end)."""
    from fluss_iceberg_spark.workloads.dedup import kmv_source_setops
    from fluss_iceberg_spark.workloads.streaming import stream_sketch_refresh

    sf = "/root/testdata/sf0.001"
    batch = {tuple(r) for r in kmv_source_setops(spark, sf).collect()}
    streamed = {tuple(r) for r in stream_sketch_refresh(spark, sf).collect()}
    assert streamed == batch
