"""Unit tests for approximate dedup/similarity paths (no SQL oracle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluss_iceberg_spark.operators import dedup as DD
from fluss_iceberg_spark.operators import multimodal as MM
from fluss_iceberg_spark.operators import similarity as SIM

BASE = (
    "spark query engine shuffles data across partitions while the optimizer "
    "prunes columns and pushes filters into the columnar scan layer"
)


def _docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, BASE.replace("columnar", "vectorized")),  # near dup of 0
        (3, "completely different text about cooking pasta with tomato sauce basil"),
        (4, "another unrelated document mentions mountains rivers and weather today"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_simhash_finds_near_dups(spark):
    pairs = {
        (r.d1, r.d2): r.hamming
        for r in DD.simhash_near_pairs(_docs(spark), max_hamming=6).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 0  # identical → distance 0
    assert (0, 2) in pairs  # one-word change → small distance
    assert (3, 4) not in pairs  # unrelated stay apart


def test_minhash_matches_exact_jaccard(spark):
    docs = _docs(spark)
    exact = {
        (r.d1, r.d2): round(r.jaccard, 6)
        for r in DD.ngram_jaccard_pairs(docs, 0.5).collect()
    }
    lsh = {
        (r.d1, r.d2): round(r.jaccard, 6)
        for r in DD.minhash_lsh_pairs(docs, 0.5).collect()
    }
    assert exact == lsh
    assert (0, 1) in exact and exact[(0, 1)] == 1.0


def test_lsh_topk_finds_exact_duplicates(spark):
    """Exact-duplicate vectors land in the same bucket with certainty and
    must retrieve each other at rank 1 with cosine 1.0."""
    import random

    rnd = random.Random(7)
    base = [rnd.uniform(-1, 1) for _ in range(64)]
    rows = [(0, base), (1, base)] + [
        (i, [rnd.uniform(-1, 1) for _ in range(64)]) for i in range(2, 40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    res = SIM.lsh_topk(emb, emb.filter(F.col("vec_id") < 2), k=5, dim=64)
    top = {
        r.query_id: (r.nn_id, r.cosine)
        for r in res.filter(F.col("rank") == 1).collect()
    }
    assert top[0] == (1, 1.0)
    assert top[1] == (0, 1.0)


def test_lsh_topk_subset_of_bruteforce_scores(spark):
    """Approximation contract: every LSH hit carries the same cosine the
    brute force assigns that pair (only the candidate set is approximate)."""
    import random

    rnd = random.Random(11)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 3)
    brute = {
        (r.query_id, r.nn_id): r.cosine
        for r in SIM.brute_force_topk(emb, q, k=29, dim=16).collect()
    }
    for r in SIM.lsh_topk(emb, q, k=10, dim=16).collect():
        assert brute[(r.query_id, r.nn_id)] == r.cosine


def test_ivf_topk_finds_duplicates_and_matches_bruteforce_scores(spark):
    """IVF: duplicate vectors share a cluster and retrieve each other at
    rank 1; every returned score equals the brute-force score."""
    import random

    rnd = random.Random(5)
    base = [rnd.uniform(-1, 1) for _ in range(16)]
    rows = [(0, base), (1, base)] + [
        (i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(2, 60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 2)
    res = SIM.ivf_topk(emb, q, k=5, n_clusters=8, n_probe=3, dim=16)
    top = {r.query_id: (r.nn_id, r.cosine) for r in res.filter(F.col("rank") == 1).collect()}
    assert top[0] == (1, 1.0) and top[1] == (0, 1.0)
    brute = {
        (r.query_id, r.nn_id): r.cosine
        for r in SIM.brute_force_topk(emb, q, k=59, dim=16).collect()
    }
    for r in res.collect():
        assert brute[(r.query_id, r.nn_id)] == r.cosine


def test_decode_real_runs_on_both_codec_paths(spark):
    """decode_real executes everywhere: PIL where importable, the
    pure-Python header probes (operators/codecs.py) where not. A valid
    PPM payload decodes to its true dimensions on EITHER path; corrupt
    bytes yield NULL features without failing the batch."""
    docs = spark.createDataFrame(
        [(1, "P6\n5 3\n255\n" + "x" * 45), (2, "not-an-image")],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in MM.decode_real(MM.binarize_documents(docs)).collect()
    }
    assert (rows[1].width, rows[1].height, rows[1].mode) == (5, 3, "RGB")
    assert rows[2].width is None and rows[2].mode is None


def test_exact_dedup_groups(spark):
    groups = {r.keep_doc_id: r.n_copies for r in DD.exact_duplicates(_docs(spark)).collect()}
    assert groups[0] == 2  # docs 0 and 1 collapse
    assert groups[2] == 1 and groups[3] == 1 and groups[4] == 1


def test_approx_distinct_within_rsd_bound(spark):
    """HLL++ with rsd=0.02 should land well within 5x the requested error
    on a 5k-key domain (deterministic sketch, no flake)."""
    from fluss_iceberg_spark.workloads.windows import approx_distinct_customers  # noqa: F401

    df = spark.range(50_000).selectExpr("id % 5000 AS o_custkey")
    row = df.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("a"),
        F.countDistinct("o_custkey").alias("e"),
    ).collect()[0]
    assert abs(row.a - row.e) / row.e < 0.10


def test_connected_components_paths_agree(spark):
    """The small-graph union-find fast path and the distributed min-label
    loop must produce identical components (including chain merges and
    singleton-free output)."""
    from fluss_iceberg_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(5, 3), (3, 1), (10, 11), (7, 7), (2, 1)], "d1 long, d2 long"
    )
    fast = {(r.doc_id, r.component)
            for r in connected_components(pairs).collect()}
    dist = {(r.doc_id, r.component)
            for r in connected_components(pairs, small_graph_edges=0).collect()}
    assert fast == dist
    assert fast == {
        (1, 1), (2, 1), (3, 1), (5, 1),
        (7, 7),
        (10, 10), (11, 10),
    }


def test_decode_real_null_payload_yields_null_features(spark):
    """A NULL payload (failed fetch) must yield NULL features, not kill
    the mapInPandas task (review regression guard)."""
    import pyspark.sql.functions as SF

    docs = spark.createDataFrame(
        [(1, "P6\n2 2\n255\n" + "x" * 12), (2, None)],
        "doc_id long, text string",
    )
    binarized = MM.binarize_documents(docs)
    assert binarized.filter(SF.col("payload").isNull()).count() == 1
    rows = {r.doc_id: r for r in MM.decode_real(binarized).collect()}
    assert rows[1].width == 2 and rows[2].width is None


def test_filtered_topk_matches_per_label_bruteforce(spark):
    """Metadata-filtered search (match_cols): the filtered result must be
    EXACTLY brute force run separately on each label slice — the filter
    changes the candidate set, never the scores — and every returned
    neighbour shares its query's label."""
    import random

    rnd = random.Random(23)
    rows = [
        (i, [rnd.uniform(-1, 1) for _ in range(16)], i % 3)
        for i in range(36)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    q = emb.filter(F.col("vec_id") < 3)  # one query per label
    got = {
        (r.query_id, r.rank): (r.nn_id, r.cosine)
        for r in SIM.brute_force_topk(
            emb, q, k=5, dim=16, match_cols=["label"]
        ).collect()
    }
    labels = {i: i % 3 for i in range(36)}
    for lbl in (0, 1, 2):
        slice_df = emb.filter(F.col("label") == lbl)
        want = {
            (r.query_id, r.rank): (r.nn_id, r.cosine)
            for r in SIM.brute_force_topk(
                slice_df, slice_df.filter(F.col("vec_id") < 3), k=5, dim=16
            ).collect()
        }
        for key, val in want.items():
            assert got[key] == val, (lbl, key)
        for (qid, _), (nid, _) in want.items():
            assert labels[nid] == labels[qid]
    assert len(got) == 3 * 5


def test_maxsim_late_interaction_semantics(spark):
    """MaxSim is order-invariant across token SLOTS (each query token
    finds its best doc token wherever it sits) — the property that
    separates late interaction from a flat positional dot product — and
    the fixed-point arithmetic is hand-checkable."""
    rows = [
        (0, [1.0, 0.0, 0.0, 1.0]),   # query: tokens (1,0), (0,1)
        (1, [1.0, 0.0, 0.0, 1.0]),   # aligned twin
        (2, [0.0, 1.0, 1.0, 0.0]),   # same tokens, slots swapped
        (3, [0.5, 0.0, 0.0, 0.5]),   # half-scale twin
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    v = SIM._as_double(emb)
    q = v.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    got = {
        r["doc_id"]: r["s"]
        for r in v.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            SIM.maxsim_q14(F.col("qv"), F.col("v"), n_tokens=2, dim=2).alias("s"),
        )
        .collect()
    }
    assert got[1] == 20000          # 1.0 + 1.0 in q14
    assert got[2] == 20000          # slot-swapped scores identically
    assert got[3] == 10000          # linear in magnitude
    # a flat positional dot of doc 2 against the query would be 0 —
    # late interaction is what makes the swapped doc a perfect match


def test_sq8_quantization_arithmetic(spark):
    """Hand-checkable SQ8: codes are round-half-away of x*127/max|x|,
    the integer dot is exact, and the milli rescale replays."""
    emb = spark.createDataFrame(
        [(0, [1.0, -0.5, 0.25, 0.0]), (1, [2.0, 1.0, 0.0, -2.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in SIM.sq8_quantized(emb).collect()}
    assert rows[0]["mx"] == 1.0 and rows[0]["q"] == [127, -64, 32, 0]
    assert rows[1]["mx"] == 2.0 and rows[1]["q"] == [127, 64, 0, -127]
    got = SIM.sq8_topk(emb, emb.filter(F.col("vec_id") == 0), k=1, dim=4).collect()
    assert len(got) == 1
    r = got[0]
    idot = 127 * 127 + (-64) * 64 + 0 + 0
    assert r["idot"] == idot
    assert r["score_milli"] == round(1.0 * 2.0 * idot * 1000.0 / 16129.0)


def test_sq8_ranking_tracks_exact_on_separated_data(spark):
    """Recall property: on data with a clear nearest neighbour (a planted
    near-duplicate), SQ8's top-1 equals the exact float top-1 — the
    quantization error (<~1%) cannot reorder well-separated neighbours."""
    import random

    rnd = random.Random(5)
    base = [rnd.uniform(-1, 1) for _ in range(16)]
    near = [x + 0.01 for x in base]
    rows = [(0, base), (1, near)] + [
        (i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(2, 30)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") == 0)
    sq_top = SIM.sq8_topk(emb, q, k=1, dim=16).collect()[0]["nn_id"]
    ex_top = SIM.brute_force_topk(emb, q, k=1, dim=16).collect()[0]["nn_id"]
    assert sq_top == ex_top == 1


def test_sq8_rerank_equals_bruteforce_when_shortlist_covers_corpus(spark):
    """With shortlist >= corpus, stage 2 scores every vector: the final
    ranking must equal exact brute force (same cosine, same order)."""
    import random

    rnd = random.Random(11)
    rows = [
        (i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(25)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 2)
    got = SIM.sq8_rerank_topk(emb, q, k=5, shortlist=100, dim=16).collect()
    want = SIM.brute_force_topk(emb, q, k=5, dim=16).collect()
    g = {(r["query_id"], r["rank"]): (r["nn_id"], r["cosine"]) for r in got}
    w = {(r["query_id"], r["rank"]): (r["nn_id"], r["cosine"]) for r in want}
    assert g == w


def test_sq8_rerank_scores_only_shortlisted_pairs(spark):
    """The exact pass must be restricted to stage-1 survivors: every
    output row carries its stage-1 rank <= shortlist, and equals brute
    force computed ON that shortlist (the two-stage contract)."""
    import random

    rnd = random.Random(12)
    rows = [
        (i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") == 0)
    shortlist = 8
    got = SIM.sq8_rerank_topk(emb, q, k=5, shortlist=shortlist, dim=16).collect()
    assert len(got) == 5
    assert all(1 <= r["sq8_rank"] <= shortlist for r in got)
    # replay: shortlist by sq8, exact-rank it
    short_ids = {
        r["nn_id"]
        for r in SIM.sq8_topk(emb, q, k=shortlist, dim=16).collect()
    }
    assert {r["nn_id"] for r in got} <= short_ids
    exact = {
        r["nn_id"]: r["cosine"]
        for r in SIM.brute_force_topk(emb, q, k=40, dim=16).collect()
        if r["nn_id"] in short_ids
    }
    order = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [r["nn_id"] for r in sorted(got, key=lambda r: r["rank"])] == [
        i for i, _ in order
    ]
