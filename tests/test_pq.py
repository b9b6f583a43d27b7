"""Product quantization: encode shape, determinism, and ADC recall vs
exact brute force."""

from __future__ import annotations

import numpy as np

from fluss_iceberg_spark.operators import similarity as SIM
from fluss_iceberg_spark.sources.tpch import load_table

SF = "/root/testdata/sf0.001"
DIM = 64


def test_pq_encode_shape_and_determinism(spark):
    emb = load_table(spark, SF, "embeddings")
    books = SIM.train_pq_codebooks(emb, n_subspaces=16, n_codes=64)
    assert len(books) == 16 and all(len(b) <= 64 for b in books)
    assert all(len(c) == DIM // 16 for b in books for c in b)
    enc1 = {r.vec_id: tuple(r.codes) for r in SIM.pq_encode(emb, books).collect()}
    enc2 = {r.vec_id: tuple(r.codes) for r in SIM.pq_encode(emb, books).collect()}
    assert enc1 == enc2
    assert all(len(c) == 16 and all(0 <= x < 64 for x in c) for c in enc1.values())


def test_pq_adc_distance_matches_reconstruction(spark):
    """ADC distance == exact L2 between the query and the RECONSTRUCTED
    (quantized) vector — the defining PQ identity."""
    emb = load_table(spark, SF, "embeddings")
    books = SIM.train_pq_codebooks(emb, n_subspaces=16, n_codes=64)
    B = [np.array(b) for b in books]
    sub = DIM // 16
    enc = {r.vec_id: r.codes for r in SIM.pq_encode(emb, books).collect()}
    raw = {
        r.vec_id: np.array([float(x) for x in r.embedding])
        for r in emb.collect()
    }
    q = emb.filter("vec_id < 2")
    out = SIM.pq_topk(emb, q, books, k=5).collect()
    for r in out:
        qv = raw[r.query_id]
        qv = qv / np.linalg.norm(qv)
        recon = np.concatenate(
            [B[s][enc[r.nn_id][s]] for s in range(16)]
        )
        expect = ((qv - recon) ** 2).sum()
        assert abs(r.adc_dist - round(expect, 4)) < 1e-6


def test_pq_recall_vs_brute_force(spark):
    emb = load_table(spark, SF, "embeddings")
    q = emb.filter("vec_id < 8")
    books = SIM.train_pq_codebooks(emb, n_subspaces=16, n_codes=64)
    approx = SIM.pq_topk(emb, q, books, k=10)
    exact = SIM.brute_force_topk(emb, q, k=10)
    a = {(r.query_id, r.nn_id) for r in approx.collect()}
    e = {(r.query_id, r.nn_id) for r in exact.collect()}
    recall = len(a & e) / len(e)
    # near-uniform synthetic vectors are PQ's worst case; 16 bytes/vector
    # still puts recall@10 far above the 10/499 ~ 0.02 chance floor
    assert recall >= 0.4, recall


def test_ivfpq_candidates_stay_in_probed_clusters(spark):
    """Every returned neighbor must live in one of its query's probed
    clusters — the invariant that makes the scan touch ~n_probe/K of the
    table."""
    emb = load_table(spark, SF, "embeddings")
    q = emb.filter("vec_id < 4")
    out = SIM.ivfpq_topk(emb, q, k=10, n_clusters=8, n_probe=2)
    ivf = SIM.train_ivf_centroids(emb, 8)
    cent = SIM._centroids_df(spark, ivf)
    v_cid = {
        r.vec_id: r.cid
        for r in SIM._assign_clusters(SIM._as_double(emb), cent, 64).collect()
    }
    q_cids = {}
    for r in SIM._assign_clusters(
        SIM._as_double(q), cent, 64, top_n=2
    ).collect():
        q_cids.setdefault(r.vec_id, set()).add(r.cid)
    for r in out.collect():
        assert v_cid[r.nn_id] in q_cids[r.query_id], (r.query_id, r.nn_id)


def test_ivfpq_recall_vs_brute_force(spark):
    emb = load_table(spark, SF, "embeddings")
    q = emb.filter("vec_id < 8")
    approx = SIM.ivfpq_topk(emb, q, k=10, n_clusters=8, n_probe=4)
    exact = SIM.brute_force_topk(emb, q, k=10)
    a = {(r.query_id, r.nn_id) for r in approx.collect()}
    e = {(r.query_id, r.nn_id) for r in exact.collect()}
    recall = len(a & e) / len(e)
    # half the lists probed on worst-case uniform vectors: above the
    # chance floor and within reach of the PQ-only ceiling (~0.54)
    assert recall >= 0.25, recall
