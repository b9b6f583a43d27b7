"""Distributed k-means determinism vs a numpy reference, and SemDeDup
greedy-decision equivalence to a brute-force per-cluster reference."""

from __future__ import annotations

import numpy as np
import pytest

from fluss_iceberg_spark.operators import dedup as DD
from fluss_iceberg_spark.operators import similarity as SIM
from fluss_iceberg_spark.sources.tpch import load_table

SF = "/root/testdata/sf0.001"
DIM = 64
K = 8
ITERS = 4


def _emb_numpy(spark):
    emb = load_table(spark, SF, "embeddings")
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([[float(x) for x in r.embedding] for r in rows])
    return emb, ids, X


def _reference_kmeans(ids, X, k=K, iters=ITERS):
    """Mirror of the operator's contract: init = first k by vec_id,
    assignment by cosine argmax (lowest cid ties), update = raw mean."""
    order = np.argsort(ids)
    X = X[order]
    C = X[:k].copy()
    for _ in range(iters):
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
        assign = (Xn @ Cn.T).argmax(axis=1)
        for c in range(k):
            m = X[assign == c]
            if len(m):
                C[c] = m.mean(axis=0)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    return C, (Xn @ Cn.T).argmax(axis=1), ids[order]


def test_distributed_kmeans_matches_numpy_reference(spark):
    emb, ids, X = _emb_numpy(spark)
    model = SIM.kmeans_fit(emb, n_clusters=K, n_iters=ITERS, dim=DIM)
    C_ref, assign_ref, ids_sorted = _reference_kmeans(ids, X)
    C_got = np.array([cv for _cid, cv, _n in sorted(model)])
    assert C_got == pytest.approx(C_ref, rel=1e-9, abs=1e-9)
    got = {
        r.vec_id: r.cluster_id
        for r in SIM.kmeans_assign(emb, model, dim=DIM).collect()
    }
    expect = dict(zip(ids_sorted.tolist(), assign_ref.tolist()))
    assert got == expect


def test_kmeans_clusters_cover_all_vectors(spark):
    emb, ids, _ = _emb_numpy(spark)
    model = SIM.kmeans_fit(emb, n_clusters=K, n_iters=1, dim=DIM)
    assigned = SIM.kmeans_assign(emb, model, dim=DIM)
    assert assigned.count() == len(ids)
    assert assigned.select("vec_id").distinct().count() == len(ids)


def test_semdedup_matches_greedy_reference(spark):
    emb, ids, X = _emb_numpy(spark)
    thr = 0.9
    out = {r.vec_id: r for r in DD.semdedup(emb, n_clusters=K, threshold=thr).collect()}
    assert set(out) == set(ids.tolist())
    # rebuild the greedy decision per cluster from the output's own
    # cluster partition: within a cluster, in vec_id order, a vector is
    # kept iff max cosine to the previously-kept set is < thr, and a
    # dropped vector's representative is its nearest kept vector
    by_vec = {int(i): X[n] for n, i in enumerate(ids)}
    clusters: dict[int, list[int]] = {}
    for vid, r in out.items():
        clusters.setdefault(r.cluster_id, []).append(vid)
    for cid, members in clusters.items():
        members.sort()
        kept: list[int] = []
        for vid in members:
            x = by_vec[vid] / np.linalg.norm(by_vec[vid])
            if kept:
                Kn = np.array([by_vec[k] / np.linalg.norm(by_vec[k]) for k in kept])
                sims = Kn @ x
                j = int(sims.argmax())
                if sims[j] >= thr:
                    assert not out[vid].keep, vid
                    assert out[vid].representative == kept[j], vid
                    continue
            assert out[vid].keep, vid
            assert out[vid].representative == vid
            kept.append(vid)


def test_semdedup_threshold_monotone(spark):
    emb, _, _ = _emb_numpy(spark)
    loose = DD.semdedup(emb, n_clusters=K, threshold=0.99)
    tight = DD.semdedup(emb, n_clusters=K, threshold=0.5)
    n_loose = loose.filter("keep").count()
    n_tight = tight.filter("keep").count()
    assert n_tight <= n_loose  # lower threshold prunes more
