"""Streaming near-duplicate admission control: first-seen-wins across
batches, min-id-per-cluster within a batch, novel docs admitted, and
replay idempotence — checked on a handcrafted corpus whose duplicate
pairs are EXACT copies (signature-identical, so LSH collision is
deterministic) and whose unique docs share no shingles (exact verify
rejects any stray bucket collision)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from fluss_iceberg_spark.lake.table import LakeCatalog
from fluss_iceberg_spark.operators import dedup as DD


def _corpus(spark):
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(400)]

    def unique_text():
        return " ".join(rng.choice(vocab) for _ in range(40))

    text_a = unique_text()
    text_b = unique_text()
    text_c = unique_text()
    rows = []
    for i in range(12):
        rows.append((i, unique_text()))
    # exact-copy clusters: {0, 5, 10} (batches 0,1,2), {2, 3} (batches
    # 2,3), and {4, 8} both in batch 0 (intra-batch, min id wins)
    rows[0] = (0, text_a)
    rows[5] = (5, text_a)
    rows[10] = (10, text_a)
    rows[2] = (2, text_b)
    rows[3] = (3, text_b)
    rows[4] = (4, text_c)
    rows[8] = (8, text_c)
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run(spark, wh, docs):
    cat = LakeCatalog(spark, wh)
    buckets = cat.create_table(
        "b", spark.createDataFrame([], "bkey string, owner long").schema,
        replace=True,
    )
    owner_sets = cat.create_table(
        "s",
        spark.createDataFrame([], "doc_id long, shset array<long>, n int").schema,
        replace=True,
    )
    admitted = cat.create_table(
        "a", spark.createDataFrame([], "doc_id long, batch int").schema,
        replace=True,
    )
    for b in range(4):
        DD.neardup_admit_batch(
            buckets, owner_sets, admitted,
            docs.filter(F.pmod("doc_id", F.lit(4)) == b), b,
        )
    return buckets, owner_sets, admitted


def test_stream_admission_first_seen_wins(spark, tmp_path):
    docs = _corpus(spark)
    buckets, owner_sets, admitted = _run(spark, str(tmp_path / "wh"), docs)
    got = {r.doc_id for r in admitted.read().collect()}
    # 5 and 10 lose to 0 (earlier batches win); 3 loses to 2; 8 loses to
    # 4 within batch 0; everything else is novel
    assert got == {0, 1, 2, 4, 6, 7, 9, 11}
    # the batch attribution matches doc_id mod 4 of each winner
    batches = {r.doc_id: r.batch for r in admitted.read().collect()}
    assert all(b == d % 4 for d, b in batches.items())
    # bucket owners are admitted docs only, and EVERY admitted doc is
    # fully indexed (16 band keys each — the multi-owner design; an
    # insert-only claim would leave pre-owned keys unindexed and let
    # later near-copies slip past screening)
    brows = buckets.read().collect()
    assert {r.owner for r in brows} == got
    assert len(brows) == 16 * len(got)


def test_stream_admission_replay_is_idempotent(spark, tmp_path):
    docs = _corpus(spark)
    buckets, owner_sets, admitted = _run(spark, str(tmp_path / "wh2"), docs)
    before = {r.doc_id for r in admitted.read().collect()}
    # replaying every batch admits nothing: each doc now collides with
    # its own stored copy at jaccard 1.0
    for b in range(4):
        n = DD.neardup_admit_batch(
            buckets, owner_sets, admitted,
            docs.filter(F.pmod("doc_id", F.lit(4)) == b), b,
        )
        assert n == 0
    assert {r.doc_id for r in admitted.read().collect()} == before


def test_stream_admission_python_replay_parity(spark, tmp_path):
    """Full-rule parity against a pure-Python replay (exact all-pairs
    Jaccard on the same 3-gram shingle rule) over a corpus with only
    exact-copy duplicates, where LSH recall is certain."""
    docs = _corpus(spark)
    _, _, admitted = _run(spark, str(tmp_path / "wh3"), docs)
    got = {r.doc_id for r in admitted.read().collect()}

    rows = sorted(
        ((r.doc_id, r.text) for r in docs.collect()), key=lambda x: x[0]
    )

    def grams(t):
        ws = t.lower().split()
        return {" ".join(ws[i: i + 3]) for i in range(len(ws) - 2)}

    def jac(a, b):
        return len(a & b) / len(a | b)

    state: dict[int, set] = {}
    expect = set()
    for b in range(4):
        batch = [(d, grams(t)) for d, t in rows if d % 4 == b]
        surv = [
            (d, g)
            for d, g in batch
            if all(jac(g, sg) < 0.8 for sg in state.values())
        ]
        # within-batch clusters, min id admits
        for i, (d, g) in enumerate(surv):
            if all(jac(g, g2) < 0.8 for d2, g2 in surv[:i] if d2 < d):
                expect.add(d)
                state[d] = g
    assert got == expect


def test_state_scan_prunes_to_colliding_files(spark, tmp_path):
    """The per-tick bucket-state read must scan only files holding a
    probed key (manifest-bloom IN pushdown), so scanned-file count stays
    FLAT as non-colliding admitted state grows — the r5 verdict's scale
    fix for the per-tick O(admitted corpus) state scan."""
    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(4000)]

    def unique_text():
        return " ".join(rng.choice(vocab) for _ in range(40))

    cat = LakeCatalog(spark, str(tmp_path / "prune_wh"))
    buckets = cat.create_table(
        "b", spark.createDataFrame([], "bkey string, owner long").schema,
        properties={"write.bloom-columns": "bkey"},
    )
    owner_sets = cat.create_table(
        "s",
        spark.createDataFrame([], "doc_id long, shset array<long>, n int").schema,
    )
    admitted = cat.create_table(
        "a", spark.createDataFrame([], "doc_id long, batch int").schema,
    )
    # grow the state: 4 batches of unique docs, disjoint vocab draws
    scanned = []
    for b in range(4):
        docs = spark.createDataFrame(
            [(b * 100 + i, unique_text()) for i in range(8)],
            "doc_id long, text string",
        )
        DD.neardup_admit_batch(buckets, owner_sets, admitted, docs, b)
        # probe with a FRESH batch's keys (no collisions with state):
        probe = DD.band_keys(
            DD.minhash_signatures(
                DD.shingle_sets(
                    spark.createDataFrame(
                        [(9999, unique_text())], "doc_id long, text string"
                    )
                )
            )
        )
        keys = [r.bkey for r in probe.select("bkey").distinct().collect()]
        scanned.append(len(buckets.plan_scan(where=[("bkey", "in", keys)])))
    total_files = len(buckets.plan_scan())
    assert total_files >= 4  # state really grew file-by-file
    # non-colliding probes scan (almost) nothing, and the count does not
    # grow with the state: bloom false positives may keep a stray file,
    # but never a linearly growing share
    assert scanned[-1] <= 1, scanned
    assert max(scanned) <= 1, scanned
    # a probe with a REAL collision still finds its file
    state_keys = [r.bkey for r in buckets.read().select("bkey").limit(5).collect()]
    hit = buckets.plan_scan(where=[("bkey", "in", state_keys)])
    assert len(hit) >= 1


def test_bucket_key_bytes_are_pinned(spark):
    """State tables persist bucket keys across engine versions — the
    exact key bytes (band id + xxhash64 over 4 signature mins) must
    never drift, or every admitted corpus's state would silently stop
    colliding with new arrivals. Golden values captured from the r7
    formulation; any reformulation of shingle/minhash/banding must
    reproduce them byte-for-byte."""
    from fluss_iceberg_spark.operators import dedup as DD

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again and again")],
        "doc_id long, text string",
    )
    rows = (
        DD.band_keys(DD.minhash_signatures(DD.shingle_sets(docs)))
        .orderBy("bkey")
        .collect()
    )
    got = sorted(r.bkey for r in rows)
    assert got == sorted([
        "0:-4652815228421735820", "1:8006053365375658152",
        "2:2838647610137566442", "3:-8581746122306448926",
        "4:-8191930346844029539", "5:-6222562038941525608",
        "6:5028712379992463297", "7:-2930617949651063909",
        "8:-1182103933515838201", "9:4216671489810067053",
        "10:6313202741838026488", "11:7146574776239625667",
        "12:-4906201715138207662", "13:3790675555621220525",
        "14:-6302960123516498105", "15:6333702385396492593",
    ])


def test_minhash_kernel_null_and_warning_contracts():
    """r13 (r12 ADVICE): a NULL shingle array maps to a NULL signature
    (the old array_min(transform(...)) contract), and the exported XXH64
    helpers are warning-clean at any call site (uint64 wraparound is the
    algorithm, not an error)."""
    import warnings

    import numpy as np

    from fluss_iceberg_spark.operators.dedup import (
        _minhash_np,
        xxh64_int_np,
        xxh64_long_np,
    )

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any RuntimeWarning fails the test
        res = _minhash_np([None, [], [3, 5, 7]])
        h = xxh64_long_np(np.array([2**63 - 1, 1], dtype=np.uint64),
                          np.uint64(42))
        xxh64_int_np(7, h)
    assert res[0] is None and res[1] is None
    assert isinstance(res[2], list) and len(res[2]) == 64
