"""Content-defined chunking: pure-Python hash/cut replay, tiling
invariants, and the shift-robustness property that is the operator's
reason to exist (fixed-offset chunking loses every fingerprint after an
insertion; CDC re-synchronizes at the next hash sync point)."""

from __future__ import annotations

import hashlib
import random

from fluss_iceberg_spark.operators.dedup import cdc_chunks

W, D, B, M = 16, 64, 257, 1_000_003


def _cuts(text: str) -> list[int]:
    """Pure-Python replay: 1-based end positions of every chunk."""
    n = len(text)
    cuts = set()
    for i in range(1, max(n - W + 1, 0) + 1):  # 1-based window starts
        acc = 0
        for j in range(W):
            acc = (acc * B + ord(text[i - 1 + j])) % M
        if acc % D == 0:
            cuts.add(i + W - 1)
    cuts.add(n)
    return sorted(cuts)


def _chunks(text: str) -> list[tuple[int, int, str]]:
    out, start = [], 1
    for end in _cuts(text):
        out.append((start, end, text[start - 1 : end]))
        start = end + 1
    return out


def _rand_text(seed: int, n: int) -> str:
    rnd = random.Random(seed)
    return "".join(rnd.choice("abcdefgh ") for _ in range(n))


def test_spark_chunks_match_python_replay(spark):
    rows = [(i, _rand_text(i, 80 + 37 * i)) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_idx"]): (
            r["start_pos"],
            r["chunk_len"],
            r["fp"],
        )
        for r in cdc_chunks(df).collect()
    }
    want = {}
    for doc_id, text in rows:
        for k, (s, e, chunk) in enumerate(_chunks(text)):
            want[(doc_id, k)] = (
                s,
                e - s + 1,
                hashlib.md5(chunk.encode()).hexdigest(),
            )
    assert got == want


def test_chunks_tile_each_document(spark):
    rows = [(i, _rand_text(100 + i, 300)) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    by_doc: dict = {}
    for r in cdc_chunks(df).collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in rows:
        ch = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
        assert ch[0]["start_pos"] == 1
        for a, b in zip(ch, ch[1:]):
            assert b["start_pos"] == a["start_pos"] + a["chunk_len"]
        assert sum(r["chunk_len"] for r in ch) == len(text)


def test_short_doc_is_single_chunk(spark):
    df = spark.createDataFrame(
        [(0, "tiny"), (1, "x" * 15)], "doc_id long, text string"
    )
    out = cdc_chunks(df).collect()
    assert sorted((r["doc_id"], r["chunk_idx"], r["chunk_len"]) for r in out) == [
        (0, 0, 4),
        (1, 0, 15),
    ]


def test_shift_robustness_prefix_insertion(spark):
    """Insert 3 chars at the head of a doc: fixed-offset chunking would
    share ZERO fingerprints; CDC re-syncs — every chunk of the original
    after its first cut reappears verbatim in the shifted doc."""
    base = _rand_text(7, 600)
    shifted = "XYZ" + base
    df = spark.createDataFrame(
        [(0, base), (1, shifted)], "doc_id long, text string"
    )
    out = cdc_chunks(df).collect()
    fps = {0: set(), 1: set()}
    for r in out:
        fps[r["doc_id"]].add(r["fp"])
    base_chunks = _chunks(base)
    assert len(base_chunks) >= 3, "fixture must actually chunk"
    # chunks after the first boundary are content-synchronized
    resync = {
        hashlib.md5(c.encode()).hexdigest() for _, _, c in base_chunks[1:]
    }
    assert resync <= fps[1]
    assert fps[0] & fps[1], "shared fingerprints prove the census works"
    # and the census column reports the sharing
    shared = [r for r in out if r["doc_id"] == 0 and r["fp"] in fps[1]]
    assert all(r["n_docs_sharing"] == 2 for r in shared)


def test_streaming_census_equals_batch_and_is_idempotent(spark):
    """The foreachBatch maintainer's final read must equal the one-shot
    batch operator row-for-row, and re-running the query (fresh scratch
    per call) must reproduce it."""
    from fluss_iceberg_spark import registry

    registry.load_all()
    sf = "/root/testdata/sf0.001"

    def _rows(name):
        return {
            tuple(r)
            for r in registry.QUERIES[name](spark, sf).collect()
        }

    batch = _rows("dedup_cdc_chunks")
    stream1 = _rows("stream_cdc_chunk_census")
    stream2 = _rows("stream_cdc_chunk_census")
    assert stream1 == batch
    assert stream2 == batch


def test_cdc_rewrite_drops_all_but_first_occurrence(spark):
    """Two identical docs: the first keeps every chunk, the second
    rebuilds empty; a prefix-shifted copy keeps only its unsynced
    head."""
    from fluss_iceberg_spark.operators.dedup import cdc_rewrite

    base = _rand_text(7, 600)
    df = spark.createDataFrame(
        [(0, base), (1, base), (2, "XYZ" + base)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in cdc_rewrite(df).collect()}
    chunks = _chunks(base)
    # doc 0 is globally first for every one of its chunks
    assert out[0]["n_kept"] == out[0]["n_chunks"] == len(chunks)
    assert out[0]["rebuilt_len"] == len(base)
    assert out[0]["rebuilt_fp"] == hashlib.md5(base.encode()).hexdigest()
    # doc 1 duplicates doc 0 exactly: everything dropped
    assert out[1]["n_kept"] == 0 and out[1]["rebuilt_len"] == 0
    assert out[1]["rebuilt_fp"] == hashlib.md5(b"").hexdigest()
    # doc 2 re-synchronizes after its first cut: only the shifted head
    # survives (every post-sync chunk already occurred in doc 0)
    shifted_head = ("XYZ" + base)[: _cuts("XYZ" + base)[0]]
    assert out[2]["n_kept"] == 1
    assert out[2]["rebuilt_fp"] == hashlib.md5(
        shifted_head.encode()
    ).hexdigest()


def test_cdc_rewrite_within_doc_repeats_collapse(spark):
    """A chunk repeated INSIDE one doc keeps only its first occurrence."""
    from fluss_iceberg_spark.operators.dedup import cdc_rewrite

    seg = _rand_text(3, 300)
    doc = seg + seg
    df = spark.createDataFrame([(0, doc)], "doc_id long, text string")
    r = cdc_rewrite(df).collect()[0]
    assert r["n_kept"] < r["n_chunks"]
    assert r["rebuilt_len"] < len(doc)
