"""Epoch materialization (mixture upsampling by repetition): rate
arithmetic replayed in pure Python, copy uniqueness, shard-position
density, and the upsample/downsample split."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from fluss_iceberg_spark.operators.text import epoch_materialize


def _docs(spark):
    # 'big' carries ~10x the token mass of 'small': small upsamples
    # (repetition), big downsamples (fractional keep)
    rows = [(i, "big", "tok " * 40) for i in range(100)] + [
        (100 + i, "small", "tok " * 8) for i in range(50)
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def _expected(rows, cap=3_000_000, salt="esh-v1"):
    """Pure-Python replay of the integer rate arithmetic + md5 draws."""
    toks = {d: len(t.split()) for d, _, t in rows}
    dom = {d: lang for d, lang, _ in rows}
    mass: dict = {}
    for d, lang, _ in rows:
        mass[lang] = mass.get(lang, 0) + toks[d]
    target = sum(mass.values()) // len(mass)
    rate = {
        lang: min(cap, target * 1_000_000 // m) for lang, m in mass.items()
    }
    out = set()
    for d, lang, _ in rows:
        r = rate[lang]
        full, frac = divmod(r, 1_000_000)
        bucket = (
            int(hashlib.md5(f"{salt}:{d}".encode()).hexdigest()[:8], 16)
            % 1_000_000
        )
        for c in range(full + (1 if bucket < frac else 0)):
            out.add((d, c))
    return out, rate, dom


def test_epoch_copies_match_python_replay(spark):
    rows = [
        (i, "en" if i % 3 else "de", "tok " * (1 + i % 13)) for i in range(300)
    ]
    got = {
        (r["doc_id"], r["copy_idx"])
        for r in epoch_materialize(
            spark.createDataFrame(rows, "doc_id long, lang string, text string")
        ).collect()
    }
    want, _, _ = _expected(rows)
    assert got == want


def test_upsample_and_downsample_split(spark):
    out = epoch_materialize(_docs(spark)).collect()
    by_dom: dict = {}
    for r in out:
        by_dom.setdefault(r["domain"], set()).add((r["doc_id"], r["copy_idx"]))
    # every (doc, copy) pair unique
    assert len(out) == sum(len(v) for v in by_dom.values())
    # small domain upsampled: more copies than docs (repetition happened)
    assert len(by_dom["small"]) > 50
    assert any(c > 0 for _, c in by_dom["small"])
    # big domain downsampled: strictly fewer kept than docs, no repeats
    assert len(by_dom["big"]) < 100
    assert all(c == 0 for _, c in by_dom["big"])


def test_shard_positions_dense_and_ordered(spark):
    out = epoch_materialize(_docs(spark), n_shards=4).collect()
    assert set(r["shard"] for r in out) <= set(range(4))
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["pos_in_shard"])
        assert [r["pos_in_shard"] for r in rows] == list(
            range(1, len(rows) + 1)
        )
        keys = [(r["shuffle_key"], r["doc_id"], r["copy_idx"]) for r in rows]
        assert keys == sorted(keys)


def test_repeat_cap_bounds_output(spark):
    # one tiny domain vs a huge one: repetition is capped at 3 copies
    rows = [(0, "tiny", "tok"), *[(i, "huge", "tok " * 50) for i in range(1, 80)]]
    out = epoch_materialize(
        spark.createDataFrame(rows, "doc_id long, lang string, text string")
    ).collect()
    tiny = [r for r in out if r["domain"] == "tiny"]
    assert 1 <= len(tiny) <= 3
    assert max(r["copy_idx"] for r in tiny) <= 2
