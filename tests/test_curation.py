"""Unit tests for the curation operators (PII scrub, sequence packing,
semantic representatives) — detection proven on literal documents, since
the synthetic corpus is PII-free."""

from __future__ import annotations

from pyspark.sql import functions as F

from fluss_iceberg_spark.operators import dedup as DD
from fluss_iceberg_spark.operators import text as TX


def test_pii_detects_and_scrubs(spark):
    docs = spark.createDataFrame(
        [
            (1, "contact me at jane.doe+spam@example.co.uk or 555-867-5309 ok"),
            (2, "server at 10.0.42.7 responded"),
            (3, "no pii here at all"),
            (4, "two mails a@b.io c@d.org and ip 192.168.0.1"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in TX.pii_scrub(docs).collect()}
    assert (rows[1].n_emails, rows[1].n_phones, rows[1].n_ips) == (1, 1, 0)
    assert (rows[2].n_emails, rows[2].n_phones, rows[2].n_ips) == (0, 0, 1)
    assert (rows[3].n_emails, rows[3].n_phones, rows[3].n_ips) == (0, 0, 0)
    assert (rows[4].n_emails, rows[4].n_phones, rows[4].n_ips) == (2, 0, 1)

    scrubbed = {
        r.doc_id: r.s
        for r in docs.select(
            "doc_id", TX.scrub_pii(F.col("text")).alias("s")
        ).collect()
    }
    assert scrubbed[1] == "contact me at [EMAIL] or [PHONE] ok"
    assert scrubbed[2] == "server at [IP] responded"
    assert scrubbed[3] == "no pii here at all"
    assert scrubbed[4] == "two mails [EMAIL] [EMAIL] and ip [IP]"


def test_pack_sequences_bins_and_offsets(spark):
    # shard A: docs of 3, 4, 5 tokens with budget 6 →
    # cum_before 0, 3, 7 → bins 0, 0, 1; offsets 0, 3, 1
    docs = spark.createDataFrame(
        [
            (1, "a b c", "A"),
            (2, "a b c d", "A"),
            (3, "a b c d e", "A"),
            (10, "x y", "B"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {r.doc_id: r for r in TX.pack_sequences(docs, budget=6).collect()}
    assert (rows[1].bin, rows[1].offset_in_bin) == (0, 0)
    assert (rows[2].bin, rows[2].offset_in_bin) == (0, 3)
    assert (rows[3].bin, rows[3].offset_in_bin) == (1, 1)
    # shards pack independently
    assert (rows[10].bin, rows[10].offset_in_bin) == (0, 0)


def test_semantic_representatives_clusters_and_singletons(spark):
    # 1≈2≈3 (identical direction), 4 orthogonal singleton
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.0]),
            (3, [0.999, 0.01]),
            (4, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {
        r.vec_id: r
        for r in DD.semantic_representatives(emb, 0.9, dim=2).collect()
    }
    assert rows[1].representative == 1 and rows[1].keep
    assert rows[2].representative == 1 and not rows[2].keep
    assert rows[3].representative == 1 and not rows[3].keep
    assert rows[4].representative == 4 and rows[4].keep


def test_budget_two_phase_equals_exact_greedy(spark):
    """The bounded-sort two-phase threshold must select EXACTLY the same
    documents as the one-window greedy form — including quality-tie
    levels straddling the budget, a group fitting entirely, and a group
    whose best single doc already overflows."""
    import random

    rng = random.Random(7)
    words = ["the", "and", "of", "to", "is", "data", "spark", "x9", "!!", "lake"]
    rows = []
    for i in range(400):
        lang = ["en", "de", "fr", "tiny"][i % 4]
        n = rng.randint(3, 40) if lang != "tiny" else 2
        rows.append((i, lang, " ".join(rng.choice(words) for _ in range(n))))
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    for budget in (50, 400, 100000):
        exact = {
            r.doc_id
            for r in TX.budget_select(docs, budget).collect()
        }
        fast = TX.budget_select_two_phase(docs, budget).collect()
        assert {r.doc_id for r in fast} == exact, f"budget={budget}"
        assert len(fast) == len({r.doc_id for r in fast})  # no dup rows


def test_quality_percentile_filter_exact_quartile(spark):
    """Per-stratum top-quartile keep vs a from-scratch Python replay of
    the rank rule (quality DESC, doc_id tie-break, ceil(frac*n) kept)."""
    import math

    from fluss_iceberg_spark.operators.text import (
        quality_percentile_filter,
        quality_score,
    )

    rows = []
    for i in range(30):
        rows.append((i, "en", "the and of to is " * (i % 7 + 1) + "x" * (i % 5)))
    for i in range(30, 37):
        rows.append((i, "de", "der und ist " + "word " * (i % 3 + 2)))
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        (r.doc_id, r.lang, r.grp_rank, r.grp_size)
        for r in quality_percentile_filter(docs, frac=0.25).collect()
    }
    scored = quality_score(docs, keep=("lang",)).collect()
    by_lang: dict = {}
    for r in scored:
        by_lang.setdefault(r.lang, []).append((-r.quality, r.doc_id))
    want = set()
    for lang, items in by_lang.items():
        items.sort()
        k = math.ceil(len(items) * 0.25)
        for rank, (_, doc_id) in enumerate(items[:k], start=1):
            want.add((doc_id, lang, rank, len(items)))
    assert got == want and want
    # every language stratum keeps ceil(n/4) docs — none wiped out
    langs = {lang for _, lang, _, _ in want}
    assert langs == {"en", "de"}


def test_quality_percentile_two_phase_equals_exact(spark):
    """The 100 TB histogram-cut form must return EXACTLY the exact
    window form's rows — doc set, grp_rank, grp_size — including
    quality-tie levels straddling the cut, single-doc strata, and
    frac edge values (everything kept / one kept per group)."""
    import random

    from fluss_iceberg_spark.operators.text import (
        quality_percentile_filter,
        quality_percentile_filter_two_phase,
    )

    rng = random.Random(11)
    words = ["the", "and", "of", "to", "is", "noise", "x1", "!!", "99", "pad"]
    rows = []
    for i in range(500):
        lang = ["en", "en", "en", "de", "fr", "solo"][i % 6]
        if lang == "solo" and i > 5:
            lang = "en"  # keep one genuine single-doc stratum
        n = rng.randint(2, 25)
        rows.append((i, lang, " ".join(rng.choice(words) for _ in range(n))))
    # force heavy quality TIES: many duplicate texts per group
    for i in range(500, 560):
        rows.append((i, "de", "the and of to is exactly alike"))
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    for frac in (0.25, 0.5, 1.0, 0.01):
        exact = {
            (r.doc_id, r[1], r.quality, r.grp_rank, r.grp_size)
            for r in quality_percentile_filter(docs, frac=frac).collect()
        }
        fast = quality_percentile_filter_two_phase(docs, frac=frac).collect()
        got = {
            (r.doc_id, r[1], r.quality, r.grp_rank, r.grp_size) for r in fast
        }
        assert got == exact and exact, f"frac={frac}"
        assert len(fast) == len(got)  # no duplicate rows


def test_bigram_scores_match_python_replay(spark):
    """bigram_scores == a pure-Python bigram-LM replay: corpus bigram
    counts, context counts as prefix sums over the bigram vocabulary,
    per-doc weighted conditional probability / avg frequency / rare
    mass. Exercises repeats within a doc, cross-doc shared bigrams,
    sub-2-token docs (dropped), and rare_df boundary counts."""
    from collections import Counter

    from fluss_iceberg_spark.operators.text import bigram_scores

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat"),
        (3, "the cat the cat the cat"),  # intra-doc repeats
        (4, "one"),                       # no bigrams -> dropped
        (5, ""),                          # no bigrams -> dropped
        (6, "zz qq"),                     # globally unique bigram
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (
            r.n_bigrams,
            round(r.coherence, 12),
            round(r.avg_bigram_freq, 12),
            round(r.rare_bigram_frac, 12),
        )
        for r in bigram_scores(docs).collect()
    }
    # replay
    toks = {d: t.split() for d, t in rows}
    grams = {d: [f"{w[i]} {w[i+1]}" for i in range(len(w) - 1)]
             for d, w in toks.items() if len(w) >= 2 and w != [""]}
    freq = Counter(g for gs in grams.values() for g in gs)
    pref = Counter()
    for g, c in freq.items():
        pref[g.split(" ")[0]] += c
    want = {}
    for d, gs in grams.items():
        if not gs:
            continue
        n = len(gs)
        sum_bg = sum(freq[g] for g in gs)
        sum_w1 = sum(pref[g.split(" ")[0]] for g in gs)
        n_rare = sum(1 for g in gs if freq[g] <= 2)
        want[d] = (
            n,
            round(sum_bg / sum_w1, 12),
            round(sum_bg / n, 12),
            round(n_rare / n, 12),
        )
    assert got == want
    assert 4 not in got and 5 not in got
    # doc 3's transitions are all "the cat"/"cat the" — high coherence;
    # doc 6's unique bigram is 100% rare
    assert got[6][3] == 1.0


def test_domain_cap_equals_naive_window(spark):
    """domain_frequency_cap (two-phase histogram cut) == the naive
    per-domain rank window, including: tie levels straddling the cap,
    under-cap domains (pass through whole), a flooding domain, and
    cap >= domain size."""
    from pyspark.sql import Window as W

    from fluss_iceberg_spark.operators.text import domain_frequency_cap

    rows = []
    i = 0
    for dom, sizes in (
        ("a.com", [100] * 7 + [50, 50, 10]),   # ties straddle cap=8
        ("b.org", [30, 20, 10]),                # under cap
        ("flood.net", list(range(200))),        # oversized
        ("solo.io", [5]),
    ):
        for s in sizes:
            rows.append((i, dom, s))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    for cap in (8, 1, 500):
        got = {
            tuple(r) for r in domain_frequency_cap(docs, cap=cap).collect()
        }
        w = W.partitionBy("source").orderBy(
            F.desc("n_chars"), F.asc("doc_id")
        )
        want = {
            tuple(r)
            for r in docs.select(
                "doc_id", "source", "n_chars",
                F.row_number().over(w).cast("int").alias("dom_rank"),
                F.count(F.lit(1)).over(W.partitionBy("source"))
                .cast("int").alias("dom_size"),
            ).filter(F.col("dom_rank") <= cap).collect()
        }
        assert got == want and want, f"cap={cap}"


def test_quality_percentile_adaptive_dispatch(spark):
    """Adaptive = exact below the doc bound, two-phase above it; both
    paths return the identical set, so the dispatch is caller-invisible."""
    from fluss_iceberg_spark.operators.text import (
        quality_percentile_filter_adaptive,
    )

    rows = [
        (i, ["en", "de"][i % 2], "the and of to is pad " * (1 + i % 5))
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    via_exact = {
        (r.doc_id, r.grp_rank)
        for r in quality_percentile_filter_adaptive(
            docs, frac=0.5, two_phase_min_docs=10**9
        ).collect()
    }
    via_two_phase = {
        (r.doc_id, r.grp_rank)
        for r in quality_percentile_filter_adaptive(
            docs, frac=0.5, two_phase_min_docs=0
        ).collect()
    }
    assert via_exact == via_two_phase and via_exact


def test_gopher_rules_flags(spark):
    """Each Gopher rule trips on its canonical violation and the clean
    document passes all seven."""
    from fluss_iceberg_spark.operators.text import gopher_rules

    docs = spark.createDataFrame(
        [
            (0, "the cat and the hat. have fun with that"),   # clean
            (1, "- b one\n- b two\n- b three\nthe of"),        # bullets > 90%? no: 3/4
            (2, "wait...\nmore...\nthe of"),                   # ellipsis 2/3 > 30%
            (3, "## # ## the of # yes ##"),                    # symbol-heavy
            (4, "aaaaaaaaaaaaaaaaaaaaaaaaaaa the of"),         # mean word len > 10
            (5, "1 2 3 4 5 6 7 8 9 10 the of"),                # < 80% alpha words
            (6, "no stop words here maybe"),                   # stopwords < 2
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in gopher_rules(docs).collect()}
    assert got[0]["keep"] == 1
    assert got[2]["r_ellipsis_lines"] == 0 and got[2]["keep"] == 0
    assert got[3]["r_symbol_ratio"] == 0
    assert got[4]["r_mean_word_len"] == 0
    assert got[5]["r_alpha_words"] == 0
    assert got[6]["r_stopwords"] == 0
    # bullet rule: 3 of 4 lines bulleted = 75% <= 90% -> passes
    assert got[1]["r_bullet_lines"] == 1


def test_compression_ratio_pins_zlib(spark):
    """Kernel output == direct zlib arithmetic; repetitive text filters
    low, noise-like text filters high, prose passes."""
    import zlib

    from fluss_iceberg_spark.operators.text import compression_ratio_filter

    import hashlib

    texts = {
        0: "the quick brown fox jumps over the lazy dog. it was a bright "
           "cold day in april and the clocks were striking thirteen.",
        1: "spam " * 400,  # hyper-repetitive -> ratio ~14, filters low
        2: "".join(  # 32 high-entropy chars: zlib EXPANDS it (ratio 1250)
            chr(33 + (b % 90)) for b in hashlib.sha256(b"y").digest()
        ),
        3: None,
        4: "",
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in compression_ratio_filter(docs).collect()}
    for k, t in texts.items():
        if not t:
            assert got[k]["ratio_milli"] is None and got[k]["keep"] is None
            continue
        raw = t.encode("utf-8")
        z = len(zlib.compress(raw, 6))
        assert got[k]["n_bytes"] == len(raw)
        assert got[k]["z_bytes"] == z
        assert got[k]["ratio_milli"] == z * 1000 // len(raw)
    assert got[1]["keep"] == 0 and got[1]["ratio_milli"] < 300
    assert got[2]["keep"] == 0 and got[2]["ratio_milli"] > 1100
    assert got[0]["keep"] == 1
