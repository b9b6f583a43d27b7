"""BPE tokenizer training + application: the Sennrich worked example,
Spark-trained == pure-local-trained equality, corpus-wide lossless
round trip, and encode/apply edge cases."""

from __future__ import annotations

from fluss_iceberg_spark.operators.bpe import (
    EOW,
    _encode_word,
    bpe_roundtrip,
    bpe_token_stats,
    decode_tokens,
    encode_text,
    merges_df,
    train_bpe,
    train_bpe_local,
    word_counts,
)

SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_sennrich_worked_example():
    # the public 2016 paper's corpus: es(9) -> est(9) -> est</w>(9) ->
    # lo(7) -> low(7) ... with (count desc, pair asc) tie-breaking
    merges = train_bpe_local(SENNRICH, 5)
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", EOW),
        ("l", "o"),
        ("lo", "w"),
    ]


def test_apply_segments_unseen_word():
    ranks = {p: i for i, p in enumerate(train_bpe_local(SENNRICH, 10))}
    assert _encode_word("lowest", ranks) == ["low", "est" + EOW]


def test_merge_loop_exhausts_and_stops():
    merges = train_bpe_local({"ab": 1}, 100)
    # "ab" -> a b </w>: only 2 pairs exist, then their merges
    assert len(merges) <= 3
    ranks = {p: i for i, p in enumerate(merges)}
    assert decode_tokens(_encode_word("ab", ranks)) == "ab"


def test_roundtrip_exact_on_hostile_text():
    ranks = {p: i for i, p in enumerate(train_bpe_local(SENNRICH, 8))}
    for text in (
        "",
        " ",
        "low",
        "  low\tnewest  lowest\n\nwidest ",
        "naïve café — ünïcödé",
        "a" * 500,
        "\n\t \r\n mixed   runs\t",
    ):
        assert decode_tokens(encode_text(text, ranks, {})) == text


def test_memo_is_consistent():
    ranks = {p: i for i, p in enumerate(train_bpe_local(SENNRICH, 8))}
    memo: dict = {}
    first = encode_text("newest newest", ranks, memo)
    second = encode_text("newest", ranks, memo)
    assert first == second + [" "] + second


def test_spark_train_equals_local(spark):
    rows = [
        (i, ("low lower newest widest " * (1 + i % 3)).strip())
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = train_bpe(docs, n_merges=12, vocab_cap=1000)
    counts = {
        r["word"]: r["n"] for r in word_counts(docs).collect()
    }
    assert got == train_bpe_local(counts, 12)


def test_spark_roundtrip_and_stats(spark):
    rows = [
        (0, "the quick brown fox"),
        (1, "  leading and   irregular\twhitespace\n"),
        (2, None),
        (3, "the the the"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(docs, n_merges=20, vocab_cap=100)
    out = {
        r["doc_id"]: r["rebuilt"]
        for r in bpe_roundtrip(docs, merges).collect()
    }
    assert out == {0: rows[0][1], 1: rows[1][1], 2: None, 3: rows[3][1]}
    stats = {
        r["doc_id"]: (r["n_tokens"], r["n_word_tokens"], r["n_chars"])
        for r in bpe_token_stats(docs, merges).collect()
    }
    assert stats[2] == (None, None, None)
    assert stats[3][2] == len("the the the")
    # "the" fully merges at 20 merges over this corpus: 3 word tokens +
    # 2 whitespace tokens
    assert stats[3][0] == 5 and stats[3][1] == 3
    mdf = merges_df(spark, merges)
    assert mdf.count() == len(merges)
    assert [f.name for f in mdf.schema.fields] == [
        "rank", "left", "right", "merged",
    ]


def test_vocab_cap_bounds_collect(spark):
    rows = [(i, f"w{i} common") for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = train_bpe(docs, n_merges=10, vocab_cap=5)
    # "common" (n=300) survives any cap; the cap changes which rare
    # types contribute, not determinism
    assert capped == train_bpe(docs, n_merges=10, vocab_cap=5)
    ranks = {p: i for i, p in enumerate(capped)}
    assert decode_tokens(encode_text("w1 common", ranks, {})) == "w1 common"


def test_eow_never_collides_with_corpus():
    # private-use codepoint: absent from any real text the corpus holds
    assert EOW not in "plain ascii corpus text"
    assert EOW not in "naïve café — ünïcödé"


def test_roundtrip_property_hypothesis():
    """Property: decode(encode(text)) == text for ARBITRARY unicode text
    (minus the private-use EOW sentinel, which no real corpus contains)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ranks = {p: i for i, p in enumerate(train_bpe_local(SENNRICH, 8))}

    @settings(max_examples=200, deadline=None)
    @given(
        st.text(
            alphabet=st.characters(blacklist_characters=EOW),
            max_size=300,
        )
    )
    def check(text):
        assert decode_tokens(encode_text(text, ranks, {})) == text

    check()
