"""Distributed BPE tokenizer training + application — the tokenizer leg
of a training-data pipeline (the reference's lakehouse feeds model
training; token statistics already exist in operators/text.py — this
adds LEARNING the subword vocabulary from the corpus and encoding with
it, after Sennrich et al. 2016's public byte-pair-encoding algorithm).

100 TB design (the same shape HuggingFace tokenizers and the original
subword-nmt use — train on WORD COUNTS, never the raw corpus):

1. ONE corpus-sized shuffle: whitespace-split -> explode -> groupBy word
   -> count. This is the only stage that touches every byte.
2. Vocabulary cap: top ``vocab_cap`` word types by (count desc, word
   asc) via TakeOrdered — word TYPES grow sublinearly (Heaps' law), and
   the cap makes the driver materialization bounded and documented,
   like the 65k quantizer sample in operators/similarity.py.
3. Driver-side merge loop over the capped word-count table with
   INCREMENTAL pair-count maintenance (pair->words index; each merge
   re-segments only the words containing the pair) — O(affected words)
   per merge, independent of corpus size.
4. Encode: merges broadcast to an Arrow ``mapInPandas`` kernel that
   memoizes per DISTINCT word inside each batch — map-side only, no
   shuffle, no driver involvement.

Losslessness: the encoder splits on a DELIMITER-CAPTURING regex, so
whitespace runs pass through as atomic tokens and
``decode(encode(text)) == text`` EXACTLY for arbitrary input — the
property the oracle-backed ``text_bpe_roundtrip`` query proves
corpus-wide (any dropped/duplicated/mis-merged token breaks the hash).

Determinism: merge selection is (count desc, pair asc); ties cannot
depend on hash order, so the Spark-trained and pure-local merge lists
are identical — the equality unit in tests/test_bpe.py asserts it.
"""

from __future__ import annotations

import re
from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# end-of-word sentinel: a private-use codepoint no corpus text contains;
# merges may absorb it so word-final subwords stay distinct (classic BPE)
EOW = "\ue000"

_SPLIT = re.compile(r"(\s+)")


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The one corpus-sized stage: whitespace words -> (word, n)."""
    return (
        docs.select(
            F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def train_bpe_local(counts: dict, n_merges: int) -> list:
    """Reference trainer over a word->count dict (Sennrich et al. 2016
    with incremental pair maintenance). Returns the ordered merge list
    [(left, right), ...]; selection is (count desc, pair asc) so the
    result is hash-order independent."""
    words = {w: tuple(w) + (EOW,) for w in counts}
    pair_counts: Counter = Counter()
    pair_words: dict = {}
    for w, syms in words.items():
        c = counts[w]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += c
            pair_words.setdefault((a, b), set()).add(w)
    merges: list = []
    for _ in range(n_merges):
        best_pair = None
        best_c = 0
        for pair, c in pair_counts.items():
            if c <= 0:
                continue
            if (
                best_pair is None
                or c > best_c
                or (c == best_c and pair < best_pair)
            ):
                best_pair, best_c = pair, c
        if best_pair is None:
            break
        pair = best_pair
        merges.append(pair)
        merged = pair[0] + pair[1]
        for w in list(pair_words.get(pair, ())):
            syms = words[w]
            c = counts[w]
            # remove this word's pair contributions
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= c
                s = pair_words.get((a, b))
                if s is not None:
                    s.discard(w)
            # re-segment: merge every occurrence left-to-right
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == pair[0]
                    and syms[i + 1] == pair[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = tuple(out)
            words[w] = syms
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += c
                pair_words.setdefault((a, b), set()).add(w)
    return merges


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    vocab_cap: int = 65536,
) -> list:
    """Distributed trainer: Spark word-count shuffle, TakeOrdered cap,
    then the bounded local merge loop. The collect is ``vocab_cap`` rows
    of (word, count) — a model-sized, documented driver materialization
    (same contract as the IVF quantizer sample)."""
    top = (
        word_counts(docs, text_col)
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(vocab_cap)
        .collect()
    )
    return train_bpe_local({r["word"]: r["n"] for r in top}, n_merges)


def _encode_word(word: str, ranks: dict) -> list:
    """Greedy lowest-rank merging of one word (classic BPE apply)."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        pair = (syms[best_i], syms[best_i + 1])
        merged = pair[0] + pair[1]
        out = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == pair[0] and syms[i + 1] == pair[1]:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def encode_text(text: str, ranks: dict, memo: dict) -> list:
    """Token stream for one document: whitespace runs pass through as
    atomic tokens (delimiter-capturing split), words BPE-encode with a
    per-distinct-word memo. ``''.join(decode)`` is exactly ``text``."""
    tokens: list = []
    for i, seg in enumerate(_SPLIT.split(text)):
        if seg == "":
            continue
        if i % 2 == 1:  # captured delimiter group = whitespace run
            tokens.append(seg)
            continue
        got = memo.get(seg)
        if got is None:
            got = _encode_word(seg, ranks)
            memo[seg] = got
        tokens.extend(got)
    return tokens


def decode_tokens(tokens: list) -> str:
    """Inverse of encode_text: concatenate and drop the EOW sentinels."""
    return "".join(tokens).replace(EOW, "")


def bpe_roundtrip(
    docs: DataFrame, merges: list, text_col: str = "text"
) -> DataFrame:
    """(doc_id, rebuilt) where rebuilt = decode(encode(text)) with the
    trained merges — the corpus-wide losslessness gate. Merges travel by
    closure capture (KBs); the kernel is map-side Arrow with a
    per-batch distinct-word memo."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def kernel(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict = {}
        for pdf in batch_iter:
            rebuilt = [
                None
                if t is None
                else decode_tokens(encode_text(t, ranks, memo))
                for t in pdf[text_col]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "rebuilt": rebuilt})

    return docs.select("doc_id", text_col).mapInPandas(
        kernel, "doc_id long, rebuilt string"
    )


def bpe_token_stats(
    docs: DataFrame, merges: list, text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_tokens, n_word_tokens, n_chars) under the trained
    tokenizer — the fertility / compression measurements a tokenizer
    sweep reads. Map-side only."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def kernel(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict = {}
        for pdf in batch_iter:
            n_tok, n_word, n_chr = [], [], []
            for t in pdf[text_col]:
                if t is None:
                    n_tok.append(None), n_word.append(None), n_chr.append(None)
                    continue
                toks = encode_text(t, ranks, memo)
                n_tok.append(len(toks))
                n_word.append(sum(1 for x in toks if not x.isspace()))
                n_chr.append(len(t))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": pd.Series(n_tok, dtype="Int32"),
                    "n_word_tokens": pd.Series(n_word, dtype="Int32"),
                    "n_chars": pd.Series(n_chr, dtype="Int32"),
                }
            )

    return docs.select("doc_id", text_col).mapInPandas(
        kernel, "doc_id long, n_tokens int, n_word_tokens int, n_chars int"
    )


def merges_df(spark, merges: list) -> DataFrame:
    """The learned merge table as a DataFrame (rank, left, right,
    merged) for persistence or inspection."""
    rows = [
        (i, left, right, left + right)
        for i, (left, right) in enumerate(merges)
    ]
    from fluss_iceberg_spark.operators.util import arrow_local_df

    return arrow_local_df(
        spark, rows, "rank int, left string, right string, merged string"
    )
