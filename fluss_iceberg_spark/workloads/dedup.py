"""Deduplication queries over documents/embeddings (training-data ops)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fluss_iceberg_spark.operators import dedup as DD
from fluss_iceberg_spark.registry import query
from fluss_iceberg_spark.sources.tpch import load_table

# exact pairwise n-gram Jaccard in DuckDB — the ground truth both the
# exact query and the LSH query are gated against
_JACCARD_SQL = """
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
        FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
    ), sizes AS (
        SELECT doc_id, COUNT(1) AS n FROM sh GROUP BY doc_id
    ), shared AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(1) AS c
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT d1, d2,
           CAST(c AS DOUBLE) / (s1.n + s2.n - c) AS jaccard
    FROM shared
    JOIN sizes s1 ON d1 = s1.doc_id
    JOIN sizes s2 ON d2 = s2.doc_id
    WHERE CAST(c AS DOUBLE) / (s1.n + s2.n - c) >= 0.8
"""


@query(
    "dedup_exact_documents",
    oracle="""
    SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
           MIN(doc_id) AS keep_doc_id,
           COUNT(1) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on normalized-text fingerprint."""
    return DD.exact_duplicates(load_table(spark, sf_dir, "documents"))


@query("dedup_ngram_jaccard", oracle=_JACCARD_SQL)
def ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs (τ=0.8) via the inverted
    shingle index — cost Σ bucket², not n²."""
    return DD.ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"), 0.8)


@query("dedup_minhash_lsh", oracle=_JACCARD_SQL)
def minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64)+LSH(16×4) candidates, exact-Jaccard verified (τ=0.8).
    Gated against the *exact* pairwise ground truth: candidate recall at
    J≥0.8 is ≈1-3e-4 per pair, so verified output equals the exact
    result; the banded candidate join is what scales to 100 TB."""
    return DD.minhash_lsh_pairs(load_table(spark, sf_dir, "documents"), 0.8)


@query(
    "dedup_connected_components",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_JACCARD_SQL}),
    edges AS (
        SELECT d1 AS a, d2 AS b FROM pairs
        UNION
        SELECT d2 AS a, d1 AS b FROM pairs
    ),
    reach(node, comp) AS (
        SELECT a AS node, a AS comp FROM edges
        UNION
        SELECT e.a AS node, r.comp
        FROM edges e JOIN reach r ON e.b = r.node
    )
    SELECT node AS doc_id, MIN(comp) AS component
    FROM reach
    GROUP BY node
    """,
)
def connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-dedup clustering: near-dup pairs (exact Jaccard τ=0.8) →
    connected components via iterative min-label propagation; component =
    the canonical (min) doc id. The oracle computes the same transitive
    closure with a recursive CTE."""
    pairs = DD.ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"), 0.8)
    return DD.connected_components(pairs)


@query("dedup_simhash")  # xxhash64 is not expressible in DuckDB → rows-only
def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(64-bit) near-dup pairs, Hamming ≤ 3, via 16-bit chunk
    banding (pigeonhole). Recall/precision asserted in unit tests against
    the exact Jaccard pairs."""
    return DD.simhash_near_pairs(load_table(spark, sf_dir, "documents"), 3)


@query(
    "dedup_embedding_cosine",
    oracle="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT a.vec_id AS id_a,
           b.vec_id AS id_b,
           round(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
                 4) AS cosine
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.45
    """,
)
def embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (τ=0.45), exact brute force —
    the LSH-bucketed scale path is ann_lsh_topk."""
    return DD.embedding_near_pairs(load_table(spark, sf_dir, "embeddings"), 0.45)


@query(
    "dedup_semantic_representatives",
    oracle="""
    WITH RECURSIVE v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), pairs AS (
        SELECT a.vec_id AS d1, b.vec_id AS d2
        FROM v a JOIN v b ON a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
              >= 0.45
    ), edges AS (
        SELECT d1 AS a, d2 AS b FROM pairs
        UNION
        SELECT d2 AS a, d1 AS b FROM pairs
    ), reach(node, comp) AS (
        SELECT a AS node, a AS comp FROM edges
        UNION
        SELECT e.a AS node, r.comp FROM edges e JOIN reach r ON e.b = r.node
    ), labels AS (
        SELECT node, MIN(comp) AS component FROM reach GROUP BY node
    )
    SELECT e.vec_id,
           COALESCE(l.component, e.vec_id) AS representative,
           e.vec_id = COALESCE(l.component, e.vec_id) AS keep
    FROM embeddings e LEFT JOIN labels l ON e.vec_id = l.node
    """,
)
def semantic_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup end-to-end: embedding near-dup pairs (cosine ≥ 0.45)
    → connected components → min-id representative per cluster; every
    vector gets a keep/drop decision (singletons keep themselves)."""
    return DD.semantic_representatives(load_table(spark, sf_dir, "embeddings"), 0.45)


@query(
    "dedup_decontaminate",
    oracle="""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id,
               w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS shingle
        FROM toks, UNNEST(range(1, len(w) - 2)) AS t(i)
    ), bench AS (
        SELECT DISTINCT shingle FROM sh WHERE doc_id % 37 = 0
    )
    SELECT s.doc_id,
           CAST(COUNT(b.shingle) AS INT) AS n_shared,
           COUNT(b.shingle) > 0 AS contaminated
    FROM sh s LEFT JOIN bench b ON s.shingle = b.shingle
    GROUP BY s.doc_id
    """,
)
def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination: every 37th document stands in for the
    benchmark corpus; training docs sharing any word 4-gram with it are
    flagged. Benchmark shingle vocab broadcast; one fact-side shuffle."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    benchmark = docs.filter(F.col("doc_id") % 37 == 0)
    return DD.decontaminate(docs, benchmark, n=4)


@query(
    "dedup_source_overlap",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS w
        FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, source,
               w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                    || ' ' || w[i+4] || ' ' || w[i+5] AS shingle
        FROM toks, UNNEST(range(1, len(w) - 4)) AS t(i)
    ), srcsh AS (
        SELECT DISTINCT source, shingle FROM sh
    ), hits AS (
        SELECT DISTINCT s.doc_id, s.source AS src_a, o.source AS src_b
        FROM sh s JOIN srcsh o
          ON s.shingle = o.shingle AND s.source <> o.source
    ), tot AS (
        SELECT source AS src_a, COUNT(*) AS n_docs FROM documents GROUP BY source
    )
    SELECT h.src_a, h.src_b,
           CAST(COUNT(*) AS INT) AS n_overlap,
           CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(t.n_docs) AS frac_overlap
    FROM hits h JOIN tot t ON h.src_a = t.src_a
    GROUP BY h.src_a, h.src_b
    """,
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix (data-mixing diagnostic): for each
    ordered source pair, the count and fraction of src_a's docs sharing
    any word 6-gram with src_b. One inverted-index shingle join whose
    build side is the vocabulary-sized (shingle, source) relation —
    per-shingle fanout bounded by #sources, so the hot-shingle blowup of
    doc-level self-joins cannot happen (operators/dedup.source_overlap)."""
    docs = load_table(spark, sf_dir, "documents")
    return DD.source_overlap(docs, n=6)


@query(
    "dedup_passage_level",
    oracle="""
    WITH words AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
        FROM documents
    ), chunks AS (
        SELECT doc_id, i AS chunk_idx,
               array_to_string(w[i * 20 + 1 : i * 20 + 20], ' ') AS passage
        FROM words,
             UNNEST(range(0, CAST(ceil(len(w) / 20.0) AS BIGINT))) AS t(i)
    ), kept AS (
        SELECT doc_id, chunk_idx, passage,
               row_number() OVER (
                   PARTITION BY passage ORDER BY doc_id, chunk_idx
               ) AS rn
        FROM chunks
    ), agg AS (
        SELECT doc_id,
               string_agg(passage, ' ' ORDER BY chunk_idx) AS kept_text,
               COUNT(1) AS n_kept
        FROM kept WHERE rn = 1 GROUP BY doc_id
    ), tot AS (
        SELECT doc_id, COUNT(1) AS n_chunks FROM chunks GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(a.kept_text, '') AS kept_text,
           CAST(COALESCE(a.n_kept, 0) AS INT) AS n_kept_chunks,
           CAST(t.n_chunks AS INT) AS n_total_chunks
    FROM documents d
    JOIN tot t ON d.doc_id = t.doc_id
    LEFT JOIN agg a ON d.doc_id = a.doc_id
    """,
)
def passage_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level exact dedup (20-token windows): keep each distinct
    passage's first corpus-wide occurrence, reassemble the survivors.
    Two bounded-key shuffles; the fingerprint pass hash-balances by
    construction. Reference role: corpus curation over the lake tables
    (README.md:257-292 analytics surface extended to training-data ops)."""
    return DD.passage_dedup(load_table(spark, sf_dir, "documents"))


@query(
    "dedup_substring_spans",
    oracle="""
    WITH words AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
        FROM documents
    ), spans AS (
        SELECT doc_id, CAST(s AS INT) AS start_tok,
               md5(array_to_string(w[s + 1 : s + 32], ' ')) AS fp
        FROM words,
             UNNEST(range(0, len(w) - 32 + 1, 16)) AS t(s)
        WHERE len(w) >= 32
    ), agg AS (
        SELECT fp, COUNT(1) AS n_occurrences,
               COUNT(DISTINCT doc_id) AS n_docs
        FROM spans GROUP BY fp HAVING COUNT(1) > 1
    ), firsts AS (
        SELECT fp, doc_id, start_tok,
               row_number() OVER (
                   PARTITION BY fp ORDER BY doc_id, start_tok
               ) AS rn
        FROM spans
    )
    SELECT a.fp, a.n_occurrences, a.n_docs,
           f.doc_id AS first_doc, f.start_tok AS first_start
    FROM agg a JOIN firsts f ON a.fp = f.fp AND f.rn = 1
    """,
)
def substring_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-duplication census (32-token windows every 16):
    duplicated spans ACROSS documents that doc-level MinHash misses —
    the Lee et al. 2021 training-data pass, rolling-fingerprint form.
    One fingerprint shuffle with map-side partial agg; output is
    duplicated-span groups, never the corpus."""
    return DD.substring_duplicate_spans(
        load_table(spark, sf_dir, "documents")
    )


@query(
    "dedup_substring_rewrite",
    oracle="""
    WITH words AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
        FROM documents
    ), spans AS (
        SELECT doc_id, CAST(s AS INT) AS start_tok,
               md5(array_to_string(w[s + 1 : s + 32], ' ')) AS fp
        FROM words,
             UNNEST(range(0, len(w) - 32 + 1, 16)) AS t(s)
        WHERE len(w) >= 32
    ), marked AS (
        SELECT doc_id, start_tok,
               COUNT(1) OVER (PARTITION BY fp) AS cnt,
               row_number() OVER (
                   PARTITION BY fp ORDER BY doc_id, start_tok
               ) AS rn
        FROM spans
    ), removals AS (
        SELECT doc_id, start_tok FROM marked WHERE cnt > 1 AND rn > 1
    ), rem_by_doc AS (
        SELECT doc_id, CAST(COUNT(1) AS INT) AS n_removed_spans
        FROM removals GROUP BY doc_id
    ), toks AS (
        SELECT doc_id, CAST(i AS INT) AS idx, w[CAST(i AS INT) + 1] AS tok
        FROM words, UNNEST(range(0, len(w))) AS t(i)
    ), kept AS (
        SELECT t.doc_id, t.idx, t.tok
        FROM toks t
        WHERE NOT EXISTS (
            SELECT 1 FROM removals r
            WHERE r.doc_id = t.doc_id
              AND t.idx >= r.start_tok AND t.idx < r.start_tok + 32
        )
    ), reasm AS (
        SELECT doc_id,
               array_to_string(list(tok ORDER BY idx), ' ') AS kept_text,
               CAST(COUNT(1) AS INT) AS n_kept_tokens
        FROM kept GROUP BY doc_id
    )
    SELECT w.doc_id,
           COALESCE(re.kept_text, '') AS kept_text,
           COALESCE(r.n_removed_spans, 0) AS n_removed_spans,
           COALESCE(re.n_kept_tokens, 0) AS n_kept_tokens,
           CAST(len(w.w) AS INT) AS n_total_tokens
    FROM words w
    LEFT JOIN rem_by_doc r USING (doc_id)
    LEFT JOIN reasm re USING (doc_id)
    """,
)
def substring_rewrite_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-duplication REMOVAL pass (Lee et al. 2021, second
    half): excise every duplicated 32-token span except its first
    occurrence corpus-wide and reassemble the documents. One fp
    shuffle ranks occurrences; removals are collision-sized; excision
    is an in-codegen array filter."""
    return DD.substring_rewrite(load_table(spark, sf_dir, "documents"))


@query("dedup_semdedup")
def semdedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic pruning: k-means partition + within-cluster
    greedy cosine keep/drop (τ=0.9). Rows-only gate (k-means float
    iterations are engine-specific); the greedy decision's equivalence
    to an exact per-cluster reference is unit-tested in
    tests/test_kmeans_semdedup.py."""
    return DD.semdedup(
        load_table(spark, sf_dir, "embeddings"), n_clusters=8, threshold=0.9
    )


KMV_SETOPS_ORACLE = """
    WITH toks AS (
        SELECT source AS src, regexp_split_to_array(trim(text), '\\s+') AS w
        FROM documents
    ), sh AS (
        SELECT DISTINCT src,
               CAST(('0x' || substr(md5(
                   w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                        || ' ' || w[i+4] || ' ' || w[i+5]), 1, 13)) AS BIGINT) AS h
        FROM toks, UNNEST(range(1, len(w) - 4)) AS t(i)
        WHERE len(w) >= 6
    ), sk AS (
        SELECT src, h FROM (
            SELECT src, h,
                   row_number() OVER (PARTITION BY src ORDER BY h) AS rk
            FROM sh
        ) WHERE rk <= 64
    ), srcs AS (SELECT DISTINCT src FROM sk),
    pairs AS (
        SELECT a.src AS src_a, b.src AS src_b
        FROM srcs a, srcs b WHERE a.src < b.src
    ), u AS (
        SELECT p.src_a, p.src_b, s.h,
               MAX(CASE WHEN s.src = p.src_a THEN 1 ELSE 0 END) AS in_a,
               MAX(CASE WHEN s.src = p.src_b THEN 1 ELSE 0 END) AS in_b
        FROM pairs p JOIN sk s ON s.src = p.src_a OR s.src = p.src_b
        GROUP BY 1, 2, 3
    ), ur AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY src_a, src_b ORDER BY h
            ) AS urk FROM u
        ) WHERE urk <= 64
    ), agg AS (
        SELECT src_a, src_b,
               COUNT(1) AS n_sk,
               MAX(h) AS kth,
               SUM(CASE WHEN in_a + in_b = 2 THEN 1 ELSE 0 END) AS inter_k
        FROM ur GROUP BY 1, 2
    )
    SELECT src_a, src_b,
           CAST(n_sk AS INT) AS n_sk,
           CAST(inter_k AS INT) AS inter_k,
           CAST(CASE WHEN n_sk < 64 THEN n_sk
                     ELSE 63 * 4503599627370496 // kth END AS BIGINT) AS est_union,
           CAST(inter_k * (CASE WHEN n_sk < 64 THEN n_sk
                                ELSE 63 * 4503599627370496 // kth END)
                // n_sk AS BIGINT) AS est_inter,
           CAST(inter_k * 1000 // n_sk AS BIGINT) AS jacc_milli
    FROM agg
    """


@query(
    "dedup_kmv_source_setops",
    oracle=KMV_SETOPS_ORACLE,
)
def kmv_source_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct sketches with set operations — the first VALUE-GATED
    approximate-distinct operator (the HLL matview gate is rows-only:
    its sketch bytes are engine-opaque; a KMV sketch is the k smallest
    52-bit md5 hashes, so every estimate is exact integer arithmetic in
    any engine). Per source: sketch the distinct word-6-gram shingles;
    per source pair: merged-sketch union estimate, intersection via the
    KMV combine rho = |union-sketch ∩ both|/k, Jaccard in milli-units
    (operators/sketches.py, Beyer et al. 2007). Sketches are mergeable
    and k-sized — at 100 TB the corpus pays one distinct (group, hash)
    shuffle and every set operation after that is k·pairs rows."""
    from fluss_iceberg_spark.operators import sketches as SK

    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    sk = SK.group_shingle_sketches(docs, k=64)
    return SK.kmv_pair_set_ops(sk, k=64)


@query(
    "dedup_quantile_sketch",
    oracle="""
    WITH base AS (
        SELECT lang, doc_id, CAST(length(text) AS INT) AS v,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                    AS BIGINT) AS hk
        FROM documents
    ), sampled AS (
        SELECT lang, doc_id, v,
               row_number() OVER (
                   PARTITION BY lang ORDER BY hk, doc_id
               ) AS srk
        FROM base
    ), est_r AS (
        SELECT lang, v,
               row_number() OVER (PARTITION BY lang ORDER BY v, doc_id) AS rn,
               COUNT(1) OVER (PARTITION BY lang) AS m
        FROM sampled WHERE srk <= 128
    ), est AS (
        SELECT lang, CAST(MAX(m) AS INT) AS m_est,
               MAX(CASE WHEN rn = 1 + ((m - 1) * 500) // 1000 THEN v END) AS p500_est,
               MAX(CASE WHEN rn = 1 + ((m - 1) * 900) // 1000 THEN v END) AS p900_est,
               MAX(CASE WHEN rn = 1 + ((m - 1) * 990) // 1000 THEN v END) AS p990_est
        FROM est_r GROUP BY lang
    ), ex_r AS (
        SELECT lang, v,
               row_number() OVER (PARTITION BY lang ORDER BY v, doc_id) AS rn,
               COUNT(1) OVER (PARTITION BY lang) AS m
        FROM sampled
    ), ex AS (
        SELECT lang, CAST(MAX(m) AS INT) AS m_exact,
               MAX(CASE WHEN rn = 1 + ((m - 1) * 500) // 1000 THEN v END) AS p500_exact,
               MAX(CASE WHEN rn = 1 + ((m - 1) * 900) // 1000 THEN v END) AS p900_exact,
               MAX(CASE WHEN rn = 1 + ((m - 1) * 990) // 1000 THEN v END) AS p990_exact
        FROM ex_r GROUP BY lang
    )
    SELECT est.lang, m_est, p500_est, p900_est, p990_est,
           m_exact, p500_exact, p900_exact, p990_exact
    FROM est JOIN ex ON est.lang = ex.lang
    """,
)
def quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable bottom-k quantile sketch under a FULL value gate — the
    gateable twin of the t-digest percentiles (rows-only by nature):
    per language, p50/p90/p99 of document length estimated from the
    deterministic md5-bottom-k uniform sample (k=128), beside the exact
    whole-group order statistics, so the gated row itself exhibits the
    sketch error (operators/sketches.quantile_sketch_report). Bottom-k
    samples merge like KMV sketches — per-partition sketches combine
    without rescanning, the 100 TB maintenance property."""
    from fluss_iceberg_spark.operators import sketches as SK

    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", F.length("text").alias("v")
    )
    return SK.quantile_sketch_report(docs, "v", "lang", k=128)


@query("dedup_hll_distinct")  # Datasketches HLL binary state -> rows-only
def hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct-shingle counts per source via Spark's
    BUILT-IN Datasketches HLL aggregates (`hll_sketch_agg` /
    `hll_union_agg` / `hll_sketch_estimate`) — the production-grade
    engine-opaque form beside the value-gated KMV sketch
    (dedup_kmv_source_setops): JVM-side, whole-stage-codegen input,
    registers mergeable across partitions/days/CDC deltas. One row per
    source plus a `__union__` row whose sketch is the union-merge of
    the per-source sketches — the merge path the matview layer uses for
    its COUNT(DISTINCT) state (plans/views.py). Each row carries the
    exact distinct count and the error in milli-units, so the gate row
    is its own accuracy report; units pin union-merge equality
    (estimate(union of sketches) == estimate(sketch of union), a
    register-maxima identity) and the lgK=12 error bound. Rows-only by
    nature: sketch bytes and estimates are Datasketches-specific.

    100 TB: the corpus pays ONE pass; HLL state is 2^12 registers per
    group regardless of cardinality (vs the distinct shuffle the exact
    column needs — that column exists only to make the gate row
    self-reporting and would be dropped in production)."""
    from fluss_iceberg_spark.operators.sketches import group_shingles

    sh = group_shingles(
        load_table(spark, sf_dir, "documents").select("source", "text")
    )
    per = sh.groupBy("src").agg(
        F.hll_sketch_agg(F.col("h"), F.lit(12)).alias("sk"),
        F.count_distinct("h").alias("exact_distinct"),
    )
    union_row = (
        per.agg(F.hll_union_agg("sk").alias("sk"))
        .crossJoin(
            sh.agg(F.count_distinct("h").alias("exact_distinct"))
        )
        .select(F.lit("__union__").alias("src"), "sk", "exact_distinct")
    )
    est = F.hll_sketch_estimate("sk").cast("long")
    return (
        per.select("src", "sk", "exact_distinct")
        .unionByName(union_row)
        .select(
            "src",
            est.alias("est_distinct"),
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
            (
                F.abs(est - F.col("exact_distinct")) * 1000
                / F.col("exact_distinct")
            ).cast("long").alias("err_milli"),
        )
        .orderBy("src")
    )


CDC_CHUNKS_ORACLE = """
    WITH d AS (
        SELECT doc_id, text AS t, length(text) AS n FROM documents
        WHERE length(text) >= 1
    ), pos AS (
        SELECT doc_id, t, n,
               list_sort(list_distinct(list_append(
                   list_filter(
                       list_transform(range(1, greatest(n - 16 + 1, 0) + 1),
                           i -> CASE WHEN list_reduce(
                                   list_prepend(CAST(0 AS BIGINT),
                                       list_transform(range(0, 16),
                                           j -> CAST(ord(substr(t,
                                               CAST(i + j AS INT), 1))
                                               AS BIGINT))),
                                   (acc, x) -> (acc * 257 + x) % 1000003)
                                   % 64 = 0
                                THEN CAST(i + 15 AS BIGINT)
                                ELSE NULL END),
                       p -> p IS NOT NULL),
                   CAST(n AS BIGINT)))) AS cuts
        FROM d
    ), ch AS (
        SELECT doc_id, CAST(k AS INT) AS chunk_idx,
               CASE WHEN k = 0 THEN 1
                    ELSE CAST(cuts[CAST(k AS INT)] + 1 AS INT)
               END AS start_pos,
               CAST(cuts[CAST(k + 1 AS INT)] AS INT) AS end_pos,
               t
        FROM pos, UNNEST(range(0, len(cuts))) u(k)
    ), fps AS (
        SELECT doc_id, chunk_idx, start_pos,
               CAST(end_pos - start_pos + 1 AS INT) AS chunk_len,
               md5(substr(t, start_pos, end_pos - start_pos + 1)) AS fp
        FROM ch
    ), census AS (
        SELECT fp, COUNT(DISTINCT doc_id) AS n_docs_sharing
        FROM fps GROUP BY fp
    )
    SELECT f.doc_id, f.chunk_idx, f.start_pos, f.chunk_len, f.fp,
           c.n_docs_sharing
    FROM fps f JOIN census c USING (fp)
    """


@query(
    "dedup_cdc_chunks",
    oracle=CDC_CHUNKS_ORACLE,
)
def cdc_chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking + chunk-fingerprint census under a full
    value gate: boundary-synchronized variable chunks (cut after any
    16-char window whose Horner rolling hash ≡ 0 mod 64) whose
    fingerprints survive insertions/deletions — the shift-robust dedup
    granularity the fixed-window family cannot give. DuckDB replays the
    identical integer hash, cut set, slicing, md5 and census
    (operators/dedup.cdc_chunks)."""
    return DD.cdc_chunks(load_table(spark, sf_dir, "documents"))


@query(
    "dedup_cdc_rewrite",
    oracle="""
    WITH d AS (
        SELECT doc_id, text AS t, length(text) AS n FROM documents
        WHERE length(text) >= 1
    ), pos AS (
        SELECT doc_id, t, n,
               list_sort(list_distinct(list_append(
                   list_filter(
                       list_transform(range(1, greatest(n - 16 + 1, 0) + 1),
                           i -> CASE WHEN list_reduce(
                                   list_prepend(CAST(0 AS BIGINT),
                                       list_transform(range(0, 16),
                                           j -> CAST(ord(substr(t,
                                               CAST(i + j AS INT), 1))
                                               AS BIGINT))),
                                   (acc, x) -> (acc * 257 + x) % 1000003)
                                   % 64 = 0
                                THEN CAST(i + 15 AS BIGINT)
                                ELSE NULL END),
                       p -> p IS NOT NULL),
                   CAST(n AS BIGINT)))) AS cuts
        FROM d
    ), ch AS (
        SELECT doc_id, CAST(k AS INT) AS chunk_idx,
               CASE WHEN k = 0 THEN 1
                    ELSE CAST(cuts[CAST(k AS INT)] + 1 AS INT)
               END AS start_pos,
               CAST(cuts[CAST(k + 1 AS INT)] AS INT) AS end_pos,
               t
        FROM pos, UNNEST(range(0, len(cuts))) u(k)
    ), fps AS (
        SELECT doc_id, chunk_idx, start_pos,
               end_pos - start_pos + 1 AS chunk_len,
               md5(substr(t, start_pos, end_pos - start_pos + 1)) AS fp
        FROM ch
    ), kept AS (
        SELECT doc_id, chunk_idx, start_pos, chunk_len FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY fp ORDER BY doc_id, chunk_idx) AS occ
            FROM fps
        ) WHERE occ = 1
    ), spans AS (
        SELECT k.doc_id, COUNT(1) AS n_kept,
               string_agg(substr(d.t, k.start_pos, k.chunk_len), ''
                          ORDER BY k.chunk_idx) AS rebuilt
        FROM kept k JOIN d ON d.doc_id = k.doc_id
        GROUP BY k.doc_id
    ), totals AS (
        SELECT doc_id, COUNT(1) AS n_chunks FROM fps GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(t2.n_chunks AS INT) AS n_chunks,
           CAST(COALESCE(s.n_kept, 0) AS INT) AS n_kept,
           CAST(length(COALESCE(s.rebuilt, '')) AS INT) AS rebuilt_len,
           md5(COALESCE(s.rebuilt, '')) AS rebuilt_fp
    FROM d
    JOIN totals t2 ON t2.doc_id = d.doc_id
    LEFT JOIN spans s ON s.doc_id = d.doc_id
    """,
)
def cdc_rewrite_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level duplication removal under a full value gate: drop
    every occurrence of a content-defined chunk except the globally
    first, rebuild each document from its surviving chunks, and pin the
    rewrite byte-for-byte via md5 + length — the actionable half of the
    cdc census, shift-robust where fixed-offset span removal breaks
    (operators/dedup.cdc_rewrite)."""
    return DD.cdc_rewrite(load_table(spark, sf_dir, "documents"))
