"""KMV (k-minimum-values) distinct sketches with set operations.

The mergeable-sketch family beside the matview layer's HLL: where HLL
state is engine-opaque (its driver gate is rows-only), a KMV sketch is
just the k SMALLEST hash values of a set — pure order statistics over a
deterministic hash — so every estimate is EXACT integer arithmetic that
Spark, DuckDB and Python replay bit-for-bit, and the driver value-gates
an approximate-distinct operator for the first time.

Estimators (Beyer et al. 2007, "On Synopses for Distinct-Value
Estimation"): with h uniform on [0, 2^52) (13 hex chars of md5 — the
engine-portable hash, same device as the weighted-sampling operators;
xxhash64 would be faster but has no DuckDB twin) and h_(k) the k-th
smallest hash of a set S:

    |S|  ≈  (k-1) · 2^52 // h_(k)          (exact |S| when |S| < k)
    union: KMV(A ∪ B) = k smallest of sketch(A) ∪ sketch(B)
    |A∩B| ≈ ρ · |A∪B|, ρ = |{h ∈ KMV(A∪B): h ∈ sketch(A) ∧ sketch(B)}| / k

(k-1)·2^52 ≤ 63·2^52 ≈ 2.8e17 — comfortably int64.

100 TB shape: the only corpus-sized work is the distinct (group, hash)
shuffle every dedup operator already pays; sketches are k rows per
group, pair set-ops are k·|pairs| rows — driver-free, mergeable (a
union of sketches is a sketch), and CDC-friendly (append-only inputs
re-sketch by merging, the KMV property).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fluss_iceberg_spark.operators.text import _ngram_array, tokens

HASH_BITS = 52  # 13 md5 hex chars — portable and int64-safe in (k-1)·2^B


def _h52(col) -> F.Column:
    """60→52-bit engine-portable uniform hash: first 13 hex chars of
    md5, parsed base-16 (the repo's standard cross-engine hash)."""
    return F.conv(F.substring(F.md5(col), 1, 13), 16, 10).cast("long")


def group_shingles(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    n: int = 6,
) -> DataFrame:
    """(src, h): the 52-bit hash of every word n-gram shingle per group
    — NOT deduplicated (map-side only; each sketch consumer dedups the
    way its aggregate wants: KMV via distinct, HLL inside its
    registers)."""
    from fluss_iceberg_spark.operators.util import spread

    return (
        spread(docs)
        .select(
            F.col(group_col).alias("src"),
            tokens(F.col(text_col)).alias("toks"),
        )
        .select("src", F.explode(F.expr(_ngram_array("toks", n))).alias("g"))
        .select("src", _h52(F.col("g")).alias("h"))
    )


def group_shingle_sketches(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    n: int = 6,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV sketch over word n-gram shingles: (src, h, rk),
    rk = 1..k ascending by hash. One distinct (group, hash) shuffle +
    a per-group top-k (bounded sort: k rows per group survive)."""
    sh = group_shingles(docs, text_col, group_col, n).distinct()
    w = Window.partitionBy("src").orderBy("h")
    return sh.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )


def kmv_pair_set_ops(sketches: DataFrame, k: int = 64) -> DataFrame:
    """All-pairs (src_a < src_b) KMV set operations from the sketches
    alone: estimated distinct-union, distinct-intersection, and Jaccard
    in integer milli-units. Work is k·|pairs| rows — never touches the
    corpus again."""
    srcs = sketches.select("src").distinct()
    pairs = (
        srcs.select(F.col("src").alias("src_a"))
        .crossJoin(srcs.select(F.col("src").alias("src_b")))
        .filter(F.col("src_a") < F.col("src_b"))
    )
    side = sketches.select("src", "h")
    u = (
        pairs.join(
            side,
            (side.src == F.col("src_a")) | (side.src == F.col("src_b")),
        )
        .groupBy("src_a", "src_b", "h")
        .agg(
            F.max((F.col("src") == F.col("src_a")).cast("int")).alias("in_a"),
            F.max((F.col("src") == F.col("src_b")).cast("int")).alias("in_b"),
        )
    )
    uw = Window.partitionBy("src_a", "src_b").orderBy("h")
    ur = u.withColumn("urk", F.row_number().over(uw)).filter(
        F.col("urk") <= k
    )
    agg = ur.groupBy("src_a", "src_b").agg(
        F.count(F.lit(1)).alias("n_sk"),
        F.max("h").alias("kth"),  # rows are the k smallest: max = h_(k)
        F.sum(
            (F.col("in_a") + F.col("in_b") == 2).cast("long")
        ).alias("inter_k"),
    )
    est_union = F.when(
        F.col("n_sk") < k, F.col("n_sk").cast("long")
    ).otherwise(
        F.expr(f"CAST(({k} - 1) AS BIGINT) * {1 << HASH_BITS} div kth")
    )
    return agg.select(
        "src_a",
        "src_b",
        F.col("n_sk").cast("int").alias("n_sk"),
        F.col("inter_k").cast("int").alias("inter_k"),
        est_union.alias("est_union"),
        F.expr(
            "CAST(inter_k AS BIGINT) * ("
            + f"CASE WHEN n_sk < {k} THEN n_sk "
            + f"ELSE CAST(({k} - 1) AS BIGINT) * {1 << HASH_BITS} div kth END"
            + ") div n_sk"
        ).alias("est_inter"),
        F.expr("CAST(inter_k AS BIGINT) * 1000 div n_sk").alias("jacc_milli"),
    )


def kmv_estimate_local(hashes: list, k: int = 64) -> int:
    """Pure-Python reference of the distinct estimator (unit gate)."""
    hs = sorted(set(hashes))
    if len(hs) < k:
        return len(hs)
    return (k - 1) * (1 << HASH_BITS) // hs[k - 1]



def quantile_sketch_report(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str = "doc_id",
    k: int = 128,
    quantiles_milli: tuple = (500, 900, 990),
) -> DataFrame:
    """Mergeable quantile sketch under a full value gate — the gateable
    twin of t-digest (whose centroid state is float-iteration-order
    dependent, hence rows-only): the sketch is the k rows with the
    SMALLEST md5 hash of their id — a deterministic uniform sample with
    the same bottom-k mergeability as KMV (bottom-k of a union = the k
    smallest of the merged bottom-k's), so distributed and
    CDC-incremental maintenance are free. Each quantile estimate is the
    LOWER order statistic of the sample at index (m-1)·q // 1000 with
    (value, id) tie-break — exact integer indexing any engine replays.
    Output carries the estimate AND the exact whole-group order
    statistic side by side (both deterministic, both gated — the row
    itself exhibits the sketch error).

    100 TB: the sketch column costs one per-group bottom-k (map-side
    partial top-k keeps k rows per task before the shuffle); the exact
    column costs the whole-group sort — drop it in production and the
    corpus-sized sort goes with it."""
    w_h = Window.partitionBy(group_col).orderBy(
        _h52(F.col(id_col).cast("string")), F.col(id_col)
    )
    sampled = (
        df.select(group_col, id_col, value_col)
        .withColumn("__srk", F.row_number().over(w_h))
    )

    def order_stats(frame: DataFrame, tag: str) -> DataFrame:
        w = Window.partitionBy(group_col).orderBy(
            F.col(value_col), F.col(id_col)
        )
        wall = Window.partitionBy(group_col)
        r = frame.withColumn("__rn", F.row_number().over(w)).withColumn(
            "__m", F.count(F.lit(1)).over(wall)
        )
        aggs = [F.max("__m").cast("int").alias(f"m_{tag}")]
        for q in quantiles_milli:
            aggs.append(
                F.max(
                    F.when(
                        F.col("__rn")
                        == F.expr(f"1 + ((__m - 1) * {q}) div 1000"),
                        F.col(value_col),
                    )
                ).alias(f"p{q}_{tag}")
            )
        return r.groupBy(group_col).agg(*aggs)

    est = order_stats(sampled.filter(F.col("__srk") <= k), "est")
    exact = order_stats(sampled, "exact")
    return est.join(exact, on=group_col)


def quantile_sketch_local(
    pairs: list, k: int = 128, q_milli: int = 500
) -> int:
    """Pure-Python reference: pairs = [(id, value)]; estimate from the
    bottom-k md5 sample (unit gate)."""
    import hashlib

    def h(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16)

    sample = sorted(pairs, key=lambda p: (h(p[0]), p[0]))[:k]
    vals = sorted((v, i) for i, v in sample)
    m = len(vals)
    return vals[(m - 1) * q_milli // 1000][0]


def _cms_bucket(col, row_salt: str, width: int) -> F.Column:
    """CMS bucket for one hash row: md5-uniform (engine-portable) mod
    width."""
    return F.pmod(_h52(F.concat(F.lit(row_salt), col)), F.lit(width))


def cms_heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
    top: int = 20,
) -> DataFrame:
    """Count-Min sketch frequency estimation under a full value gate —
    the frequency leg of the sketch family (KMV = distinct, bottom-k =
    quantiles): d×w integer counters keyed by d independent md5-salted
    hashes; a token's estimate is the MIN of its d counters, which
    NEVER under-counts (Cormode-Muthukrishnan 2005) and over-counts by
    collision mass ~N/w. Gated by estimating the corpus's exact top
    ``top`` tokens and emitting (token, true count, CMS estimate,
    overcount) — every value exact integer arithmetic in any engine.

    100 TB: the corpus is scanned ONCE and shuffled ONCE (the exact
    token-count aggregate, map-side combined). Because CMS counters are
    sums of token counts — c[r][b] = Σ_{tok: h_r(tok)=b} count(tok) —
    the d×w sketch is built from the aggregated VOCABULARY (Zipf-small),
    not from a re-explode of the corpus: a vocab-sized posexplode of the
    d bucket keys feeding one tiny (row, bucket) SUM. The repeated
    tok_counts subtree is a ReusedExchange, so no second corpus pass
    exists in the plan. Counters stay mergeable by addition (partitions,
    CDC deltas, days all combine); the probe side touches only the
    queried tokens."""
    from fluss_iceberg_spark.operators.util import spread

    toks = (
        spread(df)
        .select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .filter(F.col("tok") != "")
    )
    # token -> true count (exact): the ONLY corpus-sized scan + shuffle
    tok_counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("true_cnt"))
    top_toks = tok_counts.orderBy(
        F.desc("true_cnt"), F.asc("tok")
    ).limit(top)
    # d bucket keys per token, computed once as an array column
    buckets = F.array(
        *[_cms_bucket(F.col("tok"), f"cms{r}|", width) for r in range(depth)]
    )
    # sketch from the vocabulary: identical counters by construction
    # (sum of per-token counts per bucket == count of corpus occurrences
    # per bucket), vocab-sized explode, d·w output rows
    cms = (
        tok_counts.select(
            "true_cnt", F.posexplode(buckets).alias("row", "bucket")
        )
        .groupBy("row", "bucket")
        .agg(F.sum("true_cnt").alias("cnt"))
    )
    # probe: top tokens x d rows -> their buckets -> min over rows
    probes = top_toks.select(
        "tok", "true_cnt", F.posexplode(buckets).alias("row", "bucket")
    )
    est = (
        probes.join(F.broadcast(cms), on=["row", "bucket"])
        .groupBy("tok", "true_cnt")
        .agg(F.min("cnt").alias("est_cnt"))
    )
    return est.select(
        "tok",
        F.col("true_cnt").cast("long").alias("true_cnt"),
        F.col("est_cnt").cast("long").alias("est_cnt"),
        (F.col("est_cnt") - F.col("true_cnt")).cast("long").alias("overcount"),
    )


def cms_estimate_local(stream: list, token: str, depth: int = 4,
                       width: int = 1024) -> int:
    """Pure-Python CMS reference (unit gate)."""
    import hashlib

    def bucket(r, t):
        return int(
            hashlib.md5(f"cms{r}|{t}".encode()).hexdigest()[:13], 16
        ) % width

    counters = [dict() for _ in range(depth)]
    for t in stream:
        for r in range(depth):
            b = bucket(r, t)
            counters[r][b] = counters[r].get(b, 0) + 1
    return min(counters[r].get(bucket(r, token), 0) for r in range(depth))
