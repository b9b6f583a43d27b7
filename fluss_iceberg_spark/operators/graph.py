"""Web-graph centrality for crawl curation — fixed-point (integer)
PageRank over a link graph, the URL-level quality signal CommonCrawl
derivatives (C4/RefinedWeb lineage) rank hosts and pages with.

Why INTEGER PageRank: the operator's driver gate hash-compares values
against a DuckDB replay, and float summation order differs between
engines. All arithmetic here is exact 64-bit integer fixed-point
(SCALE = 1e12 rank units, damping 85/100 as integer mul-then-div,
integer division for the per-edge split), so every iteration is
bit-identical in ANY engine that replays the recurrence — the oracle
unrolls the iterations as plain SQL CTEs and matches hash-for-hash.
Fixed-point loses < 1 unit per division (1e-12 of total mass) — the
standard trick for making an iterative numeric algorithm gateable.

The recurrence (per iteration, D = damping numerator, 100 the divisor):

    share(u)  = (R(u) * D // 100) // out_degree(u)
    R'(v)     = BASE + SUM(share(u) for u->v)          [BASE = S*(100-D)//100//N]

Nodes with no in-links get BASE; the synthetic graph gives every node
at least one out-edge, and ``pagerank`` ALSO handles dangling nodes
(out_degree 0) by dropping their share, the "remove dangling mass"
convention — documented, and replayed identically by the oracle.

100 TB design: the classic Pregel-on-DataFrames shape. Edges are
repartitioned by src ONCE and persisted, so each iteration reuses the
edge partitioning (one shuffle for the groupBy(dst) per iteration — the
irreducible PageRank exchange); ranks are K rows of (id, long). No
driver-side state beyond the loop counter; iterations are fixed-count
(the convergence-check variant adds one tiny agg per iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12


def synth_link_graph(docs: DataFrame, n_nodes_expr: str | None = None) -> DataFrame:
    """Deterministic link graph over the documents table: doc d links to
    (d * k) % N for k = 1..(d % 4 + 1), distinct targets (self-loops
    kept — they are legal PageRank edges). Pure column arithmetic; the
    oracle replays it with UNNEST."""
    n = docs.select(F.count(F.lit(1))).collect()[0][0]
    edges = (
        docs.select("doc_id")
        .select(
            F.col("doc_id").alias("src"),
            F.explode(F.sequence(F.lit(1), F.col("doc_id") % 4 + 1)).alias("k"),
        )
        .select("src", ((F.col("src") * F.col("k")) % F.lit(n)).alias("dst"))
        .distinct()
    )
    return edges


def pagerank(
    edges: DataFrame,
    n_nodes: int,
    iterations: int = 5,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-point PageRank: (id, rank) after ``iterations`` exact
    integer rounds. ``edges`` is (src, dst); every node 0..n_nodes-1
    participates (nodes absent from src are dangling: their share is
    dropped, the remove-dangling-mass convention)."""
    spark = edges.sparkSession
    # edges partitioned by src once; the per-iteration join then reuses
    # this layout and only the groupBy(dst) shuffles
    e = edges.repartition("src").persist()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = e.join(deg, "src").persist()
    ed.count()  # materialize once so iterations don't recompute the join

    base = SCALE * (100 - damping_pct) // 100 // n_nodes
    nodes = spark.range(n_nodes).select(F.col("id"))
    # explicit long: small-N initial ranks fit an int literal, and ANSI
    # mode would then overflow rank * damping inside the loop
    ranks = nodes.select(
        "id", F.lit(SCALE // n_nodes).cast("long").alias("rank")
    )

    for _ in range(iterations):
        contrib = (
            ed.join(ranks, ed.src == ranks.id)
            .select(
                "dst",
                # integer div end-to-end: bit-identical to the SQL replay
                F.expr(
                    f"(rank * CAST({damping_pct} AS BIGINT) div 100) div deg"
                ).alias("share"),
            )
            .groupBy("dst")
            .agg(F.sum("share").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, nodes.id == contrib.dst, "left")
            .select(
                "id",
                (
                    F.lit(base).cast("long")
                    + F.coalesce(F.col("inflow"), F.lit(0)).cast("long")
                ).alias("rank"),
            )
        )
    out = ranks
    e.unpersist()
    return out


def pagerank_oracle_sql(iterations: int = 5, damping_pct: int = 85) -> str:
    """The DuckDB replay: same graph, same integer recurrence, one CTE
    per iteration (unrolled — no recursive aggregation needed)."""
    d = damping_pct
    sql = [
        "WITH n AS (SELECT COUNT(1) AS n FROM documents),",
        """edges AS (
        SELECT DISTINCT doc_id AS src, (doc_id * k) % (SELECT n FROM n) AS dst
        FROM documents, UNNEST(range(1, doc_id % 4 + 2)) t(k)
    ),""",
        "deg AS (SELECT src, COUNT(1) AS deg FROM edges GROUP BY src),",
        f"""r0 AS (
        SELECT doc_id AS id, {SCALE} // (SELECT n FROM n) AS rank
        FROM documents
    )""",
    ]
    prev = "r0"
    for i in range(1, iterations + 1):
        sql.append(
            f""", c{i} AS (
        SELECT e.dst,
               SUM((r.rank * {d} // 100) // deg.deg) AS inflow
        FROM edges e JOIN {prev} r ON e.src = r.id JOIN deg ON e.src = deg.src
        GROUP BY e.dst
    ), r{i} AS (
        SELECT d.doc_id AS id,
               {SCALE} * {100 - d} // 100 // (SELECT n FROM n)
                   + COALESCE(c{i}.inflow, 0) AS rank
        FROM documents d LEFT JOIN c{i} ON d.doc_id = c{i}.dst
    )"""
        )
        prev = f"r{i}"
    sql.append(f"SELECT id, CAST(rank AS BIGINT) AS rank FROM {prev}")
    return "\n".join(sql)


def pagerank_local(edges: list, n_nodes: int, iterations: int = 5,
                   damping_pct: int = 85) -> dict:
    """Pure-Python reference of the same integer recurrence (unit gate)."""
    from collections import Counter, defaultdict

    out: dict = defaultdict(set)
    for s, t in edges:
        out[s].add(t)
    base = SCALE * (100 - damping_pct) // 100 // n_nodes
    rank = {v: SCALE // n_nodes for v in range(n_nodes)}
    for _ in range(iterations):
        inflow: Counter = Counter()
        for s, targets in out.items():
            share = (rank[s] * damping_pct // 100) // len(targets)
            for t in targets:
                inflow[t] += share
        rank = {v: base + inflow.get(v, 0) for v in range(n_nodes)}
    return rank
