"""Web-graph centrality queries over the documents corpus (crawl
curation: PageRank is the URL-level quality signal the CommonCrawl
lineage of training-data pipelines ranks pages with)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fluss_iceberg_spark.operators import graph as G
from fluss_iceberg_spark.registry import query
from fluss_iceberg_spark.sources.tpch import load_table


@query("graph_pagerank", oracle=G.pagerank_oracle_sql(5, 85))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point integer PageRank, 5 iterations at damping 85/100,
    over the deterministic link graph d -> (d*k) % N, k = 1..(d%4+1)
    (distinct edges). Every arithmetic step is 64-bit integer
    (operators/graph.py), so the DuckDB oracle — the SAME recurrence
    unrolled as one CTE pair per iteration — matches hash-for-hash:
    an iterative graph algorithm under a full value gate, not a
    rows-only record. Pregel-on-DataFrames shape: edges repartitioned
    by src once and persisted; each iteration pays exactly one
    groupBy(dst) exchange (the irreducible PageRank shuffle)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    edges = G.synth_link_graph(docs)
    return G.pagerank(edges, n, iterations=5, damping_pct=85)


@query(
    "graph_top_authorities",
    oracle=f"""
    WITH pr AS ({G.pagerank_oracle_sql(5, 85)})
    SELECT pr.id, pr.rank, d.source
    FROM pr JOIN (SELECT doc_id, source FROM documents) d ON pr.id = d.doc_id
    ORDER BY pr.rank DESC, pr.id ASC LIMIT 25
    """,
)
def graph_top_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 authority pages by PageRank joined back to their source
    domain — the curation read path (keep/boost high-centrality pages).
    TakeOrderedAndProject on (rank desc, id) over the exact ranks; the
    join is broadcast (25 rows against the documents dimension)."""
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    ranks = G.pagerank(G.synth_link_graph(docs.select("doc_id")), n, 5, 85)
    top = ranks.orderBy(F.col("rank").desc(), F.col("id").asc()).limit(25)
    # broadcast the 25-row top-k, NOT the corpus-sized dimension
    return (
        docs.select("doc_id", "source")
        .join(F.broadcast(top), F.col("doc_id") == top.id)
        .select("id", "rank", "source")
    )


@query("graph_hits_scores", oracle=G.hits_oracle_sql(3))
def graph_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point integer HITS (Kleinberg hubs/authorities — the
    seed-site curation signal complementing PageRank's global rank),
    3 iterations over the same deterministic link graph. Per-iteration
    max-normalization is integer division at HITS_SCALE=1e6 so every
    value is exact; the per-iteration scalar max stays in-plan as a
    broadcast single-row cross join (no driver collect inside the
    loop). The oracle unrolls the full auth/hub recurrence in SQL and
    the driver hash-matches every score."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    return G.hits(G.synth_link_graph(docs), n, iterations=3)


@query("graph_components", oracle=G.components_oracle_sql(6))
def graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weakly-connected components by 6 rounds of min-label propagation
    over the undirected closure of the deterministic link graph —
    mirror/site-cluster detection, the third leg of the graph suite
    beside pagerank and HITS. Every step is exact integer MIN, so the
    unrolled-CTE oracle matches hash-for-hash at any round count (both
    engines compute the same k-hop label prefix; >= diameter rounds
    give the exact components). One groupBy MIN exchange per round over
    once-partitioned persisted edges (operators/graph.components)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    return G.components(G.synth_link_graph(docs), n, iterations=6)


@query("graph_triangle_counts", oracle=G.triangles_oracle_sql())
def graph_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-node triangle counts over the undirected simple
    closure of the deterministic link graph — the clustering-coefficient
    numerator (link-ring / mirror-farm detection in crawl curation).
    Degree-ordered orientation (operators/graph.triangles) bounds the
    wedge join at O(m^1.5) regardless of hub skew; the DuckDB oracle
    replays the identical orientation + wedge-close joins, so every
    (id, triangles) row is hash-gated."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return G.triangles(G.synth_link_graph(docs))
