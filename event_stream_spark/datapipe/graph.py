"""Iterative graph analytics over the near-duplicate document graph.

``graph_pagerank`` runs a fixed number of PageRank power iterations over the
undirected near-dup graph whose edges are the verified MinHash-LSH pairs
(``dedup.minhash_lsh_pairs`` — the same relation ``dedup_minhash`` and
``dedup_clusters`` are built on).  Ranking nodes by centrality inside a
near-dup neighborhood is the graph-analytics step of canonical-document
selection (complementing the quality-score selection in
``dedup_cluster_best``): the most-connected variant of a template family is
its natural representative.

This is the repo's iterative-computation pattern (with ``dedup_clusters``'s
pointer-jumping): a driver-side Python loop over a bounded iteration count,
each round a join + aggregate on the edge relation — the vertex-program
shape GraphX/Pregel popularized, expressed in plain DataFrame ops so
Catalyst/AQE handle the physical plan.

Scale shape per iteration: ``edges ⋈ pr`` co-partitions on the src key and
the contribution aggregate shuffles on the dst key — two hash exchanges
over an edge-count-sized relation of (long, long, double) rows, never the
documents themselves.  The rank vector is node-sized.  Degrees are computed
once and ride along with the edges (joined before the loop), so iterations
touch exactly two relations.  At 100 TB-corpus scale the edge set is the
output of the (already bucketed) LSH candidate machinery, and each
iteration is a pair of narrow-row exchanges — the standard distributed
PageRank cost model.

Determinism: per-node contribution sums fold LEFT over neighbors ordered by
source id (``aggregate(array_sort(collect_list(...)))`` ↔ DuckDB
``list_sum(list(x ORDER BY src))``) and each round's rank is rounded to 6
digits, so the two engines stay bit-identical through every iteration
(plain ``sum`` is the production path; the ordered fold buys bit-stable
reproducibility, same contract as ``datapipe/retrieval.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGERANK_ITERS = 5
PAGERANK_DAMPING = 0.85


def graph_pagerank(
    spark: SparkSession,
    sf: str,
    *,
    iters: int = PAGERANK_ITERS,
    damping: float = PAGERANK_DAMPING,
) -> DataFrame:
    """(doc_id, deg, pr) for every node of the near-dup graph after
    ``iters`` power iterations; pr sums to ~1 over the node set."""
    from event_stream_spark.datapipe.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(spark, sf, threshold=0.5).select("a", "b")
    edges = pairs.union(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).select(F.col("a").alias("src"), F.col("b").alias("dst"))
    pr, deg = pagerank_iterations(edges, iters=iters, damping=damping)
    return (
        pr.join(deg, pr["doc_id"] == deg["src"])
        .select("doc_id", "deg", "pr")
        .orderBy(F.desc("pr"), "doc_id")
    )


def pagerank_iterations(
    edges: DataFrame,
    *,
    iters: int = PAGERANK_ITERS,
    damping: float = PAGERANK_DAMPING,
) -> tuple[DataFrame, DataFrame]:
    """The iteration core over a SYMMETRIC (src, dst) edge relation —
    factored out so the property test drives the exact operator code (not a
    copy) against an independent python reference.  Returns ((doc_id, pr),
    (src, deg))."""
    # out-degree (== in-degree: symmetric graph); node set == deg keys
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    n = deg.agg(F.count("*").alias("n_nodes"))

    # edges carry the source degree through every iteration (joined once)
    esrc = edges.join(deg, "src")

    pr = deg.crossJoin(F.broadcast(n)).select(
        F.col("src").alias("doc_id"),
        F.round(F.lit(1.0) / F.col("n_nodes"), 6).alias("pr"),
    )
    for _ in range(iters):
        contrib = (
            esrc.join(pr, esrc["src"] == pr["doc_id"])
            .select(
                "dst",
                F.col("src"),
                (F.col("pr") / F.col("deg")).alias("c"),
            )
            .groupBy("dst")
            .agg(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct(F.col("src"), F.col("c")))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["c"],
                ).alias("acc")
            )
        )
        pr = contrib.crossJoin(F.broadcast(n)).select(
            F.col("dst").alias("doc_id"),
            F.round(
                F.lit(1.0 - damping) / F.col("n_nodes") + F.lit(damping) * F.col("acc"),
                6,
            ).alias("pr"),
        )
    return pr, deg


def _pagerank_sql() -> str:
    from event_stream_spark.datapipe.dedup import _MINHASH_PAIRS_CTES

    d = PAGERANK_DAMPING
    rounds = []
    for k in range(1, PAGERANK_ITERS + 1):
        rounds.append(f"""
    s{k} AS (
        SELECT e.dst AS doc_id,
               list_sum(list(p.pr / e.deg ORDER BY e.src)) AS acc
        FROM esrc e JOIN pr{k - 1} p ON p.doc_id = e.src
        GROUP BY e.dst
    ),
    pr{k} AS (
        SELECT doc_id,
               round({1.0 - d} / (SELECT n_nodes FROM n) + {d} * acc, 6) AS pr
        FROM s{k}
    )""")
    return f"""
    WITH {_MINHASH_PAIRS_CTES},
    edges AS (
        SELECT a AS src, b AS dst FROM pairs
        UNION ALL
        SELECT b AS src, a AS dst FROM pairs
    ),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    n AS (SELECT count(*) AS n_nodes FROM deg),
    esrc AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d ON d.src = e.src),
    pr0 AS (
        SELECT src AS doc_id, round(1.0 / (SELECT n_nodes FROM n), 6) AS pr
        FROM deg
    ),{",".join(rounds)}
    SELECT p.doc_id, d.deg, p.pr
    FROM pr{PAGERANK_ITERS} p JOIN deg d ON d.src = p.doc_id
    ORDER BY p.pr DESC, p.doc_id
"""


GRAPH_PAGERANK_SQL = _pagerank_sql()
