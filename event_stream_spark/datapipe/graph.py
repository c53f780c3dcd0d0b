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
over an edge-count-sized relation of (long, long, long) rows, never the
documents themselves.  The rank vector is node-sized.  Degrees are computed
once and ride along with the edges (joined before the loop), so iterations
touch exactly two relations.

Determinism — fixed-point integer arithmetic, NOT ordered float folds: rank
is carried as a BIGINT in units of 1e-12 (``FP_SCALE``); per-edge
contributions are integer divisions (``pr_fp DIV deg``) and the per-node
fold is a plain integer ``SUM`` — commutative and exact, so partial-
aggregation order cannot change the result and both engines are
bit-identical by construction.  The damping factor is applied as an exact
rational (17/20 for 0.85).  This replaces the r4 design that folded DOUBLE
contributions LEFT over a ``collect_list``/``array_sort`` array per
destination — deterministic, but a dense hub materialized a degree-sized
array in a single aggregation row, a skew hazard at 10¹⁰-doc scale
(VERDICT r4 ask #5).  The production aggregation now holds constant state
per group regardless of degree (gated by ``test_pagerank_no_degree_sized_
array`` with a 10⁵-edge hub).
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGERANK_ITERS = 5
PAGERANK_DAMPING = 0.85
# rank fixed-point scale: 1e-12 units in BIGINT.  Max intermediate is
# d_num·Σacc ≈ 17·1e12 ≈ 2e13 ≪ 2^63.
FP_SCALE = 10**12
# emitted precision: 6 dp, same contract as the rest of the registry
OUT_SCALE = 10**6


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

    # The verified-pair relation is the DAG's one expensive leaf, and the
    # iteration graph below references it many times (edges = both
    # orientations; deg, esrc, and every power-iteration join re-inline
    # it).  Catalyst re-inlines a subplan per reference and exchange
    # reuse does not fire across the aliased references (measured: the
    # unpersisted plan is 432 parquet scans, 0 ReusedExchange), so the
    # minhash pipeline would re-execute per reference.  Persisting the
    # tiny pair list (edge-count-sized, two longs per row) computes it
    # once per execution and truncates the plan — the canonical
    # iterative-graph persist (guide §5); recomputed from parquet on
    # every fresh execution (nothing outlives the run: the bench's
    # release step drops the blocks after each materialization).
    pairs = minhash_lsh_pairs(spark, sf, threshold=0.5).select("a", "b").persist()
    edges = pairs.union(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).select(F.col("a").alias("src"), F.col("b").alias("dst"))
    pr, deg = pagerank_iterations(edges, iters=iters, damping=damping)
    return (
        pr.join(deg, pr["doc_id"] == deg["src"])
        .select("doc_id", "deg", "pr")
        .orderBy(F.desc("pr"), "doc_id")
    )


def _damping_ratio(damping: float) -> tuple[int, int]:
    frac = Fraction(damping).limit_denominator(10**6)
    return frac.numerator, frac.denominator


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
    d_num, d_den = _damping_ratio(damping)

    # out-degree (== in-degree: symmetric graph); node set == deg keys.
    # Node-sized and referenced four times (n, esrc, pr0, the caller's
    # final join) — persisted so the edge aggregation runs once.
    deg = edges.groupBy("src").agg(F.count("*").alias("deg")).persist()
    n = deg.agg(F.count("*").alias("n_nodes"))

    # edges carry the source degree through every iteration (joined once,
    # persisted once: every one of the ``iters`` contribution joins scans
    # this relation — without the persist each iteration re-inlines and
    # re-executes the edge subplan, compounding with iteration depth)
    esrc = edges.join(deg, "src").persist()

    pr = deg.crossJoin(F.broadcast(n)).select(
        F.col("src").alias("doc_id"),
        F.expr(f"{FP_SCALE}L DIV n_nodes").alias("pr_fp"),
    )
    for _ in range(iters):
        contrib = (
            esrc.join(pr, esrc["src"] == pr["doc_id"])
            # integer contribution: constant-size state per dst group,
            # order-independent exact SUM — the production path at any skew
            .select("dst", F.expr("pr_fp DIV deg").alias("c_fp"))
            .groupBy("dst")
            .agg(F.sum("c_fp").alias("acc_fp"))
        )
        pr = contrib.crossJoin(F.broadcast(n)).select(
            F.col("dst").alias("doc_id"),
            F.expr(
                f"({(d_den - d_num)} * {FP_SCALE}L) DIV ({d_den} * n_nodes)"
                f" + ({d_num} * acc_fp) DIV {d_den}"
            ).alias("pr_fp"),
        )
    out = pr.select(
        "doc_id",
        # round-half-up to 6 dp in integer space, then ONE IEEE division
        # (correctly rounded → bit-identical across engines)
        (
            F.expr(f"(pr_fp + {FP_SCALE // OUT_SCALE // 2}) DIV {FP_SCALE // OUT_SCALE}")
            / F.lit(float(OUT_SCALE))
        ).alias("pr"),
    )
    return out, deg


def _pagerank_sql() -> str:
    from event_stream_spark.datapipe.dedup import _MINHASH_PAIRS_CTES

    d_num, d_den = _damping_ratio(PAGERANK_DAMPING)
    half = FP_SCALE // OUT_SCALE // 2
    unit = FP_SCALE // OUT_SCALE
    rounds = []
    for k in range(1, PAGERANK_ITERS + 1):
        rounds.append(f"""
    s{k} AS (
        SELECT e.dst AS doc_id, sum(p.pr_fp // e.deg) AS acc_fp
        FROM esrc e JOIN pr{k - 1} p ON p.doc_id = e.src
        GROUP BY e.dst
    ),
    pr{k} AS (
        SELECT doc_id,
               ({d_den - d_num} * {FP_SCALE}) // ({d_den} * (SELECT n_nodes FROM n))
                 + ({d_num} * acc_fp) // {d_den} AS pr_fp
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
        SELECT src AS doc_id, {FP_SCALE} // (SELECT n_nodes FROM n) AS pr_fp
        FROM deg
    ),{",".join(rounds)}
    SELECT p.doc_id, d.deg,
           ((p.pr_fp + {half}) // {unit}) / {float(OUT_SCALE)} AS pr
    FROM pr{PAGERANK_ITERS} p JOIN deg d ON d.src = p.doc_id
    ORDER BY pr DESC, p.doc_id
"""


GRAPH_PAGERANK_SQL = _pagerank_sql()


# ---------------------------------------------------------------------------
# triangle counting (degree-oriented — Suri & Vassilvitskii's MapReduce
# formulation, the standard cure for "the curse of the last reducer")
# ---------------------------------------------------------------------------

#: rank packing: deg·2^32 + node gives one BIGINT whose total order is
#: (degree, node) — the orientation key that bounds wedge fan-out
_RANK_BASE = 1 << 32


def triangle_counts(pairs: DataFrame) -> DataFrame:
    """(node, deg, n_triangles, clustering_p6) over an undirected graph
    given as canonical a<b ``pairs`` — factored so the pytest drives the
    exact operator code on planted graphs (K4, paths).

    Every edge is ORIENTED from its lower-(degree, id) endpoint to the
    higher one; a wedge c→u, c→v (rank u < rank v) closes into a triangle
    iff the oriented edge u→v exists — each triangle is found exactly
    once, as its rank-ascending traversal.  Orienting by degree bounds a
    node's out-degree by O(√m), so wedge fan-out is Σ out-deg² ≤ O(m^1.5)
    REGARDLESS of hubs — an unoriented formulation explodes on the
    highest-degree center (deg² wedges on the hub).  Both joins are
    narrow (long, long) equi-joins; nothing is ever quadratic in nodes.
    ``clustering_p6`` is the local clustering coefficient
    2T/(deg·(deg−1)) in the pure-BIGINT HALF-UP contract."""
    edges = pairs.union(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    # node-sized; referenced by rank and the final left join — persisted
    # so the edge aggregation runs once per execution
    deg = edges.groupBy("a").agg(F.count("*").alias("deg")).select(
        F.col("a").alias("node"), "deg"
    ).persist()
    rank = deg.select(
        "node", (F.col("deg") * _RANK_BASE + F.col("node")).alias("rk")
    )
    pr_ = pairs.join(
        rank.select(F.col("node").alias("a"), F.col("rk").alias("rka")), "a"
    ).join(rank.select(F.col("node").alias("b"), F.col("rk").alias("rkb")), "b")
    lo = F.col("rka") < F.col("rkb")
    # the oriented edge list feeds the wedge self-join twice AND the
    # closing-edge probe — three references that would each re-inline the
    # pairs ⋈ rank ⋈ rank subplan (and transitively the whole candidate
    # pipeline: the unpersisted plan measured 2,621 operators / 564
    # parquet scans with 0 ReusedExchange).  Edge-sized (three longs per
    # row); persisted per execution, recomputed from parquet each run.
    oriented = pr_.select(
        F.when(lo, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(lo, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.greatest("rka", "rkb").alias("dst_rk"),
    ).persist()
    x = oriented.select(
        F.col("src").alias("c"), F.col("dst").alias("u"),
        F.col("dst_rk").alias("urk"),
    )
    y = oriented.select(
        F.col("src").alias("c"), F.col("dst").alias("v"),
        F.col("dst_rk").alias("vrk"),
    )
    wedges = x.join(y, "c").filter(F.col("urk") < F.col("vrk")).select(
        "c", "u", "v"
    )
    closing = oriented.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    tris = wedges.join(closing, ["u", "v"]).select("c", "u", "v")
    nodes = (
        tris.select(F.col("c").alias("node"))
        .union(tris.select(F.col("u").alias("node")))
        .union(tris.select(F.col("v").alias("node")))
    )
    per = nodes.groupBy("node").agg(F.count("*").alias("t"))
    return (
        deg.join(per, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce("t", F.lit(0)).cast("long").alias("n_triangles"),
            F.when(
                F.col("deg") >= 2,
                F.expr(
                    "(2 * coalesce(t, 0) * 2000000 + deg * (deg - 1))"
                    " div (2 * deg * (deg - 1))"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("clustering_p6"),
        )
    )


def graph_triangles(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document triangle count + local clustering coefficient over the
    near-dup graph — triangle density separates template FAMILIES (dense
    cliques of mutual near-dups) from chains of incidental overlap, the
    community-structure signal next to ``graph_pagerank``'s centrality."""
    from event_stream_spark.datapipe.dedup import minhash_lsh_pairs

    # same persist rationale as graph_pagerank: the one expensive leaf,
    # referenced by both edge orientations and the orientation join
    pairs = minhash_lsh_pairs(spark, sf, threshold=0.5).select("a", "b").persist()
    return (
        triangle_counts(pairs)
        .select(
            F.col("node").alias("doc_id"), "deg", "n_triangles",
            "clustering_p6",
        )
        .orderBy("doc_id")
    )


def _triangles_sql() -> str:
    from event_stream_spark.datapipe.dedup import _MINHASH_PAIRS_CTES

    return f"""
    WITH {_MINHASH_PAIRS_CTES},
    edges AS (
        SELECT a, b FROM pairs
        UNION ALL
        SELECT b AS a, a AS b FROM pairs
    ),
    deg AS (SELECT a AS node, count(*) AS deg FROM edges GROUP BY a),
    rk AS (SELECT node, deg * {_RANK_BASE} + node AS rk FROM deg),
    o AS (
        SELECT CASE WHEN ra.rk < rb.rk THEN p.a ELSE p.b END AS src,
               CASE WHEN ra.rk < rb.rk THEN p.b ELSE p.a END AS dst,
               greatest(ra.rk, rb.rk) AS dst_rk
        FROM pairs p
        JOIN rk ra ON ra.node = p.a
        JOIN rk rb ON rb.node = p.b),
    w AS (
        SELECT x.src AS c, x.dst AS u, y.dst AS v
        FROM o x JOIN o y ON y.src = x.src AND x.dst_rk < y.dst_rk),
    tri AS (SELECT c, u, v FROM w JOIN o ON o.src = w.u AND o.dst = w.v),
    nodes AS (
        SELECT c AS node FROM tri
        UNION ALL SELECT u FROM tri
        UNION ALL SELECT v FROM tri),
    per AS (SELECT node, count(*) AS t FROM nodes GROUP BY node)
    SELECT d.node AS doc_id, d.deg,
           CAST(coalesce(per.t, 0) AS BIGINT) AS n_triangles,
           CAST(CASE WHEN d.deg >= 2
                     THEN (2 * coalesce(per.t, 0) * 2000000
                           + d.deg * (d.deg - 1))
                          // (2 * d.deg * (d.deg - 1))
                     ELSE 0 END AS BIGINT) AS clustering_p6
    FROM deg d LEFT JOIN per ON per.node = d.node
    ORDER BY doc_id
"""


GRAPH_TRIANGLES_SQL = _triangles_sql()
