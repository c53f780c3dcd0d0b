"""Deduplication operators over the ``documents`` / ``embeddings`` tables.

Five dedup families, each designed scale-first:

- exact       : hash-groupBy — one shuffle on a 32-byte key, no text movement
                after the hash projection
- minhash LSH : shingle → k min-hashes → band keys → bucket join → verify.
                Signatures are computed by EXPLODE → 16 codegen'd md5 columns
                → groupBy-min (a per-element lambda would run interpreted —
                ~10× slower; see git history), candidates are |bands| rows/doc
                joined on band key — never n²
- simhash     : 64-bit majority-bit signature via explode + 64 codegen'd bit
                sums; candidates via 4×16-bit block pigeonhole (hamming ≤ 3 ⇒
                some block equal), verified by bit_count(xor)
- n-gram jaccard : EXACT set-similarity join with prefix filtering
                (SSJoin/PPJoin family): under a global token order, two sets
                with J ≥ t must share a token in their size-(|X|-⌈t|X|⌉+1)
                prefixes — candidates come from a prefix-token equi-join,
                then exact jaccard verifies.  Never materializes n² pairs.
- embedding cosine : banded hyperplane-LSH blocking (shared with
                ann_lsh_topk's plane family) → per-(band, bucket) BLAS tile
                verify → group-max dedup across bands.  Candidates never
                expand n²; `bits` scales with log₂(n) to keep cells small.
                The exact all-block-pairs tile join survives as the declared
                baseline (`dedup_embedding_exact`), like ann_topk_brute.

md5-hex hashing keeps the DuckDB oracle exactly replayable (DuckDB has md5;
it does not share Spark's xxhash64).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from event_stream_spark.datapipe.text import lsh_bands, words
from event_stream_spark.queries import t


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Survivor per identical text: min doc_id + copy count."""
    d = t(spark, sf, "documents")
    return (
        d.select("doc_id", F.sha2(F.col("text"), 256).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_copies"))
        .select("doc_id", "text_hash", "n_copies")
        .orderBy("doc_id")
    )


DEDUP_EXACT_SQL = """
    SELECT min(doc_id) AS doc_id, sha256(text) AS text_hash, COUNT(*) AS n_copies
    FROM documents GROUP BY sha256(text) ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------

#: universal-hash constants: A odd < 2^30, B < 2^31, P = 2^61 - 1 (Mersenne)
_MH_P = (1 << 61) - 1
_MH_A = [(1000003 * i + 12345) | 1 for i in range(64)]
_MH_B = [998244353 * i + 7 for i in range(64)]

def _verify_jaccard(
    cand: DataFrame, shg: DataFrame, threshold: float
) -> DataFrame:
    """Exact jaccard for candidate pairs from shingle ROWS — no arrays.

    intersection(a, b) = count of equal-shingle row matches; sizes come from
    a per-doc count.  Touches only candidate docs' shingles, every step a
    codegen'd equi-join/agg — this is the piece that must stay cheap when the
    candidate set is thousands of pairs over billions of docs."""
    # referenced twice (za and zb); doc-sized (two longs per doc) —
    # persisted so the per-doc count aggregation over the shingle
    # relation runs once per execution, not once per join side
    sizes = shg.groupBy("doc_id").agg(F.count("*").alias("sz")).persist()
    sa = shg.select(F.col("doc_id").alias("a"), F.col("s").alias("s"))
    sb = shg.select(F.col("doc_id").alias("b"), F.col("s").alias("s"))
    inter = (
        cand.join(sa, "a")
        .join(sb, ["b", "s"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    za = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("sz_b"))
    jacc = F.round(
        F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
    )
    return (
        inter.join(za, "a")
        .join(zb, "b")
        .select("a", "b", jacc.alias("jacc"))
        .filter(F.col("jacc") >= threshold)
        .orderBy("a", "b")
    )


def minhash_lsh_pairs(
    spark: SparkSession,
    sf: str,
    *,
    threshold: float = 0.5,
    bands: int = 4,
    rows: int = 4,
) -> DataFrame:
    """Near-dup candidate pairs via banded min-hash, verified with exact
    shingle-set jaccard ≥ threshold.  Returns (a, b, jacc) with a < b."""
    from event_stream_spark.datapipe.text import doc_shingles

    k = bands * rows
    # Parquet-materialized once per (session, sf) — feeds the signature AND
    # all three verify joins here, plus the fingerprint operator (matview.py).
    shg = doc_shingles(spark, sf, 3)
    # One md5 per shingle → 32-bit base hash → k universal hashes
    # (A_i·h + B_i) mod P.  16× fewer cryptographic hashes than md5-per-seed;
    # pure int64 arithmetic (A_i < 2^30, h < 2^32 ⇒ product < 2^62, no
    # overflow), replayed exactly by the DuckDB oracle.
    base = F.conv(F.substring(F.md5("s"), 1, 8), 16, 10).cast("long")
    hashed = shg.select(
        "doc_id",
        *[
            ((F.lit(_MH_A[i]) * base + F.lit(_MH_B[i])) % F.lit(_MH_P)).alias(f"h{i}")
            for i in range(k)
        ],
    )
    sig = (
        hashed.groupBy("doc_id")
        .agg(*[F.min(f"h{i}").alias(f"m{i}") for i in range(k)])
        .select(
            "doc_id",
            F.array(
                *[F.col(f"m{i}").cast("string") for i in range(k)]
            ).alias("sig"),
        )
    )
    # both sides of the band self-join reference this; exchange reuse
    # does not fire across the aliases, so unpersisted the k-hash
    # signature aggregation (a corpus-scale shuffle) executes TWICE.
    # bands-per-doc rows of (long, int, string) — persisted per
    # execution, recomputed from parquet each run.
    exploded = sig.select(
        "doc_id",
        F.posexplode(lsh_bands(F.col("sig"), bands, rows)).alias("band_id", "band_key"),
    ).persist()
    e1 = exploded.alias("e1")
    e2 = exploded.alias("e2")
    cand = (
        e1.join(
            e2,
            (F.col("e1.band_id") == F.col("e2.band_id"))
            & (F.col("e1.band_key") == F.col("e2.band_key"))
            & (F.col("e1.doc_id") < F.col("e2.doc_id")),
        )
        .select(F.col("e1.doc_id").alias("a"), F.col("e2.doc_id").alias("b"))
        .distinct()
    )
    return _verify_jaccard(cand, shg, threshold)


def dedup_minhash(spark: SparkSession, sf: str) -> DataFrame:
    return minhash_lsh_pairs(spark, sf, threshold=0.5)


# The full minhash pipeline restated in DuckDB SQL (same universal hashes,
# same banding) — the oracle replays candidate generation AND verification.
_MH_A_SQL = "[" + ", ".join(str(a) for a in _MH_A[:16]) + "]"
_MH_B_SQL = "[" + ", ".join(str(b) for b in _MH_B[:16]) + "]"

# The minhash pipeline as a reusable CTE block: DEDUP_MINHASH_SQL selects
# the pairs directly; DEDUP_CLUSTERS_SQL extends the same block with a
# recursive connected-components CTE.
_MINHASH_PAIRS_CTES = f"""
    docs AS (
        SELECT doc_id,
               list_distinct(
                 list_transform(
                   range(1, greatest(len(ws) - 1, 1)),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shg
        FROM (SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '') AS ws
              FROM documents)
        WHERE len(ws) >= 3
    ),
    hashed AS (
        SELECT doc_id, shg,
               list_transform(shg,
                 x -> ('0x' || substring(md5(x), 1, 8))::BIGINT) AS hs
        FROM docs
    ),
    sigs AS (
        SELECT doc_id, shg,
               list_transform(range(16),
                 i -> (list_min(list_transform(hs,
                        h -> ({_MH_A_SQL}[i+1] * h + {_MH_B_SQL}[i+1])
                             % {_MH_P})))::VARCHAR) AS sig
        FROM hashed
    ),
    bands AS (
        SELECT doc_id, b.band_id,
               array_to_string(sig[b.band_id*4+1 : b.band_id*4+4], '|') AS band_key
        FROM sigs, (SELECT unnest(range(4)) AS band_id) b
    ),
    cand AS (
        SELECT DISTINCT e1.doc_id AS a, e2.doc_id AS b
        FROM bands e1 JOIN bands e2
          ON e1.band_id = e2.band_id AND e1.band_key = e2.band_key
         AND e1.doc_id < e2.doc_id
    ),
    pairs AS (
        SELECT a, b,
               round(len(list_intersect(da.shg, db.shg))::DOUBLE /
                     (len(da.shg) + len(db.shg) - len(list_intersect(da.shg, db.shg))), 6) AS jacc
        FROM cand
        JOIN docs da ON da.doc_id = a
        JOIN docs db ON db.doc_id = b
        WHERE jacc >= 0.5
    )
"""

DEDUP_MINHASH_SQL = f"""
    WITH {_MINHASH_PAIRS_CTES}
    SELECT a, b, jacc FROM pairs ORDER BY a, b
"""

# Connected components over the same pair set: min-label over the transitive
# closure (the recursive CTE's UNION-distinct bounds the closure, so this
# terminates for any graph).
DEDUP_CLUSTERS_SQL = f"""
    WITH RECURSIVE {_MINHASH_PAIRS_CTES},
    edges AS (
        SELECT a AS u, b AS v FROM pairs
        UNION
        SELECT b AS u, a AS v FROM pairs
    ),
    reach(src, dst) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        UNION
        SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
    ),
    lbl AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src)
    SELECT doc_id, cluster_id,
           COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
           doc_id = cluster_id AS keep
    FROM lbl
    ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# one-permutation hashing (OPH) minhash — one hash per shingle total
# ---------------------------------------------------------------------------

_OPH_K = 16
_OPH_BANDS = 4
_OPH_ROWS = 4
#: densification offset: a bin borrowed from distance t carries +t·C, so
#: borrowed values from different distances can never collide with
#: genuine minima (h < 2^32 < C) or with each other
_OPH_C = 1 << 33


def minhash_oph_pairs(
    spark: SparkSession, sf: str, *, threshold: float = 0.5
) -> DataFrame:
    """Near-dup pairs via ONE-permutation minhash (Li, Owen, Zhang, NIPS
    2012) with rotation densification (Shrivastava & Li, ICML 2014).

    OPH computes ONE hash per shingle and uses it as both the bin
    selector (h mod K) and the permutation value: the signature is the
    per-bin minimum — one conditional-min aggregate instead of K hash
    passes.  Bins left empty (short docs) borrow the nearest non-empty
    bin to the right, circularly, at ``+t·_OPH_C`` per borrowed
    distance — the Shrivastava–Li rotation scheme, which restores the
    collision-probability estimate unbiasedly.

    Honest cost note: the classic path here (``minhash_lsh_pairs``)
    already amortizes one md5 across K=16 cheap universal hashes, so at
    this K the measured walls are comparable (sf1: 52 ms classic vs
    76 ms OPH — the md5 dominates both).  OPH's arithmetic saving
    materializes at large K (128-perm signatures) or when each minhash
    would otherwise need an independent strong hash — and it is the
    standard modern formulation, so the engine should speak it.

    Banding, bucket join, and EXACT-jaccard verification are identical to
    the classic path, so precision is exact by construction; only recall
    depends on the sketch.  The DuckDB oracle replays every hash, bin,
    densification offset, and band key bit-for-bit.
    """
    from event_stream_spark.datapipe.text import doc_shingles

    k = _OPH_K
    shg = doc_shingles(spark, sf, 3)
    base = F.conv(F.substring(F.md5("s"), 1, 8), 16, 10).cast("long")
    hashed = shg.select("doc_id", base.alias("h"))
    mins = hashed.groupBy("doc_id").agg(
        *[
            F.min(F.when(F.col("h") % k == j, F.col("h"))).alias(f"s{j}")
            for j in range(k)
        ]
    )
    dense = mins.select(
        "doc_id",
        *[
            F.coalesce(
                *[
                    F.col(f"s{(j + t) % k}") + F.lit(t * _OPH_C)
                    for t in range(k)
                ]
            ).alias(f"d{j}")
            for j in range(k)
        ],
    )
    bands = dense.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        "|",
                        *[
                            F.col(f"d{b * _OPH_ROWS + r}").cast("string")
                            for r in range(_OPH_ROWS)
                        ],
                    )
                    for b in range(_OPH_BANDS)
                ]
            )
        ).alias("band_id", "band_key"),
    # both self-join sides reference this; unpersisted, the conditional-
    # min sketch aggregation (corpus-scale shuffle) executes twice —
    # persisted per execution, recomputed from parquet each run
    ).persist()
    e1 = bands.alias("e1")
    e2 = bands.alias("e2")
    cand = (
        e1.join(
            e2,
            (F.col("e1.band_id") == F.col("e2.band_id"))
            & (F.col("e1.band_key") == F.col("e2.band_key"))
            & (F.col("e1.doc_id") < F.col("e2.doc_id")),
        )
        .select(F.col("e1.doc_id").alias("a"), F.col("e2.doc_id").alias("b"))
        .distinct()
    )
    return _verify_jaccard(cand, shg, threshold)


def dedup_minhash_oph(spark: SparkSession, sf: str) -> DataFrame:
    return minhash_oph_pairs(spark, sf, threshold=0.5)


# the oracle twin, generated from the SAME constants so the two engines
# cannot drift: conditional-min bins, rotation densification, band keys
_OPH_MINS_SQL = ",\n               ".join(
    f"min(CASE WHEN h % {_OPH_K} = {j} THEN h END) AS s{j}"
    for j in range(_OPH_K)
)
_OPH_DENSE_SQL = ",\n               ".join(
    "coalesce("
    + ", ".join(
        f"s{(j + t) % _OPH_K} + {t * _OPH_C}" for t in range(_OPH_K)
    )
    + f") AS d{j}"
    for j in range(_OPH_K)
)
_OPH_BANDS_SQL = "\n        UNION ALL\n        ".join(
    f"SELECT doc_id, {b} AS band_id, "
    + " || '|' || ".join(
        f"d{b * _OPH_ROWS + r}::VARCHAR" for r in range(_OPH_ROWS)
    )
    + " AS band_key FROM dense"
    for b in range(_OPH_BANDS)
)

DEDUP_MINHASH_OPH_SQL = f"""
    WITH docs AS (
        SELECT doc_id,
               list_distinct(
                 list_transform(
                   range(1, greatest(len(ws) - 1, 1)),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shg
        FROM (SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '') AS ws
              FROM documents)
        WHERE len(ws) >= 3
    ),
    hrows AS (
        SELECT doc_id,
               unnest(list_transform(shg,
                 x -> ('0x' || substring(md5(x), 1, 8))::BIGINT)) AS h
        FROM docs
    ),
    mins AS (
        SELECT doc_id, {_OPH_MINS_SQL}
        FROM hrows GROUP BY doc_id
    ),
    dense AS (
        SELECT doc_id, {_OPH_DENSE_SQL}
        FROM mins
    ),
    bands AS (
        {_OPH_BANDS_SQL}
    ),
    cand AS (
        SELECT DISTINCT e1.doc_id AS a, e2.doc_id AS b
        FROM bands e1 JOIN bands e2
          ON e1.band_id = e2.band_id AND e1.band_key = e2.band_key
         AND e1.doc_id < e2.doc_id
    ),
    pairs AS (
        SELECT a, b,
               round(len(list_intersect(da.shg, db.shg))::DOUBLE /
                     (len(da.shg) + len(db.shg) - len(list_intersect(da.shg, db.shg))), 6) AS jacc
        FROM cand
        JOIN docs da ON da.doc_id = a
        JOIN docs db ON db.doc_id = b
        WHERE jacc >= 0.5
    )
    SELECT a, b, jacc FROM pairs ORDER BY a, b
"""


# ---------------------------------------------------------------------------
# duplicate clustering (connected components over near-dup pairs)
# ---------------------------------------------------------------------------

def connected_components(
    pairs: DataFrame, *, max_iters: int = 25
) -> DataFrame:
    """Connected components over an undirected pair list ``(a, b)`` →
    ``(node, label)`` where label = min node id in the component.

    Min-label propagation with pointer jumping (path halving): each round
    every node takes the min of its own label, its neighbors' labels, and
    its label's label.  Pointer jumping makes convergence logarithmic in
    component diameter (plain neighbor propagation is linear — a 1M-node
    chain would need 1M rounds; this needs ~20).  Each round is two
    distributed joins + one convergence-count action, and
    ``localCheckpoint`` truncates the lineage so the plan doesn't double
    per round (on a cluster: ``spark.sparkContext.setCheckpointDir`` +
    ``.checkpoint()`` for executor-loss resilience).  This is the same
    driver-loop shape GraphX/GraphFrames use for CC — the loop is on the
    driver, all data movement is cluster-side.
    """
    sym = pairs.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        pairs.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    lbl = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select(F.col("u").alias("node"), F.least("u", "mn").alias("l"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        prop = (
            sym.alias("e")
            .join(lbl.alias("n"), F.col("e.v") == F.col("n.node"))
            .groupBy(F.col("e.u").alias("node"))
            .agg(F.min("n.l").alias("pl"))
        )
        merged = (
            lbl.join(prop, "node", "left")
            .select("node", F.least("l", F.coalesce("pl", "l")).alias("l"))
        )
        jumped = (
            merged.alias("m1")
            .join(merged.alias("m2"), F.col("m1.l") == F.col("m2.node"), "left")
            .select(
                F.col("m1.node").alias("node"),
                F.least(
                    F.col("m1.l"), F.coalesce(F.col("m2.l"), F.col("m1.l"))
                ).alias("l"),
            )
            .localCheckpoint()
        )
        changed = (
            jumped.withColumnRenamed("l", "ln")
            .join(lbl.withColumnRenamed("l", "lo"), "node")
            .where(F.col("ln") != F.col("lo"))
            .count()
        )
        lbl = jumped
        if changed == 0:
            break
    return lbl


def dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Duplicate clusters: minhash near-dup pairs grouped into connected
    components; ``keep`` marks the canonical (min-id) doc per cluster —
    the production keep/drop decision that pair lists alone don't give.
    """
    cc = connected_components(minhash_lsh_pairs(spark, sf, threshold=0.5))
    sizes = cc.groupBy("l").agg(F.count("*").alias("cluster_size"))
    return (
        cc.join(sizes, "l")
        .select(
            F.col("node").alias("doc_id"),
            F.col("l").alias("cluster_id"),
            "cluster_size",
            (F.col("node") == F.col("l")).alias("keep"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 64


def simhash_df(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, simhash): bit b set iff a strict majority of the doc's
    distinct words have bit b set in their 64-bit md5-prefix hash — the
    standard Manku/Charikar 64-bit simhash (widely published for web-scale
    near-dup detection; 32 bits is far too collision-prone above ~10^4 docs).

    explode → one codegen'd hash column (two md5 32-bit halves packed into a
    signed long) → 64 conditional-sum aggregates in a single groupBy pass —
    no per-element lambdas, one shuffle."""
    d = t(spark, sf, "documents")
    w = d.select(
        "doc_id", F.explode_outer(F.array_distinct(words(F.col("text")))).alias("w")
    )
    hi = F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(F.md5("w"), 9, 8), 16, 10).cast("long")
    h = w.select("doc_id", F.shiftleft(hi, 32).bitwiseOR(lo).alias("h"))
    bit_sums = [
        # (h >> b) & 1: arithmetic shift's sign-extension is masked off
        F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))).alias(f"b{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = h.groupBy("doc_id").agg(F.count("h").alias("n"), *bit_sums)
    sim = None
    for b in range(SIMHASH_BITS):
        # shiftleft wraps for b=63 (sign bit) — exactly the two's-complement
        # packing we want; a Python 1<<63 literal would overflow LongType
        term = F.when(
            F.col(f"b{b}") * 2 > F.col("n"),
            F.shiftleft(F.lit(1).cast("long"), b),
        ).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    return agg.select("doc_id", F.coalesce(sim, F.lit(0)).alias("simhash"))


def dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    return simhash_df(spark, sf).orderBy("doc_id")


# 64-bit replay: hi/lo md5 halves packed with overflow-safe signed arithmetic
# (DuckDB checks shift/multiply overflow, so bit 63 needs the CASE forms).
DEDUP_SIMHASH_SQL = """
    WITH w AS (
        SELECT doc_id,
               list_distinct(list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x <> '')) AS ws
        FROM documents
    ),
    h AS (
        SELECT doc_id,
               list_transform(ws, x ->
                 CASE WHEN ('0x' || substring(md5(x), 1, 8))::BIGINT >= 2147483648
                      THEN (('0x' || substring(md5(x), 1, 8))::BIGINT - 4294967296)
                           * 4294967296 + ('0x' || substring(md5(x), 9, 8))::BIGINT
                      ELSE ('0x' || substring(md5(x), 1, 8))::BIGINT
                           * 4294967296 + ('0x' || substring(md5(x), 9, 8))::BIGINT
                 END) AS hs,
               len(ws) AS n
        FROM w
    )
    SELECT doc_id,
           list_sum(list_transform(range(0, 64),
             b -> CASE WHEN 2 * len(list_filter(hs, x -> (x >> b) & 1 = 1)) > n
                       THEN CASE WHEN b = 63 THEN -9223372036854775808
                                 ELSE (1::BIGINT << b) END
                       ELSE 0 END))::BIGINT AS simhash
    FROM h ORDER BY doc_id
"""


def simhash_near_pairs(
    spark: SparkSession, sf: str, *, max_hamming: int = 3
) -> DataFrame:
    """Candidate pairs by 4×16-bit block pigeonhole, verified by hamming ≤ k.

    hamming(a,b) ≤ 3 with 4 blocks ⇒ at least one block identical, so an
    equi-join per block finds every true pair without an n² compare (the
    Manku et al. WWW'07 construction over the 64-bit simhash)."""
    # both sides of the block self-join read this; exchange reuse does NOT
    # fire across the aliased sides (verified: 0 ReusedExchange), so the
    # 64-agg relation is parquet-materialized once per session (matview.py)
    from event_stream_spark.datapipe.matview import materialized

    sh = materialized(spark, f"simhash|{sf}", lambda: simhash_df(spark, sf))
    blocks = sh.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("block_id", "block_val"),
    )
    b1, b2 = blocks.alias("b1"), blocks.alias("b2")
    cand = (
        b1.join(
            b2,
            (F.col("b1.block_id") == F.col("b2.block_id"))
            & (F.col("b1.block_val") == F.col("b2.block_val"))
            & (F.col("b1.doc_id") < F.col("b2.doc_id")),
        )
        .select(
            F.col("b1.doc_id").alias("a"),
            F.col("b2.doc_id").alias("b"),
            F.col("b1.simhash").alias("sa"),
            F.col("b2.simhash").alias("sb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        cand.select("a", "b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("a", "b")
    )


# Pigeonhole replay: the same 64-bit simhash construction (shared CTE text
# with DEDUP_SIMHASH_SQL), 4×16-bit blocks via shift/mask, bit_count(xor)
# verify — candidate generation AND verification both replayed, like the
# minhash/embedding oracles.  `&` masking makes the arithmetic >> sign
# extension irrelevant, matching Spark's shiftright+bitwiseAND.
DEDUP_SIMHASH_PAIRS_SQL = """
    WITH w AS (
        SELECT doc_id,
               list_distinct(list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x <> '')) AS ws
        FROM documents
    ),
    h AS (
        SELECT doc_id,
               list_transform(ws, x ->
                 CASE WHEN ('0x' || substring(md5(x), 1, 8))::BIGINT >= 2147483648
                      THEN (('0x' || substring(md5(x), 1, 8))::BIGINT - 4294967296)
                           * 4294967296 + ('0x' || substring(md5(x), 9, 8))::BIGINT
                      ELSE ('0x' || substring(md5(x), 1, 8))::BIGINT
                           * 4294967296 + ('0x' || substring(md5(x), 9, 8))::BIGINT
                 END) AS hs,
               len(ws) AS n
        FROM w
    ),
    sh AS (
        SELECT doc_id,
               list_sum(list_transform(range(0, 64),
                 b -> CASE WHEN 2 * len(list_filter(hs, x -> (x >> b) & 1 = 1)) > n
                           THEN CASE WHEN b = 63 THEN -9223372036854775808
                                     ELSE (1::BIGINT << b) END
                           ELSE 0 END))::BIGINT AS simhash
        FROM h
    ),
    blocks AS (
        SELECT doc_id, simhash, g.block_id,
               (simhash >> (16 * g.block_id)) & 65535 AS block_val
        FROM sh, (SELECT unnest(range(4)) AS block_id) g
    ),
    cand AS (
        SELECT DISTINCT b1.doc_id AS a, b2.doc_id AS b,
               b1.simhash AS sa, b2.simhash AS sb
        FROM blocks b1 JOIN blocks b2
          ON b1.block_id = b2.block_id AND b1.block_val = b2.block_val
         AND b1.doc_id < b2.doc_id
    )
    SELECT a, b, bit_count(xor(sa, sb)) AS hamming
    FROM cand WHERE hamming <= 3 ORDER BY a, b
"""


# ---------------------------------------------------------------------------
# n-gram jaccard via prefix-filtered set-similarity join (exact)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    spark: SparkSession, sf: str, *, threshold: float = 0.5, n: int = 5
) -> DataFrame:
    """All pairs with word n-gram jaccard ≥ threshold — EXACT result computed
    with prefix filtering, not an n² cross join.

    Under any global token order, J(A,B) ≥ t implies A and B share a token
    within their first (|X| - ⌈t·|X|⌉ + 1) tokens; md5(token) provides the
    (deterministic, uniform) global order.  Candidates = equi-join of
    prefix rows; exact jaccard verifies."""
    from pyspark.sql import Window

    from event_stream_spark.datapipe.text import doc_shingles

    # session-persisted: feeds sizes, the ranked prefix relation, and both
    # verify joins (see minhash note)
    shg = doc_shingles(spark, sf, n)
    sizes = shg.groupBy("doc_id").agg(F.count("*").alias("sz"))
    win = Window.partitionBy("doc_id").orderBy("k")
    ranked = (
        shg.select("doc_id", F.md5("s").alias("k"))
        .withColumn("rn", F.row_number().over(win))
        .join(sizes, "doc_id")
    )
    plen = F.col("sz") - F.ceil(F.col("sz") * F.lit(threshold)) + 1
    # both self-join sides reference this; unpersisted, the per-doc
    # row_number window + size join execute twice — prefix-row-sized
    # (two strings per row), persisted per execution
    prefixes = (
        ranked.filter(F.col("rn") <= plen).select("doc_id", "k").persist()
    )
    p1, p2 = prefixes.alias("p1"), prefixes.alias("p2")
    cand = (
        p1.join(
            p2,
            (F.col("p1.k") == F.col("p2.k"))
            & (F.col("p1.doc_id") < F.col("p2.doc_id")),
        )
        .select(F.col("p1.doc_id").alias("a"), F.col("p2.doc_id").alias("b"))
        .distinct()
    )
    return _verify_jaccard(cand, shg, threshold)


def dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    return ngram_jaccard_pairs(spark, sf, threshold=0.5, n=5)


# Oracle: the naive quadratic formulation — same result set by definition;
# DuckDB runs it comfortably at the correctness scale factor.
DEDUP_NGRAM_JACCARD_SQL = """
    WITH docs AS (
        SELECT doc_id,
               list_distinct(
                 list_transform(
                   range(1, greatest(len(ws) - 3, 1)),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
                        ws[i+3] || ' ' || ws[i+4])) AS shg
        FROM (SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '') AS ws
              FROM documents)
        WHERE len(ws) >= 5
    )
    SELECT a.doc_id AS a, b.doc_id AS b,
           round(len(list_intersect(a.shg, b.shg))::DOUBLE /
                 (len(a.shg) + len(b.shg) - len(list_intersect(a.shg, b.shg))), 6) AS jacc
    FROM docs a JOIN docs b ON a.doc_id < b.doc_id
    WHERE jacc >= 0.5
    ORDER BY a, b
"""


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_lsh_pairs(
    spark: SparkSession,
    sf: str,
    *,
    threshold: float = 0.4,
    bands: int = 8,
    bits: int = 8,
) -> DataFrame:
    """Embedding near-dup via banded hyperplane-LSH blocking — the scale path.

    Candidate generation NEVER expands n² pairs: each vector lands in
    ``bands`` buckets (one ``bits``-bit sign signature per band, from the
    deterministic hyperplane family shared with ``ann_lsh_topk``), and only
    vectors sharing a (band, bucket) cell are compared — one dense BLAS tile
    per cell via applyInPandas, exactly the SemDeDup/SimHash production shape.
    A pair colliding in several bands is deduped by a (a, b) group-max.

    Total verify work is Σ_cells |cell|² ≈ n²·bands/2^bits for uncorrelated
    data — ``bits`` scales with log₂(n) (buckets stay ~constant-sized), so at
    10⁹ vectors bits≈24-28 keeps cells in the hundreds while a plain
    all-pairs table would be 5·10¹⁷.  Recall per pair at cosine s is
    1-(1-p^bits)^bands with p = 1-acos(s)/π — sized for the near-dup regime
    (s ≥ 0.9 ⇒ ~99%+); exact ground truth lives in
    :func:`embedding_pairs_exact` (the declared baseline).

    The DuckDB oracle (DEDUP_EMBEDDING_SQL) replays candidate generation AND
    verification — same md5-derived hyperplanes, same banding, same rounded
    cosine — like the minhash oracle."""
    import pandas as pd

    from event_stream_spark.datapipe.similarity import lsh_band_buckets

    import math

    e = t(spark, sf, "embeddings").select("vec_id", "embedding")
    # Spark group = (band, bucket mod G): per-cell groups would mean one
    # Python invocation per (mostly tiny) cell — measured overhead-bound at
    # ~0.2 ms/group.  Packing ~GROUP_ROWS rows per group keeps invocation
    # count ∝ n/GROUP_ROWS at every scale; the per-BUCKET exact tiles run in
    # a numpy loop inside the group.  G comes from the parquet row count (a
    # metadata-only lookup, no scan).
    GROUP_ROWS = 4096
    n = e.count()
    groups_per_band = max(1, math.ceil(n / GROUP_ROWS))
    exploded = (
        lsh_band_buckets(e, bands=bands, bits=bits)
        .select(
            "vec_id",
            "embedding",
            F.posexplode("buckets").alias("band_id", "bucket"),
        )
        .withColumn("cell_grp", F.pmod(F.col("bucket"), F.lit(groups_per_band)))
    )

    margin = threshold - 1e-6  # final filter happens on the rounded value

    def cells(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        out_a, out_b, out_s = [], [], []
        for _, sub in pdf.groupby("bucket", sort=False):
            if len(sub) < 2:
                continue  # singleton cell — no pairs
            V = np.stack(sub["embedding"].to_numpy()).astype("float64")
            ids = sub["vec_id"].to_numpy()
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            M = Vn @ Vn.T
            ii, jj = np.where(M >= margin)
            keep = ids[ii] < ids[jj]
            out_a.append(ids[ii][keep])
            out_b.append(ids[jj][keep])
            out_s.append(M[ii, jj][keep])
        if not out_a:
            return pd.DataFrame(columns=["a", "b", "sim"])
        return pd.DataFrame(
            {
                "a": np.concatenate(out_a),
                "b": np.concatenate(out_b),
                "sim": np.concatenate(out_s),
            }
        )

    tiles = exploded.groupBy("band_id", "cell_grp").applyInPandas(
        cells, schema="a long, b long, sim double"
    )
    return (
        tiles.groupBy("a", "b")  # multi-band collisions → one row (max is
        .agg(F.max("sim").alias("sim"))  # order-free: ulp-identical inputs)
        .select("a", "b", F.round("sim", 6).alias("sim"))
        .filter(F.col("sim") >= threshold)
        .orderBy("a", "b")
    )


def dedup_embedding(spark: SparkSession, sf: str) -> DataFrame:
    return embedding_lsh_pairs(spark, sf, threshold=0.4)


# The LSH pipeline restated in DuckDB SQL: hyperplane components regenerated
# from the same md5(plane || '|' || comp) family (exact in binary64 — see
# similarity._hyperplane), same 8×8 banding, same rounded-cosine verify.
DEDUP_EMBEDDING_SQL = """
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    planes AS (
        SELECT pk,
               list_transform(range(64),
                 j -> ('0x' || substring(md5(pk::VARCHAR || '|' || j::VARCHAR), 1, 8))::BIGINT
                      / 2147483648.0 - 1.0) AS p
        FROM (SELECT unnest(range(64)) AS pk)
    ),
    bits AS (
        SELECT e.vec_id, (p.pk // 8) AS band_id,
               CASE WHEN list_dot_product(e.v, p.p) >= 0
                    THEN 1 << (p.pk % 8) ELSE 0 END AS bit
        FROM e CROSS JOIN planes p
    ),
    bk AS (
        SELECT vec_id, band_id, sum(bit) AS bucket
        FROM bits GROUP BY vec_id, band_id
    ),
    cand AS (
        SELECT DISTINCT e1.vec_id AS a, e2.vec_id AS b
        FROM bk e1 JOIN bk e2
          ON e1.band_id = e2.band_id AND e1.bucket = e2.bucket
         AND e1.vec_id < e2.vec_id
    )
    SELECT a, b, round(list_cosine_similarity(ea.v, eb.v), 6) AS sim
    FROM cand JOIN e ea ON ea.vec_id = a JOIN e eb ON eb.vec_id = b
    WHERE sim >= 0.4
    ORDER BY a, b
"""


def embedding_pairs(
    spark: SparkSession, sf: str, *, threshold: float = 0.4, block: int = 1024
) -> DataFrame:
    """EXACT pairwise cosine ≥ threshold via distributed block-matrix tiles —
    the declared correctness baseline for :func:`embedding_lsh_pairs` (the
    registry's ``dedup_embedding_exact``), exactly as ``ann_topk_brute``
    baselines the ANN operators.  O(n²) flops by admission: use the LSH path
    in production.

    Vectors are grouped into id-range blocks of ``block``; every block pair
    (bi ≤ bj) becomes one task that computes its numpy similarity tile and
    emits qualifying (a, b, sim).  Work distributes across ⌈n/block⌉² /2
    tasks; per-tile math is BLAS.  Thresholding happens after a Spark-side
    round(6) so results match the sequential-sum oracle.

    The block-pair driving table is built with a distributed self-join — no
    driver-side collect: the pairs frame stays lazy and feeds the join
    directly, never materializing on the driver.

    r11 (guide §2.4 + §5): the pre-r11 form scanned the vector table FOUR
    times (the block-id distinct twice via the pair self-join, then once
    per tile side).  Now the ⌈n/block⌉-row block list is persisted per
    execution, and both tile sides come from ONE scan: each vector
    broadcast-joins the doubled (blk → bi, bj, side) membership list —
    identical (bi, bj, vec, side) rows, identical tiles, one pass of the
    payload instead of two."""
    import pandas as pd

    e = t(spark, sf, "embeddings").select(
        "vec_id", "embedding", (F.col("vec_id") / block).cast("long").alias("blk")
    )
    blks = e.select("blk").distinct().persist()
    pairs_df = (
        blks.select(F.col("blk").alias("bi"))
        .join(blks.select(F.col("blk").alias("bj")), F.col("bi") <= F.col("bj"))
    )
    memb = pairs_df.select(
        F.col("bi").alias("blk"), "bi", "bj", F.lit(0).alias("side")
    ).unionByName(
        pairs_df.select(F.col("bj").alias("blk"), "bi", "bj", F.lit(1).alias("side"))
    )
    both = e.join(F.broadcast(memb), "blk").select(
        "bi", "bj", "vec_id", "embedding", "side"
    )

    margin = threshold - 1e-6  # final filter happens on the rounded value

    def tile(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        same = pdf["bi"].iloc[0] == pdf["bj"].iloc[0]
        if same:
            a_rows = pdf[pdf["side"] == 0]
            b_rows = a_rows
        else:
            a_rows = pdf[pdf["side"] == 0]
            b_rows = pdf[pdf["side"] == 1]
        if a_rows.empty or b_rows.empty:
            return pd.DataFrame(columns=["a", "b", "sim"])
        A = np.stack(a_rows["embedding"].to_numpy()).astype("float64")
        B = np.stack(b_rows["embedding"].to_numpy()).astype("float64")
        ids_a = a_rows["vec_id"].to_numpy()
        ids_b = b_rows["vec_id"].to_numpy()
        An = A / np.linalg.norm(A, axis=1, keepdims=True)
        Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
        M = An @ Bn.T
        ii, jj = np.where(M >= margin)
        keep = ids_a[ii] < ids_b[jj]
        return pd.DataFrame(
            {"a": ids_a[ii][keep], "b": ids_b[jj][keep], "sim": M[ii, jj][keep]}
        )

    tiles = both.groupBy("bi", "bj").applyInPandas(
        tile, schema="a long, b long, sim double"
    )
    return (
        tiles.select("a", "b", F.round("sim", 6).alias("sim"))
        .filter(F.col("sim") >= threshold)
        .orderBy("a", "b")
    )


def dedup_embedding_exact(spark: SparkSession, sf: str) -> DataFrame:
    return embedding_pairs(spark, sf, threshold=0.4)


DEDUP_EMBEDDING_EXACT_SQL = """
    SELECT a.vec_id AS a, b.vec_id AS b,
           round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE sim >= 0.4
    ORDER BY a, b
"""


# ---------------------------------------------------------------------------
# cluster representative selection (keep the best doc, not the min id)
# ---------------------------------------------------------------------------

def dedup_cluster_best(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-aware canonical selection: for each near-dup cluster
    (minhash pairs → connected components), keep the member with the
    HIGHEST quality score (ties → min doc_id) — what production dedup
    actually does (CCNet/RefinedWeb keep the best-scoring copy), where
    :func:`dedup_clusters`'s min-id ``keep`` is the arbitrary baseline.

    Scale shape: the component labels (log-diameter pointer-jumping CC)
    cover only clustered docs — a tiny relation next to the corpus — so
    the quality join streams the narrow (doc_id, quality) projection
    against it on the doc_id key; the argmax is one window shuffle on
    cluster_id over that same small relation.  No full-corpus shuffle
    carries text.
    """
    from pyspark.sql import Window

    from event_stream_spark.datapipe.textstats import text_quality

    cc = connected_components(minhash_lsh_pairs(spark, sf, threshold=0.5))
    labels = cc.select(
        F.col("node").alias("doc_id"), F.col("l").alias("cluster_id")
    )
    quality = text_quality(spark, sf).select("doc_id", "quality")
    joined = labels.join(quality, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "cluster_size",
            F.count("*").over(Window.partitionBy("cluster_id")),
        )
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("best_doc_id"),
            F.col("quality").alias("best_quality"),
            "cluster_size",
        )
        .orderBy("cluster_id")
    )


# The full pipeline restated: minhash CTEs + transitive-closure labels +
# the same quality formula as TEXT_QUALITY_SQL, argmax per cluster.
DEDUP_CLUSTER_BEST_SQL = f"""
    WITH RECURSIVE {_MINHASH_PAIRS_CTES},
    edges AS (
        SELECT a AS u, b AS v FROM pairs
        UNION
        SELECT b AS u, a AS v FROM pairs
    ),
    reach(src, dst) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        UNION
        SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
    ),
    lbl AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src),
    qw AS (
        SELECT doc_id, text,
               list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ws
        FROM documents),
    quality AS (
        SELECT doc_id,
               round(least(1.0, len(ws) / 50.0)
                     * (1.0 - length(regexp_replace(text, '[^.!?,;:]', '', 'g'))::DOUBLE
                              / greatest(length(text), 1))
                     * (CASE WHEN length(text)::DOUBLE / greatest(len(ws),1) BETWEEN 3 AND 12
                             THEN 1.0 ELSE 0.5 END), 6) AS quality
        FROM qw),
    ranked AS (
        SELECT l.cluster_id, l.doc_id, q.quality,
               COUNT(*) OVER (PARTITION BY l.cluster_id) AS cluster_size,
               ROW_NUMBER() OVER (PARTITION BY l.cluster_id
                                  ORDER BY q.quality DESC, l.doc_id) AS rn
        FROM lbl l JOIN quality q USING (doc_id)
    )
    SELECT cluster_id, doc_id AS best_doc_id, quality AS best_quality,
           cluster_size
    FROM ranked WHERE rn = 1 ORDER BY cluster_id
"""


# ---------------------------------------------------------------------------
# Asymmetric containment (subset-duplicate) detection
# ---------------------------------------------------------------------------

CONTAIN_T = 0.8  # fraction of A's shingles that must appear in B
CONTAIN_N = 5  # same shingle order as the jaccard family


def containment_pairs(
    spark: SparkSession, sf: str, *, threshold: float = CONTAIN_T, n: int = CONTAIN_N
) -> DataFrame:
    """Directed pairs (a, b) where doc a's shingle set is ≥ ``threshold``
    CONTAINED in doc b's: C(a→b) = |Sₐ∩S_b| / |Sₐ| — the asymmetric cousin
    of jaccard that catches subset duplicates (a quote, an excerpt, a doc
    embedded in a larger page), which symmetric jaccard misses whenever the
    container is much bigger than the contained doc.

    Exactness via prefix filtering (the containment-join variant of the
    PPJoin trick in :func:`ngram_jaccard_pairs`): under the md5 global
    token order, C(a→b) ≥ t forces a to share a token within its first
    (|Sₐ| − ⌈t·|Sₐ|⌉ + 1) tokens with SOME token of b — so candidates are
    an equi-join of a-prefix rows against b's full shingle rows (the
    asymmetry: only the probe side is prefix-pruned), and the exact
    containment verify touches candidates only.  Every step is a codegen
    equi-join/agg on the shingle key — no n² compare at any size.
    """
    from pyspark.sql import Window

    from event_stream_spark.datapipe.text import doc_shingles

    shg = doc_shingles(spark, sf, n)
    # referenced twice (the prefix-length join and za below); doc-sized —
    # persisted so the per-doc count runs once per execution
    sizes = shg.groupBy("doc_id").agg(F.count("*").alias("sz")).persist()
    win = Window.partitionBy("doc_id").orderBy("k")
    ranked = (
        shg.select("doc_id", F.md5("s").alias("k"))
        .withColumn("rn", F.row_number().over(win))
        .join(sizes, "doc_id")
    )
    plen = F.col("sz") - F.ceil(F.col("sz") * F.lit(threshold)) + 1
    a_pref = ranked.filter(F.col("rn") <= plen).select(
        F.col("doc_id").alias("a"), "k"
    )
    b_all = shg.select(F.col("doc_id").alias("b"), F.md5("s").alias("k"))
    cand = (
        a_pref.join(b_all, "k")
        .filter(F.col("a") != F.col("b"))
        .select("a", "b")
        .distinct()
    )
    sa = shg.select(F.col("doc_id").alias("a"), "s")
    sb = shg.select(F.col("doc_id").alias("b"), "s")
    inter = (
        cand.join(sa, "a")
        .join(sb, ["b", "s"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    za = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sz_a"))
    containment = F.round(F.col("inter") / F.col("sz_a"), 6)
    return (
        inter.join(za, "a")
        .select("a", "b", containment.alias("containment"))
        .filter(F.col("containment") >= threshold)
        .orderBy("a", "b")
    )


def dedup_containment(spark: SparkSession, sf: str) -> DataFrame:
    return containment_pairs(spark, sf)


# Oracle: naive quadratic containment — same result set by definition.
DEDUP_CONTAINMENT_SQL = f"""
    WITH docs AS (
        SELECT doc_id,
               list_distinct(
                 list_transform(
                   range(1, greatest(len(ws) - 3, 1)),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
                        ws[i+3] || ' ' || ws[i+4])) AS shg
        FROM (SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '') AS ws
              FROM documents)
        WHERE len(ws) >= 5
    )
    SELECT a.doc_id AS a, b.doc_id AS b,
           round(len(list_intersect(a.shg, b.shg))::DOUBLE / len(a.shg), 6)
               AS containment
    FROM docs a JOIN docs b ON a.doc_id <> b.doc_id
    WHERE containment >= {CONTAIN_T}
    ORDER BY a, b
"""


# ---------------------------------------------------------------------------
# Normalization-aware exact dedup
# ---------------------------------------------------------------------------


def _norm_text(text):
    """The normalization contract (mirrored verbatim in the oracle):
    lowercase → collapse all whitespace runs to one space → strip
    ASCII punctuation → trim.  Catches the re-encoded/re-wrapped copies
    byte-exact hashing misses (the usual gap between crawl snapshots)."""
    col = F.col(text) if isinstance(text, str) else text
    col = F.lower(col)
    col = F.regexp_replace(col, r"[.!?,;:'\"()\[\]{}-]", "")
    col = F.regexp_replace(col, r"\s+", " ")
    return F.trim(col)


def dedup_exact_norm(spark: SparkSession, sf: str) -> DataFrame:
    """Survivor per NORMALIZED text: min doc_id + copy count + whether the
    group only collapses under normalization (raw_distinct > 1 while the
    normalized hash matches) — the practical dedup_exact upgrade.

    Scale shape: identical to ``dedup_exact`` — the normalization is
    scan-local codegen string work, then one 32-byte-hash shuffle with
    map-side combine; the text never rides the exchange.
    """
    d = t(spark, sf, "documents")
    return (
        d.select(
            "doc_id",
            F.sha2(_norm_text("text"), 256).alias("norm_hash"),
            F.sha2(F.col("text"), 256).alias("raw_hash"),
        )
        .groupBy("norm_hash")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count("*").alias("n_copies"),
            (F.countDistinct("raw_hash") > 1).alias("norm_only"),
        )
        .select("doc_id", "norm_hash", "n_copies", "norm_only")
        .orderBy("doc_id")
    )


DEDUP_EXACT_NORM_SQL = r"""
    SELECT min(doc_id) AS doc_id, norm_hash, count(*) AS n_copies,
           (count(DISTINCT raw_hash) > 1) AS norm_only
    FROM (
        SELECT doc_id,
               sha256(trim(regexp_replace(
                   regexp_replace(lower(text), '[.!?,;:''"()\[\]{}-]', '', 'g'),
                   '\s+', ' ', 'g'))) AS norm_hash,
               sha256(text) AS raw_hash
        FROM documents
    )
    GROUP BY norm_hash
    ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# soft dedup — duplicate-aware sampling weights instead of removal
# ---------------------------------------------------------------------------

def dedup_soft(spark: SparkSession, sf: str) -> DataFrame:
    """SoftDeDup-style reweighting (He et al. 2024): instead of DELETING
    duplicates, score each document's *commonness* — the mean corpus
    document-frequency of its distinct word 3-gram shingles — and emit a
    sampling weight ∝ 1/commonness.  Partially-duplicated documents (boiler-
    plate, template pages) get smoothly down-weighted where binary dedup
    either keeps them at weight 1 or drops them entirely.

    Columns: ``n_shingles`` (distinct 3-grams), ``commonness_p6``
    (round(1e6·mean df)), ``weight_p6`` (round(1e6/mean df)); shingle-less
    short docs default to unique (1.0 / 1.0).

    Scale shape: reuses the shared ``doc_shingles`` mat-view; one
    shingle-key shuffle for the df counts (map-side combinable: the value
    is a count, never text) and one doc_id shuffle for the per-doc sums.
    Both roundings are the pure-BIGINT HALF-UP identity
    ``(2a·1e6 + b) DIV 2b`` — the ``dup_spans`` contract — so the twins are
    bit-identical with no float boundary to split on.
    """
    from event_stream_spark.datapipe.text import doc_shingles

    sh = doc_shingles(spark, sf, 3)
    df_rel = sh.groupBy("s").agg(F.count("*").alias("df"))
    per_doc = (
        sh.join(df_rel, "s")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shingles"), F.sum("df").alias("sum_df"))
    )
    d = t(spark, sf, "documents").select("doc_id")
    return (
        d.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce(
                F.expr(
                    "(sum_df * 2000000 + n_shingles) div (2 * n_shingles)"
                ),
                F.lit(1000000),
            ).cast("long").alias("commonness_p6"),
            F.coalesce(
                F.expr(
                    "(n_shingles * 2000000 + sum_df) div (2 * sum_df)"
                ),
                F.lit(1000000),
            ).cast("long").alias("weight_p6"),
        )
        .orderBy("doc_id")
    )


DEDUP_SOFT_SQL = """
    WITH w AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ws
        FROM documents),
    sh AS (
        SELECT doc_id, unnest(
                 list_distinct(list_transform(range(1, len(ws) - 1),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS s
        FROM w WHERE len(ws) >= 3),
    df AS (SELECT s, count(*) AS df FROM sh GROUP BY s),
    pd AS (SELECT sh.doc_id, count(*) AS n, sum(df.df) AS sum_df
           FROM sh JOIN df USING (s) GROUP BY sh.doc_id)
    SELECT d.doc_id,
           CAST(coalesce(pd.n, 0) AS BIGINT) AS n_shingles,
           CAST(coalesce((pd.sum_df * 2000000 + pd.n) // (2 * pd.n),
                         1000000) AS BIGINT) AS commonness_p6,
           CAST(coalesce((pd.n * 2000000 + pd.sum_df) // (2 * pd.sum_df),
                         1000000) AS BIGINT) AS weight_p6
    FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id
    ORDER BY d.doc_id
"""
