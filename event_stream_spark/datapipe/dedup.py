"""Deduplication operators over the ``documents`` / ``embeddings`` tables.

Five dedup families, each designed scale-first:

- exact       : hash-groupBy — one shuffle on a 32-byte key, no text movement
                after the hash projection (column pruning keeps text at the scan)
- minhash LSH : shingle → k min-hashes → band keys → bucket join → verify.
                Candidate generation is |bands| exploded rows per doc joined on
                the band key — at 100 TB this is THE standard near-dup sweep
                (the verify join only touches candidate pairs, never n²)
- simhash     : 32-bit majority-bit signature; candidates via 4×8-bit block
                pigeonhole (hamming ≤ 3 ⇒ some block equal), verified by
                bit_count(xor) — again never n²
- n-gram jaccard : exact word-set jaccard for pairs (bounded corpora /
                verification tier; the LSH families are the scale path)
- embedding cosine : near-dup by vector similarity (threshold on cosine)

All JVM-side column expressions; md5-hex min-hash keeps the DuckDB oracle
exactly replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_stream_spark.datapipe.text import lsh_bands, minhash_signature, shingles, words
from event_stream_spark.datapipe.vector import cosine
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

def _doc_shingles(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    return d.select(
        "doc_id", shingles(words(F.col("text"))).alias("shg")
    ).filter(F.size("shg") > 0)


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
    docs = _doc_shingles(spark, sf)
    sig = docs.select(
        "doc_id", "shg", minhash_signature(F.col("shg"), bands * rows).alias("sig")
    )
    exploded = sig.select(
        "doc_id",
        F.posexplode(lsh_bands(F.col("sig"), bands, rows)).alias("band_id", "band_key"),
    )
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
    sa = docs.select(F.col("doc_id").alias("a"), F.col("shg").alias("shg_a"))
    sb = docs.select(F.col("doc_id").alias("b"), F.col("shg").alias("shg_b"))
    inter = F.size(F.array_intersect("shg_a", "shg_b"))
    union = F.size("shg_a") + F.size("shg_b") - inter
    return (
        cand.join(sa, "a")
        .join(sb, "b")
        .select("a", "b", F.round(inter / union, 6).alias("jacc"))
        .filter(F.col("jacc") >= threshold)
        .orderBy("a", "b")
    )


def dedup_minhash(spark: SparkSession, sf: str) -> DataFrame:
    return minhash_lsh_pairs(spark, sf, threshold=0.5)


# The full minhash pipeline restated in DuckDB SQL (same md5-based hashes,
# same banding) — the oracle replays candidate generation AND verification.
DEDUP_MINHASH_SQL = """
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
    sigs AS (
        SELECT doc_id, shg,
               list_transform(range(16),
                 s -> list_min(list_transform(shg, x -> md5(s::varchar || '|' || x)))) AS sig
        FROM docs
    ),
    bands AS (
        SELECT doc_id, b.band_id,
               array_to_string(sig[b.band_id*4+1 : b.band_id*4+4], '') AS band_key
        FROM sigs, (SELECT unnest(range(4)) AS band_id) b
    ),
    cand AS (
        SELECT DISTINCT e1.doc_id AS a, e2.doc_id AS b
        FROM bands e1 JOIN bands e2
          ON e1.band_id = e2.band_id AND e1.band_key = e2.band_key
         AND e1.doc_id < e2.doc_id
    )
    SELECT a, b,
           round(len(list_intersect(da.shg, db.shg))::DOUBLE /
                 (len(da.shg) + len(db.shg) - len(list_intersect(da.shg, db.shg))), 6) AS jacc
    FROM cand
    JOIN docs da ON da.doc_id = a
    JOIN docs db ON db.doc_id = b
    WHERE jacc >= 0.5
    ORDER BY a, b
"""


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def _word_hash32(w):
    """First 8 md5 hex chars as a 32-bit int — portable to DuckDB."""
    return F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long")


def simhash_col(ws):
    """32-bit simhash: bit b set iff a strict majority of distinct words have
    bit b set in their 32-bit hash."""
    hashes = F.transform(F.array_distinct(ws), _word_hash32)
    nwords = F.size(hashes)
    bit = lambda b: F.when(
        F.size(F.filter(hashes, lambda h: h.bitwiseAND(F.lit(1 << b)) != 0)) * 2
        > nwords,
        F.lit(1 << b).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    out = F.lit(0).cast("long")
    for b in range(32):
        out = out + bit(b)
    return out


def dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc 32-bit simhash signature (the dedup key for hamming-distance
    bucketing)."""
    d = t(spark, sf, "documents")
    return (
        d.select("doc_id", simhash_col(words(F.col("text"))).alias("simhash"))
        .orderBy("doc_id")
    )


DEDUP_SIMHASH_SQL = """
    WITH w AS (
        SELECT doc_id,
               list_distinct(list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x <> '')) AS ws
        FROM documents
    ),
    h AS (
        SELECT doc_id,
               list_transform(ws, x -> ('0x' || substring(md5(x), 1, 8))::BIGINT) AS hs,
               len(ws) AS n
        FROM w
    )
    SELECT doc_id,
           list_sum(list_transform(range(0, 32),
             b -> CASE WHEN 2 * len(list_filter(hs, x -> (x >> b) & 1 = 1)) > n
                       THEN (1::BIGINT << b) ELSE 0 END))::BIGINT AS simhash
    FROM h ORDER BY doc_id
"""


def simhash_near_pairs(
    spark: SparkSession, sf: str, *, max_hamming: int = 3
) -> DataFrame:
    """Candidate pairs by 4×8-bit block pigeonhole, verified by hamming ≤ k.

    hamming(a,b) ≤ 3 with 4 blocks ⇒ at least one block identical, so an
    equi-join per block finds every true pair without an n² compare.
    """
    d = t(spark, sf, "documents")
    sh = d.select("doc_id", simhash_col(words(F.col("text"))).alias("simhash"))
    blocks = sh.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), 8 * i).bitwiseAND(F.lit(0xFF))
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


# ---------------------------------------------------------------------------
# word-set jaccard (exact pairwise tier)
# ---------------------------------------------------------------------------

def dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Exact word-set jaccard ≥ 0.5 over all pairs (a < b).

    Quadratic by construction — the verification tier for bounded corpora;
    use minhash_lsh_pairs for the at-scale sweep."""
    d = t(spark, sf, "documents").select(
        "doc_id", F.array_distinct(words(F.col("text"))).alias("ws")
    )
    a = d.select(F.col("doc_id").alias("a"), F.col("ws").alias("wa"))
    b = d.select(F.col("doc_id").alias("b"), F.col("ws").alias("wb"))
    inter = F.size(F.array_intersect("wa", "wb"))
    union = F.size("wa") + F.size("wb") - inter
    return (
        a.join(b, F.col("a") < F.col("b"))
        .select("a", "b", F.round(inter / union, 6).alias("jacc"))
        .filter(F.col("jacc") >= 0.5)
        .orderBy("a", "b")
    )


DEDUP_NGRAM_JACCARD_SQL = """
    WITH w AS (
        SELECT doc_id,
               list_distinct(list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x <> '')) AS ws
        FROM documents
    )
    SELECT a.doc_id AS a, b.doc_id AS b,
           round(len(list_intersect(a.ws, b.ws))::DOUBLE /
                 (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))), 6) AS jacc
    FROM w a JOIN w b ON a.doc_id < b.doc_id
    WHERE jacc >= 0.5
    ORDER BY a, b
"""


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def dedup_embedding(spark: SparkSession, sf: str) -> DataFrame:
    """Pairs with cosine ≥ 0.4 (double math both sides; see vector.py)."""
    e = t(spark, sf, "embeddings")
    a = e.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    sim = cosine(F.col("va"), F.col("vb"))
    return (
        a.join(b, F.col("a") < F.col("b"))
        .select("a", "b", F.round(sim, 6).alias("sim"))
        .filter(F.col("sim") >= 0.4)
        .orderBy("a", "b")
    )


DEDUP_EMBEDDING_SQL = """
    SELECT a.vec_id AS a, b.vec_id AS b,
           round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE sim >= 0.4
    ORDER BY a, b
"""
