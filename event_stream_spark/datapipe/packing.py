"""Sequence packing: assign documents to fixed-token-budget training
sequences (the "concat-then-chunk" packing every LM pretraining pipeline
runs after cleaning/dedup).

Documents are concatenated in deterministic order (doc_id) within a
(lang, shard) stratum and the token stream is cut into SEQ_LEN-token
sequences; each doc reports the sequence index its first token lands in
and its offset within that sequence.

Scale shape: the cumulative token sum is a window partitioned by
(lang, shard) — NOT a global window — so packing parallelizes across
strata at any corpus size; each stratum is an independent sequential
scan, which is inherent to contiguous packing (a doc's position depends
on every doc before it *within its shard only*).  At 100 TB you raise
SHARDS so each stratum fits an executor's scan; sharding by
``doc_id % SHARDS`` keeps assignment deterministic and replayable.
Token counts reuse the whitespace-word contract of ``text.words`` /
``textstats.text_tokens`` so the DuckDB oracle mirrors it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from event_stream_spark.datapipe.text import words
from event_stream_spark.queries import t

SEQ_LEN = 512  # tokens per packed training sequence
SHARDS = 4  # parallel packing strata per language


def seq_pack(spark: SparkSession, sf: str) -> DataFrame:
    """Per doc: its (lang, shard) packing stratum, whitespace token count,
    the packed-sequence index its first token falls in, and the offset of
    that token within the sequence."""
    d = t(spark, sf, "documents")
    base = d.select(
        "doc_id",
        "lang",
        (F.col("doc_id") % SHARDS).alias("shard"),
        F.size(words(F.col("text"))).cast("long").alias("n_tokens"),
    )
    win = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(win) - F.col("n_tokens")
    return base.select(
        "doc_id",
        "lang",
        "shard",
        "n_tokens",
        F.floor(start / SEQ_LEN).cast("long").alias("seq_ix"),
        (start % SEQ_LEN).cast("long").alias("seq_offset"),
    ).orderBy("doc_id")


SEQ_PACK_SQL = f"""
    WITH w AS (
        SELECT doc_id, lang,
               doc_id % {SHARDS} AS shard,
               len(list_filter(string_split_regex(lower(text), '\\s+'),
                               x -> x <> ''))::BIGINT AS n_tokens
        FROM documents),
    c AS (
        SELECT *,
               sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - n_tokens AS start
        FROM w)
    SELECT doc_id, lang, shard, n_tokens,
           (start // {SEQ_LEN})::BIGINT AS seq_ix,
           (start % {SEQ_LEN})::BIGINT AS seq_offset
    FROM c ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Document chunking (RAG / long-context preprocessing)
# ---------------------------------------------------------------------------

CHUNK_SIZE = 32  # tokens per chunk
CHUNK_STRIDE = 24  # chunk start spacing (CHUNK_SIZE - CHUNK_STRIDE overlap)


def chunk_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Split each document into overlapping fixed-token chunks — the
    standard RAG-indexing / long-context windowing pass.  Chunk ``i`` covers
    tokens ``[i·stride, i·stride + size)``; the tail chunk may be short.

    Scale shape: zero shuffles — tokenize, generate chunk starts
    (``sequence`` stepped by stride), explode, ``slice`` the word array —
    all narrow per-row array expressions in codegen.  Output order is the
    natural (doc_id, chunk_id); the ORDER BY here is presentation-only and
    absent from the production pipeline.
    """
    d = t(spark, sf, "documents")
    ws = words(F.col("text"))
    starts = F.when(
        F.size(ws) > 0,
        F.sequence(F.lit(0), F.size(ws) - 1, F.lit(CHUNK_STRIDE)),
    ).otherwise(F.expr("array()").cast("array<int>"))
    c = d.select(
        "doc_id", ws.alias("ws"), F.explode(starts).alias("start")
    )
    chunk = F.slice(F.col("ws"), F.col("start") + 1, CHUNK_SIZE)
    return c.select(
        "doc_id",
        (F.col("start") / CHUNK_STRIDE).cast("int").alias("chunk_id"),
        F.size(chunk).alias("n_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    ).orderBy("doc_id", "chunk_id")


CHUNK_DOCS_SQL = f"""
    WITH w AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ws
        FROM documents),
    c AS (
        SELECT doc_id, ws, unnest(range(0, len(ws), {CHUNK_STRIDE})) AS start
        FROM w WHERE len(ws) > 0)
    SELECT doc_id,
           (start // {CHUNK_STRIDE})::INT AS chunk_id,
           len(ws[start + 1 : start + {CHUNK_SIZE}])::INT AS n_tokens,
           array_to_string(ws[start + 1 : start + {CHUNK_SIZE}], ' ') AS chunk_text
    FROM c
    ORDER BY doc_id, chunk_id
"""
