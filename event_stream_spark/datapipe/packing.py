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
