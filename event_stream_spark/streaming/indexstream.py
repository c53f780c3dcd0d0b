"""Streaming inverted-index maintenance — the live twin of ``bm25_topk``'s
materialized posting list (``datapipe/retrieval.py``).

Crawl batches stream in; each batch tokenizes its documents (the shared
``datapipe/text.py`` contract), drops documents already indexed, and
appends their (doc_id, term, tf) postings to a bucket-partitioned parquet
index.  Probing the live index with :func:`bm25_from_index` returns
EXACTLY what the batch ``score_postings`` scorer returns over the same
corpus — the batch≡stream parity contract every streaming twin in this
repo carries (rollup, anomaly, heavy hitters, corpus ingest).

Contract:

- **exactly-once postings**: each batch anti-joins the distinct doc_ids
  already IN the postings lake, so transport/checkpoint replays append
  nothing — at-least-once delivery + id anti-join = exactly-once index
  membership, the ``dedupstream.py`` division of labor.  The lake itself
  is the ledger (single source of truth): there is no separate seen-ids
  table whose write could land out of step with the postings write and
  open a duplicate-on-replay window.  Spark's parquet commit protocol
  cleans partial files from a failed append, so "doc_id visible in the
  lake" and "its postings landed" coincide.
- **term-bucketed layout**: postings land in ``bucket = pmod(xxhash64
  (term), 64)`` partition dirs, so a query-term probe prunes to its
  buckets at PLAN time (the same prune-before-read stance as the block /
  IVF / corpus lakes).  At 100 TB per-bucket files are periodically
  compacted (``sources/eventlake.py::compact_event_lake`` shape), and the
  seen-ids anti-join probe reads a doc_id-only column projection.

Scale shape per batch: tokenize + one (doc_id, term) partial-agg shuffle
over the BATCH only; the ledger anti-join reads a doc_id-only projection
(AQE broadcasts while small, runtime bloom above that); the append is one
parquet job.  Nothing ever re-touches the existing index rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

INDEX_BUCKETS = 64


def _postings(batch: DataFrame, text_col: str = "text") -> DataFrame:
    from event_stream_spark.datapipe.text import word_rows

    return (
        word_rows(batch, text_col)
        .groupBy("doc_id", F.col("w").alias("term"))
        .agg(F.count("*").alias("tf"))
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(INDEX_BUCKETS)))
    )


def index_batch(
    spark: SparkSession, batch: DataFrame, index_path: str, *, text_col: str = "text"
) -> int:
    """One microbatch of index maintenance; returns newly indexed doc
    count.  Usable directly for batch backfills."""
    docs = batch.select("doc_id", text_col).dropDuplicates(["doc_id"])
    lake = f"{index_path}/postings"
    if os.path.isdir(lake):
        seen = spark.read.parquet(lake).select("doc_id").distinct()
        docs = docs.join(seen, "doc_id", "left_anti")
    # token-less docs produce no postings, so they can never enter the
    # lake-ledger; count only docs that actually index (they are harmlessly
    # re-examined on replay, never re-written — there is nothing to write)
    postings = _postings(docs, text_col)
    fresh = postings.select("doc_id").distinct().count()
    if fresh:
        postings.write.mode("append").partitionBy("bucket").parquet(lake)
    return fresh


def posting_index_sink(
    docs: DataFrame, index_path: str, checkpoint: str, *, text_col: str = "text"
):
    """``writeStream`` builder: call ``.start()`` on the result."""

    def ingest(batch: DataFrame, _batch_id: int) -> None:
        index_batch(batch.sparkSession, batch, index_path, text_col=text_col)

    return docs.writeStream.foreachBatch(ingest).option(
        "checkpointLocation", checkpoint
    )


def read_postings(spark: SparkSession, index_path: str) -> DataFrame:
    return spark.read.parquet(f"{index_path}/postings").select(
        "doc_id", "term", "tf"
    )


def bm25_from_index(
    spark: SparkSession,
    index_path: str,
    *,
    queries: list[tuple[int, str]],
    k: int | None = None,
) -> DataFrame:
    """BM25 top-k against the incrementally-maintained index — the shared
    ``score_postings`` scorer (which derives ALL corpus stats from the
    postings), so results are identical to the batch ``bm25_topk`` over the
    same corpus, including corpora with token-less docs (invisible to both
    paths by the shared N = docs-with-tokens definition)."""
    from event_stream_spark.datapipe.retrieval import BM25_TOPK, score_postings

    return score_postings(
        spark,
        read_postings(spark, index_path),
        queries=queries,
        k=BM25_TOPK if k is None else k,
    )
