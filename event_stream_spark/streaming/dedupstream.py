"""Streaming incremental corpus dedup — the live twin of
``datapipe.webops.dedup_incremental``: crawl batches stream in, each batch
dedups within itself and against everything already accepted, and only
fresh documents append to the corpus.

Contract (the training-data ingest shape):

- **within-batch**: keep-first by (hash, doc_id) — deterministic winner.
- **cross-batch**: md5(normalized text) anti-join against the corpus built
  so far; a document ever accepted is never accepted again.
- **replay-safe**: transport/checkpoint replays are absorbed — a replayed
  batch's hashes are already in the corpus, so the anti-join drops every
  row and the append is a no-op.  At-least-once delivery + content-hash
  anti-join = exactly-once corpus membership, the same division of labor
  as the block path's height dedup (F5, MultiplexFlow.kt:142-145).

Scale shape: the per-batch work is (batch ⋈ corpus-hashes) — the corpus
side is a hash-only projection (parquet column pruning reads just the 32-
byte hash column), AQE broadcasts it while small, and Spark's runtime
bloom filter pre-filters the probe above the broadcast threshold.  At
100 TB the corpus-hash projection becomes a maintained hash table in a
table format (Iceberg/Delta MERGE); the per-batch plan is identical.
Appends use one parquet job per batch; a crash between the append and the
checkpoint commit replays the batch into a no-op (see replay test).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _hashed(batch: DataFrame, text_col: str) -> DataFrame:
    return batch.withColumn("h", F.md5(F.lower(F.trim(text_col))))


def ingest_batch(
    spark: SparkSession, batch: DataFrame, corpus_path: str, *, text_col: str = "text"
) -> int:
    """One microbatch of the incremental-dedup ingest; returns accepted
    row count.  Usable directly for batch backfills too."""
    hashed = _hashed(batch, text_col)
    keep = hashed.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    fresh = hashed.join(keep, ["h", "doc_id"])  # within-batch keep-first
    if os.path.isdir(corpus_path):
        existing = (
            spark.read.parquet(corpus_path).select("h").distinct()
        )
        fresh = fresh.join(existing, "h", "left_anti")
    accepted = fresh.count()
    if accepted:
        fresh.write.mode("append").parquet(corpus_path)
    return accepted


def corpus_ingest_sink(
    docs: DataFrame,
    corpus_path: str,
    checkpoint: str,
    *,
    text_col: str = "text",
):
    """``writeStream`` builder: call ``.start()`` on the result.  ``docs``
    needs (doc_id, <text_col>, ...) columns; all input columns plus ``h``
    land in the corpus."""

    def ingest(batch: DataFrame, _batch_id: int) -> None:
        ingest_batch(batch.sparkSession, batch, corpus_path, text_col=text_col)

    return docs.writeStream.foreachBatch(ingest).option(
        "checkpointLocation", checkpoint
    )


def snap_ingest_batch(
    spark: SparkSession, batch: DataFrame, table: str, *, text_col: str = "text"
) -> int:
    """One microbatch of the SNAPSHOT-COMMITTING incremental ingest: same
    dedup contract as :func:`ingest_batch`, but accepted rows land as ONE
    atomic snapshot (``sources/snaplog.py``) instead of a bare parquet
    append — so readers get snapshot isolation over the growing corpus,
    each microbatch is a time-travelable version, and a crash mid-write
    leaves orphan data files no reader ever sees.  Replays still collapse
    to no-ops via the hash anti-join against the LATEST snapshot, and a
    no-op ingest commits nothing (no empty snapshots)."""
    from event_stream_spark.sources.snaplog import commit, read_snapshot, snapshots

    hashed = _hashed(batch, text_col)
    keep = hashed.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    fresh = hashed.join(keep, ["h", "doc_id"])
    if snapshots(table):
        existing = read_snapshot(spark, table).select("h").distinct()
        fresh = fresh.join(existing, "h", "left_anti")
    accepted = fresh.count()
    if accepted:
        commit(fresh, table, mode="append")
    return accepted


def corpus_snapshot_ingest_sink(
    docs: DataFrame, table: str, checkpoint: str, *, text_col: str = "text"
):
    """``writeStream`` builder for the snapshot-committing ingest."""

    def ingest(batch: DataFrame, _batch_id: int) -> None:
        snap_ingest_batch(batch.sparkSession, batch, table, text_col=text_col)

    return docs.writeStream.foreachBatch(ingest).option(
        "checkpointLocation", checkpoint
    )
