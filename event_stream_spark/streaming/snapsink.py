"""Exactly-once streaming appends INTO a snapshot-log table.

``foreachBatch`` is at-least-once: after a crash between the sink write and
the checkpoint commit, Structured Streaming re-runs the last microbatch, and
a naive append would publish its rows twice.  Delta solves this with writer
transactions (``txnAppId``/``txnVersion``); the snapshot log implements the
same primitive (``snaplog.commit(txn=...)``): every commit stamps a
per-writer monotone version into the manifest, a replayed version is
recognized and skipped, and the map rides every later manifest so the
guarantee survives unrelated commits, compaction, and restarts.

Scale shape: the sink adds zero shuffles (each microbatch's partitions
write directly as snapshot files); the txn map costs O(writers) bytes per
manifest.  With ``change_feed=True`` each batch also records its exact
insert relation, so a downstream ``format("snapcdf")`` consumer
(``streaming/cdfview.py``) maintains aggregates at O(changes) — the full
lakehouse loop: stream in, stream out, both exactly-once.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def snap_append_writer(
    table: str,
    *,
    app_id: str,
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
    change_feed: bool = False,
    compact_every: int | None = None,
    compact_target_files: int = 4,
    compact_zorder_by: list[str] | None = None,
) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` function appending each microbatch to ``table``
    as one snapshot commit, idempotent on (app_id, batch_id) replay.

    ``compact_every=N`` runs the maintenance compaction
    (``snaplog.compact``) inline after every Nth batch: streaming ingest
    accretes one file set per microbatch, and at 100 TB the small-file
    tax (per-file open cost, manifest growth, stats dilution) compounds
    until reads are metadata-bound — this bounds live file count at
    roughly ``files_per_batch * N + compact_target_files``.  The
    compaction commit is row-identical and ``data_change=False``, so CDF
    consumers skip it (no synthetic churn), and it is safe under replay:
    a re-run batch skips its append (txn ledger) and at worst re-compacts
    an already-compacted layout.  ``compact_zorder_by`` makes each pass a
    clustering rewrite (OPTIMIZE ZORDER) so file-level min/max stats stay
    tight on the named dimensions as the table grows."""
    from event_stream_spark.sources.snaplog import commit, compact

    def write(batch_df: DataFrame, batch_id: int) -> None:
        cdc = (
            batch_df.withColumn("_change_type", F.lit("insert"))
            if change_feed
            else None
        )
        commit(
            batch_df,
            table,
            mode="append",
            stats_cols=stats_cols,
            bloom_cols=bloom_cols,
            cdc=cdc,
            txn=(app_id, batch_id),
        )
        if compact_every and (batch_id + 1) % compact_every == 0:
            compact(
                batch_df.sparkSession,
                table,
                target_files=compact_target_files,
                stats_cols=stats_cols,
                bloom_cols=bloom_cols,
                zorder_by=compact_zorder_by,
            )

    return write


def stream_into_snaptable(
    stream: DataFrame,
    table: str,
    checkpoint: str,
    *,
    app_id: str | None = None,
    trigger_available_now: bool = True,
    **writer_kwargs,
) -> StreamingQuery:
    """Wire a streaming DataFrame into a snapshot-log table.

    ``app_id`` defaults to the table path — correct when exactly one
    streaming query feeds the table; pass an explicit id per query when
    several do (each gets its own replay watermark).
    """
    writer = snap_append_writer(
        table, app_id=app_id or f"stream:{table}", **writer_kwargs
    )
    w = stream.writeStream.foreachBatch(writer).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
