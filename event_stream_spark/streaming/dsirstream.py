"""Streaming DSIR scoring: live documents scored against a FROZEN bucket
model — the stream twin of ``datapipe.corpusops.dsir_weights``.

The importance-resampling recipe splits cleanly across the batch/stream
boundary: the model (1024 (b, lr_p6) rows) is fit ONCE over the reference
corpus in batch and frozen; scoring is per-document arithmetic against
that constant-size relation, so a stream of incoming documents scores in
``foreachBatch`` with the SAME ``dsir_score`` operator the registry entry
uses — batch ≡ stream by construction, not by reimplementation.

Replay contract (the ``dedupstream`` corpus-membership semantics): each
microbatch anti-joins the already-scored output on doc_id before scoring,
so an at-least-once replay after a crash — even with a lost checkpoint —
appends nothing new: exactly-once per doc_id.

Scale shape: the model broadcasts to every microbatch task; scoring is
map-side + one per-doc integer sum; the anti-join probes the scored lake
on its key.  Nothing stateful lives in the stream — the model is the only
cross-batch knowledge, and it is immutable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def dsir_scoring_sink(
    docs: DataFrame,
    model: DataFrame,
    out_path: str,
    checkpoint: str,
):
    """``writeStream`` builder: call ``.start()`` on the result.  ``docs``
    is a streaming frame with (doc_id, text, …); ``model`` the frozen
    (b, lr_p6) relation from ``dsir_model``; scored rows land as parquet
    at ``out_path`` exactly once per doc_id."""
    from event_stream_spark.datapipe.corpusops import dsir_score

    def write_batch(batch_df, _batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        spark = batch_df.sparkSession
        fresh = batch_df
        if os.path.isdir(out_path):
            try:
                seen = spark.read.parquet(out_path).select("doc_id")
                fresh = batch_df.join(seen, "doc_id", "left_anti")
            except AnalysisException:
                # the directory exists but holds no committed parquet
                # footers (crash before the first file landed, or a
                # pre-created dir): nothing scored yet — score everything
                pass
        if fresh.isEmpty():
            return
        dsir_score(fresh, model).write.mode("append").parquet(out_path)

    return (
        docs.writeStream.foreachBatch(write_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
