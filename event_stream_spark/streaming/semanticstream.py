"""Streaming semantic decontamination: live vectors screened against a
FROZEN eval-embedding set — the stream twin of
``datapipe.similarity.decontaminate_semantic``.

Same decomposition as ``dsirstream``: the eval set is fixed (benchmarks
don't change mid-ingest) and tiny, so each microbatch runs the SAME
``semantic_screen`` operator the registry entry uses against the
broadcast eval relation — batch ≡ stream by construction.  The replay
contract is the ``dedupstream`` ledger: each batch anti-joins the
already-screened output on vec_id, so an at-least-once redelivery (even
with a lost checkpoint) appends nothing — exactly-once per vec_id.

Scale shape: the eval side broadcasts once per microbatch task
(~|eval|×dim floats); screening is map-side + one per-vector max.  No
stream state at all — the eval set is the only cross-batch knowledge,
and it is immutable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def semantic_screen_sink(
    vecs: DataFrame,
    eval_vecs: DataFrame,
    out_path: str,
    checkpoint: str,
):
    """``writeStream`` builder: call ``.start()`` on the result.  ``vecs``
    is a streaming frame with (vec_id, embedding); ``eval_vecs`` the
    frozen eval side as a single ``ev`` array column (the shape
    ``decontaminate_semantic`` derives from the embeddings table);
    screened rows land as parquet at ``out_path`` exactly once per
    vec_id."""
    from event_stream_spark.datapipe.similarity import semantic_screen

    def write_batch(batch_df, _batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        spark = batch_df.sparkSession
        fresh = batch_df
        if os.path.isdir(out_path):
            try:
                seen = spark.read.parquet(out_path).select("vec_id")
                fresh = batch_df.join(seen, "vec_id", "left_anti")
            except AnalysisException:
                pass  # dir exists but no committed footers: screen all
        if fresh.isEmpty():
            return
        semantic_screen(fresh, eval_vecs).write.mode("append").parquet(out_path)

    return (
        vecs.writeStream.foreachBatch(write_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
