"""Streaming PQ-index maintenance — the live twin of ``ann_pq_topk``'s
encode stage, composed with the snapshot log: embedding batches stream in,
each batch PQ-encodes against FROZEN codebooks and lands as one atomic
snapshot-log commit, and probes ADC-score the table of codes.

Contract:

- **Frozen codebooks**: trained once (``datapipe.similarity.pq_codebooks``
  on a seed corpus) and held constant while the stream runs — the same
  frozen-model stance as the DSIR stream twin; retraining is an offline
  job that rebuilds the index (a new table), never a silent drift of the
  code space under live vectors.
- **Exactly-once membership**: each batch anti-joins vec_ids already in
  the table (the table IS the ledger — ``indexstream`` division of labor),
  so transport/checkpoint replays commit nothing.  Because every batch is
  one atomic snapshot commit, the growing index is time-travelable and a
  reader never sees half a batch.
- **Batch ≡ stream parity**: ``ann_from_pq_index`` over the streamed table
  returns EXACTLY what ``ann_pq_topk`` computes inline over the same
  vectors and codebooks (asserted in tests) — the probe is the identical
  literal-LUT ADC scorer, reading M small int columns instead of the
  float embedding.

Scale shape per batch: one row-local Arrow encode kernel + a vec_id-only
anti-join projection + one atomic commit; the probe is scan → codegen LUT
sum → TakeOrdered over rows of M log2(K)-bit codes (64× narrower than the
float column).  At 10¹⁰ vectors the code table is ~40 GB — the in-memory
index the batch operator's docstring promises, maintained incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_stream_spark.datapipe.similarity import (
    PQ_M,
    _adc_expr,
    _pq_codes,
    pq_lut,
)
from event_stream_spark.sources import snaplog

_CODE_COLS = [f"code_{m}" for m in range(PQ_M)]


def pq_encode_batch(batch: DataFrame, codebooks) -> DataFrame:
    """(vec_id, code_0..code_{M-1}) for one batch — the stored index rows."""
    return _pq_codes(batch.select("vec_id", "embedding"), codebooks).select(
        "vec_id", *_CODE_COLS
    )


def pq_index_batch(
    spark: SparkSession, batch: DataFrame, table: str, codebooks
) -> int:
    """One microbatch of PQ-index maintenance: encode, drop vec_ids the
    table already holds, commit the rest atomically.  Returns newly
    indexed vector count (0 commits nothing — a replay is a no-op).
    Usable directly for batch backfills."""
    fresh = batch.dropDuplicates(["vec_id"])
    if snaplog.snapshots(table):
        seen = snaplog.read_snapshot(spark, table).select("vec_id")
        fresh = fresh.join(seen, "vec_id", "left_anti")
    # persist: the count gate and the commit's parquet write would
    # otherwise each run the encode kernel AND the ledger anti-join —
    # 2× the dominant per-batch cost
    codes = pq_encode_batch(fresh, codebooks).persist()
    try:
        n = codes.count()
        if n:
            snaplog.commit(codes, table, mode="append", stats_cols=["vec_id"])
    finally:
        codes.unpersist()
    return n


def pq_index_sink(embeddings: DataFrame, table: str, checkpoint: str, codebooks):
    """``writeStream`` builder: call ``.start()`` on the result.  The
    stream needs (vec_id, embedding) columns."""

    def ingest(batch: DataFrame, _batch_id: int) -> None:
        pq_index_batch(batch.sparkSession, batch, table, codebooks)

    return embeddings.writeStream.foreachBatch(ingest).option(
        "checkpointLocation", checkpoint
    )


def ann_from_pq_index(
    spark: SparkSession,
    table: str,
    query_vec: list[float],
    codebooks,
    *,
    k: int = 10,
    snapshot: int | None = None,
) -> DataFrame:
    """ADC top-k over the streamed code table — same output contract as
    ``ann_pq_topk`` (vec_id, codes, adc_p6), same literal-LUT arithmetic;
    ``snapshot=`` probes a historical index state (time travel)."""
    coded = snaplog.read_snapshot(spark, table, snapshot=snapshot)
    adc = _adc_expr(pq_lut([float(x) for x in query_vec], codebooks))
    return (
        coded.select(
            "vec_id",
            F.concat_ws(",", *_CODE_COLS).alias("codes"),
            F.round(adc * 1e6).cast("long").alias("adc_p6"),
        )
        .orderBy("adc_p6", "vec_id")
        .limit(k)
    )
