"""Driver-witnessable STREAMING end-state: a multi-batch stateful
streaming run whose committed output a batch relation (and a DuckDB
replay of the same algebra) can hash.

The streaming family is pytest-only by nature (batch≡stream equivalence
tests), but its END STATES are plain data.  ``stream_neardup_state``
replays a deterministic 3-microbatch run of the streaming near-dup
detector (``streaming/neardup.py``) over the sf dir's ``documents``
table — batch *i* carries the ``doc_id % 3 == i`` slice, delivered in
order by a file-source with ``maxFilesPerTrigger=1`` — and returns the
collision log the stream committed.  First-claim semantics make the log
a pure function of (content, batch order): per (band, key) bucket the
first claimant is the earliest batch's smallest doc_id, and every later
claimant emits one row per colliding band.  The DuckDB oracle replays
the identical MinHash-LSH banding (the batch family's CTEs, bit-for-bit
the same signatures) plus a window over (batch, doc_id).

Reference parity: extends the reference's streaming surface
(es-core/.../stream — live decode/merge only) with stateful dedup the
way the batch family extends its filters.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_stream_spark.datapipe.dedup import _MINHASH_PAIRS_CTES
from event_stream_spark.datapipe.snapddl import _dir

_NEARDUP_TAG = "v1"


def _build_neardup_state(spark: SparkSession, sf: str) -> str:
    """One-shot fixture: three mtime-ordered parquet files (batch i =
    ``doc_id % 3 == i``), a maxFilesPerTrigger=1 availableNow streaming
    run of ``neardup_collisions`` into an exactly-once parquet sink.
    Refuses to publish unless the run exercised BOTH state behaviors:
    a cross-batch collision (state carried between microbatches) and a
    same-batch collision (within-batch first-claim ordering)."""
    from event_stream_spark.queries import t
    from event_stream_spark.streaming.neardup import neardup_collisions

    root = _dir(sf, "streamneardup", _NEARDUP_TAG)
    marker = os.path.join(root, "_built")
    out = os.path.join(root, "out")
    if os.path.exists(marker):
        return out
    shutil.rmtree(root, ignore_errors=True)
    feed = os.path.join(root, "feed")
    os.makedirs(feed, exist_ok=True)
    docs = t(spark, sf, "documents").select("doc_id", "text")
    now = time.time()
    for i in range(3):
        path = os.path.join(feed, f"batch-{i}.parquet")
        pdf = (
            docs.filter(F.col("doc_id") % 3 == i)
            .orderBy("doc_id")
            .toPandas()
        )
        pdf.to_parquet(path, index=False)
        # oldest-first file-source pickup order IS the batch order
        os.utime(path, (now - 30 + i * 10, now - 30 + i * 10))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = (
        neardup_collisions(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.read.parquet(out).collect()
    cross = [r for r in got if r.first_doc_id % 3 != r.doc_id % 3]
    same = [r for r in got if r.first_doc_id % 3 == r.doc_id % 3]
    if not cross or not same:
        shutil.rmtree(root, ignore_errors=True)
        raise RuntimeError(
            "neardup stream fixture proved nothing: "
            f"{len(cross)} cross-batch / {len(same)} same-batch collisions"
        )
    with open(marker, "w") as fh:
        fh.write(_NEARDUP_TAG)
    return out


def stream_neardup_state(spark: SparkSession, sf: str) -> DataFrame:
    """The committed collision log of the deterministic 3-batch streaming
    near-dup run: one row per (later doc, band) whose LSH bucket an
    earlier arrival claimed — state carried ACROSS microbatches."""
    out = _build_neardup_state(spark, sf)
    return (
        spark.read.parquet(out)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("band_id").cast("int").alias("band_id"),
            F.col("first_doc_id").cast("long").alias("first_doc_id"),
        )
        .orderBy("doc_id", "band_id")
    )


STREAM_NEARDUP_SQL = f"""
WITH {_MINHASH_PAIRS_CTES},
arr AS (
    SELECT doc_id, band_id, band_key, doc_id % 3 AS batch FROM bands
),
firsts AS (
    SELECT doc_id, band_id,
           FIRST_VALUE(doc_id) OVER (
             PARTITION BY band_id, band_key ORDER BY batch, doc_id
           ) AS first_doc_id
    FROM arr
)
SELECT doc_id, CAST(band_id AS INT) AS band_id, first_doc_id
FROM firsts WHERE doc_id <> first_doc_id
ORDER BY doc_id, band_id
"""
