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


# ---------------------------------------------------------------------------
# CDF-maintained VIEW end-state (VERDICT r10 #5): an IVM run over the
# snapshot log's change feed — including an OVERWRITE retraction step —
# whose final published view a DuckDB replay of the head lineage hashes.
# ---------------------------------------------------------------------------

_CDFVIEW_TAG = "v1"


def _build_cdf_view_state(spark: SparkSession, sf: str) -> str:
    """One-shot fixture: a snapshot-log table driven through a scripted
    DML run — insert, merge-upsert (update + insert), row delete, an
    OVERWRITE (full retraction + fresh contribution), append, and a
    second upsert over duplicate-id rows — then ``maintain_cdf_view``
    (availableNow, ``streaming/cdfview.py``) maintains a per-``k``
    (count, sum) aggregate purely from the ``snapcdf`` change feed.

    Publish-guards (the negative cases must FIRE or the fixture proves
    nothing): the feed must contain retraction rows from the overwrite
    version, and the final view must DIFFER from an adds-only replay —
    i.e. mishandled retractions would change the answer."""
    from event_stream_spark.queries import t
    from event_stream_spark.sources.snaplog import (
        commit,
        delete_where,
        merge_upsert,
        read_changes,
    )
    from event_stream_spark.streaming.cdfview import (
        maintain_cdf_view,
        read_view,
    )

    root = _dir(sf, "streamcdfview", _CDFVIEW_TAG)
    marker = os.path.join(root, "_built")
    view = os.path.join(root, "view")
    if os.path.exists(marker):
        return view
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    table = os.path.join(root, "tbl")
    docs = t(spark, sf, "documents").select(
        F.col("doc_id").alias("id"),
        (F.col("doc_id") % 20).alias("k"),
        F.length("text").cast("long").alias("v"),
    )
    # the scripted run (each step derives deterministically from the
    # documents table, so a SQL oracle can replay the head lineage)
    commit(docs.filter("id % 4 IN (0, 1)"), table)
    merge_upsert(
        spark, table,
        docs.filter("id % 8 = 0").withColumn("v", F.col("v") + 1000)
        .unionByName(docs.filter("id % 4 = 2")),
        key="id",
    )
    delete_where(spark, table, "k = 3")
    # RETRACTION: overwrite drops every surviving contribution and
    # contributes a fresh relation
    commit(
        docs.filter("id % 5 = 0").withColumn("v", F.col("v") * 2),
        table, mode="overwrite",
    )
    commit(docs.filter("id % 4 = 3"), table, mode="append")
    # ids % 10 == 5 exist TWICE by now (overwrite row + appended row
    # when id % 4 == 3): the upsert must collapse both into one
    merge_upsert(
        spark, table,
        docs.filter("id % 10 = 5").withColumn("v", F.col("v") + 50),
        key="id",
    )

    from event_stream_spark.sources import snapstream

    snapstream.register(spark)  # the snapcdf python data source
    q = maintain_cdf_view(
        spark, table, view, os.path.join(root, "ckpt"), key="k", val="v"
    )
    q.awaitTermination(300)

    feed = read_changes(spark, table, since=-1)
    n_retract = feed.filter(
        F.col("_change_type").isin("delete", "update_preimage")
        & (F.col("_commit_version") == 3)
    ).count()
    adds_only = (
        feed.filter(F.col("_change_type").isin("insert", "update_postimage"))
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("total"))
    )
    final = read_view(spark, view)
    differs = (
        final.join(adds_only, "k", "full_outer")
        .filter(
            (F.coalesce(final["n"], F.lit(-1)) != F.coalesce(adds_only["n"], F.lit(-1)))
            | (F.coalesce(final["total"], F.lit(-1)) != F.coalesce(adds_only["total"], F.lit(-1)))
        )
        .count()
    )
    if n_retract == 0 or differs == 0:
        shutil.rmtree(root, ignore_errors=True)
        raise RuntimeError(
            "cdf view fixture proved nothing: "
            f"{n_retract} overwrite retraction rows, "
            f"{differs} keys where retractions changed the view"
        )
    with open(marker, "w") as fh:
        fh.write(_CDFVIEW_TAG)
    return view


def stream_cdf_view_state(spark: SparkSession, sf: str) -> DataFrame:
    """Final published state of the CDF-maintained (count, sum) view
    after the scripted DML run — retractions (row deletes, upsert
    preimages, and a full OVERWRITE) applied through the IVM delta
    algebra, versions published exactly-once per microbatch."""
    from event_stream_spark.streaming.cdfview import read_view

    view = _build_cdf_view_state(spark, sf)
    return (
        read_view(spark, view)
        .select(
            F.col("k").cast("long").alias("k"),
            F.col("n").cast("long").alias("n"),
            F.col("total").cast("long").alias("total"),
        )
        .orderBy("k")
    )


#: the IVM algebra is exact, so the final view is a pure function of the
#: head lineage: overwrite content, plus the post-overwrite append, with
#: the second upsert collapsing every matched id (incl. duplicate rows)
STREAM_CDF_VIEW_SQL = """
WITH base AS (
    SELECT doc_id AS id, doc_id % 20 AS k,
           CAST(LENGTH(text) AS BIGINT) AS v
    FROM documents
),
s3 AS (SELECT id, k, v * 2 AS v FROM base WHERE id % 5 = 0),
s4 AS (
    SELECT * FROM s3
    UNION ALL
    SELECT id, k, v FROM base WHERE id % 4 = 3
),
s5 AS (
    SELECT * FROM s4 WHERE id % 10 <> 5
    UNION ALL
    SELECT id, k, v + 50 AS v FROM base WHERE id % 10 = 5
)
SELECT k, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS total
FROM s5 GROUP BY k ORDER BY k
"""
