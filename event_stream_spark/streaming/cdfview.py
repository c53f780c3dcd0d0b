"""CDF-driven MATERIALIZED VIEW maintenance — the consumer story
``snaplog.read_changes`` / ``format("snapcdf")`` exists to serve.

A downstream aggregate (per-key count + sum) maintains itself from the
change feed instead of recomputing from the table: inserts and
update-postimages ADD their contribution, deletes and update-preimages
RETRACT theirs — so the view stays correct through append, merge-upsert,
row deletes, and overwrite commits, and a compaction (data_change=False)
contributes zero feed rows and zero view work.  This is the standard
incremental-view-maintenance (IVM) delta algebra over a CDC stream —
Delta Lake's readChangeFeed → MERGE pattern, expressed over the repo's
own snapshot log.

Idempotence (foreachBatch is at-least-once): view states are VERSIONED
BY BATCH ID — batch ``b`` reads the newest state with id < b, applies its
delta, and publishes state ``b`` via write-then-atomic-rename.  A batch
replayed after a crash recomputes the identical state from the identical
predecessor and re-publishes it — exactly-once effect on the view.

Scale shape: the per-batch delta is one partial-agg shuffle over the
batch's change rows (O(changes)); the merge touches O(|view|) rows of a
small aggregate relation, never the base table.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: change types that add a row's contribution vs retract it
_ADDS = ("insert", "update_postimage")
_RETRACTS = ("delete", "update_preimage")


def cdf_delta(changes: DataFrame, key: str, val: str) -> DataFrame:
    """Signed per-key delta of a change-row batch: (key, dn, dv) where
    ``dn`` is the net row-count change and ``dv`` the net value change."""
    sign = (
        F.when(F.col("_change_type").isin(*_ADDS), F.lit(1))
        .when(F.col("_change_type").isin(*_RETRACTS), F.lit(-1))
        .otherwise(F.lit(0))
    )
    return (
        changes.select(
            F.col(key).alias("k"),
            sign.alias("_s"),
            (sign * F.col(val)).alias("_sv"),
        )
        .groupBy("k")
        .agg(
            F.sum("_s").cast("long").alias("dn"),
            F.sum("_sv").cast("long").alias("dv"),
        )
    )


def apply_delta(view: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge a signed delta into the (k, n, total) view relation; groups
    whose count reaches zero leave the view."""
    merged = view.join(delta, "k", "full_outer").select(
        "k",
        (F.coalesce(F.col("n"), F.lit(0)) + F.coalesce(F.col("dn"), F.lit(0)))
        .cast("long")
        .alias("n"),
        (
            F.coalesce(F.col("total"), F.lit(0))
            + F.coalesce(F.col("dv"), F.lit(0))
        )
        .cast("long")
        .alias("total"),
    )
    return merged.filter(F.col("n") > 0)


def _versions(view_dir: str) -> list[int]:
    if not os.path.isdir(view_dir):
        return []
    return sorted(
        int(d[1:]) for d in os.listdir(view_dir)
        if d.startswith("v") and d[1:].isdigit()
    )


def read_view(spark: SparkSession, view_dir: str, *, before: int | None = None) -> DataFrame:
    """The newest published view state (optionally: newest with id <
    ``before``), or an empty typed relation for a fresh view."""
    ids = [v for v in _versions(view_dir) if before is None or v < before]
    if ids:
        return spark.read.parquet(os.path.join(view_dir, f"v{ids[-1]}"))
    return spark.createDataFrame([], "k long, n long, total long")


def apply_cdf_batch(
    batch: DataFrame, batch_id: int, view_dir: str, *, key: str, val: str
) -> None:
    """foreachBatch body: version-gated delta application (see module
    doc for the replay-idempotence argument)."""
    spark = batch.sparkSession
    done = os.path.join(view_dir, f"v{batch_id}")
    tmp = os.path.join(view_dir, f".tmp-v{batch_id}")
    prev = read_view(spark, view_dir, before=batch_id)
    new = apply_delta(prev, cdf_delta(batch, key, val))
    shutil.rmtree(tmp, ignore_errors=True)
    new.coalesce(1).write.mode("overwrite").parquet(tmp)
    # publish atomically: a crash mid-write leaves only the tmp dir, and
    # the replayed batch recomputes from the same predecessor
    shutil.rmtree(done, ignore_errors=True)
    os.rename(tmp, done)


def maintain_cdf_view(
    spark: SparkSession,
    table: str,
    view_dir: str,
    checkpoint_dir: str,
    *,
    key: str,
    val: str,
):
    """Start (availableNow) the maintenance stream: snapcdf source →
    per-batch IVM delta into the versioned view.  Returns the query."""
    os.makedirs(view_dir, exist_ok=True)
    changes = (
        spark.readStream.format("snapcdf").option("table_path", table).load()
    )
    return (
        changes.writeStream.foreachBatch(
            lambda b, i: apply_cdf_batch(b, i, view_dir, key=key, val=val)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
