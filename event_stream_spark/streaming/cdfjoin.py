"""CDF-driven JOIN-view maintenance — the bilinear IVM case.

``streaming/cdfview.py`` maintains per-key AGGREGATES from one change
feed; the harder standard case is a two-table join view

    V  =  FACT ⋈ DIM          (equi-join  fact_key = dim_key)

where BOTH tables are snapshot-log tables emitting change feeds.  A
join is bilinear in its inputs, so the exact delta for a microbatch
carrying signed changes ΔF and ΔD is the product rule

    ΔV  =  ΔF ⋈ D_old  ∪  F_old ⋈ ΔD  ∪  ΔF ⋈ ΔD

(the cross term covers rows whose join partners arrive in the SAME
batch) — the classical incremental-view-maintenance result (Blakeley et
al. 1986; the same operator DBSP/differential dataflow derive).  A
delete on either side retracts exactly the joined rows it participated
in, because its signed multiplicity multiplies its partners' stored
multiplicities.

State model: three BAG relations versioned by batch id —

- ``fstate``: distinct fact rows + multiplicity ``m``;
- ``dstate``: distinct dim rows + multiplicity ``m``;
- ``view``:   joined rows (fact cols + dim cols) + multiplicity ``m``.

All merges are union + groupBy (null-safe, unlike join-on-equality), so
rows with NULL non-key columns maintain correctly; NULL JOIN KEYS never
match, exactly like the batch join they mirror.

Idempotence: same scheme as ``cdfview`` — batch ``b`` reads the newest
state triple with id < b, applies its delta, publishes ``v{b}`` by
write-then-atomic-rename; a replayed batch recomputes the identical
triple from the identical predecessor.

Scale shape: every term of the product rule is an EQUI-join on the join
key, and the per-batch work is O(|changes| × fan-out) plus one
O(|view|) merge groupBy — the base tables are never rescanned.  The
side states are exactly the two join inputs, i.e. what any streaming
join must retain; at 100 TB you key the view storage the same way the
join is keyed and the merge shuffles only the delta plus matching
groups.

Reference parity note: the reference has no lakehouse layer; this
extends ``es-kafka``'s at-least-once sink composition
(``KafkaBlockSink.kt:16-38``) with the maintained-view consumer story.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_stream_spark.streaming.cdfview import _ADDS, _RETRACTS

_STATES = ("fstate", "dstate", "view")


def _signed_rows(changes: DataFrame, cols: list[str]) -> DataFrame:
    """Net signed multiplicity per distinct row of ``cols``: inserts and
    update-postimages +1, deletes and update-preimages -1; rows netting
    to zero (an update that didn't touch these columns) drop out."""
    sign = (
        F.when(F.col("_change_type").isin(*_ADDS), F.lit(1))
        .when(F.col("_change_type").isin(*_RETRACTS), F.lit(-1))
        .otherwise(F.lit(0))
    )
    return (
        changes.select(*cols, sign.alias("_s"))
        .groupBy(*cols)
        .agg(F.sum("_s").cast("long").alias("dm"))
        .filter(F.col("dm") != 0)
    )


def _merge_bag(state: DataFrame, delta: DataFrame, cols: list[str]) -> DataFrame:
    """Bag-union a signed delta into a multiplicity relation.  Union +
    groupBy rather than a full-outer join: groupBy groups NULLs together,
    so rows with NULL attribute columns maintain correctly."""
    merged = (
        state.select(*cols, F.col("m"))
        .unionByName(delta.select(*cols, F.col("dm").alias("m")))
        .groupBy(*cols)
        .agg(F.sum("m").cast("long").alias("m"))
    )
    # a consistent feed can only retract what it inserted, so m stays
    # >= 0; filtering on != 0 (not > 0) keeps any inconsistency visible
    # as a negative row instead of silently vanishing
    return merged.filter(F.col("m") != 0)


def _versions(view_dir: str) -> list[int]:
    if not os.path.isdir(view_dir):
        return []
    return sorted(
        int(d[1:])
        for d in os.listdir(view_dir)
        if d.startswith("v") and d[1:].isdigit()
    )


def _read_state(
    spark: SparkSession, view_dir: str, name: str, ids: list[int]
) -> DataFrame | None:
    if ids:
        return spark.read.parquet(
            os.path.join(view_dir, f"v{ids[-1]}", name)
        )
    return None


def read_join_view(
    spark: SparkSession, view_dir: str, *, before: int | None = None
) -> DataFrame | None:
    """The newest published join-view state (optionally newest with id <
    ``before``), or None for a fresh view."""
    ids = [v for v in _versions(view_dir) if before is None or v < before]
    return _read_state(spark, view_dir, "view", ids)


def apply_cdf_join_batch(
    batch: DataFrame,
    batch_id: int,
    view_dir: str,
    *,
    fact_key: str,
    dim_key: str,
    fact_cols: list[str],
    dim_cols: list[str],
) -> None:
    """foreachBatch body: product-rule delta application over a batch of
    tagged change rows (``_side`` ∈ {'f', 'd'}), version-gated like
    ``cdfview.apply_cdf_batch``."""
    spark = batch.sparkSession
    vcols = list(fact_cols) + list(dim_cols)
    ids = [v for v in _versions(view_dir) if v < batch_id]

    def empty(cols: list[str]) -> DataFrame:
        return (
            batch.select(*cols)
            .limit(0)
            .withColumn("m", F.lit(0).cast("long"))
        )

    fstate = _read_state(spark, view_dir, "fstate", ids)
    dstate = _read_state(spark, view_dir, "dstate", ids)
    view = _read_state(spark, view_dir, "view", ids)
    if fstate is None:
        fstate, dstate, view = empty(fact_cols), empty(dim_cols), empty(vcols)

    fdelta = _signed_rows(batch.filter(F.col("_side") == "f"), fact_cols)
    ddelta = _signed_rows(batch.filter(F.col("_side") == "d"), dim_cols)

    on = F.col(fact_key) == F.col(dim_key)
    contrib = lambda a, b: (F.col(a) * F.col(b)).cast("long").alias("dm")  # noqa: E731
    # product rule: ΔF ⋈ D_old  ∪  F_old ⋈ ΔD  ∪  ΔF ⋈ ΔD
    t1 = fdelta.join(dstate, on).select(*vcols, contrib("dm", "m"))
    t2 = fstate.join(ddelta, on).select(*vcols, contrib("m", "dm"))
    t3 = (
        fdelta.withColumnRenamed("dm", "_dmf")
        .join(ddelta.withColumnRenamed("dm", "_dmd"), on)
        .select(*vcols, contrib("_dmf", "_dmd"))
    )
    dview = (
        t1.unionByName(t2)
        .unionByName(t3)
        .groupBy(*vcols)
        .agg(F.sum("dm").cast("long").alias("dm"))
        .filter(F.col("dm") != 0)
    )

    out = {
        "fstate": _merge_bag(fstate, fdelta, fact_cols),
        "dstate": _merge_bag(dstate, ddelta, dim_cols),
        "view": _merge_bag(view, dview, vcols),
    }
    done = os.path.join(view_dir, f"v{batch_id}")
    tmp = os.path.join(view_dir, f".tmp-v{batch_id}")
    shutil.rmtree(tmp, ignore_errors=True)
    for name in _STATES:
        out[name].coalesce(1).write.mode("overwrite").parquet(
            os.path.join(tmp, name)
        )
    # publish the TRIPLE atomically: a crash mid-write leaves only the
    # tmp dir and the replayed batch recomputes from the predecessor
    shutil.rmtree(done, ignore_errors=True)
    os.rename(tmp, done)


def maintain_cdf_join_view(
    spark: SparkSession,
    fact_table: str,
    dim_table: str,
    view_dir: str,
    checkpoint_dir: str,
    *,
    fact_key: str,
    dim_key: str,
):
    """Start (availableNow) the join-view maintenance stream: BOTH
    tables' ``snapcdf`` feeds union into one query (each source keeps
    its own checkpointed offset), so every microbatch carries the signed
    changes of both sides and the product rule applies them together.

    Column names of the two tables must be disjoint (the view carries
    both sides' columns)."""
    os.makedirs(view_dir, exist_ok=True)
    fs = (
        spark.readStream.format("snapcdf")
        .option("table_path", fact_table)
        .load()
    )
    ds = (
        spark.readStream.format("snapcdf")
        .option("table_path", dim_table)
        .load()
    )
    meta = {"_change_type", "_commit_version", "_commit_timestamp"}
    fact_cols = [c for c in fs.columns if c not in meta]
    dim_cols = [c for c in ds.columns if c not in meta]
    overlap = set(fact_cols) & set(dim_cols)
    if overlap:
        raise ValueError(f"fact/dim column names must be disjoint: {overlap}")
    if fact_key not in fact_cols or dim_key not in dim_cols:
        raise ValueError("join keys must be columns of their tables")
    ftypes, dtypes = dict(fs.dtypes), dict(ds.dtypes)
    f_u = fs.select(
        F.lit("f").alias("_side"),
        *[F.col(c) for c in fact_cols],
        *[F.lit(None).cast(dtypes[c]).alias(c) for c in dim_cols],
        F.col("_change_type"),
    )
    d_u = ds.select(
        F.lit("d").alias("_side"),
        *[F.lit(None).cast(ftypes[c]).alias(c) for c in fact_cols],
        *[F.col(c) for c in dim_cols],
        F.col("_change_type"),
    )
    return (
        f_u.unionByName(d_u)
        .writeStream.foreachBatch(
            lambda b, i: apply_cdf_join_batch(
                b,
                i,
                view_dir,
                fact_key=fact_key,
                dim_key=dim_key,
                fact_cols=fact_cols,
                dim_cols=dim_cols,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
