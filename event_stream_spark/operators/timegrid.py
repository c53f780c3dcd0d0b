"""Hypertable-style time-grid resampling: per-key hourly grid with
last-observation-carried-forward (LOCF) and linear interpolation.

Time-series stores (TimescaleDB's ``time_bucket_gapfill`` + ``locf`` +
``interpolate``) treat regular-grid resampling as a core operator; a
training-data pipeline needs the same shape to align irregular event
streams onto a model's fixed time step.  The reference itself only ever
gap-fills the *height* axis (ContiguousFlow.kt:17-30 — integer gaps,
re-fetch to fill); this operator is the event-time generalisation: the
missing grid points are synthesised rather than fetched, and the fill
value comes from neighbouring observations instead of an RPC.

Semantics (shared verbatim by the DuckDB oracle in TIME_GAPFILL_SQL):

- observations are collapsed to one value per (user, ts) via ``max`` so the
  fill is deterministic under same-timestamp collisions;
- each user's grid spans ``date_trunc('hour', min(ts))`` .. ``max(ts)``,
  step 1 hour;
- a grid point coinciding with an observation sorts AFTER it (is_grid
  tiebreak), so LOCF at that instant sees the observation;
- ``locf_value`` = latest observation at-or-before the grid point (null
  before the first observation — leading edge is NOT back-filled);
- ``interp_value`` = linear interpolation between the straddling
  observations; equals ``locf_value`` after the last observation, null
  before the first.

Scale shape: the span aggregate is a per-user partial agg (one narrow
exchange on ``user_id``); ``sequence()`` + ``explode`` synthesise the grid
executor-side with no extra shuffle; the union'd points then take ONE
hash-exchange on ``user_id`` that both window passes (ASC running LOCF,
DESC running next-observation) reuse — the second pass re-sorts within
partitions but never re-exchanges.  Grid
density is bounded by span/step per key, so output is linear in
observations + grid, never key² — the same discipline as the bin-blocked
range join (operators/rangejoin.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_gapfill(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """(key, grid_ts, locf_value, interp_value) — hourly resample of
    ``value`` per key, LOCF- and linearly-interpolated."""
    e = (
        events.select(
            F.col(key).alias("user_id"),
            F.col(ts).alias("ts"),
            F.col(value).alias("value"),
        )
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    span = e.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("mn"),
        F.date_trunc("hour", F.max("ts")).alias("mx"),
    )
    grid = span.select(
        "user_id",
        F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))).alias("ts"),
        F.lit(None).cast("double").alias("value"),
        F.lit(1).alias("is_grid"),
    )
    pts = e.withColumn("is_grid", F.lit(0)).unionByName(grid)

    pre = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_grid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # "next observation at-or-after" as a DESC running frame: the set of rows
    # sorting >= current in (ts, is_grid) ASC equals the rows sorting <=
    # current in DESC, so last-non-null over the DESC running frame is
    # exactly first-non-null over [current, unboundedFollowing] ASC — but
    # executes O(n log n) per key (running frame) where Spark's
    # UnboundedFollowingWindowFunctionFrame re-scans to the partition end
    # per row (quadratic in the densest series).  Same exchange, one extra
    # within-partition sort.
    post = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("is_grid").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_ts = F.when(F.col("value").isNotNull(), F.col("ts"))
    w = pts.select(
        "user_id",
        "ts",
        "is_grid",
        F.last("value", ignorenulls=True).over(pre).alias("locf"),
        F.last(obs_ts, ignorenulls=True).over(pre).alias("locf_ts"),
        F.last("value", ignorenulls=True).over(post).alias("nxt"),
        F.last(obs_ts, ignorenulls=True).over(post).alias("nxt_ts"),
    )
    # identical arithmetic shape to the oracle: locf + (nxt-locf) * (dt/span)
    frac = (F.unix_micros("ts") - F.unix_micros("locf_ts")) / (
        F.unix_micros("nxt_ts") - F.unix_micros("locf_ts")
    ).cast("double")
    interp = (
        F.when(F.col("locf").isNull(), F.lit(None).cast("double"))
        .when(
            F.col("nxt").isNull() | (F.col("nxt_ts") == F.col("locf_ts")),
            F.col("locf"),
        )
        .otherwise(F.col("locf") + (F.col("nxt") - F.col("locf")) * frac)
    )
    return (
        w.filter(F.col("is_grid") == 1)
        .select(
            "user_id",
            F.col("ts").alias("grid_ts"),
            F.round("locf", 6).alias("locf_value"),
            F.round(interp, 6).alias("interp_value"),
        )
        .orderBy("user_id", "grid_ts")
    )


TIME_GAPFILL_SQL = """
    WITH e AS (
        SELECT user_id, ts, max(value) AS value
        FROM events WHERE user_id < 50 GROUP BY user_id, ts
    ),
    span AS (
        SELECT user_id,
               date_trunc('hour', min(ts)) AS mn,
               date_trunc('hour', max(ts)) AS mx
        FROM e GROUP BY user_id
    ),
    grid AS (
        SELECT user_id,
               unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS ts
        FROM span
    ),
    pts AS (
        SELECT user_id, ts, value, 0 AS is_grid FROM e
        UNION ALL
        SELECT user_id, ts, NULL AS value, 1 AS is_grid FROM grid
    ),
    w AS (
        SELECT user_id, ts, is_grid,
               last_value(value IGNORE NULLS) OVER pre AS locf,
               last_value(CASE WHEN value IS NOT NULL THEN ts END IGNORE NULLS)
                   OVER pre AS locf_ts,
               first_value(value IGNORE NULLS) OVER post AS nxt,
               first_value(CASE WHEN value IS NOT NULL THEN ts END IGNORE NULLS)
                   OVER post AS nxt_ts
        FROM pts
        WINDOW pre AS (PARTITION BY user_id ORDER BY ts, is_grid
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               post AS (PARTITION BY user_id ORDER BY ts, is_grid
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, ts AS grid_ts,
           round(locf, 6) AS locf_value,
           round(CASE WHEN locf IS NULL THEN NULL
                      WHEN nxt IS NULL OR nxt_ts = locf_ts THEN locf
                      ELSE locf + (nxt - locf) *
                           ((epoch_us(ts) - epoch_us(locf_ts)) /
                            CAST(epoch_us(nxt_ts) - epoch_us(locf_ts) AS DOUBLE))
                 END, 6) AS interp_value
    FROM w
    WHERE is_grid = 1
    ORDER BY user_id, grid_ts
"""
