"""Date-partitioned event lake: the at-rest layout for the analytics-side
``events`` stream at 100 TB.

The block lake (``sources/blocks.py``) buckets by height; the analytics
tables are time-keyed, so the standard cluster layout is daily partition
directories:

- ``event_date=YYYY-MM-DD/`` partition dirs → every time-ranged query
  (sessions, funnels, cohorts, range joins) prunes to its date span at
  PLAN time — a one-week query over a 10-year lake touches 7/3650 of the
  files before a single row is read;
- within a partition, rows are written sorted by ``(user_id, ts)`` so
  min/max row-group statistics make per-user probes skip row groups
  (poor-man's z-order for the two dominant predicates);
- writes are idempotent per partition (``partitionOverwriteMode=dynamic``):
  re-running an ingest day replaces exactly that day, the same contract as
  the hourly rollup maintenance job (``streaming/rollup.py``).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_event_lake(events: DataFrame, path: str) -> None:
    """Idempotent daily-partitioned writer; within-partition sort by
    (user_id, ts) for row-group stat pruning on user probes."""
    (
        events.withColumn("event_date", F.to_date("ts"))
        .repartition("event_date")
        .sortWithinPartitions("user_id", "ts")
        .write.mode("overwrite")
        # per-write option, NOT a session conf mutation: other overwrites in
        # the same session keep their static-overwrite semantics
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_date")
        .parquet(path)
    )


def read_event_lake(
    spark: SparkSession,
    path: str,
    from_date: str | dt.date | None = None,
    to_date: str | dt.date | None = None,
) -> DataFrame:
    """Range scan: the ``event_date`` predicates are partition filters
    (pruned at plan time, verified by ``tests/test_plans.py``); ``ts`` stays
    available for row-level pushdown within the touched days."""
    df = spark.read.parquet(path)
    if from_date is not None:
        df = df.filter(F.col("event_date") >= F.lit(str(from_date)))
    if to_date is not None:
        df = df.filter(F.col("event_date") <= F.lit(str(to_date)))
    return df
