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
        # the sort MUST lead with the partition column: FileFormatWriter
        # requires its output ordered by partition columns and silently
        # re-sorts by [event_date] alone (unstably!) when it is not —
        # which would destroy the (user_id, ts) file order this layout
        # promises (caught by test_event_lake_compaction's monotone check)
        .sortWithinPartitions("event_date", "user_id", "ts")
        .write.mode("overwrite")
        # per-write option, NOT a session conf mutation: other overwrites in
        # the same session keep their static-overwrite semantics
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_date")
        .parquet(path)
    )


def compact_event_lake(spark: SparkSession, path: str) -> None:
    """Small-file compaction — the maintenance job every long-lived lake
    needs: streaming ingest (microbatch appends) and repeated per-day
    overwrites leave each partition with many small files, and at 100 TB
    file-count, not bytes, is what kills scan planning (one task + one
    footer per file).

    Rewrites every partition to one file (hash-repartition on event_date —
    days compact in parallel, one task each; a day too big for one file
    would add a salt column to the repartition, same as the writer would),
    preserving the lake's contracts: daily dirs, within-file (user_id, ts)
    sort for row-group stat pruning, and row-for-row content equality.
    Spark can't
    overwrite a path it is reading, so the compacted copy lands in a
    sibling temp dir first and partition dirs are swapped in afterwards —
    per-partition, so a crash mid-swap leaves each day either old or new,
    never mixed (the same per-partition idempotence contract as the
    writer).  On a real cluster the swap step is the table format's commit
    (Iceberg/Delta rewrite-files); the read→rewrite plan is identical.
    """
    import os
    import shutil

    tmp = path.rstrip("/") + "__compacting"
    df = spark.read.parquet(path)
    (
        df.repartition("event_date")
        # leading event_date keeps FileFormatWriter from injecting its own
        # unstable partition-column sort (see write_event_lake)
        .sortWithinPartitions("event_date", "user_id", "ts")
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(tmp)
    )
    for entry in sorted(os.listdir(tmp)):
        if not entry.startswith("event_date="):
            continue
        dst = os.path.join(path, entry)
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        shutil.move(os.path.join(tmp, entry), dst)
    shutil.rmtree(tmp, ignore_errors=True)


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
