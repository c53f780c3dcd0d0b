"""Driver-witnessable CHANGE DATA FEED proof: a deterministic DML script
over a snapshot-log table, read back through :func:`snaplog.read_changes`
and hash-checked against a DuckDB replay of the same commit algebra —
change-apply ≡ snapshot-diff as a driver-green relation, not just pytest.

The script (all derived from the sf dir's ``documents`` table, so every
run at a given sf rebuilds byte-identical logical history):

* snapshot 0 — append keys ``doc_id % 3 == 0`` (before the feed window:
  ``read_changes(since=0)`` covers commits AFTER 0);
* snapshot 1 — append keys ``doc_id % 3 == 1``;
* snapshot 2 — ``merge_upsert(change_feed=True)``: updates ``% 6 == 0``
  (val + 1000, all existing → update_preimage/postimage pairs) plus
  inserts ``% 3 == 2 AND % 2 == 0`` (new keys → insert rows);
* snapshot 3 — ``delete_where_dv("doc_id % 10 = 7", change_feed=True)``
  (deletion-vector delete; the recorded change relation carries the
  POST-MERGE values, which is what the oracle's state replay checks).

Reference parity: the reference streams block-level changes as typed
events (es-core BlockSource semantics); this is the lakehouse analogue —
Delta Lake's ``table_changes`` protocol shape (CDC sidecars + commit
versions) built on the repo's own snapshot log (sources/snaplog.py).
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: bump to invalidate previously built table dirs when the script changes
_BUILD_TAG = "v1"


def _table_dir(sf: str) -> str:
    from event_stream_spark.datapipe.fixutil import fixture_key

    key = fixture_key(sf)
    return os.path.join("/tmp", f"es_snapchanges_{_BUILD_TAG}_{key}")


def _build(spark: SparkSession, sf: str) -> str:
    """Idempotent: a completed build (4 snapshots + done marker) is
    reused — the history is a pure function of (script version, sf), so
    re-reads hash identically whether rebuilt or not."""
    from event_stream_spark.queries import t
    from event_stream_spark.sources import snaplog

    table = _table_dir(sf)
    marker = os.path.join(table, "_built")
    if os.path.exists(marker) and snaplog.snapshots(table) == [0, 1, 2, 3]:
        return table
    shutil.rmtree(table, ignore_errors=True)
    base = t(spark, sf, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("val")
    )
    snaplog.commit(
        base.filter(F.col("doc_id") % 3 == 0), table, stats_cols=["doc_id"]
    )
    snaplog.commit(
        base.filter(F.col("doc_id") % 3 == 1), table, stats_cols=["doc_id"]
    )
    upd = base.filter(F.col("doc_id") % 6 == 0).withColumn(
        "val", F.col("val") + 1000
    )
    new = base.filter((F.col("doc_id") % 3 == 2) & (F.col("doc_id") % 2 == 0))
    snaplog.merge_upsert(
        spark, table, upd.unionByName(new), key="doc_id",
        stats_cols=["doc_id"], change_feed=True,
    )
    snaplog.delete_where_dv(
        spark, table, "doc_id % 10 = 7", change_feed=True
    )
    with open(marker, "w") as fh:
        fh.write(_BUILD_TAG)
    return table


def snap_changes(spark: SparkSession, sf: str) -> DataFrame:
    """The full change feed of the scripted table, projected to its
    deterministic columns (commit timestamps are wall-clock and excluded)
    in a total order."""
    from event_stream_spark.sources import snaplog

    table = _build(spark, sf)
    return (
        snaplog.read_changes(spark, table, since=0)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("val").cast("long").alias("val"),
            "_change_type",
            F.col("_commit_version").alias("_commit_version"),
        )
        .orderBy("_commit_version", "doc_id", "_change_type")
    )


#: DuckDB replay of the same commit algebra: state2 reconstructs the
#: post-merge table (kept-original ∪ updated ∪ inserted) so the delete
#: branch checks the feed's preserved post-merge values.
SNAP_CHANGES_SQL = """
WITH base AS (
    SELECT doc_id, CAST(n_chars AS BIGINT) AS val FROM documents
),
new AS (
    SELECT doc_id, val FROM base WHERE doc_id % 3 = 2 AND doc_id % 2 = 0
),
state2 AS (
    SELECT doc_id,
           CASE WHEN doc_id % 6 = 0 THEN val + 1000 ELSE val END AS val
    FROM base WHERE doc_id % 3 IN (0, 1)
    UNION ALL
    SELECT doc_id, val FROM new
),
feed AS (
    SELECT doc_id, val, 'insert' AS _change_type,
           CAST(1 AS BIGINT) AS _commit_version
    FROM base WHERE doc_id % 3 = 1
    UNION ALL
    SELECT doc_id, val, 'update_preimage', 2
    FROM base WHERE doc_id % 6 = 0
    UNION ALL
    SELECT doc_id, val + 1000, 'update_postimage', 2
    FROM base WHERE doc_id % 6 = 0
    UNION ALL
    SELECT doc_id, val, 'insert', 2 FROM new
    UNION ALL
    SELECT doc_id, val, 'delete', 3 FROM state2 WHERE doc_id % 10 = 7
)
SELECT doc_id, val, _change_type, _commit_version
FROM feed
ORDER BY _commit_version, doc_id, _change_type
"""


#: separate build dir: the restore script has its own history
_RESTORE_TAG = "v1"


def _restore_table_dir(sf: str) -> str:
    from event_stream_spark.datapipe.fixutil import fixture_key

    key = fixture_key(sf)
    return os.path.join("/tmp", f"es_snaprestore_{_RESTORE_TAG}_{key}")


def _build_restore(spark: SparkSession, sf: str) -> str:
    """Deterministic contract-and-rollback script:

    * snap 0 — append keys ``doc_id % 3 IN (0, 1)``;
    * snap 1 — ``set_constraint("val >= 0")`` (metadata commit);
    * snap 2 — ``merge_upsert``: ``% 6 == 0`` gets val+1000, keys
      ``% 3 == 2 AND % 2 == 0`` insert;
    * (blocked) — an upsert writing ``val = -5`` MUST raise
      ConstraintViolation and leave no snapshot;
    * snap 3 — ``delete_where_dv("doc_id % 10 = 7")``;
    * snap 4 — ``restore(to=2)``: resurrects the deleted rows,
      re-validating the constraint on the restored state.
    """
    from event_stream_spark.queries import t
    from event_stream_spark.sources import snaplog

    table = _restore_table_dir(sf)
    marker = os.path.join(table, "_built")
    if os.path.exists(marker) and snaplog.snapshots(table) == [0, 1, 2, 3, 4]:
        return table
    shutil.rmtree(table, ignore_errors=True)
    base = t(spark, sf, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("val")
    )
    snaplog.commit(
        base.filter(F.col("doc_id") % 3 < 2), table, stats_cols=["doc_id"]
    )
    snaplog.set_constraint(spark, table, "val_pos", "val >= 0")
    upd = base.filter(F.col("doc_id") % 6 == 0).withColumn(
        "val", F.col("val") + 1000
    )
    new = base.filter((F.col("doc_id") % 3 == 2) & (F.col("doc_id") % 2 == 0))
    snaplog.merge_upsert(
        spark, table, upd.unionByName(new), key="doc_id", stats_cols=["doc_id"]
    )
    try:
        snaplog.merge_upsert(
            spark,
            table,
            base.filter(F.col("doc_id") % 6 == 3).withColumn(
                "val", F.lit(-5).cast("long")
            ),
            key="doc_id",
        )
    except snaplog.ConstraintViolation:
        pass  # the contract held — required for the script to proceed
    else:
        raise RuntimeError(
            "constraint did NOT block the violating merge — snap_restore "
            "refuses to publish a green-looking history"
        )
    snaplog.delete_where_dv(spark, table, "doc_id % 10 = 7")
    snaplog.restore(spark, table, 2)
    with open(marker, "w") as fh:
        fh.write(_RESTORE_TAG)
    return table


def snap_restore(spark: SparkSession, sf: str) -> DataFrame:
    """Final state after the contract-and-rollback script, each row joined
    to its ORIGINAL value via a time-travel read of snapshot 0 (inserted
    keys surface NULL) — one relation proving: the restore resurrected the
    DV-deleted rows, the CHECK constraint blocked the bad merge, and
    history stayed time-travelable through all of it."""
    from event_stream_spark.sources import snaplog

    table = _build_restore(spark, sf)
    cur = snaplog.read_snapshot(spark, table)
    orig = snaplog.read_snapshot(spark, table, snapshot=0).select(
        "doc_id", F.col("val").alias("val_orig")
    )
    return (
        cur.join(orig, "doc_id", "left")
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("val").cast("long").alias("val"),
            F.col("val_orig").cast("long").alias("val_orig"),
        )
        .orderBy("doc_id")
    )


#: DuckDB replay: the restored state IS the post-merge state (snap 2) —
#: the delete must be invisible and the blocked merge absent.
SNAP_RESTORE_SQL = """
WITH base AS (
    SELECT doc_id, CAST(n_chars AS BIGINT) AS val FROM documents
)
SELECT doc_id,
       CAST(CASE WHEN doc_id % 6 = 0 THEN val + 1000 ELSE val END
            AS BIGINT) AS val,
       CAST(val AS BIGINT) AS val_orig
FROM base WHERE doc_id % 3 IN (0, 1)
UNION ALL
SELECT doc_id, CAST(val AS BIGINT), CAST(NULL AS BIGINT)
FROM base WHERE doc_id % 3 = 2 AND doc_id % 2 = 0
ORDER BY doc_id
"""


def snap_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Driver-witnessed manifest statistics (round-9): per snapshot of the
    snapchanges fixture, the row counts the MANIFESTS ALONE report —
    recorded rows, DV-deleted rows, live rows — cross-checked against the
    oracle recomputing the same script's state arithmetic in SQL.  This
    is the layer ``read_snapshot(plan_stats=True)`` trusts for first-run
    broadcast decisions (zero Spark jobs, zero file scans), so its
    correctness deserves a driver witness, not just a plan gate: a wrong
    live count silently mis-plans joins at 100 TB.

    Snapshot 3 is the interesting row: the DV delete leaves recorded rows
    UNCHANGED while deleted_rows goes positive — exactly the divergence
    between Spark's static raw-size estimate and the manifest's live
    view."""
    from event_stream_spark.sources.snaplog import (
        _read_manifest,
        entries_stats,
        snapshots,
    )

    table = _build(spark, sf)
    rows = []
    for n in snapshots(table):
        st = entries_stats(_read_manifest(table, n)["files"])
        rows.append((n, st["rows"], st["live_rows"], st["deleted_rows"]))
    return spark.createDataFrame(
        rows, "snapshot long, rows long, live_rows long, deleted_rows long"
    ).orderBy("snapshot")


SNAP_STATS_SQL = """
WITH d AS (SELECT doc_id FROM documents),
s0 AS (SELECT CAST(COUNT(*) AS BIGINT) n FROM d WHERE doc_id % 3 = 0),
s1 AS (SELECT CAST(COUNT(*) AS BIGINT) n FROM d WHERE doc_id % 3 IN (0, 1)),
state2 AS (
    SELECT doc_id FROM d
    WHERE doc_id % 3 IN (0, 1) OR (doc_id % 3 = 2 AND doc_id % 2 = 0)
),
s2 AS (SELECT CAST(COUNT(*) AS BIGINT) n FROM state2),
dv AS (SELECT CAST(COUNT(*) AS BIGINT) n FROM state2 WHERE doc_id % 10 = 7)
SELECT 0 AS snapshot, s0.n AS rows, s0.n AS live_rows,
       CAST(0 AS BIGINT) AS deleted_rows FROM s0
UNION ALL
SELECT 1, s1.n, s1.n, CAST(0 AS BIGINT) FROM s1
UNION ALL
SELECT 2, s2.n, s2.n, CAST(0 AS BIGINT) FROM s2
UNION ALL
SELECT 3, s2.n, s2.n - dv.n, dv.n FROM s2, dv
ORDER BY snapshot
"""
