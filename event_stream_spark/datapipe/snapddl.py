"""Driver-witnessable proofs for the round-8 lakehouse features:
COLUMN MAPPING (rename/drop as metadata commits), INCREMENTAL
JOIN-VIEW MAINTENANCE over dual change feeds, and DATA BRANCHES
(create/diverge/three-way merge with conflict detection).

Like ``snapchanges.py``, each entry replays a deterministic DML script
derived from the sf dir's ``documents`` table (marker-guarded fixture
build; rebuilds produce byte-identical logical history) and returns a
relation a DuckDB replay of the same algebra must hash-match.

Reference parity: the reference has no lakehouse layer; these extend
its exactly-once sink composition (es-kafka KafkaBlockSink.kt:16-38)
with the schema-evolution and maintained-view consumer stories.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_RENAME_TAG = "v1"
_JOIN_TAG = "v1"


def _dir(sf: str, kind: str, tag: str) -> str:
    from event_stream_spark.datapipe.fixutil import fixture_key

    key = fixture_key(sf)
    return os.path.join("/tmp", f"es_{kind}_{tag}_{key}")


# ---------------------------------------------------------------------------
# snap_rename — column mapping through a rename/drop/re-add script
# ---------------------------------------------------------------------------


def _build_rename(spark: SparkSession, sf: str) -> str:
    """Script (snapshots 0-5):

    * 0 — append ``% 3 == 0`` as (doc_id, val, lang);
    * 1 — append ``% 3 == 1``;
    * 2 — ``rename_column(val -> chars)`` — METADATA ONLY;
    * 3 — append ``% 3 == 2`` under the NEW name, chars = val + 5;
    * 4 — ``drop_column(lang)``;
    * 5 — append ``% 9 == 2`` keys (shifted by 10M — disjoint) RE-ADDING
      ``lang`` with fresh values — the dropped bytes must NOT resurface.
    """
    from event_stream_spark.queries import t
    from event_stream_spark.sources import snaplog

    table = _dir(sf, "snaprename", _RENAME_TAG)
    marker = os.path.join(table, "_built")
    if os.path.exists(marker) and snaplog.snapshots(table) == list(range(6)):
        return table
    shutil.rmtree(table, ignore_errors=True)
    base = t(spark, sf, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("val"), "lang"
    )
    snaplog.commit(
        base.filter(F.col("doc_id") % 3 == 0), table, stats_cols=["doc_id"]
    )
    snaplog.commit(
        base.filter(F.col("doc_id") % 3 == 1), table, mode="append",
        stats_cols=["doc_id"],
    )
    snaplog.rename_column(spark, table, "val", "chars")
    snaplog.commit(
        base.filter(F.col("doc_id") % 3 == 2).select(
            "doc_id", (F.col("val") + 5).alias("chars"), "lang"
        ),
        table, mode="append", stats_cols=["doc_id"],
    )
    snaplog.drop_column(spark, table, "lang")
    snaplog.commit(
        base.filter(F.col("doc_id") % 9 == 2).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.col("val").alias("chars"),
            F.concat(F.lit("re-"), F.col("lang")).alias("lang"),
        ),
        table, mode="append", allow_added_columns=True,
    )
    with open(marker, "w") as fh:
        fh.write(_RENAME_TAG)
    return table


def snap_rename(spark: SparkSession, sf: str) -> DataFrame:
    """Final state of the rename/drop/re-add script, each row joined to
    the PRE-RENAME snapshot 1 via time travel UNDER ITS OLD NAME — one
    relation proving: new reads use the new names, old snapshots keep
    theirs, the re-added ``lang`` is NULL for every pre-drop row (the
    dropped bytes stayed buried), and appends under both eras landed."""
    from event_stream_spark.sources import snaplog

    table = _build_rename(spark, sf)
    cur = snaplog.read_snapshot(spark, table)
    t1 = snaplog.read_snapshot(spark, table, snapshot=1).select(
        "doc_id", F.col("val").alias("val_t1")  # the OLD logical name
    )
    return (
        cur.join(t1, "doc_id", "left")
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("chars").cast("long").alias("chars"),
            "lang",
            F.col("val_t1").cast("long").alias("val_t1"),
        )
        .orderBy("doc_id")
    )


SNAP_RENAME_SQL = """
WITH base AS (
    SELECT doc_id, CAST(n_chars AS BIGINT) AS val, lang FROM documents
),
cur AS (
    SELECT doc_id, val AS chars, CAST(NULL AS VARCHAR) AS lang
    FROM base WHERE doc_id % 3 IN (0, 1)
    UNION ALL
    SELECT doc_id, val + 5, CAST(NULL AS VARCHAR)
    FROM base WHERE doc_id % 3 = 2
    UNION ALL
    SELECT doc_id + 10000000, val, 're-' || lang
    FROM base WHERE doc_id % 9 = 2
),
t1 AS (SELECT doc_id, val FROM base WHERE doc_id % 3 IN (0, 1))
SELECT c.doc_id, CAST(c.chars AS BIGINT) AS chars, c.lang,
       CAST(t1.val AS BIGINT) AS val_t1
FROM cur c LEFT JOIN t1 USING (doc_id)
ORDER BY c.doc_id
"""


# ---------------------------------------------------------------------------
# snap_join_view — IVM of fact ⋈ dim from both tables' change feeds
# ---------------------------------------------------------------------------


def _build_join_view(spark: SparkSession, sf: str) -> str:
    """Two scripted tables plus an incrementally maintained join view.

    fact (id, fk, v): snap 0 appends ``% 3 == 0``; snap 1 appends
    ``% 3 == 1`` PLUS a re-append of ``% 30 == 0`` (multiplicity 2);
    snap 2 DV-deletes ``id % 10 = 7``.
    dim (pk, attr): snap 0 appends pk = distinct(doc_id % 7) with
    attr 'a'||pk; snap 1 merge-updates even pks to 'b'||pk; snap 2
    deletes pk = 3 (removing its join partners).

    The view applies each table's change feed ONE COMMIT PER BATCH,
    interleaved (f0, d0, f1, d1, f2, d2) through
    ``cdfjoin.apply_cdf_join_batch`` — the exact product-rule deltas the
    streaming maintainer runs, minus the engine scheduling, so the
    result is deterministic and oracle-checkable."""
    from event_stream_spark.queries import t
    from event_stream_spark.sources import snaplog
    from event_stream_spark.streaming.cdfjoin import apply_cdf_join_batch

    root = _dir(sf, "snapjoinview", _JOIN_TAG)
    marker = os.path.join(root, "_built")
    if os.path.exists(marker):
        return root
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    fact = os.path.join(root, "fact")
    dim = os.path.join(root, "dim")
    view = os.path.join(root, "view")
    os.makedirs(view)

    base = t(spark, sf, "documents").select(
        F.col("doc_id").alias("id"),
        (F.col("doc_id") % 7).alias("fk"),
        F.col("n_chars").cast("long").alias("v"),
    )
    snaplog.commit(base.filter(F.col("id") % 3 == 0), fact)
    snaplog.commit(
        base.filter(F.col("id") % 3 == 1).unionByName(
            base.filter(F.col("id") % 30 == 0)
        ),
        fact, mode="append",
    )
    snaplog.delete_where_dv(spark, fact, "id % 10 = 7", change_feed=True)

    pks = base.select(F.col("fk").alias("pk")).distinct()
    snaplog.commit(
        pks.select("pk", F.concat(F.lit("a"), F.col("pk")).alias("attr")),
        dim,
    )
    snaplog.merge_upsert(
        spark, dim,
        pks.filter(F.col("pk") % 2 == 0).select(
            "pk", F.concat(F.lit("b"), F.col("pk")).alias("attr")
        ),
        key="pk", change_feed=True,
    )
    snaplog.delete_where(spark, dim, "pk = 3", change_feed=True)

    def tagged(table: str, v: int, side: str) -> DataFrame:
        ch = snaplog.read_changes(spark, table, since=v - 1, until=v)
        if side == "f":
            return ch.select(
                F.lit("f").alias("_side"), "id", "fk", "v",
                F.lit(None).cast("long").alias("pk"),
                F.lit(None).cast("string").alias("attr"),
                "_change_type",
            )
        return ch.select(
            F.lit("d").alias("_side"),
            F.lit(None).cast("long").alias("id"),
            F.lit(None).cast("long").alias("fk"),
            F.lit(None).cast("long").alias("v"),
            "pk", "attr", "_change_type",
        )

    kw = dict(
        fact_key="fk", dim_key="pk",
        fact_cols=["id", "fk", "v"], dim_cols=["pk", "attr"],
    )
    batch_id = 0
    for v in range(3):  # interleave: both sides advance per round
        for side, table in (("f", fact), ("d", dim)):
            apply_cdf_join_batch(
                tagged(table, v, side), batch_id, view, **kw
            )
            batch_id += 1
    with open(marker, "w") as fh:
        fh.write(_JOIN_TAG)
    return root


def snap_join_view(spark: SparkSession, sf: str) -> DataFrame:
    """The maintained join view after the dual-feed DML script — the IVM
    invariant (view ≡ batch join of the final states, with bag
    multiplicities) as a driver-green relation."""
    from event_stream_spark.streaming.cdfjoin import read_join_view

    root = _build_join_view(spark, sf)
    v = read_join_view(spark, os.path.join(root, "view"))
    return v.select(
        F.col("id").cast("long").alias("id"),
        F.col("fk").cast("long").alias("fk"),
        F.col("v").cast("long").alias("v"),
        F.col("pk").cast("long").alias("pk"),
        "attr",
        F.col("m").cast("long").alias("m"),
    ).orderBy("id", "pk")


SNAP_JOIN_VIEW_SQL = """
WITH base AS (
    SELECT doc_id AS id, doc_id % 7 AS fk,
           CAST(n_chars AS BIGINT) AS v
    FROM documents
),
fact AS (
    SELECT id, fk, v FROM base WHERE id % 3 = 0
    UNION ALL
    SELECT id, fk, v FROM base WHERE id % 3 = 1
    UNION ALL
    SELECT id, fk, v FROM base WHERE id % 30 = 0
),
live AS (SELECT * FROM fact WHERE id % 10 <> 7),
dim AS (
    SELECT pk,
           CASE WHEN pk % 2 = 0 THEN 'b' || pk ELSE 'a' || pk END AS attr
    FROM (SELECT DISTINCT fk AS pk FROM base)
    WHERE pk <> 3
)
SELECT CAST(f.id AS BIGINT) AS id, CAST(f.fk AS BIGINT) AS fk, f.v,
       CAST(d.pk AS BIGINT) AS pk, d.attr, COUNT(*)::BIGINT AS m
FROM live f JOIN dim d ON f.fk = d.pk
GROUP BY f.id, f.fk, f.v, d.pk, d.attr
ORDER BY id, pk
"""


# ---------------------------------------------------------------------------
# snap_branch — branch / diverge / merge, with conflict detection witnessed
# ---------------------------------------------------------------------------

_BRANCH_TAG = "v1"


def _build_branch(spark: SparkSession, sf: str) -> str:
    """Deterministic branch-and-merge script:

    * main snap 0 — append ``doc_id % 3 == 0`` as (doc_id, val);
    * branch "exp" cut at snap 0; ON THE BRANCH: ``delete_where
      (doc_id % 9 == 0)`` (copy-on-write rewrite of the base file),
      then append ``% 3 == 1`` with val + 5000;
    * main moves independently: append ``% 3 == 2`` with val + 7000;
    * ``merge_branch(exp)`` — three-way merge lands the branch's delete
      AND appends onto the moved main;
    * (blocked) — a second branch "bad" ALSO cut at snap 0 that deletes
      from the same base file must raise MergeConflict after the first
      merge rewrote it; the fixture refuses to publish otherwise.
    """
    from event_stream_spark.queries import t
    from event_stream_spark.sources import snaplog
    from event_stream_spark.sources.snapbranch import (
        MergeConflict,
        create_branch,
        merge_branch,
    )

    table = _dir(sf, "snapbranch", _BRANCH_TAG)
    marker = os.path.join(table, "_built")
    if os.path.exists(marker) and snaplog.snapshots(table) == [0, 1, 2]:
        return table
    shutil.rmtree(table, ignore_errors=True)
    shutil.rmtree(table + "@exp", ignore_errors=True)
    shutil.rmtree(table + "@bad", ignore_errors=True)
    base = t(spark, sf, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("val")
    )
    snaplog.commit(base.filter(F.col("doc_id") % 3 == 0), table)
    bt = create_branch(table, "exp")
    create_branch(table, "bad")
    snaplog.delete_where(spark, bt, "doc_id % 9 = 0")
    snaplog.commit(
        base.filter(F.col("doc_id") % 3 == 1).withColumn(
            "val", F.col("val") + 5000
        ),
        bt,
    )
    snaplog.commit(
        base.filter(F.col("doc_id") % 3 == 2).withColumn(
            "val", F.col("val") + 7000
        ),
        table,
    )
    merge_branch(spark, table, "exp")
    snaplog.delete_where(spark, table + "@bad", "doc_id % 9 = 3")
    try:
        merge_branch(spark, table, "bad")
    except MergeConflict:
        pass  # required: the base file was rewritten by the first merge
    else:
        raise RuntimeError(
            "merge conflict did NOT fire — snap_branch refuses to publish "
            "a green-looking history"
        )
    with open(marker, "w") as fh:
        fh.write(_BRANCH_TAG)
    return table


def snap_branch(spark: SparkSession, sf: str) -> DataFrame:
    """Driver-witnessed branch/merge proof: the post-merge main state —
    branch-deleted keys absent, branch appends present (+5000), main's
    independent appends present (+7000) — with the pre-merge main head
    joined per key so the hash also pins what main looked like BEFORE the
    merge (the isolation claim).  The conflicting second merge must have
    raised for this relation to exist at all."""
    from event_stream_spark.sources import snaplog

    table = _build_branch(spark, sf)
    cur = snaplog.read_snapshot(spark, table)
    pre = snaplog.read_snapshot(spark, table, snapshot=1).select(
        "doc_id", F.col("val").alias("val_pre_merge")
    )
    return (
        cur.join(pre, "doc_id", "left")
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("val").cast("long").alias("val"),
            F.col("val_pre_merge").cast("long").alias("val_pre_merge"),
        )
        .orderBy("doc_id")
    )


SNAP_BRANCH_SQL = """
WITH base AS (
    SELECT doc_id, CAST(n_chars AS BIGINT) AS val FROM documents
),
merged AS (
    SELECT doc_id, val FROM base WHERE doc_id % 3 = 0 AND doc_id % 9 <> 0
    UNION ALL
    SELECT doc_id, val + 5000 FROM base WHERE doc_id % 3 = 1
    UNION ALL
    SELECT doc_id, val + 7000 FROM base WHERE doc_id % 3 = 2
),
pre AS (
    SELECT doc_id, val FROM base WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id, val + 7000 FROM base WHERE doc_id % 3 = 2
)
SELECT m.doc_id, CAST(m.val AS BIGINT) AS val,
       CAST(p.val AS BIGINT) AS val_pre_merge
FROM merged m LEFT JOIN pre p USING (doc_id)
ORDER BY m.doc_id
"""


# ---------------------------------------------------------------------------
# snap_merge_rows — row-level three-way branch merge, divergence refusal
# witnessed (round-9)
# ---------------------------------------------------------------------------

_MERGE_ROWS_TAG = "v1"


def _build_merge_rows(spark: SparkSession, sf: str) -> str:
    """Deterministic row-level-merge script over key-disjoint mod-20
    residues (disjoint BY CONSTRUCTION, so the clean merge is provably
    conflict-free at row granularity while file granularity refuses):

    * main snap 0 — evens of documents as (doc_id, val), doc_id stats;
    * branch "rows" cut at 0; ON THE BRANCH: ``merge_upsert`` val+1000
      where ``doc_id % 20 == 0``, then ``delete_where`` of
      ``doc_id % 20 == 2``;
    * main moves independently: ``merge_upsert`` val+2000 where
      ``doc_id % 20 == 4`` — both sides have now rewritten base files,
      so the FILE-level merge must refuse (asserted);
    * ``merge_branch(resolve='rows', key='doc_id')`` applies the branch's
      row delta onto main's head in one commit with a writer-recorded
      CDF;
    * (blocked) — branch "dup", also cut at 0, updates ``% 20 == 4`` to
      val+9000: true same-key divergence with main's +2000, so the
      row-level merge must ALSO refuse; the fixture refuses to publish
      unless both refusals fire.
    """
    from event_stream_spark.queries import t
    from event_stream_spark.sources import snaplog
    from event_stream_spark.sources.snapbranch import (
        MergeConflict,
        create_branch,
        merge_branch,
    )

    table = _dir(sf, "snapmergerows", _MERGE_ROWS_TAG)
    marker = os.path.join(table, "_built")
    if os.path.exists(marker) and snaplog.snapshots(table) == [0, 1, 2]:
        return table
    shutil.rmtree(table, ignore_errors=True)
    shutil.rmtree(table + "@rows", ignore_errors=True)
    shutil.rmtree(table + "@dup", ignore_errors=True)
    base = (
        t(spark, sf, "documents")
        .filter(F.col("doc_id") % 2 == 0)
        .select("doc_id", F.col("n_chars").cast("long").alias("val"))
    )
    snaplog.commit(base, table, stats_cols=["doc_id"])
    bt = create_branch(table, "rows")
    create_branch(table, "dup")
    snaplog.merge_upsert(
        spark, bt,
        base.filter(F.col("doc_id") % 20 == 0).withColumn(
            "val", F.col("val") + 1000
        ),
        key="doc_id", stats_cols=["doc_id"],
    )
    snaplog.delete_where(spark, bt, "doc_id % 20 = 2", stats_cols=["doc_id"])
    snaplog.merge_upsert(
        spark, table,
        base.filter(F.col("doc_id") % 20 == 4).withColumn(
            "val", F.col("val") + 2000
        ),
        key="doc_id", stats_cols=["doc_id"],
    )
    try:
        merge_branch(spark, table, "rows")
    except MergeConflict:
        pass  # required: both sides rewrote base files
    else:
        raise RuntimeError(
            "file-level merge did NOT conflict — snap_merge_rows refuses "
            "to publish a fixture that never exercised the rows path"
        )
    merge_branch(spark, table, "rows", resolve="rows", key="doc_id")
    snaplog.merge_upsert(
        spark, table + "@dup",
        base.filter(F.col("doc_id") % 20 == 4).withColumn(
            "val", F.col("val") + 9000
        ),
        key="doc_id", stats_cols=["doc_id"],
    )
    try:
        merge_branch(spark, table, "dup", resolve="rows", key="doc_id")
    except MergeConflict:
        pass  # required: same-key divergence (+9000 vs +2000)
    else:
        raise RuntimeError(
            "row-level divergence did NOT refuse — snap_merge_rows "
            "refuses to publish a green-looking history"
        )
    with open(marker, "w") as fh:
        fh.write(_MERGE_ROWS_TAG)
    return table


def snap_merge_rows(spark: SparkSession, sf: str) -> DataFrame:
    """Driver-witnessed row-level merge proof: the post-merge state FULL
    OUTER JOINed with the merge commit's writer-recorded CDF — branch
    updates (+1000) carry 'update_postimage', branch deletes surface as
    'delete' rows with NULL final value, main's own +2000 update is
    intact and absent from the merge's change set, untouched evens ride
    through unchanged.  Both refusals (file-level conflict, row-level
    divergence) must have fired for this relation to exist."""
    from event_stream_spark.sources import snaplog

    table = _build_merge_rows(spark, sf)
    m = snaplog.snapshots(table)[-1]
    cur = snaplog.read_snapshot(spark, table)
    ch = (
        snaplog.read_changes(spark, table, since=m - 1, until=m)
        .filter(F.col("_change_type").isin("update_postimage", "delete"))
        .select("doc_id", F.col("_change_type").alias("change"))
    )
    return (
        cur.join(ch, "doc_id", "full_outer")
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("val").cast("long").alias("val"),
            "change",
        )
        .orderBy("doc_id")
    )


SNAP_MERGE_ROWS_SQL = """
WITH base AS (
    SELECT doc_id, CAST(n_chars AS BIGINT) AS val FROM documents
    WHERE doc_id % 2 = 0
),
post AS (
    SELECT doc_id,
           CASE WHEN doc_id % 20 = 0 THEN val + 1000
                WHEN doc_id % 20 = 4 THEN val + 2000
                ELSE val END AS val
    FROM base WHERE doc_id % 20 <> 2
),
chg AS (
    SELECT doc_id, 'update_postimage' AS change FROM base
    WHERE doc_id % 20 = 0
    UNION ALL
    SELECT doc_id, 'delete' AS change FROM base WHERE doc_id % 20 = 2
)
SELECT COALESCE(p.doc_id, c.doc_id) AS doc_id, p.val AS val, c.change
FROM post p FULL OUTER JOIN chg c ON p.doc_id = c.doc_id
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# snap_ckpt — a checkpointed delta-encoded log resolved cold
# ---------------------------------------------------------------------------

_CKPT_TAG = "v1"


def _build_ckpt(spark: SparkSession, sf: str) -> str:
    """Checkpointed-log script: ``SNAP_CHECKPOINT_EVERY + 4`` appends
    (slice i = ``doc_id % n == i`` of documents), one deletion-vector
    delete of a single document (a manifest-only commit whose delta
    record MUTATES one entry), then ``vacuum(keep_last=2)`` — which
    drops every pre-horizon manifest AND the cadence checkpoint, leaving
    the edge checkpoint as the kept tail's only anchor.  Refuses to
    publish unless the negative cases actually fired: the head manifest
    must be delta-encoded on disk, the cadence checkpoint must have
    existed before vacuum, and the post-vacuum log must contain exactly
    the two kept manifests plus the edge checkpoint."""
    from event_stream_spark.queries import t
    from event_stream_spark.sources import snaplog

    table = _dir(sf, "snapckpt", _CKPT_TAG)
    marker = os.path.join(table, "_built")
    n_slices = snaplog.SNAP_CHECKPOINT_EVERY + 4
    keep = [n_slices - 1, n_slices]
    if os.path.exists(marker) and snaplog.snapshots(table) == keep:
        return table
    shutil.rmtree(table, ignore_errors=True)
    base = t(spark, sf, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("val")
    )
    for i in range(n_slices):
        snaplog.commit(
            base.filter(F.col("doc_id") % n_slices == i),
            table,
            mode="append",
            stats_cols=["doc_id"],
        )
    snaplog.delete_where_dv(spark, table, "doc_id = 3")
    head_raw = snaplog._load_raw(table, n_slices)
    ok = (
        "files_delta" in head_raw
        and len(head_raw["files_delta"].get("mutate", [])) == 1
        and os.path.exists(
            snaplog._ckpt_path(table, snaplog.SNAP_CHECKPOINT_EVERY)
        )
    )
    snaplog.vacuum(table, keep_last=2, tmp_ttl_s=0.0)
    ok = (
        ok
        and snaplog.snapshots(table) == keep
        and os.path.exists(snaplog._ckpt_path(table, keep[0]))
        and not os.path.exists(
            snaplog._ckpt_path(table, snaplog.SNAP_CHECKPOINT_EVERY)
        )
    )
    if not ok:
        shutil.rmtree(table, ignore_errors=True)
        raise RuntimeError(
            "snap_ckpt fixture proved nothing: the delta/checkpoint "
            "machinery was not on the resolution path"
        )
    with open(marker, "w") as fh:
        fh.write(_CKPT_TAG)
    return table


def snap_ckpt(spark: SparkSession, sf: str) -> DataFrame:
    """Final state of the checkpointed-log script, resolved COLD (the
    manifest cache is cleared first): the kept delta tail must
    reconstruct through vacuum's edge checkpoint alone — commits were
    O(delta) records, never full file-list restatements."""
    from event_stream_spark.sources import snaplog

    table = _build_ckpt(spark, sf)
    snaplog._MANIFEST_CACHE.clear()
    return (
        snaplog.read_snapshot(spark, table)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("val").cast("long").alias("val"),
        )
        .orderBy("doc_id")
    )


SNAP_CKPT_SQL = """
SELECT doc_id, CAST(n_chars AS BIGINT) AS val
FROM documents
WHERE doc_id <> 3
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# snap_catalog — zero-copy catalog registration (snapcatalog.snapshot_table)
# ---------------------------------------------------------------------------

_CATALOG_TAG = "v1"


def _build_catalog(spark: SparkSession, sf: str) -> tuple[str, str, str]:
    """Two scripted snaplog tables — facts (3 appends of documents
    slices, stats + KMV-NDV recorded) and a language dimension — for the
    catalog-registration witness.  Returns (facts_dir, dim_dir, key)."""
    from event_stream_spark.datapipe.fixutil import fixture_key
    from event_stream_spark.queries import t
    from event_stream_spark.sources import snaplog

    key = fixture_key(sf)
    facts = _dir(sf, "snapcatf", _CATALOG_TAG)
    dim = _dir(sf, "snapcatd", _CATALOG_TAG)
    marker = os.path.join(facts, "_built")
    if (
        os.path.exists(marker)
        and snaplog.snapshots(facts) == [0, 1, 2]
        and snaplog.snapshots(dim) == [0]
    ):
        return facts, dim, key
    shutil.rmtree(facts, ignore_errors=True)
    shutil.rmtree(dim, ignore_errors=True)
    base = t(spark, sf, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("val")
    )
    for i in range(3):
        snaplog.commit(
            base.filter(F.col("doc_id") % 3 == i),
            facts,
            mode="append",
            stats_cols=["doc_id", "val"],
            ndv_cols=["doc_id", "lang"],
        )
    snaplog.commit(
        base.select("lang")
        .distinct()
        .withColumn("lang_len", F.length("lang").cast("long")),
        dim,
        stats_cols=["lang_len"],
        ndv_cols=["lang"],
    )
    with open(marker, "w") as fh:
        fh.write(_CATALOG_TAG)
    return facts, dim, key


def snap_catalog(spark: SparkSession, sf: str) -> DataFrame:
    """Data-path witness for ``snapcatalog.snapshot_table``: both
    scripted tables registered as zero-copy (hard-linked) session-
    catalog parquet tables with manifest statistics injected (rowCount,
    sizeInBytes, min/max, merged-KMV NDV), then joined and aggregated
    THROUGH the catalog — the result must equal the plain algebra the
    DuckDB oracle replays, proving registration corrupts nothing.  (The
    join-ORDER effect of the same stats is plan-gated in
    tests/test_plans.py::test_manifest_stats_drive_cbo_join_reorder.)"""
    from event_stream_spark.sources.snapcatalog import snapshot_table

    facts, dim, key = _build_catalog(spark, sf)
    fname, dname = f"snapcat_facts_{key}", f"snapcat_dim_{key}"
    snapshot_table(spark, facts, fname)
    snapshot_table(spark, dim, dname)
    f, d = spark.table(fname), spark.table(dname)
    return (
        f.join(d, "lang")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("val").alias("sum_chars"),
            F.max("lang_len").alias("lang_len"),
        )
        .orderBy("lang")
    )


SNAP_CATALOG_SQL = """
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS sum_chars,
       MAX(CAST(length(lang) AS BIGINT)) AS lang_len
FROM documents
GROUP BY lang
ORDER BY lang
"""
