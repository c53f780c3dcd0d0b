"""Manifest statistics → the session catalog → Catalyst CBO.

``read_snapshot(plan_stats=True)`` already uses manifest stats to make
one decision (broadcast the small side).  The GENERAL form is to hand
the statistics to Catalyst itself, so every cost-based choice — join
ORDERING first of all, plus filter-selectivity and AQE initial
estimates — improves without any hint or decision code of ours:

- :func:`snapshot_table` registers a snapshot as a session-catalog
  parquet table (hard links, zero copy) and injects the statistics the
  MANIFEST already knows into the catalog: rowCount (sum of per-entry
  row counts), sizeInBytes (file sizes), per-column min/max (merged
  per-file footer stats) and per-column distinct counts (merged KMV
  sketches recorded by ``commit(..., ndv_cols=[...])``).  No data file
  is opened — this is ``ANALYZE TABLE ... FOR COLUMNS`` for free, the
  Delta `ANALYZE`-less stats / Iceberg puffin-sketch design point.
- with ``spark.sql.cbo.enabled`` + ``spark.sql.cbo.joinReorder.enabled``
  Catalyst's CostBasedJoinReorder then reorders multi-way joins over
  snapshot tables by estimated cardinality (plan-gated in
  tests/test_plans.py: a 3-table join changes ORDER purely because the
  stats are present).

Implementation note on the shim: Spark has no public stats-injection
API, and py4j cannot carry ``scala.math.BigInt`` across the gateway (it
auto-converts to a Python int, so ``CatalogStatistics`` can never be
constructed argument-by-argument from Python).  The janino compiler
that ships INSIDE Spark (it powers whole-stage codegen) compiles a
10-line shim at runtime that builds the ``CatalogStatistics`` JVM-side
and calls ``SessionCatalog.alterTableStats`` — the same call ``ANALYZE
TABLE`` ends in.  One compile per JVM, cached.

Scale shape: O(manifest) driver work per registration — file COUNT
sized, never file CONTENT sized; the created table is a plain parquet
catalog table, so scans/pushdown/pruning behave exactly as stock.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from event_stream_spark.sources.snaplog import (
    _read_manifest,
    kmv_ndv,
    snapshots,
)

_SHIM_SRC = """
public class SnapStatsShim {
  public static void set(Object sessionCatalog, Object tableIdent,
                         long size, long rows, Object colStats) {
    scala.math.BigInt s = scala.math.BigInt$.MODULE$.apply(size);
    scala.Option r = scala.Option$.MODULE$.apply(
        scala.math.BigInt$.MODULE$.apply(rows));
    org.apache.spark.sql.catalyst.catalog.CatalogStatistics st =
      new org.apache.spark.sql.catalyst.catalog.CatalogStatistics(
        s, r, (scala.collection.immutable.Map) colStats);
    ((org.apache.spark.sql.catalyst.catalog.SessionCatalog) sessionCatalog)
      .alterTableStats(
        (org.apache.spark.sql.catalyst.TableIdentifier) tableIdent,
        scala.Option$.MODULE$.apply(st));
  }
}
"""

_SHIM_CACHE: dict[int, object] = {}


def _stats_shim(spark: SparkSession):
    """Compile (once per JVM) and return the reflective Method handle."""
    jvm = spark._jvm
    key = id(jvm)
    meth = _SHIM_CACHE.get(key)
    if meth is None:
        comp = jvm.org.codehaus.janino.SimpleCompiler()
        comp.setParentClassLoader(
            jvm.org.apache.spark.util.Utils.getContextOrSparkClassLoader()
        )
        comp.cook(_SHIM_SRC)
        cls = comp.getClassLoader().loadClass("SnapStatsShim")
        meth = [m for m in cls.getMethods() if m.getName() == "set"][0]
        _SHIM_CACHE[key] = meth
    return meth


def _col_stat(spark: SparkSession, col: str, ndv, lo, hi):
    """One ``CatalogColumnStat`` built through Spark's own string-map
    parser (``CatalogColumnStat.fromMap`` — the Hive-properties codec),
    which keeps every BigInt JVM-side."""
    jvm = spark._jvm
    hm = jvm.java.util.HashMap()
    if ndv is not None:
        hm.put(f"{col}.distinctCount", str(int(ndv)))
    if lo is not None:
        hm.put(f"{col}.min", str(lo))
    if hi is not None:
        hm.put(f"{col}.max", str(hi))
    hm.put(f"{col}.version", "2")
    smap = jvm.org.apache.spark.api.python.PythonUtils.toScalaMap(hm)
    opt = jvm.org.apache.spark.sql.catalyst.catalog.CatalogColumnStat.fromMap(
        "snapshot_table", col, smap
    )
    return opt.get() if opt.isDefined() else None


def manifest_column_stats(manifest: dict) -> dict[str, dict]:
    """Column statistics derivable from a manifest alone: merged min/max
    (present only when EVERY entry recorded the column — a partial merge
    would understate the range) and merged-KMV distinct counts (same
    every-entry rule: a file without a sketch has unknown values)."""
    entries = manifest["files"]
    out: dict[str, dict] = {}
    if not entries:
        return out
    for col in {c for e in entries for c in (e.get("stats") or {})}:
        ranges = [e.get("stats", {}).get(col) for e in entries]
        if all(r is not None for r in ranges):
            out.setdefault(col, {})["min"] = min(r[0] for r in ranges)
            out[col]["max"] = max(r[1] for r in ranges)
    for col in {c for e in entries for c in (e.get("ndv") or {})}:
        sketches = [e.get("ndv", {}).get(col) for e in entries]
        if all(s is not None for s in sketches):
            est = kmv_ndv(sketches)
            if est is not None:
                out.setdefault(col, {})["ndv"] = est
    return out


def snapshot_table(
    spark: SparkSession,
    table: str,
    name: str,
    *,
    snapshot: int | None = None,
    sweep_ttl_s: float = 3600.0,
) -> DataFrame:
    """Register snapshot ``snapshot`` (default latest) of ``table`` as
    session-catalog parquet table ``name`` with manifest-derived
    statistics injected — rowCount, sizeInBytes, per-column min/max and
    KMV distinct counts — so Catalyst CBO plans joins over it without a
    scan or a hint.  Zero-copy: the snapshot's immutable files are hard
    linked into ``<table>/_catalog/``.  Returns ``spark.table(name)``.

    Refused (loudly) for snapshots with deletion vectors (a raw parquet
    scan would resurrect the deleted rows) and for column-mapped tables
    (data files carry physical names the catalog table would surface).
    Re-registering the same name re-points it at the requested snapshot;
    the superseded view dir is only swept once it is ``sweep_ttl_s`` old
    (vacuum's discipline), so a scan of the previously registered table
    that is still mid-flight keeps its files.
    """
    from event_stream_spark.sources.snapbranch import _link_fresh

    ids = snapshots(table)
    n = ids[-1] if snapshot is None else snapshot
    if n not in ids:
        raise ValueError(f"snapshot {n} not in {ids}")
    m = _read_manifest(table, n)
    if m.get("column_mapping"):
        raise ValueError(
            "snapshot_table on a column-mapped table: data files carry "
            "physical column names — compact first to materialize the "
            "logical schema"
        )
    if any(e.get("dv") for e in m["files"]):
        raise ValueError(
            "snapshot_table on a snapshot with deletion vectors: a raw "
            "catalog scan would resurrect deleted rows — compact first"
        )
    view_dir = os.path.join(table, "_catalog", f"{name}-s{n:012d}")
    # re-registration at a new snapshot: the DROP below un-points the
    # old catalog table, so its view dir (hard links — no data bytes)
    # is garbage — but a scan of the OLD catalog table may still be
    # mid-flight, and yanking its files would fail that query.  Sweep
    # with the vacuum discipline: only dirs older than ``sweep_ttl_s``
    # (any straggler scan of them has long finished) — age-stamp the
    # survivor so the NEXT registration's clock starts now.
    import glob as _glob
    import shutil as _shutil
    import time as _time

    now = _time.time()
    for old in _glob.glob(os.path.join(table, "_catalog", f"{name}-s*")):
        if os.path.abspath(old) == os.path.abspath(view_dir):
            continue
        try:
            age = now - os.path.getmtime(old)
        except OSError:
            continue  # already swept by a racing registration
        if age >= sweep_ttl_s:
            _shutil.rmtree(old, ignore_errors=True)
        else:
            os.utime(old)  # restart the TTL from this un-pointing
    os.makedirs(view_dir, exist_ok=True)
    size = 0
    rows = 0
    for e in m["files"]:
        dst = os.path.join(view_dir, os.path.basename(e["path"]))
        _link_fresh(e["path"], dst)
        size += os.path.getsize(dst)
        rows += e["rows"]

    cols = ", ".join(f"`{c}` {t}" for c, t in m["columns"])
    spark.sql(f"DROP TABLE IF EXISTS `{name}`")
    spark.sql(
        f"CREATE TABLE `{name}` ({cols}) USING parquet "
        f"LOCATION '{os.path.abspath(view_dir)}'"
    )

    jvm = spark._jvm
    scala_map = getattr(
        getattr(jvm.scala.collection.immutable, "Map$"), "MODULE$"
    ).empty()
    for col, st in manifest_column_stats(m).items():
        cs = _col_stat(
            spark, col, st.get("ndv"), st.get("min"), st.get("max")
        )
        if cs is not None:
            scala_map = scala_map.updated(col, cs)
    gw = spark.sparkContext._gateway
    args = gw.new_array(jvm.java.lang.Object, 5)
    args[0] = spark._jsparkSession.sessionState().catalog()
    args[1] = jvm.org.apache.spark.sql.catalyst.TableIdentifier.apply(name)
    args[2] = size
    args[3] = rows
    args[4] = scala_map
    _stats_shim(spark).invoke(None, args)
    return spark.table(f"`{name}`")
