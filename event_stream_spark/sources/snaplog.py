"""Snapshot log: minimal lakehouse-style transaction layer for the parquet
lakes (the public Delta/Iceberg design point, reduced to its core).

Plain ``mode("append")`` parquet writes — what the lake writers and the
streaming ingest sinks use — leave two gaps at 100 TB operation:

- **no atomic multi-file commits**: a reader listing the directory mid-write
  sees half a batch;
- **no time travel / snapshot isolation**: concurrent readers see whatever
  the filesystem happens to contain.

This module closes both with the standard recipe: data files are immutable
and manifest files are the ONLY source of truth.

- every commit writes its data files under a fresh ``data/c<N>-<token>/``
  directory, then publishes ``_log/<N>.json`` — an O(delta) record
  (``files_delta``: entries added/removed/mutated vs snapshot N-1) when
  that is smaller than the snapshot's full file set, the full list
  otherwise (snapshot 0, overwrites).  Every ``SNAP_CHECKPOINT_EVERY``-th
  commit additionally writes a self-contained ``_log/<N>.ckpt.json``
  checkpoint (the Delta log-checkpoint / Iceberg manifest-list design
  point), so readers resolve any snapshot from one anchor plus a bounded
  delta tail — commit bytes scale with the CHANGE and resolve cost with
  the checkpoint cadence, not with the table's file count;
- the manifest CONTENT is written to a temp file first, then ``os.link``ed
  onto the final ``_log/<N>.json`` name — the link is the filesystem's
  atomic claim on snapshot id N, and the manifest is fully readable the
  instant it is visible (a writer killed mid-commit leaves only a temp
  file and orphan data, never a partial manifest).  A concurrent committer
  losing the race re-reads the log and retries with N+1 (optimistic
  concurrency, no locks);
- readers resolve a manifest (latest, or a pinned ``snapshot=``) and read
  exactly its file list — a crash that wrote data files but no manifest is
  INVISIBLE, and old snapshots stay readable until vacuumed.

Scale notes: a manifest lists file paths, not rows — thousands of entries
of a few hundred bytes; the read plan is a plain multi-path parquet scan,
so pruning/pushdown behave exactly as on a raw directory.  On top of that,
``commit(..., stats_cols=[...])`` records per-file min/max from the parquet
footers into the manifest, and ``read_snapshot(..., prune={col: (lo, hi)})``
drops non-overlapping files BEFORE the scan is even planned — manifest-level
file skipping, the Iceberg/Delta data-skipping design point: the driver
never lists, opens, or schedules the skipped files at all (footer row-group
pruning only helps after a task already opened the file).
"""

from __future__ import annotations

import json
import os
import threading
import uuid
from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession

_LOG = "_log"

# Full-state checkpoint cadence (the Delta checkpoint-every-10 /
# Iceberg manifest-list design point): ordinary commits persist O(delta)
# manifests; every K-th commit ALSO writes a self-contained checkpoint so
# a cold reader resolves any snapshot from at most one checkpoint plus
# < K delta tails.  At 100 TB (~800k files) this is the difference
# between an ~800k-entry JSON written per commit and re-parsed per read
# versus a few entries per commit and an O(files) write only every K.
SNAP_CHECKPOINT_EVERY = 20


def _log_dir(table: str) -> str:
    return os.path.join(table, _LOG)


def _manifest_path(table: str, n: int) -> str:
    return os.path.join(_log_dir(table), f"{n:012d}.json")


def _ckpt_path(table: str, n: int) -> str:
    # ".ckpt.json" keeps snapshots() blind to it (int("...ckpt") fails)
    return os.path.join(_log_dir(table), f"{n:012d}.ckpt.json")


def snapshots(table: str) -> list[int]:
    """Committed snapshot ids, ascending (empty for a fresh table)."""
    d = _log_dir(table)
    if not os.path.isdir(d):
        return []
    ids = []
    for name in os.listdir(d):
        if name.endswith(".json"):
            try:
                ids.append(int(name[:-5]))
            except ValueError:
                continue
    return sorted(ids)


# Resolved-manifest cache: manifests are IMMUTABLE once linked (the
# os.link claim publishes final content), so a (path, inode, mtime, size)
# key can never serve stale state — it only guards against a table
# directory being deleted and re-created at the same path.  The cache
# holds RESOLVED manifests (full file lists) handed out BY REFERENCE:
# at the design point (~800k file entries / table) a per-read deepcopy
# is seconds of driver work, so readers treat the dict as frozen and
# every mutating path makes its own copy of exactly what it changes
# (``_metadata_commit`` shallow-copies the dict and its callbacks
# replace values wholesale; ``_relink_into_main`` copies the entry).
# All cache operations go through ``_MANIFEST_LOCK`` — resolution runs
# on reader, writer, AND vacuum threads concurrently, and an unlocked
# get→move_to_end can KeyError against a racing eviction.
_MANIFEST_CACHE: OrderedDict[tuple, dict] = OrderedDict()
_MANIFEST_CACHE_MAX = 256
_MANIFEST_LOCK = threading.Lock()


def _stat_key(path: str) -> tuple:
    st = os.stat(path)
    return (os.path.abspath(path), st.st_ino, st.st_mtime_ns, st.st_size)


def _load_raw(table: str, n: int) -> dict:
    """The on-disk manifest record, verbatim: either a FULL manifest
    (has ``files``) or a delta record (has ``files_delta``)."""
    with open(_manifest_path(table, n)) as fh:
        return json.load(fh)


def _apply_delta(prev_files: list[dict], d: dict) -> list[dict]:
    """Reconstruct a snapshot's file list from its predecessor's:
    kept entries stay in predecessor order (mutated ones — e.g. a grown
    DV sidecar — replaced in place), added entries append at the end —
    exactly the shape commit() builds (``prev + entries``)."""
    removed = set(d.get("remove", ()))
    mutated = {e["path"]: e for e in d.get("mutate", ())}
    files = [
        mutated.get(e["path"], e)
        for e in prev_files
        if e["path"] not in removed
    ]
    return files + list(d.get("add", ()))


def _resolve_manifest(table: str, n: int) -> dict:
    """Resolve snapshot ``n``'s LOGICAL manifest (full ``files`` list)
    from the delta-encoded log: walk back to the nearest anchor — a
    cached resolution, a checkpoint, or a full on-disk manifest — then
    apply the delta tail forward.  Cold cost is bounded by the
    checkpoint cadence; warm cost is one cache hit.

    Concurrency: a racing ``vacuum`` writes the retention-edge
    checkpoint BEFORE dropping pre-horizon manifests, so a walk that
    loses the race mid-descent (manifest gone underfoot) retries once —
    the second pass finds the fresh checkpoint and anchors there."""
    try:
        return _resolve_manifest_once(table, n)
    except FileNotFoundError:
        return _resolve_manifest_once(table, n)


def _resolve_manifest_once(table: str, n: int) -> dict:
    path = _manifest_path(table, n)
    key = _stat_key(path)
    with _MANIFEST_LOCK:
        hit = _MANIFEST_CACHE.get(key)
        if hit is not None:
            _MANIFEST_CACHE.move_to_end(key)
            return hit
    top = _load_raw(table, n)
    own_ck = _ckpt_path(table, n)
    if "files" in top:
        resolved = top
    elif os.path.exists(own_ck):
        # n's own checkpoint (vacuum writes one at the retention edge
        # before dropping predecessors): self-contained, no walk needed
        with open(own_ck) as fh:
            resolved = json.load(fh)
    else:
        deltas = [top["files_delta"]]
        base_files: list[dict] | None = None
        m = n - 1
        while True:
            mp = _manifest_path(table, m)
            try:
                mk = _stat_key(mp) if os.path.exists(mp) else None
            except FileNotFoundError:
                mk = None  # vacuumed between exists() and stat()
            if mk is not None:
                with _MANIFEST_LOCK:
                    c = _MANIFEST_CACHE.get(mk)
                if c is not None:
                    base_files = c["files"]
                    break
            ck = _ckpt_path(table, m)
            if os.path.exists(ck):
                with open(ck) as fh:
                    base_files = json.load(fh)["files"]
                break
            if mk is None:
                raise FileNotFoundError(
                    f"cannot resolve snapshot {n} of {table!r}: manifest "
                    f"{m} is gone and no checkpoint covers the tail"
                )
            raw = _load_raw(table, m)
            if "files" in raw:
                base_files = raw["files"]
                break
            deltas.append(raw["files_delta"])
            m -= 1
        files = base_files
        for d in reversed(deltas):
            files = _apply_delta(files, d)
        resolved = {k: v for k, v in top.items() if k != "files_delta"}
        resolved["files"] = files
    with _MANIFEST_LOCK:
        _MANIFEST_CACHE[key] = resolved
        while len(_MANIFEST_CACHE) > _MANIFEST_CACHE_MAX:
            _MANIFEST_CACHE.popitem(last=False)
    return resolved


def _read_manifest(table: str, n: int) -> dict:
    """The resolved manifest, SHARED with the cache — treat as frozen.
    Reads are O(1) beyond cold resolution (no per-call copy of the file
    list; at ~800k entries a deepcopy was seconds per read).  Mutating
    paths copy what they change: see the cache comment above."""
    return _resolve_manifest(table, n)


def _encode_manifest(table: str, n: int, manifest: dict) -> dict:
    """On-disk record for a logical manifest: an O(delta) ``files_delta``
    against snapshot n-1 when the file list is expressible as (kept
    entries in predecessor order, some mutated in place, new entries
    appended) AND that is smaller than the full list; the full manifest
    otherwise.  The faithfulness guard reconstructs and compares, so a
    caller that e.g. reorders carried entries silently gets a full
    manifest instead of a corrupted delta — correctness never depends on
    writer discipline."""
    files = manifest["files"]
    if n == 0:
        return manifest  # the chain anchor is always self-contained
    try:
        prev = _resolve_manifest(table, n - 1)["files"]
    except FileNotFoundError:
        return manifest
    prev_by_path = {e["path"]: e for e in prev}
    add, mutate, kept = [], [], set()
    for e in files:
        pe = prev_by_path.get(e["path"])
        if pe is None:
            add.append(e)
        else:
            kept.add(e["path"])
            if pe != e:
                mutate.append(e)
    remove = [p for p in prev_by_path if p not in kept]
    if len(add) + len(mutate) + len(remove) >= len(files):
        return manifest  # delta would not be smaller (e.g. overwrite)
    d = {
        "base": n - 1,
        **({"remove": remove} if remove else {}),
        **({"mutate": mutate} if mutate else {}),
        **({"add": add} if add else {}),
    }
    if _apply_delta(prev, d) != files:
        return manifest  # unexpressible (reordered carry): stay full
    out = {k: v for k, v in manifest.items() if k != "files"}
    out["files_delta"] = d
    return out


def _maybe_checkpoint(
    table: str, n: int, resolved: dict, *, force: bool = False
) -> None:
    """Write the self-contained checkpoint for snapshot ``n`` (crash-safe
    and best-effort: readers that never see it just walk a longer delta
    tail).  Called on the cadence by commit paths and forced by vacuum
    before it drops the manifests a kept delta tail would need."""
    if not force and (n == 0 or n % SNAP_CHECKPOINT_EVERY):
        return
    ck = _ckpt_path(table, n)
    if os.path.exists(ck):
        return
    token = uuid.uuid4().hex[:12]
    tmp = os.path.join(_log_dir(table), f".tmp-ck{token}-{n}.json")
    with open(tmp, "w") as fh:
        json.dump(resolved, fh)
        fh.flush()
        os.fsync(fh.fileno())
    try:
        os.link(tmp, ck)
    except FileExistsError:
        pass  # a concurrent writer checkpointed the same snapshot
    os.remove(tmp)


def _row_count(path: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def _file_stats(path: str, cols: list[str]) -> dict:
    """Per-file min/max for ``cols`` from the parquet footer (local read of
    metadata only — no row data)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    out: dict[str, list] = {}
    for col in cols:
        if col not in idx:
            continue
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[col]).statistics
            if st is None or not st.has_min_max:
                return {}  # stats unavailable → never prune on this file
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        # manifests are JSON and pruning must be ORDER-FAITHFUL to the
        # footer stats: record numeric min/max only.  String stats are
        # deliberately omitted — parquet writers may TRUNCATE long string
        # max values (the truncated max understates the true max) and
        # footer ordering is unsigned-byte-wise, so pruning on them could
        # skip a file that actually overlaps, losing rows.  An unrecorded
        # column simply never prunes that file — always safe.
        if (
            isinstance(lo, (int, float))
            and isinstance(hi, (int, float))
            and not isinstance(lo, bool)
            and not isinstance(hi, bool)
        ):
            out[col] = [lo, hi]
    return out


# Per-file bloom filters (the Delta bloom-index / Iceberg puffin design
# point): m bits / k probes sized for ~1% false positives around 500
# distinct keys per file; the bitmap is 512 bytes hex-encoded per (file,
# col) in the JSON manifest.  min/max stats prune RANGE predicates; blooms
# prune POINT lookups, which range stats can't help with once a key column
# is unsorted across files (every file's [min, max] spans the whole domain).
SNAP_BLOOM_M = 4096
SNAP_BLOOM_K = 3


def _bloom_hashes(value, m: int = SNAP_BLOOM_M, k: int = SNAP_BLOOM_K) -> list[int]:
    """The k bit positions for a value — same function at build and probe
    (pure Python + md5: engine-independent, stable across runs).  Values
    are type-tagged so int 7 and str '7' don't alias — but NUMERICALLY
    EQUAL probe values must hash identically to the build (Spark's
    equality coerces 101.0 == 101 == True·101), so integral floats and
    bools canonicalize to int before tagging.  A non-integral float can
    never equal an integer column value, so its (unmatchable) hash
    pruning everything is correct."""
    import hashlib

    if isinstance(value, bool):
        value = int(value)
    elif isinstance(value, float) and value.is_integer():
        value = int(value)
    tag = "i" if isinstance(value, int) else "s"
    canon = f"{tag}|{value}".encode()
    return [
        int.from_bytes(
            hashlib.md5(b"%d|" % j + canon).digest()[:8], "big"
        ) % m
        for j in range(k)
    ]


def _file_bloom(path: str, cols: list[str]) -> dict:
    """Per-file bloom bitmaps for ``cols`` (int/string columns only — the
    types with a canonical encoding; others are skipped and simply never
    prune).  Reads just the requested columns of one file.  This runs
    manifest-side like ``_file_stats``; a petabyte writer would fold the
    same bitmap inside the write task and attach it to the commit — the
    manifest format is identical either way."""
    import pyarrow.parquet as pq

    available = set(pq.ParquetFile(path).schema_arrow.names)
    want = [c for c in cols if c in available]
    if not want:
        return {}
    tbl = pq.read_table(path, columns=want)
    out: dict[str, dict] = {}
    for col in want:
        bits = bytearray(SNAP_BLOOM_M // 8)
        ok = True
        for v in tbl.column(col).to_pylist():
            if v is None:
                continue
            if not isinstance(v, (int, str)) or isinstance(v, bool):
                ok = False  # no canonical encoding → record nothing
                break
            for pos in _bloom_hashes(v):
                bits[pos // 8] |= 1 << (pos % 8)
        if ok:
            out[col] = {
                "m": SNAP_BLOOM_M,
                "k": SNAP_BLOOM_K,
                "bits": bytes(bits).hex(),
            }
    return out


# Per-file KMV (bottom-k minimum values) distinct-count sketches — the
# Iceberg puffin theta-sketch design point, reduced to its core: k
# smallest 64-bit value hashes per (file, column).  Unlike per-file NDV
# numbers (which cannot be summed across files) KMV sketches MERGE
# exactly (union → bottom-k), so a manifest-level NDV estimate for any
# snapshot costs O(files · k) driver work with no data scan — that is
# what feeds Catalyst CBO join reordering (sources/snapcatalog.py).
SNAP_KMV_K = 128
_KMV_SPACE = 1 << 64


def _kmv_hash(value) -> int:
    """64-bit value hash, same canonicalization as the blooms (so int 7
    and str '7' don't alias, while 7.0 == 7 hash identically)."""
    import hashlib

    if isinstance(value, bool):
        value = int(value)
    elif isinstance(value, float) and value.is_integer():
        value = int(value)
    tag = "i" if isinstance(value, int) else "s"
    return int.from_bytes(
        hashlib.md5(f"{tag}|{value}".encode()).digest()[:8], "big"
    )


def _file_kmv(path: str, cols: list[str], k: int = SNAP_KMV_K) -> dict:
    """Per-file KMV sketch for ``cols`` (int/string columns — same type
    discipline as the blooms).  A sketch with fewer than k hashes is the
    COMPLETE distinct-hash set of the file (exact), which the merge
    rule exploits."""
    import pyarrow.parquet as pq

    available = set(pq.ParquetFile(path).schema_arrow.names)
    want = [c for c in cols if c in available]
    if not want:
        return {}
    tbl = pq.read_table(path, columns=want)
    out: dict[str, dict] = {}
    for col in want:
        hashes: set[int] = set()
        ok = True
        for v in tbl.column(col).to_pylist():
            if v is None:
                continue
            if not isinstance(v, (int, str)) or isinstance(v, bool):
                ok = False
                break
            hashes.add(_kmv_hash(v))
        if ok:
            out[col] = {"k": k, "mins": sorted(hashes)[:k]}
    return out


def kmv_ndv(sketches: list[dict]) -> int | None:
    """Merged NDV estimate from per-file KMV sketches (same k): union →
    bottom-k; a union smaller than k means every contributing sketch was
    complete, so the count is EXACT; else the standard KMV estimator
    (k-1) / R_k with R_k the k-th smallest hash normalized to [0, 1)."""
    if not sketches:
        return None
    k = sketches[0]["k"]
    merged: set[int] = set()
    for s in sketches:
        if s["k"] != k:
            return None
        merged.update(s["mins"])
    if len(merged) < k:
        return len(merged)
    kth = sorted(merged)[k - 1]
    return max(k, int(round((k - 1) * _KMV_SPACE / (kth + 1))))


def _bloom_may_contain(bloom: dict, value) -> bool:
    """Probe one manifest bloom entry; True = the file MAY hold the value
    (false positives possible, false negatives impossible)."""
    bits = bytes.fromhex(bloom["bits"])
    for pos in _bloom_hashes(value, m=bloom["m"], k=bloom["k"]):
        if not bits[pos // 8] & (1 << (pos % 8)):
            return False
    return True


# ---------------------------------------------------------------------------
# Deletion vectors — row-level deletes without rewriting data files
# (the Delta deletion-vector / Iceberg v3 positional-delete design point:
# a manifest entry may carry a sidecar listing ROW POSITIONS of its data
# file that are logically deleted; readers anti-filter on
# (file, _metadata.row_index) and every file byte stays immutable)
# ---------------------------------------------------------------------------


def _dv_read(entry: dict) -> list[int]:
    """Deleted row positions for one manifest entry ([] if none)."""
    dvi = entry.get("dv")
    if not dvi:
        return []
    with open(dvi["path"]) as fh:
        return json.load(fh)["rows"]


def _dv_pairs(entries: list[dict]) -> list[tuple[str, int]]:
    """(file basename, row position) for every deleted row across
    ``entries`` — driver-side: DVs are the SMALL-delete design point (a
    purge touching a large fraction of rows should use the copy-on-write
    ``delete_where``, which this module also provides).  A petabyte
    implementation would ship these as roaring bitmaps read task-side;
    the manifest format is identical either way."""
    out: list[tuple[str, int]] = []
    for e in entries:
        b = os.path.basename(e["path"])
        out.extend((b, i) for i in _dv_read(e))
    return out


def _apply_dv(spark: SparkSession, df: DataFrame, entries: list[dict]) -> DataFrame:
    """Anti-filter ``df`` (a scan over exactly ``entries``' files) by the
    entries' deletion vectors.  No-op (and zero plan overhead) when no
    entry carries a DV.  The join is a BROADCAST anti-join on
    (file basename, row position) — the DV side is tiny by contract."""
    from pyspark.sql import functions as F

    pairs = _dv_pairs(entries)
    if not pairs:
        return df
    dv = spark.createDataFrame(pairs, "__file string, __row long")
    keyed = df.select(
        "*",
        F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1).alias(
            "__file"
        ),
        F.col("_metadata.row_index").alias("__row"),
    )
    return keyed.join(
        F.broadcast(dv), ["__file", "__row"], "left_anti"
    ).drop("__file", "__row")


def _logical_projection(
    df: DataFrame, manifest: dict, *, extra: tuple[str, ...] = ()
) -> DataFrame:
    """COLUMN MAPPING read side: project a physical-named scan to the
    manifest's LOGICAL schema (the Delta column-mapping design point —
    data files keep their physical column names forever; renames and
    drops are manifest-only).  Identity for tables that never renamed or
    dropped a column, so the legacy read surface is bit-identical.
    Idempotent: a column already surfaced under its logical name passes
    through.  ``extra`` names ride along when present (CDF meta columns,
    position columns)."""
    if not manifest.get("column_mapping"):
        return df
    from pyspark.sql import functions as F

    phys = manifest.get("physical") or {}
    have = set(df.columns)
    sel = []
    for name, typ in manifest["columns"]:
        p = phys.get(name, name)
        if p in have:
            sel.append(F.col(p).alias(name))
        elif name in have:  # already logical (double projection)
            sel.append(F.col(name))
        else:  # file predates the column's (re-)addition
            sel.append(F.lit(None).cast(typ).alias(name))
    sel.extend(F.col(c) for c in extra if c in have)
    return df.select(*sel)


def _physical_frame(df: DataFrame, manifest: dict | None) -> DataFrame:
    """COLUMN MAPPING write side: alias a logical-named frame to the
    physical column names new data files must carry.  Identity when the
    table has no active mapping."""
    if not manifest or not manifest.get("column_mapping"):
        return df
    from pyspark.sql import functions as F

    phys = manifest.get("physical") or {}
    return df.select(*[F.col(c).alias(phys.get(c, c)) for c in df.columns])


def _read_entries(
    spark: SparkSession, entries: list[dict], manifest: dict | None = None
) -> DataFrame:
    """Scan exactly ``entries``' files with their deletion vectors
    applied — the one read path every DML helper must use (reading the
    parquet directly would resurrect DV-deleted rows into the rewrite).
    Pass the governing ``manifest`` to surface the logical schema of a
    column-mapped table (physical names otherwise — identical for tables
    that never renamed)."""
    df = spark.read.option("mergeSchema", "true").parquet(
        *[e["path"] for e in entries]
    )
    df = _apply_dv(spark, df, entries)
    if manifest is not None:
        df = _logical_projection(df, manifest)
    return df


class ConstraintViolation(RuntimeError):
    """A commit's new rows violate a table CHECK constraint.  Raised
    BEFORE the manifest claim, so the offending data never becomes
    visible — the table stays at its previous snapshot."""


class CommitConflict(RuntimeError):
    """A transaction based on ``expected_snapshot`` lost the race: another
    commit landed first.  Re-read the table and retry the transformation —
    the Delta/Iceberg optimistic-concurrency contract."""


def commit(
    df: DataFrame | None,
    table: str,
    *,
    mode: str = "append",
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
    ndv_cols: list[str] | None = None,
    expected_snapshot: int | None = None,
    allow_added_columns: bool = False,
    max_retries: int = 20,
    carry_entries: list[dict] | None = None,
    data_change: bool = True,
    cdc: DataFrame | None = None,
    txn: tuple[str, int] | None = None,
    extra_meta: dict | None = None,
) -> int:
    """Write ``df``'s rows as a new snapshot; returns the snapshot id.

    ``mode="append"`` extends the previous snapshot's file set;
    ``mode="overwrite"`` replaces it (old files stay on disk for time
    travel until :func:`vacuum`).  The data write happens BEFORE the
    manifest claim, so a failure at any point leaves the table at the
    previous snapshot.  ``stats_cols`` records per-file min/max for those
    columns in the manifest, enabling :func:`read_snapshot` range file
    skipping; ``bloom_cols`` additionally records a per-file bloom bitmap
    for those (int/string) columns, enabling ``prune_eq`` POINT-lookup
    skipping that min/max ranges cannot express once a key column is
    unsorted across files.  ``ndv_cols`` records a per-file KMV
    distinct-count sketch (mergeable across files — the Iceberg puffin
    theta-sketch design point), which :func:`snapcatalog.snapshot_table`
    merges into catalog column statistics so Catalyst CBO can reorder
    joins over snapshots without ever scanning them.

    ``expected_snapshot`` makes the commit TRANSACTIONAL: it asserts the
    table is still at that snapshot when the claim lands.  If another
    commit won the race, :class:`CommitConflict` is raised instead of
    silently publishing a result computed from stale state — required for
    every read-modify-write (the DML helpers pass it); plain appends omit
    it and simply retry onto the next id.

    Schema is PART of the table contract: every manifest records its
    column list, an append whose columns differ is rejected, and the only
    legal change is ADDITIVE (new trailing columns) with an explicit
    ``allow_added_columns=True`` — silent drift (renames, type changes,
    reorders) can never enter the log.  Readers merge schemas, so rows
    from pre-evolution files surface NULL for the added columns.

    ``carry_entries`` (overwrite mode only) carries existing manifest
    entries — immutable data files from the previous snapshot — into the
    new manifest verbatim alongside the freshly written files.  This is
    the file-targeted copy-on-write seam: a DML that only rewrites the
    files its keys touch carries every untouched file forward without
    moving a byte of it.

    ``df=None`` publishes a MANIFEST-ONLY commit (no new data files) —
    the deletion-vector path: the snapshot is entirely the carried
    entries (with their updated ``dv`` sidecars) and the column contract
    is inherited from the previous manifest.

    CHANGE DATA FEED plumbing (the Delta CDF design point):
    ``data_change=False`` marks a commit as pure REORGANIZATION —
    identical row set, new file layout (compaction, clustering) — so
    :func:`read_changes` skips it entirely instead of synthesizing
    delete+insert churn for every row the rewrite moved.  ``cdc`` is an
    optional writer-recorded change relation (must carry a
    ``_change_type`` string column) persisted as parquet sidecars under
    ``_cdc_data/`` and referenced by the manifest: the DML helpers pass
    their exact change sets (they know precisely which rows they
    touched), so the feed costs O(changes) to read instead of the
    O(changed files) logical diff the synthesis fallback performs.

    IDEMPOTENT WRITER TRANSACTIONS (the Delta ``txnAppId``/``txnVersion``
    design point): ``txn=(app_id, version)`` stamps the commit with a
    monotonically increasing per-writer version.  The manifest carries a
    cumulative ``{app_id: latest_version}`` map forward through EVERY
    commit; a commit whose version is <= the recorded one is a REPLAY and
    is skipped (no data written, the current snapshot id is returned).
    This is what makes a restart-replayed streaming microbatch
    (``streaming/snapsink.py`` passes ``txn=(query_id, batch_id)``)
    exactly-once even though foreachBatch itself is at-least-once.  The
    skip check runs inside the claim-retry loop, so losing a manifest
    race to a concurrent replay of the SAME batch also resolves to a
    skip, never a duplicate.  The map is O(writers) bytes — negligible
    against the file list at any scale."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode {mode!r}")
    _RESERVED_META = {
        "snapshot", "op", "ts", "columns", "files", "data_change", "cdc",
        "txn", "constraints", "column_mapping", "physical", "physical_used",
    }
    if extra_meta and _RESERVED_META & set(extra_meta):
        raise ValueError(
            f"extra_meta may not override reserved manifest keys: "
            f"{sorted(_RESERVED_META & set(extra_meta))}"
        )
    if cdc is not None and "_change_type" not in cdc.columns:
        raise ValueError("cdc relation must carry a _change_type column")
    if carry_entries and mode != "overwrite":
        raise ValueError("carry_entries requires mode='overwrite'")
    if df is None and not carry_entries:
        raise ValueError("df=None (manifest-only commit) requires carry_entries")
    os.makedirs(_log_dir(table), exist_ok=True)
    token = uuid.uuid4().hex[:12]
    new_cols = (
        [[f.name, f.dataType.simpleString()] for f in df.schema.fields]
        if df is not None
        else None
    )
    for _ in range(max_retries):
        nxt = (snapshots(table) or [-1])[-1] + 1
        prev_manifest = _read_manifest(table, nxt - 1) if nxt > 0 else {}
        txn_map: dict[str, int] = dict(prev_manifest.get("txn", {}))
        constraints: dict[str, str] = dict(prev_manifest.get("constraints", {}))
        if txn is not None:
            app_id, version = txn
            if txn_map.get(app_id, -1) >= int(version):
                return nxt - 1  # replay of an already-applied transaction
            txn_map[app_id] = int(version)
        if df is None:
            if nxt == 0:
                raise ValueError("manifest-only commit on an empty table")
            new_cols = _read_manifest(table, nxt - 1).get("columns")
        if nxt > 0 and mode == "append":
            prev_cols = _read_manifest(table, nxt - 1).get("columns")
            if prev_cols is not None and prev_cols != new_cols:
                if new_cols[: len(prev_cols)] == prev_cols and allow_added_columns:
                    pass  # additive evolution, explicitly allowed
                else:
                    raise ValueError(
                        f"schema mismatch: table has {prev_cols}, commit has "
                        f"{new_cols} (additive trailing columns require "
                        "allow_added_columns=True; anything else is drift)"
                    )
        if expected_snapshot is not None and nxt != expected_snapshot + 1:
            raise CommitConflict(
                f"table moved to snapshot {nxt - 1}, transaction based on "
                f"{expected_snapshot}: re-read and retry"
            )
        # COLUMN MAPPING (active only after a rename/drop): logical names
        # are the caller surface, physical names are what data files carry
        mapping_on = bool(prev_manifest.get("column_mapping"))
        phys_map = dict(prev_manifest.get("physical") or {})
        phys_used = list(prev_manifest.get("physical_used") or [])
        if mapping_on and new_cols is not None:
            prev_logical = {n for n, _t in (prev_manifest.get("columns") or [])}
            for n, _t in new_cols:
                if n not in prev_logical and n not in phys_map:
                    if n in phys_used:
                        # a re-added logical column must NOT resurrect the
                        # dropped column's bytes: fresh physical name
                        phys_map[n] = f"{n}__p{nxt}_{token[:4]}"
                    target = phys_map.get(n, n)
                    if target not in phys_used:
                        phys_used.append(target)
        pm = {"column_mapping": True, "physical": phys_map} if mapping_on else None
        if df is not None:
            part_dir = os.path.join(table, "data", f"c{nxt:012d}-{token}")
            _physical_frame(df, pm).write.mode("error").parquet(part_dir)
            new_files = sorted(
                os.path.join(part_dir, f)
                for f in os.listdir(part_dir)
                if f.endswith(".parquet")
            )
            # zero-row part files (empty input partitions) carry no data
            # and no footer stats; referencing them bloats manifests and
            # schedules empty scan tasks — keep one only when the whole
            # commit is empty, so the snapshot still carries the schema
            nonempty = [p for p in new_files if _row_count(p) > 0]
            new_files = nonempty or new_files[:1]
            if constraints and nonempty:
                from pyspark.sql import functions as F

                # CHECK enforcement on the rows as WRITTEN (one scan of
                # the new files only — never a second run of df's plan,
                # never a rescan of carried files, which were checked by
                # the commits that wrote them).  SQL CHECK semantics:
                # NULL passes, only an expression that is FALSE violates.
                import shutil

                viol = (
                    _logical_projection(
                        df.sparkSession.read.parquet(part_dir),
                        {**(pm or {}), "columns": new_cols},
                    )
                    .agg(
                        *[
                            F.sum(
                                F.when(F.expr(e) == False, 1).otherwise(0)  # noqa: E712
                            ).alias(name)
                            for name, e in constraints.items()
                        ]
                    )
                    .collect()[0]
                )
                bad = {n: int(viol[n]) for n in constraints if viol[n]}
                if bad:
                    shutil.rmtree(part_dir, ignore_errors=True)
                    raise ConstraintViolation(
                        f"commit violates CHECK constraint(s) {bad} "
                        f"(name -> violating row count); table stays at "
                        f"snapshot {nxt - 1}"
                    )
        else:
            part_dir = None
            new_files = []
        if cdc is not None:
            cdc_dir = os.path.join(table, "_cdc_data", f"c{nxt:012d}-{token}")
            _physical_frame(cdc, pm).write.mode("error").parquet(cdc_dir)
            cdc_files = sorted(
                os.path.join(cdc_dir, f)
                for f in os.listdir(cdc_dir)
                if f.endswith(".parquet") and _row_count(os.path.join(cdc_dir, f))
            )
        else:
            cdc_dir = None
            cdc_files = []
        prev = (
            _read_manifest(table, nxt - 1)["files"]
            if mode == "append" and nxt > 0
            else list(carry_entries or [])
        )
        def _keyed(fn, p, cols):
            """Per-file stats/bloom keyed by LOGICAL name: computed over
            the physical columns on disk, re-keyed so pruning predicates
            (always logical) keep working across renames."""
            if not mapping_on:
                return fn(p, cols)
            raw = fn(p, [phys_map.get(c, c) for c in cols])
            return {
                c: raw[phys_map.get(c, c)]
                for c in cols
                if phys_map.get(c, c) in raw
            }

        entries = [
            {
                "path": p,
                "rows": _row_count(p),
                **(
                    {"stats": _keyed(_file_stats, p, stats_cols)}
                    if stats_cols
                    else {}
                ),
                **(
                    {"bloom": _keyed(_file_bloom, p, bloom_cols)}
                    if bloom_cols
                    else {}
                ),
                **(
                    {"ndv": _keyed(_file_kmv, p, ndv_cols)}
                    if ndv_cols
                    else {}
                ),
            }
            for p in new_files
        ]
        import time as _time

        manifest = {
            "snapshot": nxt,
            "op": mode,
            "ts": _time.time(),
            "columns": new_cols,
            "files": prev + entries,
            "data_change": data_change,
            # cdc is not None ⇒ the writer RECORDED its change relation —
            # even an empty one (e.g. a delete matching nothing).  The
            # explicit [] is load-bearing: it tells _change_chunks "zero
            # change rows", where an ABSENT key means "not recorded" and
            # triggers the logical-diff fallback (which would re-derive
            # full delete+insert churn for the rewritten files).
            **({"cdc": cdc_files} if cdc is not None else {}),
            # writer-transaction watermarks ride every manifest so a
            # replayed (app_id, version) is recognizable forever
            **({"txn": txn_map} if txn_map else {}),
            # CHECK constraints are table contract: carried forward until
            # explicitly dropped, enforced on every commit's new rows
            **({"constraints": constraints} if constraints else {}),
            # column-mapping state (rename/drop without touching data):
            # logical→physical map + every physical name ever assigned
            **(
                {
                    "column_mapping": True,
                    "physical": phys_map,
                    "physical_used": phys_used,
                }
                if mapping_on
                else {}
            ),
            # caller-supplied attribution (e.g. a row-level branch merge
            # stamps merged_branch so history/CDF can attribute the
            # commit) — reserved keys rejected above
            **(extra_meta or {}),
        }
        # content first, visibility second: the fsync'd temp file carries
        # the full record before os.link atomically claims the id — a
        # reader can never observe a partial manifest.  What lands on
        # disk is the O(delta) encoding (vs snapshot nxt-1) whenever that
        # is smaller than the full file list — commit bytes scale with
        # the CHANGE, not the table.
        tmp = os.path.join(_log_dir(table), f".tmp-{token}-{nxt}.json")
        with open(tmp, "w") as fh:
            json.dump(_encode_manifest(table, nxt, manifest), fh)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, _manifest_path(table, nxt))
        except FileExistsError:
            # lost the race: orphan this attempt's data dir (invisible —
            # no manifest references it; vacuum sweeps it), then abort the
            # transaction or retry the plain append
            import shutil

            os.remove(tmp)
            if part_dir is not None:
                shutil.rmtree(part_dir, ignore_errors=True)
            if cdc_dir is not None:
                shutil.rmtree(cdc_dir, ignore_errors=True)
            if expected_snapshot is not None:
                raise CommitConflict(
                    f"snapshot {nxt} claimed concurrently, transaction based "
                    f"on {expected_snapshot}: re-read and retry"
                ) from None
            continue
        os.remove(tmp)
        _maybe_checkpoint(table, nxt, manifest)
        return nxt
    raise RuntimeError(f"snapshot commit contention: {max_retries} retries exhausted")


def _metadata_commit(
    table: str, mutate, *, max_retries: int = 20, expected_parent: int | None = None
) -> int:
    """Publish a data-free snapshot whose manifest is the previous one
    with ``mutate(manifest_dict)`` applied — same atomic-link claim as
    :func:`commit`, zero data files moved.

    ``expected_parent`` pins the snapshot this commit must stack on: if
    another commit claimed it first, :class:`CommitConflict` is raised
    instead of silently rebasing — callers whose mutation depends on the
    parent STATE (e.g. constraint validation) re-check and retry."""
    import time as _time

    for _ in range(max_retries):
        nxt = (snapshots(table) or [-1])[-1] + 1
        if nxt == 0:
            raise ValueError("metadata commit on an empty table")
        if expected_parent is not None and nxt - 1 != expected_parent:
            raise CommitConflict(
                f"snapshot {nxt - 1} committed since this mutation was "
                f"prepared against {expected_parent}: re-check and retry"
            )
        manifest = dict(_read_manifest(table, nxt - 1))
        manifest.update(
            snapshot=nxt, op="metadata", ts=_time.time(), data_change=False
        )
        manifest.pop("cdc", None)  # change relations belong to their commit
        mutate(manifest)
        token = uuid.uuid4().hex[:12]
        tmp = os.path.join(_log_dir(table), f".tmp-{token}-{nxt}.json")
        with open(tmp, "w") as fh:
            json.dump(_encode_manifest(table, nxt, manifest), fh)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, _manifest_path(table, nxt))
        except FileExistsError:
            os.remove(tmp)
            continue
        os.remove(tmp)
        _maybe_checkpoint(table, nxt, manifest)
        return nxt
    raise RuntimeError(f"metadata commit contention: {max_retries} retries")


def set_constraint(
    spark: SparkSession, table: str, name: str, expr: str
) -> int:
    """ADD a CHECK constraint (the Delta ``ALTER TABLE ADD CONSTRAINT``
    design point): existing rows are validated first (one scan — a
    constraint that the table already violates is refused), then the
    constraint lands in the manifest via a metadata-only commit and every
    later :func:`commit` enforces it on its new rows before the manifest
    claim.  SQL CHECK semantics: NULL passes, FALSE violates.

    Concurrency: the metadata commit is pinned to the snapshot the
    validation scan read (``expected_parent``) — a data commit landing
    between the scan and the manifest claim forces a re-validation
    against the new head, so concurrently written rows can never become
    visible under a constraint they violate."""
    from pyspark.sql import functions as F

    def mutate(m: dict) -> None:
        cons = dict(m.get("constraints", {}))
        cons[name] = expr
        m["constraints"] = cons

    for _ in range(20):
        head = (snapshots(table) or [-1])[-1]
        n_bad = (
            read_snapshot(spark, table, snapshot=head)
            .where(F.expr(expr) == False)  # noqa: E712
            .count()
        )
        if n_bad:
            raise ConstraintViolation(
                f"cannot add CHECK {name!r}: {n_bad} existing rows "
                f"violate {expr!r}"
            )
        try:
            return _metadata_commit(table, mutate, expected_parent=head)
        except CommitConflict:
            continue  # a commit landed mid-validation: re-validate on it
    raise RuntimeError("set_constraint contention: 20 retries exhausted")


def _constraint_refs(manifest: dict, column: str) -> list[str]:
    """Names of CHECK constraints whose expression references ``column``
    (word-boundary match — the conservative Delta stance: DDL on a
    constrained column is refused rather than silently rewritten)."""
    import re as _re

    pat = _re.compile(rf"\b{_re.escape(column)}\b")
    return [
        n
        for n, e in (manifest.get("constraints") or {}).items()
        if pat.search(e)
    ]


def _activate_mapping(m: dict) -> None:
    """First rename/drop on a table turns COLUMN MAPPING on: physical
    names freeze at their current values and every name ever assigned is
    recorded (a future re-add of a dropped name gets a fresh physical
    name instead of resurrecting the old bytes)."""
    if not m.get("column_mapping"):
        m["column_mapping"] = True
        m.setdefault("physical", {})
        m["physical_used"] = sorted(
            {n for n, _t in m.get("columns") or []}
            | set(m.get("physical", {}).values())
        )


def rename_column(spark: SparkSession, table: str, old: str, new: str) -> int:
    """RENAME COLUMN as a METADATA-ONLY commit (the Delta column-mapping
    design point): zero data files move — files keep their physical
    column names forever, and the manifest maps logical → physical.
    Time travel to a pre-rename snapshot reads under the OLD name (each
    snapshot surfaces its own logical schema); the change feed surfaces
    the whole window under the LATEST names.  Refused while a CHECK
    constraint references ``old`` (drop the constraint first — silently
    rewriting its expression would change a recorded contract).

    Streaming note: like Delta without ``schemaTrackingLocation``, the
    ``snaptable``/``snapcdf`` STREAM legs refuse a column-mapped table —
    a consumer restarts from a full read after a rename."""
    for _ in range(20):
        head = (snapshots(table) or [-1])[-1]
        if head < 0:
            raise ValueError(f"no snapshots committed at {table}")
        m = _read_manifest(table, head)
        names = [n for n, _t in m["columns"]]
        if old not in names:
            raise ValueError(f"no column {old!r} in {names}")
        if new in names:
            raise ValueError(f"column {new!r} already exists")
        refs = _constraint_refs(m, old)
        if refs:
            raise ValueError(
                f"cannot rename {old!r}: CHECK constraint(s) {refs} "
                "reference it — drop them first"
            )

        def mutate(mm: dict) -> None:
            _activate_mapping(mm)
            phys = dict(mm["physical"])
            phys[new] = phys.pop(old, old)
            mm["physical"] = {k: v for k, v in phys.items()}
            mm["columns"] = [
                [new if n == old else n, t] for n, t in mm["columns"]
            ]

        try:
            return _metadata_commit(table, mutate, expected_parent=head)
        except CommitConflict:
            continue
    raise RuntimeError("rename_column contention: 20 retries exhausted")


def drop_column(spark: SparkSession, table: str, name: str) -> int:
    """DROP COLUMN as a METADATA-ONLY commit: the column leaves the
    logical schema; its bytes stay in the data files (time travel still
    reads them) and are reclaimed as files age out via :func:`vacuum`
    after rewrites.  A later re-add of the same name is a NEW column
    (fresh physical name) — the dropped values never resurface.  Refused
    while a CHECK constraint references the column."""
    for _ in range(20):
        head = (snapshots(table) or [-1])[-1]
        if head < 0:
            raise ValueError(f"no snapshots committed at {table}")
        m = _read_manifest(table, head)
        names = [n for n, _t in m["columns"]]
        if name not in names:
            raise ValueError(f"no column {name!r} in {names}")
        if len(names) == 1:
            raise ValueError("cannot drop the only column")
        refs = _constraint_refs(m, name)
        if refs:
            raise ValueError(
                f"cannot drop {name!r}: CHECK constraint(s) {refs} "
                "reference it — drop them first"
            )

        def mutate(mm: dict) -> None:
            _activate_mapping(mm)
            phys = dict(mm["physical"])
            phys.pop(name, None)
            mm["physical"] = phys
            mm["columns"] = [[n, t] for n, t in mm["columns"] if n != name]

        try:
            return _metadata_commit(table, mutate, expected_parent=head)
        except CommitConflict:
            continue
    raise RuntimeError("drop_column contention: 20 retries exhausted")


def restore(spark: SparkSession, table: str, to_snapshot: int) -> int:
    """RESTORE the table to a previous snapshot's state (the Delta
    ``RESTORE TABLE ... TO VERSION AS OF`` design point): publishes a NEW
    overwrite commit whose file set (including deletion-vector state) is
    the target snapshot's — history is preserved, nothing is rewritten or
    deleted, and the restore itself can be time-traveled past or restored
    away again.

    Semantics pinned here:

    - the target's data files must still exist — restoring past a
      :func:`vacuum` horizon fails loudly instead of publishing a
      snapshot that cannot be read;
    - current CHECK constraints are re-validated against the restored
      state (a restore cannot resurrect rows a since-added constraint
      forbids — the table never visibly violates its contract);
    - the change feed sees the restore as an overwrite and synthesizes
      the delete/insert churn via the file-targeted logical diff;
    - writer-transaction watermarks are NOT rolled back (a replayed
      microbatch stays recognizable after a restore).

    Cost: manifest copy + one constraint-validation scan of the restored
    state (skipped when the table has no constraints).  The commit is
    pinned to the head whose constraint set was validated — a constraint
    added concurrently forces a re-validation, same as
    :func:`set_constraint`."""
    ids = snapshots(table)
    if to_snapshot not in ids:
        raise ValueError(f"snapshot {to_snapshot} not in {ids}")
    target = _read_manifest(table, to_snapshot)
    missing = [e["path"] for e in target["files"] if not os.path.exists(e["path"])]
    if missing:
        raise ValueError(
            f"cannot restore to snapshot {to_snapshot}: {len(missing)} data "
            f"file(s) vacuumed away (first: {missing[0]})"
        )

    def mutate(m: dict) -> None:
        m["op"] = "overwrite"
        m["data_change"] = True
        m["files"] = target["files"]
        m["columns"] = target["columns"]
        m["restored_from"] = to_snapshot
        # restore the target's column-mapping state WITH its schema (a
        # head-era logical→physical map over the target's columns would
        # mis-resolve); physical_used stays the union so names assigned
        # in either era can never be reused
        used = set(m.get("physical_used") or []) | set(
            target.get("physical_used") or []
        )
        for k in ("column_mapping", "physical", "physical_used"):
            if k in target:
                m[k] = target[k]
            else:
                m.pop(k, None)
        if target.get("column_mapping"):
            m["physical_used"] = sorted(used)

    for _ in range(20):
        head = snapshots(table)[-1]
        head_m = _read_manifest(table, head)
        cons = dict(head_m.get("constraints", {}))
        if cons:
            from pyspark.sql import functions as F

            # constraint exprs use the HEAD's logical names; target files
            # carry stable physical names — project with the head manifest
            restored = _read_entries(spark, target["files"], head_m)
            viol = restored.agg(
                *[
                    F.sum(F.when(F.expr(e) == False, 1).otherwise(0)).alias(n)  # noqa: E712
                    for n, e in cons.items()
                ]
            ).collect()[0]
            bad = {n: int(viol[n]) for n in cons if viol[n]}
            if bad:
                raise ConstraintViolation(
                    f"restore to snapshot {to_snapshot} would violate CHECK "
                    f"constraint(s) {bad}"
                )
        try:
            return _metadata_commit(table, mutate, expected_parent=head)
        except CommitConflict:
            continue  # a commit landed mid-validation: re-validate on it
    raise RuntimeError("restore contention: 20 retries exhausted")


def clone(src_table: str, dst_table: str, *, snapshot: int | None = None) -> int:
    """SHALLOW CLONE (the Delta design point): create ``dst_table`` whose
    snapshot 0 references ``src_table``'s data files (at ``snapshot``,
    default latest) WITHOUT copying a byte — the zero-cost dev/test
    sandbox over a production table.

    Contract pinned here:

    - DML on the clone is copy-on-write INTO THE CLONE's directory: the
      source never observes a clone's writes, and untouched entries keep
      referencing source files;
    - ``vacuum`` is directory-scoped, so vacuuming the clone can never
      delete source files (and vice versa) — but vacuuming the SOURCE
      does not know about clone references, so source vacuums can break
      a shallow clone (the same documented hazard as Delta's; promote
      with a rewriting ``compact`` on the clone to sever the dependency);
    - CHECK constraints travel with the clone (table contract);
    - writer-transaction watermarks do NOT (a clone is a new writer
      lineage — a stream re-pointed at it must start a fresh ledger)."""
    src_ids = snapshots(src_table)
    if not src_ids:
        raise ValueError(f"clone source {src_table!r} has no snapshots")
    n = src_ids[-1] if snapshot is None else snapshot
    if n not in src_ids:
        raise ValueError(f"snapshot {n} not in {src_ids}")
    if snapshots(dst_table):
        raise ValueError(f"clone destination {dst_table!r} already exists")
    src = _read_manifest(src_table, n)
    import time as _time

    os.makedirs(_log_dir(dst_table), exist_ok=True)
    manifest = {
        "snapshot": 0,
        "op": "clone",
        "ts": _time.time(),
        "columns": src["columns"],
        "files": src["files"],
        "data_change": True,
        "cloned_from": {"table": src_table, "snapshot": n},
        **(
            {"constraints": src["constraints"]}
            if src.get("constraints")
            else {}
        ),
    }
    token = uuid.uuid4().hex[:12]
    tmp = os.path.join(_log_dir(dst_table), f".tmp-{token}-0.json")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
        fh.flush()
        os.fsync(fh.fileno())
    try:
        os.link(tmp, _manifest_path(dst_table, 0))
    except FileExistsError:
        os.remove(tmp)
        raise ValueError(
            f"clone destination {dst_table!r} claimed concurrently"
        ) from None
    os.remove(tmp)
    return 0


def drop_constraint(table: str, name: str) -> int:
    """Remove a CHECK constraint; later commits stop enforcing it."""

    def mutate(m: dict) -> None:
        cons = dict(m.get("constraints", {}))
        cons.pop(name, None)
        if cons:
            m["constraints"] = cons
        else:
            m.pop("constraints", None)

    return _metadata_commit(table, mutate)


def _size_bytes(text: str) -> int:
    """Parse a Spark size conf value ('10485760', '10m', '10MB', '-1')."""
    s = text.strip().lower().removesuffix("b")
    mult = 1
    for suffix, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                      ("t", 1 << 40)):
        if s.endswith(suffix):
            s, mult = s[:-1], m
            break
    return int(float(s) * mult)


def entries_stats(entries: list[dict]) -> dict:
    """Manifest-derived table statistics over ``entries``' files: recorded
    row counts, DV-deleted rows, on-disk bytes, and the LIVE estimates
    (bytes scaled by the live-row fraction).  Pure manifest/inode reads —
    no Spark job, no file scan — which is the whole point: first-run plans
    can be informed by the same numbers steady-state plans learn at
    runtime."""
    rows = sum(e["rows"] for e in entries)
    deleted = sum(len(_dv_read(e)) for e in entries)
    size = sum(
        os.path.getsize(e["path"])
        for e in entries
        if os.path.exists(e["path"])
    )
    live_rows = rows - deleted
    live_bytes = int(size * (live_rows / rows)) if rows else 0
    return {
        "rows": rows,
        "live_rows": live_rows,
        "deleted_rows": deleted,
        "bytes": size,
        "live_bytes": live_bytes,
        "files": len(entries),
    }


def table_stats(table: str, *, snapshot: int | None = None) -> dict:
    """Statistics for a snapshot (default latest) from its manifest alone —
    see :func:`entries_stats`."""
    ids = snapshots(table)
    if not ids:
        raise ValueError(f"no snapshots committed at {table}")
    n = ids[-1] if snapshot is None else snapshot
    return entries_stats(_read_manifest(table, n)["files"])


def read_snapshot(
    spark: SparkSession,
    table: str,
    *,
    snapshot: int | None = None,
    as_of_ts: float | None = None,
    prune: dict[str, tuple] | None = None,
    prune_eq: dict | None = None,
    plan_stats: bool = False,
) -> DataFrame:
    """DataFrame over exactly one snapshot's file set (default: latest).

    ``as_of_ts`` resolves the snapshot by commit wall-clock time instead
    (``TIMESTAMP AS OF`` — see :func:`snapshot_as_of`); mutually
    exclusive with ``snapshot``.

    ``prune={col: (lo, hi)}`` drops files whose manifest min/max for
    ``col`` cannot overlap [lo, hi] BEFORE planning the scan (files without
    recorded stats are always kept — skipping must never lose rows).
    ``prune_eq={col: value}`` drops files whose manifest BLOOM for ``col``
    proves the value absent (recorded via ``commit(bloom_cols=...)``) —
    the point-lookup complement: with an unsorted key column every file's
    [min, max] spans the whole domain and range stats prune nothing, while
    the bloom keeps ~fp_rate of the files.  Both predicates are NOT
    applied to the surviving rows; callers add their own ``filter`` (which
    then also prunes row groups in the kept files).  An empty table (no
    commits) raises ValueError.

    ``plan_stats=True`` makes the read COST-INFORMED on the first run:
    when the manifest's LIVE size (file bytes scaled by the surviving
    row fraction after deletion vectors, over the PRUNED entry set) fits
    under ``spark.sql.autoBroadcastJoinThreshold``, the returned frame
    carries a broadcast hint, so a join against it plans
    BroadcastHashJoin immediately.  This closes the stats-less-first-run
    gap: Spark's static estimate is the RAW parquet bytes — a table whose
    rows are mostly DV-deleted (post-purge, pre-compaction) or mostly
    pruned looks 10-100x its live size and plans a SortMergeJoin that AQE
    can only repair after a shuffle has already been written.  The
    manifest knows better before any job runs."""
    ids = snapshots(table)
    if not ids:
        raise ValueError(f"no snapshots committed at {table}")
    if as_of_ts is not None:
        if snapshot is not None:
            raise ValueError("snapshot and as_of_ts are mutually exclusive")
        snapshot = snapshot_as_of(table, as_of_ts)
    n = ids[-1] if snapshot is None else snapshot
    if n not in ids:
        raise ValueError(f"snapshot {n} not in {ids}")
    m = _read_manifest(table, n)
    entries = m["files"]
    if prune or prune_eq:
        def overlaps(e: dict) -> bool:
            st = e.get("stats") or {}
            for col, (lo, hi) in (prune or {}).items():
                if col not in st:
                    continue  # no stats → keep
                fmin, fmax = st[col]
                if fmax < lo or fmin > hi:
                    return False
            bl = e.get("bloom") or {}
            for col, val in (prune_eq or {}).items():
                if col not in bl:
                    continue  # no bloom → keep
                if not _bloom_may_contain(bl[col], val):
                    return False
            return True

        all_files = [f["path"] for f in _read_manifest(table, n)["files"]]
        entries = [e for e in entries if overlaps(e)]
        if not entries and all_files:
            # everything pruned: keep the TABLE's schema so callers can
            # still filter/select/join — limit(0) plans no row reads.  The
            # NEWEST file carries the full column set under additive-only
            # evolution (the oldest would drop added trailing columns and
            # break callers selecting them — same reason
            # snapstream._table_ddl reads files[-1])
            return _logical_projection(
                spark.read.parquet(all_files[-1]).limit(0), m
            )
    files = [f["path"] for f in entries]
    if not files:
        raise ValueError(f"snapshot {n} at {table} references no files")
    # mergeSchema: pre-evolution files surface NULL for added columns;
    # deletion vectors (if any surviving entry carries one) anti-filter
    # the scan by (file, row position) — a no-op otherwise; a mapped
    # table's snapshot surfaces under ITS OWN logical names (time travel
    # to a pre-rename snapshot reads under the pre-rename name)
    df = spark.read.option("mergeSchema", "true").parquet(*files)
    out = _logical_projection(_apply_dv(spark, df, entries), m)
    if plan_stats:
        from pyspark.sql import functions as F

        threshold = _size_bytes(
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
        )
        if threshold > 0 and entries_stats(entries)["live_bytes"] <= threshold:
            out = F.broadcast(out)
    return out


def snapshot_as_of(table: str, ts: float) -> int:
    """The snapshot id current AT wall-clock time ``ts`` — the latest
    commit whose manifest timestamp is ≤ ts (Delta's ``TIMESTAMP AS OF``
    resolution).  Manifests predating the ``ts`` field fall back to the
    manifest file's mtime (the moment the atomic link landed).  Raises
    ValueError when ``ts`` precedes the first commit."""
    best = None
    for n in snapshots(table):
        committed = _read_manifest(table, n).get("ts")
        if committed is None:
            committed = os.path.getmtime(_manifest_path(table, n))
        if committed <= ts:
            best = n
    if best is None:
        raise ValueError(f"no snapshot at {table} as of {ts}")
    return best


def history(table: str) -> list[dict]:
    """Audit listing, oldest first: one dict per snapshot with id, op,
    commit timestamp, file count, metadata row count (net of deletion
    vectors), and the net row delta vs the previous snapshot — the
    `DESCRIBE HISTORY` surface, from manifests only (no data file is
    opened unless a legacy entry lacks its row count)."""
    out: list[dict] = []
    prev_rows = 0
    for n in snapshots(table):
        m = _read_manifest(table, n)
        rows = snap_count(table, snapshot=n)
        out.append(
            {
                "snapshot": n,
                "op": m["op"],
                "ts": m.get("ts") or os.path.getmtime(_manifest_path(table, n)),
                "n_files": len(m["files"]),
                "rows": rows,
                "row_delta": rows - prev_rows,
                # merge attribution rides into the audit surface: both the
                # file-level merge (op="merge_branch") and the row-level
                # one (op="overwrite" + extra_meta) stamp merged_branch
                **(
                    {"merged_branch": m["merged_branch"]}
                    if m.get("merged_branch")
                    else {}
                ),
            }
        )
        prev_rows = rows
    return out


def snap_count(table: str, *, snapshot: int | None = None) -> int:
    """Exact row count of a snapshot from METADATA ONLY — per-entry row
    counts recorded at commit time minus deletion-vector counts; a footer
    read (num_rows only, no row data) covers entries from manifests
    predating the ``rows`` field.  The `SELECT count(*)` fast path every
    table format grows: no scan task is ever scheduled."""
    ids = snapshots(table)
    if not ids:
        raise ValueError(f"no snapshots committed at {table}")
    n = ids[-1] if snapshot is None else snapshot
    if n not in ids:
        raise ValueError(f"snapshot {n} not in {ids}")
    total = 0
    for e in _read_manifest(table, n)["files"]:
        total += e["rows"] if "rows" in e else _row_count(e["path"])
        total -= (e.get("dv") or {}).get("count", 0)
    return total


def vacuum(table: str, *, keep_last: int = 1, tmp_ttl_s: float = 3600.0) -> list[str]:
    """Delete data files unreachable from the last ``keep_last`` snapshots
    (and drop the older manifests).  Returns the removed file paths.

    Safe under concurrent writers: ``commit`` writes data files BEFORE
    publishing the manifest, so an in-flight commit's fresh files look
    unreferenced for a window.  Unreferenced files younger than
    ``tmp_ttl_s`` are therefore SKIPPED (same mtime threshold that guards
    the manifest temp files) — only files both unreachable and older than
    the TTL can belong to a dead writer rather than a live one."""
    import time

    ids = snapshots(table)
    keep_ids = ids[-keep_last:] if keep_last else []
    # the delta-encoded log resolves a snapshot by walking back to an
    # anchor; dropping manifests below the retention horizon would strand
    # a kept delta tail — so the OLDEST kept snapshot is checkpointed
    # first (self-contained), making every kept id resolvable forever
    if keep_ids and ids[0] != keep_ids[0]:
        oldest = keep_ids[0]
        if "files" not in _load_raw(table, oldest) and not os.path.exists(
            _ckpt_path(table, oldest)
        ):
            _maybe_checkpoint(
                table, oldest, _resolve_manifest(table, oldest), force=True
            )
    live: set[str] = set()
    live_dv: set[str] = set()
    live_cdc: set[str] = set()
    for n in keep_ids:
        m = _read_manifest(table, n)
        for f in m["files"]:
            live.update([f["path"]])
            if f.get("dv"):
                live_dv.add(f["dv"]["path"])
        live_cdc.update(m.get("cdc") or [])
    # DATA BRANCHES reference this table's files by this table's paths
    # (snapbranch: a branch is a shallow clone + divergent commits) —
    # every snapshot of every live branch pins its files here, or a main
    # vacuum would silently hole the branch.  Branch directories prune
    # their own garbage with their own vacuum.
    parent = os.path.dirname(os.path.abspath(table)) or "."
    stem = os.path.basename(os.path.abspath(table)) + "@"
    if os.path.isdir(parent):
        for d in os.listdir(parent):
            bdir = os.path.join(parent, d)
            if d.startswith(stem) and os.path.isdir(
                os.path.join(bdir, _LOG)
            ):
                try:
                    for bn in snapshots(bdir):
                        bm = _read_manifest(bdir, bn)
                        for f in bm["files"]:
                            live.add(f["path"])
                            if f.get("dv"):
                                live_dv.add(f["dv"]["path"])
                except FileNotFoundError:
                    continue  # branch dropped mid-scan: its pins die with it
    removed: list[str] = []
    now = time.time()

    def _mtime(path: str) -> float | None:
        # concurrent writers legitimately clean their own dirs mid-scan
        # (a merge retry rmtree's its stale attempt dir; drop_branch
        # removes a whole tree) — a vanished path is SOMEONE ELSE'S
        # completed cleanup, never an error for this scanner
        try:
            return os.path.getmtime(path)
        except FileNotFoundError:
            return None

    def _ls(path: str) -> list[str]:
        try:
            return os.listdir(path)
        except FileNotFoundError:
            return []

    data_root = os.path.join(table, "data")
    if os.path.isdir(data_root):
        for cdir in _ls(data_root):
            full = os.path.join(data_root, cdir)
            for f in _ls(full):
                p = os.path.join(full, f)
                mt = _mtime(p)
                if (
                    f.endswith(".parquet")
                    and p not in live
                    and mt is not None
                    and now - mt > tmp_ttl_s
                ):
                    try:
                        os.remove(p)
                    except FileNotFoundError:
                        continue
                    removed.append(p)
            # an EMPTY commit dir gets the same TTL guard as a fresh
            # file: a merge/commit just ran makedirs and is about to
            # land its first link — chaos family 5 caught a vacuum
            # rmtree'ing that window (r11), failing the link on a
            # vanished parent
            mt = _mtime(full)
            if (
                mt is not None
                and not any(x.endswith(".parquet") for x in _ls(full))
                and now - mt > tmp_ttl_s
            ):
                import shutil

                shutil.rmtree(full, ignore_errors=True)
    # deletion-vector sidecars: same liveness + TTL rules as data files
    dv_root = os.path.join(table, "_dv")
    if os.path.isdir(dv_root):
        for ddir in _ls(dv_root):
            full = os.path.join(dv_root, ddir)
            for f in _ls(full):
                p = os.path.join(full, f)
                mt = _mtime(p)
                if p not in live_dv and mt is not None and now - mt > tmp_ttl_s:
                    try:
                        os.remove(p)
                    except FileNotFoundError:
                        continue
                    removed.append(p)
            mt = _mtime(full)
            if not _ls(full) and mt is not None and now - mt > tmp_ttl_s:
                try:
                    os.rmdir(full)
                except OSError:
                    pass  # refilled or removed concurrently
    # change-feed sidecars: a _cdc_data file is live only while a KEPT
    # manifest's "cdc" list references it — once its manifest is dropped,
    # the feed over that window is unreadable anyway (read_changes fails
    # loudly on vacuumed history), so the sidecar is pure garbage.  Same
    # TTL guard protects an in-flight commit's fresh sidecars.
    cdc_root = os.path.join(table, "_cdc_data")
    if os.path.isdir(cdc_root):
        for cdir in _ls(cdc_root):
            full = os.path.join(cdc_root, cdir)
            for f in _ls(full):
                p = os.path.join(full, f)
                mt = _mtime(p)
                if p not in live_cdc and mt is not None and now - mt > tmp_ttl_s:
                    try:
                        os.remove(p)
                    except FileNotFoundError:
                        continue
                    removed.append(p)
            mt = _mtime(full)
            if not _ls(full) and mt is not None and now - mt > tmp_ttl_s:
                try:
                    os.rmdir(full)
                except OSError:
                    pass  # refilled or removed concurrently
    for n in ids:
        if n not in keep_ids:
            os.remove(_manifest_path(table, n))
            ck = _ckpt_path(table, n)
            if os.path.exists(ck):
                os.remove(ck)
    # sweep manifest temp files from writers killed mid-commit — but only
    # STALE ones: a live committer is inside its open→link→remove window
    # for milliseconds, so an age threshold cleanly separates the two.
    # That same window means the file can vanish (renamed into place)
    # between listdir and getmtime — a vanished tmp is a committer that
    # FINISHED, never an error (the chaos-5 vacuum loop caught this).
    for name in os.listdir(_log_dir(table)):
        if name.startswith(".tmp-"):
            full = os.path.join(_log_dir(table), name)
            mt = _mtime(full)
            if mt is not None and now - mt > tmp_ttl_s:
                try:
                    os.remove(full)
                except FileNotFoundError:
                    pass
    return removed


def added_files(table: str, n: int) -> list[str]:
    """Paths first referenced by snapshot ``n`` (its delta vs n-1).  For an
    ``overwrite`` snapshot this is its full file set — the delta chain
    restarts there."""
    ids = snapshots(table)
    if n not in ids:
        raise ValueError(f"snapshot {n} not in {ids}")
    raw = _load_raw(table, n)
    if n > 0 and raw.get("op") != "overwrite" and "files_delta" in raw:
        # O(delta) fast path: an append/metadata delta record carries
        # exactly the first-referenced entries — no resolution, no diff
        return [e["path"] for e in raw["files_delta"].get("add", ())]
    cur = _read_manifest(table, n)
    if n == 0 or cur["op"] == "overwrite":
        return [f["path"] for f in cur["files"]]
    prev = {f["path"] for f in _read_manifest(table, n - 1)["files"]}
    return [f["path"] for f in cur["files"] if f["path"] not in prev]


def read_increment(
    spark: SparkSession, table: str, *, since: int, until: int | None = None
) -> DataFrame:
    """Rows appended AFTER snapshot ``since`` up to ``until`` (default
    latest) — the CDC-lite feed an incremental consumer (posting-index
    maintenance, downstream aggregates) tails instead of re-reading the
    table.  Because data files are immutable and manifests only ever ADD
    paths on append, the increment is exactly the union of each covered
    snapshot's delta.  Crossing an ``overwrite`` snapshot raises: the delta
    chain restarts there and the consumer must resync from a full read."""
    ids = snapshots(table)
    if since not in ids:
        raise ValueError(f"snapshot {since} not in {ids}")
    hi = ids[-1] if until is None else until
    if hi not in ids:
        raise ValueError(f"snapshot {hi} not in {ids}")
    files: list[str] = []
    for n in ids:
        if since < n <= hi:
            if _read_manifest(table, n)["op"] == "overwrite":
                raise ValueError(
                    f"snapshot {n} is an overwrite: incremental chain broken, resync"
                )
            files.extend(added_files(table, n))
    if not files:
        return read_snapshot(spark, table, snapshot=hi).limit(0)
    return spark.read.parquet(*files)


def _change_chunks(table: str, since: int, until: int) -> list[dict]:
    """Metadata-only CHANGE PLAN for snapshots in ``(since, until]`` — one
    descriptor per (file, change kind):

    ``{"path", "kind", "version", "ts", "exclude", "include"}``

    * ``kind="cdc"`` — a writer-recorded ``_cdc_data`` sidecar; the file
      itself carries ``_change_type``;
    * ``kind="insert"`` / ``"delete"`` — a data file whose LIVE rows
      (minus ``exclude`` positions, the file's deletion vector) are the
      change rows, or — when ``include`` is set — exactly those positions
      (the grown/shrunk-DV delta of a carried file).

    ``since=-1`` means "from the beginning" (snapshot 0 surfaces as
    inserts).  Shared by the batch reader (:func:`read_changes`) and the
    ``snapcdf`` streaming source so the two can never drift — driver-side,
    O(manifests + DV sidecars), no data file is opened."""
    ids = snapshots(table)
    if since != -1 and since not in ids:
        raise ValueError(f"snapshot {since} not in {ids}")
    if until not in ids:
        raise ValueError(f"snapshot {until} not in {ids}")
    chunks: list[dict] = []

    def _add(path, kind, n, ts, exclude=(), include=None):
        chunks.append(
            {
                "path": path,
                "kind": kind,
                "version": n,
                "ts": ts,
                "exclude": list(exclude),
                "include": include,
            }
        )

    for n in ids:
        if not since < n <= until:
            continue
        m = _read_manifest(table, n)
        ts = m.get("ts") or os.path.getmtime(_manifest_path(table, n))
        if not m.get("data_change", True):
            continue  # pure reorganization: same rows, new layout
        if m.get("cdc") is not None:
            # recorded change relation — possibly explicitly EMPTY
            # ("cdc": [] — a DML call that matched nothing): zero feed
            # rows, never the logical-diff fallback
            for p in m["cdc"]:
                _add(p, "cdc", n, ts)
            continue
        prev = _read_manifest(table, n - 1)["files"] if n > 0 else []
        prev_by_path = {e["path"]: e for e in prev}
        cur_by_path = {e["path"]: e for e in m["files"]}
        if m["op"] == "append" or n == 0:
            for e in m["files"]:
                if e["path"] not in prev_by_path:
                    _add(e["path"], "insert", n, ts, exclude=_dv_read(e))
            continue
        # overwrite with no recorded change relation: logical diff of the
        # manifest delta (file-targeted — untouched carried entries never
        # appear on either side)
        for e in prev:
            if e["path"] not in cur_by_path:
                _add(e["path"], "delete", n, ts, exclude=_dv_read(e))
        for e in m["files"]:
            if e["path"] not in prev_by_path:
                _add(e["path"], "insert", n, ts, exclude=_dv_read(e))
        # carried entries whose deletion vector CHANGED: grown positions
        # are row deletes (the delete_where_dv shape); shrunk positions
        # (a DV rollback) resurface as inserts
        for path, cur_e in cur_by_path.items():
            prev_e = prev_by_path.get(path)
            if prev_e is None:
                continue
            old = set(_dv_read(prev_e))
            new = set(_dv_read(cur_e))
            if new - old:
                _add(path, "delete", n, ts, include=sorted(new - old))
            if old - new:
                _add(path, "insert", n, ts, include=sorted(old - new))
    return chunks


def read_changes(
    spark: SparkSession,
    table: str,
    *,
    since: int,
    until: int | None = None,
    branch: str | None = None,
) -> DataFrame:
    """CHANGE DATA FEED: every row-level change committed AFTER snapshot
    ``since`` up to ``until`` (default latest), as the Delta CDF relation —
    the table's columns plus ``_change_type`` (``insert`` / ``delete`` /
    ``update_preimage`` / ``update_postimage``), ``_commit_version`` and
    ``_commit_timestamp``.  This is what an incremental downstream consumer
    (materialized aggregate, search index, replication target) applies
    instead of diffing full snapshots — and unlike :func:`read_increment`
    it survives overwrite commits, because deletes are first-class rows.

    Cost model, per covered snapshot:

    * commits whose writer recorded a change relation (the DML helpers'
      ``change_feed=True``) read their ``_cdc_data`` sidecars — O(changes);
    * plain appends read exactly the added files — O(inserted rows);
    * ``data_change=False`` commits (compaction / z-order clustering) are
      SKIPPED — identical row set, new layout, zero feed rows;
    * overwrites with no recorded relation fall back to a LOGICAL DIFF of
      the manifest delta: removed files' live rows surface as deletes,
      added files' live rows as inserts, and grown deletion vectors as
      per-position deletes — O(changed files), never O(table).  All three
      shapes are file-targeted scans unioned lazily; nothing is collected.

    ``branch=`` tails a BRANCH's feed instead of main's (the branch is its
    own snapshot log, so offsets are branch snapshot ids; a consumer can
    follow an experiment's changes without the experiment ever touching
    main).  After the branch merges, the merge commit appears on MAIN's
    feed — as the writer-recorded row change set for a row-level merge,
    or the manifest's file-level delta for a file-level one.

    Design point: Delta Lake's ``table_changes`` / ``readChangeFeed``
    (public protocol, CDC files + ``dataChange`` flag on actions)."""
    from pyspark.sql import functions as F

    if branch is not None:
        from event_stream_spark.sources.snapbranch import branch_table

        table = branch_table(table, branch)
    ids = snapshots(table)
    # since=-1 = "from the beginning" (snapshot 0's rows surface as
    # inserts) — the same convention the snapcdf stream's initial offset
    # uses, so batch and stream can express identical windows
    if since != -1 and since not in ids:
        raise ValueError(f"snapshot {since} not in {ids}")
    hi = ids[-1] if until is None else until
    chunks = _change_chunks(table, since, hi)

    def _stamp(df: DataFrame, n: int, ts: float) -> DataFrame:
        return df.select(
            "*",
            F.lit(n).cast("long").alias("_commit_version"),
            F.lit(float(ts)).alias("_commit_timestamp"),
        )

    def _pos_scan(paths: list[str]) -> DataFrame:
        return spark.read.option("mergeSchema", "true").parquet(*paths).select(
            "*",
            F.element_at(
                F.split(F.col("_metadata.file_path"), "/"), -1
            ).alias("__file"),
            F.col("_metadata.row_index").alias("__row"),
        )

    parts: list[DataFrame] = []
    # PATH-DATED categories collapse to ONE scan each, regardless of how
    # many snapshots the window covers: cdc sidecars and first-referenced
    # data files live in c{version:012d}-{token} dirs written BY that
    # commit (newly referenced ⇒ newly written — carried entries are in
    # the previous manifest and never produce these chunks), so the
    # commit version is derivable from the file path and the whole
    # category is a single plan node + one ts-map broadcast.  The
    # per-version union this replaces built O(window) relations — a
    # 10k-commit window would have choked the driver at plan time.
    cdc_all = [c for c in chunks if c["kind"] == "cdc"]
    ins_all = [
        c for c in chunks
        if c["kind"] == "insert" and c["include"] is None and not c["exclude"]
    ]
    if cdc_all or ins_all:
        vts = sorted({(c["version"], float(c["ts"])) for c in chunks})
        vmap = F.broadcast(
            spark.createDataFrame(
                vts, "_commit_version long, _commit_timestamp double"
            )
        )
        ver = F.regexp_extract(
            F.col("_metadata.file_path"), r"/c(\d{12})-[0-9a-f]+/", 1
        ).cast("long")

        def _path_stamped(paths: list[str], ctype: str | None) -> DataFrame:
            df = spark.read.option("mergeSchema", "true").parquet(*paths)
            if ctype is not None:
                df = df.withColumn("_change_type", F.lit(ctype))
            cols = df.columns
            return (
                df.withColumn("_commit_version", ver)
                .join(vmap, "_commit_version")
                .select(*cols, "_commit_version", "_commit_timestamp")
            )

        if cdc_all:
            parts.append(_path_stamped([c["path"] for c in cdc_all], None))
        if ins_all:
            parts.append(
                _path_stamped([c["path"] for c in ins_all], "insert")
            )
    # position-filtered and removed-file categories stay per-version: a
    # DELETED file's path carries its CREATION commit, not the deleting
    # one, and include/exclude position sets are per-(version, file)
    by_ver: dict[tuple, list[dict]] = {}
    for c in chunks:
        if c["kind"] == "cdc" or (
            c["kind"] == "insert"
            and c["include"] is None
            and not c["exclude"]
        ):
            continue  # handled by the single path-dated scans above
        by_ver.setdefault((c["version"], c["ts"]), []).append(c)
    for (n, ts), cs in sorted(by_ver.items()):
        for ctype in ("insert", "delete"):
            plain = [
                c
                for c in cs
                if c["kind"] == ctype and c["include"] is None and not c["exclude"]
            ]
            excl = [
                c
                for c in cs
                if c["kind"] == ctype and c["include"] is None and c["exclude"]
            ]
            incl = [c for c in cs if c["kind"] == ctype and c["include"] is not None]
            if plain:
                parts.append(
                    _stamp(
                        spark.read.option("mergeSchema", "true")
                        .parquet(*[c["path"] for c in plain])
                        .withColumn("_change_type", F.lit(ctype)),
                        n,
                        ts,
                    )
                )
            if excl:
                pairs = [
                    (os.path.basename(c["path"]), i)
                    for c in excl
                    for i in c["exclude"]
                ]
                pos = spark.createDataFrame(pairs, "__file string, __row long")
                parts.append(
                    _stamp(
                        _pos_scan([c["path"] for c in excl])
                        .join(F.broadcast(pos), ["__file", "__row"], "left_anti")
                        .drop("__file", "__row")
                        .withColumn("_change_type", F.lit(ctype)),
                        n,
                        ts,
                    )
                )
            if incl:
                pairs = [
                    (os.path.basename(c["path"]), i)
                    for c in incl
                    for i in c["include"]
                ]
                pos = spark.createDataFrame(pairs, "__file string, __row long")
                parts.append(
                    _stamp(
                        _pos_scan([c["path"] for c in incl])
                        .join(F.broadcast(pos), ["__file", "__row"], "left_semi")
                        .drop("__file", "__row")
                        .withColumn("_change_type", F.lit(ctype)),
                        n,
                        ts,
                    )
                )
    if not parts:
        return (
            read_snapshot(spark, table, snapshot=hi)
            .limit(0)
            .select(
                "*",
                F.lit("insert").alias("_change_type"),
                F.lit(0).cast("long").alias("_commit_version"),
                F.lit(0.0).alias("_commit_timestamp"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    # a mapped table's feed surfaces under the LATEST logical names for
    # the whole window — physical names are stable across renames, so one
    # projection covers every covered version's files and cdc sidecars
    return _logical_projection(
        out,
        _read_manifest(table, hi),
        extra=("_change_type", "_commit_version", "_commit_timestamp"),
    )


# ---------------------------------------------------------------------------
# Copy-on-write DML — the lakehouse write-path operations over snapshots
# ---------------------------------------------------------------------------


def _latest_snapshot(table: str) -> int:
    """Latest committed id, with the same ValueError contract as
    read_snapshot — DML on a never-committed table is a caller error, not
    an IndexError."""
    ids = snapshots(table)
    if not ids:
        raise ValueError(f"no snapshots committed at {table}")
    return ids[-1]


def merge_upsert(
    spark: SparkSession,
    table: str,
    updates: DataFrame,
    *,
    key: str,
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
    bloom_target_max_keys: int = 100_000,
    change_feed: bool = False,
) -> int:
    """MERGE INTO by ``key`` (upsert): rows of ``updates`` replace
    same-keyed rows of the latest snapshot and new keys append — committed
    as ONE atomic ``overwrite`` snapshot (readers see the old table until
    the manifest lands; time travel keeps it after).

    FILE-TARGETED copy-on-write: when the manifest carries ``key`` stats,
    only the files whose [min, max] key range overlaps the update batch's
    key span are read and rewritten — every other file is carried into the
    new manifest verbatim (its entry, including stats, is copied; the
    bytes never move).  An untouched file cannot contain an updated key
    (its range misses the whole update span), so correctness is
    unconditional.  Files without recorded ``key`` stats are conservatively
    rewritten; a table with no stats at all degrades to the whole-table
    rewrite.  At 100 TB this is the difference between a merge costing
    O(touched files) and O(table).

    When the manifest also carries a ``key`` BLOOM, range-surviving files
    are re-tested per update key: a file whose bloom proves every update
    key absent is carried verbatim too.  This is the scattered-key case —
    CDC batches touch keys spread across the whole domain, every file's
    range overlaps, and min/max targeting rewrites the entire table while
    bloom targeting rewrites ~(touched + fp) files.  The refinement
    collects the distinct update keys once and is skipped for batches
    larger than ``bloom_target_max_keys`` (a batch that big is rewriting
    most files anyway)."""
    from pyspark.sql import functions as F

    base = _latest_snapshot(table)
    entries = _read_manifest(table, base)["files"]
    bounds = updates.agg(
        F.min(key).alias("lo"), F.max(key).alias("hi")
    ).first()
    lo, hi = bounds["lo"], bounds["hi"]
    touched, untouched = [], []
    for e in entries:
        st = (e.get("stats") or {}).get(key)
        if lo is None:  # empty update batch: nothing can be touched
            untouched.append(e)
        elif st is None:
            touched.append(e)  # no stats → must assume overlap
        elif st[1] < lo or st[0] > hi:
            untouched.append(e)
        else:
            touched.append(e)
    if touched and any((e.get("bloom") or {}).get(key) for e in touched):
        # one job: limit(max+1) both sizes the guard and fetches the keys
        rows = (
            updates.select(key)
            .distinct()
            .limit(bloom_target_max_keys + 1)
            .collect()
        )
        if len(rows) <= bloom_target_max_keys:
            keys = [r[0] for r in rows if r[0] is not None]
            still = []
            for e in touched:
                bl = (e.get("bloom") or {}).get(key)
                if bl is None or any(_bloom_may_contain(bl, v) for v in keys):
                    still.append(e)
                else:
                    untouched.append(e)
            touched = still
    if touched:
        # _read_entries, not a raw parquet read: rewriting a file that
        # carries a deletion vector must not resurrect its deleted rows
        current = _read_entries(spark, touched, _read_manifest(table, base))
        kept = current.join(updates.select(key).distinct(), key, "left_anti")
        merged = kept.unionByName(updates, allowMissingColumns=True)
    else:
        current = None
        merged = updates
    cdc = None
    if change_feed:
        # the writer knows its exact change set — record it so the feed
        # costs O(changes) to read (the Delta enableChangeDataFeed
        # design); without this, read_changes falls back to a logical
        # diff of the changed files
        from pyspark.sql import functions as _F

        upd_keys = updates.select(key).distinct()
        if current is not None:
            pre = current.join(upd_keys, key, "left_semi")
            pre_keys = pre.select(key).distinct()
            post = updates.join(pre_keys, key, "left_semi")
            news = updates.join(pre_keys, key, "left_anti")
            cdc = (
                pre.withColumn("_change_type", _F.lit("update_preimage"))
                .unionByName(
                    post.withColumn(
                        "_change_type", _F.lit("update_postimage")
                    ),
                    allowMissingColumns=True,
                )
                .unionByName(
                    news.withColumn("_change_type", _F.lit("insert")),
                    allowMissingColumns=True,
                )
            )
        else:
            cdc = updates.withColumn("_change_type", _F.lit("insert"))
    return commit(
        merged, table, mode="overwrite", stats_cols=stats_cols,
        bloom_cols=bloom_cols, expected_snapshot=base,
        carry_entries=untouched, cdc=cdc,
    )


def delete_where(
    spark: SparkSession,
    table: str,
    predicate: str,
    *,
    stats_cols: list[str] | None = None,
    prune: dict[str, tuple] | None = None,
    change_feed: bool = False,
) -> int:
    """Row-level DELETE (GDPR/abuse purge shape): commit one atomic
    ``overwrite`` snapshot holding every row NOT matching ``predicate``.
    Old snapshots still contain the rows until :func:`vacuum` — the
    documented retention window a real purge pipeline must run.

    ``prune={col: (lo, hi)}`` makes the delete FILE-TARGETED: the caller
    asserts every row the predicate matches has ``col`` within [lo, hi]
    (e.g. ``delete_where(t, "user_id = 7", prune={"user_id": (7, 7)})``),
    so files whose manifest stats cannot overlap are carried into the new
    manifest verbatim and only overlapping files are filtered and
    rewritten.  The predicate is STILL applied to every rewritten row —
    the hint only skips files it provably cannot touch; statless files
    are conservatively rewritten."""
    base = _latest_snapshot(table)
    touched_entries = _read_manifest(table, base)["files"]
    untouched: list[dict] = []
    if prune:
        def overlaps(e: dict) -> bool:
            st = e.get("stats") or {}
            for col, (lo, hi) in prune.items():
                if col not in st:
                    continue  # no stats → conservatively rewrite
                if st[col][1] < lo or st[col][0] > hi:
                    return False
            return True

        untouched = [e for e in touched_entries if not overlaps(e)]
        touched_entries = [e for e in touched_entries if overlaps(e)]
    if touched_entries:
        current = _read_entries(
            spark, touched_entries, _read_manifest(table, base)
        )
    else:
        current = read_snapshot(spark, table, snapshot=base).limit(0)
    cdc = None
    if change_feed:
        from pyspark.sql import functions as _F

        cdc = current.filter(f"({predicate}) IS TRUE").withColumn(
            "_change_type", _F.lit("delete")
        )
    # SQL DELETE semantics: remove rows where the predicate is TRUE and
    # KEEP rows where it is false OR NULL (a bare NOT(pred) would silently
    # purge every row with a NULL in a predicate column)
    return commit(
        current.filter(f"({predicate}) IS NOT TRUE"),
        table,
        mode="overwrite",
        stats_cols=stats_cols,
        expected_snapshot=base,
        carry_entries=untouched,
        cdc=cdc,
    )


#: refuse DV deletes above this many matched rows — a delete this large is
#: rewriting most files anyway, and the DV sidecars (and the driver-held
#: position list) would stop being "small by contract"
DV_MAX_ROWS = 1_000_000


def delete_where_dv(
    spark: SparkSession,
    table: str,
    predicate: str,
    *,
    change_feed: bool = False,
) -> int:
    """Row-level DELETE as DELETION VECTORS: no data file is read in full
    or rewritten — matched row POSITIONS are recorded in per-file sidecars
    and the new snapshot carries every existing file verbatim with its
    updated DV.  The GDPR-purge shape for small-fraction deletes at
    100 TB: O(matched rows) written instead of O(touched files) —
    ``merge_upsert``'s file-targeted rewrite still pays a full file
    rewrite for a single matched row; this pays 8 bytes.

    Semantics match :func:`delete_where` (rows where the predicate is
    TRUE are removed; FALSE and NULL rows stay), including atomicity
    (single manifest claim, ``CommitConflict`` on a lost race) and time
    travel (prior snapshots still see the rows; the underlying bytes are
    shared, so the retention story is :func:`vacuum`-driven exactly as
    before).  Repeated DV deletes union their positions.  ``compact`` /
    ``merge_upsert`` MATERIALIZE deletion vectors when they rewrite a
    file; ``read_increment`` across a DV commit raises (it is an
    overwrite — deletes are not expressible as an append delta).

    Raises ValueError when the predicate matches more than
    ``DV_MAX_ROWS`` rows — use the copy-on-write :func:`delete_where`
    for bulk purges."""
    base = _latest_snapshot(table)
    entries = [dict(e) for e in _read_manifest(table, base)["files"]]
    # positions are computed over the DV-APPLIED view: already-deleted
    # rows can't rematch, so each sidecar is the union of live matches
    # with the prior vector
    live = _read_entries_with_pos(spark, entries, _read_manifest(table, base))
    matched = (
        live.filter(f"({predicate}) IS TRUE")
        .select("__file", "__row")
        .limit(DV_MAX_ROWS + 1)
        .collect()
    )
    if len(matched) > DV_MAX_ROWS:
        raise ValueError(
            f"predicate matches > {DV_MAX_ROWS} rows: use the "
            "copy-on-write delete_where for bulk purges"
        )
    per_file: dict[str, list[int]] = {}
    for r in matched:
        per_file.setdefault(r["__file"], []).append(r["__row"])
    if per_file:
        token = uuid.uuid4().hex[:12]
        dv_dir = os.path.join(table, "_dv", f"d{base + 1:012d}-{token}")
        os.makedirs(dv_dir, exist_ok=True)
        for e in entries:
            b = os.path.basename(e["path"])
            if b not in per_file:
                continue
            rows = sorted(set(_dv_read(e)) | set(per_file[b]))
            dv_path = os.path.join(dv_dir, f"{b}.dv.json")
            with open(dv_path, "w") as fh:
                json.dump({"rows": rows}, fh)
                fh.flush()
                os.fsync(fh.fileno())
            e["dv"] = {"path": dv_path, "count": len(rows)}
    cdc = None
    if change_feed:
        from pyspark.sql import functions as _F

        # the DV cap keeps this relation small by contract
        cdc = (
            live.filter(f"({predicate}) IS TRUE")
            .drop("__file", "__row")
            .withColumn("_change_type", _F.lit("delete"))
        )
    return commit(
        None, table, mode="overwrite", expected_snapshot=base,
        carry_entries=entries, cdc=cdc,
    )


def _read_entries_with_pos(
    spark: SparkSession, entries: list[dict], manifest: dict | None = None
) -> DataFrame:
    """DV-applied scan of ``entries`` that RETAINS the (__file, __row)
    position columns — the delete_where_dv work relation.  ``manifest``
    surfaces a mapped table's logical names (predicates are logical)."""
    from pyspark.sql import functions as F

    df = spark.read.option("mergeSchema", "true").parquet(
        *[e["path"] for e in entries]
    ).select(
        "*",
        F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1).alias(
            "__file"
        ),
        F.col("_metadata.row_index").alias("__row"),
    )
    pairs = _dv_pairs(entries)
    if pairs:
        dv = spark.createDataFrame(pairs, "__file string, __row long")
        df = df.join(F.broadcast(dv), ["__file", "__row"], "left_anti")
    if manifest is not None:
        df = _logical_projection(df, manifest, extra=("__file", "__row"))
    return df


def compact(
    spark: SparkSession,
    table: str,
    *,
    target_files: int = 1,
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
    zorder_by: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite the latest snapshot into
    ``target_files`` files as one atomic ``overwrite`` commit.  Row set is
    IDENTICAL — only the file layout changes (the per-batch streaming
    ingests accrete one file set per microbatch; this is their maintenance
    job, same role as ``compact_event_lake`` for the raw lake).

    ``zorder_by=[col, ...]`` makes the compaction a CLUSTERING rewrite —
    Delta's ``OPTIMIZE ZORDER BY`` inside the transaction log: rows are
    range-partitioned and sorted along the Morton curve of the named
    columns (``sources/zorder.py``, pure codegen arithmetic + the one
    range exchange any clustered write needs), so each rewritten file
    covers a NARROW range of every clustered dimension and the manifest
    min/max recorded via ``stats_cols`` turns ``read_snapshot(prune=...)``
    into multi-dimensional file skipping.  Streaming microbatches accrete
    time-ordered files whose key stats span the whole domain; this is the
    maintenance pass that restores pruning power on every dimension at
    once."""
    from event_stream_spark.sources.zorder import zorder_col

    base = _latest_snapshot(table)
    current = read_snapshot(spark, table, snapshot=base)
    if zorder_by:
        z = zorder_col(current, zorder_by).alias("__z")
        current = (
            current.select("*", z)
            .repartitionByRange(target_files, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
        )
    else:
        current = current.coalesce(target_files)
    return commit(
        current,
        table,
        mode="overwrite",
        stats_cols=stats_cols,
        bloom_cols=bloom_cols,
        expected_snapshot=base,
        # identical row set, new layout: the change feed must skip this
        # commit instead of synthesizing delete+insert churn for every
        # row the rewrite moved
        data_change=False,
    )
