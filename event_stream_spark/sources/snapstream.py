"""Snapshot tables as a STREAMING source — ``format("snaptable")``.

The snapshot log's commit ids form a total order of immutable deltas, which
is exactly a stream's offset sequence (the Delta-as-a-source design point):
``latestOffset`` is the newest committed snapshot id, and a microbatch for
(start, end] reads the data files first referenced by each covered
snapshot — the same delta set ``snaplog.read_increment`` returns, but
planned as one input partition per file so the read parallelizes across
executors and restarts resume exactly from the checkpointed snapshot id.

Composability this buys: the snapshot-committing ingest
(``corpus_snapshot_ingest_sink``) writes the table, and any number of
downstream streaming consumers (posting-index maintenance, rollups,
replication) tail it independently with their own checkpoints — the table
IS the bus, no extra queue.

Semantics:

- exactly-once per consumer: offsets are snapshot ids in the consumer's
  checkpoint; data files are immutable, so a replayed batch rereads the
  identical rows;
- an ``overwrite`` snapshot BREAKS the delta chain — ``partitions()``
  raises, matching ``read_increment``: a consumer must resync from a full
  read rather than silently miss the rewrite;
- schema comes from the latest snapshot's parquet footer at source
  construction (fixed for the query's lifetime, like every source here).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_ARROW_TO_DDL = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "large_string": "string",
    "bool": "boolean",
    "binary": "binary",
    "large_binary": "binary",
    "date32[day]": "date",
}


def _resolve_table(options: dict) -> str:
    """``table_path`` plus the optional ``branch`` option: a branch is its
    own snapshot log at ``<table>@<branch>``, so every reader (snaptable
    rows, snapcdf changes) can tail a branch by name — offsets are then
    BRANCH snapshot ids, and main's feed is untouched until a merge
    publishes there."""
    table = options["table_path"]
    branch = options.get("branch")
    if branch:
        from event_stream_spark.sources.snapbranch import branch_table

        table = branch_table(table, branch)
    return table


def _table_ddl(table: str) -> str:
    """Spark DDL schema from the latest snapshot's first parquet footer."""
    import pyarrow.parquet as pq

    from event_stream_spark.sources.snaplog import _read_manifest, snapshots

    ids = snapshots(table)
    if not ids:
        raise ValueError(f"no snapshots committed at {table}")
    manifest = _read_manifest(table, ids[-1])
    if manifest.get("column_mapping"):
        # the stream legs read data files by PHYSICAL column name with a
        # schema fixed at query start; after a rename/drop the honest
        # move is a loud refusal (Delta's stance without
        # schemaTrackingLocation) — consumers resync from a batch read,
        # which maps logical names per snapshot
        raise ValueError(
            f"{table} has column mapping active (a column was renamed "
            "or dropped): snaptable/snapcdf streaming is unsupported — "
            "resync from a batch read_snapshot/read_changes"
        )
    files = manifest["files"]
    if not files:
        raise ValueError(f"latest snapshot at {table} references no files")
    # the NEWEST file carries the full schema (evolution is additive-only,
    # enforced by snaplog.commit); older files may lack trailing columns
    schema = pq.read_schema(files[-1]["path"])
    cols = []
    for field in schema:
        t = str(field.type)
        if t.startswith("timestamp"):
            ddl = "timestamp"
        elif t in _ARROW_TO_DDL:
            ddl = _ARROW_TO_DDL[t]
        else:
            raise NotImplementedError(f"snaptable: unsupported column type {t}")
        cols.append(f"`{field.name}` {ddl}")
    return ", ".join(cols)


class SnapFile(InputPartition):
    def __init__(
        self, path: str, columns: list[str], exclude: list[int] | None = None
    ):
        self.path = path
        self.columns = columns
        # row POSITIONS logically deleted by the entry's deletion vector —
        # positions index the file's full row order, which pq.read_table
        # preserves, so masking here is exactly the reader anti-join
        self.exclude = exclude


def _arrow_schema(spark_schema) -> "object | None":
    """Target pyarrow schema for Arrow-batch yields, or None when the
    conversion helper is unavailable (row-tuple fallback stays)."""
    try:
        from pyspark.sql.pandas.types import to_arrow_schema

        return to_arrow_schema(spark_schema)
    except Exception:
        return None


def _mask_positions(tbl, include, exclude):
    """Vectorized position selection (pyarrow kernels, no Python loop):
    keep exactly ``include`` positions, or drop ``exclude`` positions."""
    import numpy as np
    import pyarrow as pa

    n = tbl.num_rows
    if include is not None:
        idx = np.asarray(include, dtype=np.int64)
        return tbl.take(pa.array(idx[idx < n]))
    if exclude:
        mask = np.ones(n, dtype=bool)
        ex = np.asarray(exclude, dtype=np.int64)
        mask[ex[ex < n]] = False
        return tbl.filter(pa.array(mask))
    return tbl


def _project_arrow(tbl, fields, constants: dict | None = None):
    """Project ``tbl`` to ``fields`` (ordered pa.Field list) BY NAME —
    casting present columns to the target type, nulling absent ones
    (additive evolution), and broadcasting ``constants`` — then yield the
    result as RecordBatches: rows cross to the JVM as Arrow buffers, not
    per-row Python tuples (O(columns) per file instead of O(rows))."""
    import pyarrow as pa

    n = tbl.num_rows
    have = set(tbl.column_names)
    arrays = []
    for field in fields:
        if constants and field.name in constants:
            arrays.append(
                pa.array([constants[field.name]] * n).cast(field.type)
            )
        elif field.name in have:
            col = tbl.column(field.name)
            arrays.append(
                col if col.type == field.type else col.cast(field.type)
            )
        else:
            arrays.append(pa.nulls(n, field.type))
    out = pa.table(arrays, schema=pa.schema(list(fields)))
    yield from out.to_batches()


def _read_snap_file(partition: "SnapFile", arrow_fields=None):
    """Shared executor-side file read for both legs: columns are selected
    BY NAME in the source-schema order, so a commit whose parquet happened
    to lay columns out differently can never silently swap values; columns
    a pre-evolution file lacks surface as NULLs (additive evolution).
    With ``arrow_fields`` the transfer is zero-copy Arrow batches; the
    tuple path remains as the no-arrow-schema fallback."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        partition.path,
        columns=[c for c in partition.columns if c in pq.read_schema(partition.path).names],
    )
    tbl = _mask_positions(tbl, None, partition.exclude)
    if arrow_fields is not None:
        yield from _project_arrow(tbl, arrow_fields)
        return
    n = tbl.num_rows
    cols = [
        tbl.column(name).to_pylist() if name in tbl.column_names else [None] * n
        for name in partition.columns
    ]
    yield from zip(*cols) if cols else iter(())


class SnapTableStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, schema):
        self.table = _resolve_table(options)
        self.columns = schema.fieldNames()
        self.arrow_fields = _arrow_schema(schema)
        # deliver history from this snapshot id EXCLUSIVE; default -1 = all
        self.start_after = int(options.get("starting_snapshot", -1))
        # backpressure knob (maxFilesPerTrigger's snapshot-granular
        # analogue): cap how many snapshots one microbatch may cover, so
        # a consumer starting against a long-history table catches up in
        # bounded batches instead of one table-sized batch.  CAVEAT: use
        # with continuous/processing-time triggers — Trigger.AvailableNow
        # captures its drain target from ONE latestOffset call (the
        # Python DataSource API has no ReadLimit plumbing), so a clamped
        # offset would end an availableNow run after a single step.
        self.max_per_trigger = (
            int(options.get("max_snapshots_per_trigger", 0)) or None
        )
        self._last = self.start_after

    def initialOffset(self) -> dict:
        return {"snapshot": self.start_after}

    def latestOffset(self) -> dict:
        """Clamped HERE, not in partitions(): the planner checkpoints
        whatever this returns as the batch end, so clamping later would
        silently skip the gap (an offset is an ack).  The clamp is safe
        only because ``_last`` can never sit below a committed offset when
        this runs: on a fresh checkpoint nothing is committed, and on a
        RESTART Spark always re-plans the last offset-log batch —
        ``partitions(start, committed_end)`` — before its first
        latestOffset call (verified against the engine; the restart test
        pins it), which advances ``_last`` to the committed end.  Without
        that advance, a clamp from the reset ``starting_snapshot``
        watermark would regress below the checkpoint, and a later batch
        would re-plan already-ingested snapshots under new batch ids —
        duplicates the txn sink cannot catch."""
        from event_stream_spark.sources.snaplog import snapshots

        ids = snapshots(self.table)
        head = ids[-1] if ids else self.start_after
        if self.max_per_trigger is not None:
            head = min(head, self._last + self.max_per_trigger)
        self._last = max(self._last, head)
        return {"snapshot": self._last}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        from event_stream_spark.sources.snaplog import (
            _read_manifest,
            added_files,
            snapshots,
        )

        lo, hi = start["snapshot"], end["snapshot"]
        # a replayed (restart-recovered) batch teaches the fresh reader
        # instance the committed watermark — never regress below it
        self._last = max(self._last, hi)
        ids = set(snapshots(self.table))
        # the delta of snapshot n needs manifests n AND n-1; a vacuum that
        # truncated history past this consumer's checkpoint must fail the
        # stream loudly (resync from a full read), never skip deltas
        need = range(max(lo, 0), hi + 1)
        missing = [n for n in need if n not in ids]
        if missing:
            raise ValueError(
                f"snapshots {missing} vacuumed past this consumer's "
                f"checkpoint ({lo}): resync from a full read"
            )
        files: list[str] = []
        for n in sorted(ids):
            if lo < n <= hi:
                if n > 0 and _read_manifest(self.table, n)["op"] == "overwrite":
                    raise ValueError(
                        f"snapshot {n} is an overwrite: stream cannot continue, "
                        "restart the consumer from a full read"
                    )
                files.extend(added_files(self.table, n))
        return [SnapFile(p, self.columns) for p in files]

    def read(self, partition: SnapFile) -> Iterator[tuple]:
        return _read_snap_file(partition, self.arrow_fields)

    def commit(self, end: dict) -> None:
        # offsets live in the consumer's checkpoint; mirror the committed
        # end locally so the watermark can never regress below it
        self._last = max(self._last, end["snapshot"])


class SnapTableBatchReader(DataSourceReader):
    """Batch leg of the same source: ``spark.read.format("snaptable")``
    reads one snapshot (latest, or ``.option("snapshot", n)`` for time
    travel) — one partition per data file."""

    def __init__(self, options: dict, schema):
        self.table = _resolve_table(options)
        self.columns = schema.fieldNames()
        self.arrow_fields = _arrow_schema(schema)
        self.snapshot = (
            int(options["snapshot"]) if "snapshot" in options else None
        )

    def partitions(self) -> Sequence[InputPartition]:
        from event_stream_spark.sources.snaplog import (
            _dv_read,
            _read_manifest,
            snapshots,
        )

        ids = snapshots(self.table)
        if not ids:
            raise ValueError(f"no snapshots committed at {self.table}")
        n = ids[-1] if self.snapshot is None else self.snapshot
        if n not in ids:
            raise ValueError(f"snapshot {n} not in {ids}")
        return [
            SnapFile(f["path"], self.columns, exclude=_dv_read(f) or None)
            for f in _read_manifest(self.table, n)["files"]
        ]

    def read(self, partition: SnapFile) -> Iterator[tuple]:
        return _read_snap_file(partition, self.arrow_fields)


class SnapTableDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "snaptable"

    def schema(self) -> str:
        return _table_ddl(_resolve_table(self.options))

    def reader(self, schema) -> DataSourceReader:
        return SnapTableBatchReader(self.options, schema)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return SnapTableStreamReader(self.options, schema)


# ---------------------------------------------------------------------------
# CHANGE DATA FEED as a stream — ``format("snapcdf")``
# ---------------------------------------------------------------------------

_CDF_META = ("_change_type", "_commit_version", "_commit_timestamp")


class CDFChunk(InputPartition):
    def __init__(self, chunk: dict, columns: list[str]):
        self.chunk = chunk
        self.columns = columns


class SnapCDFStreamReader(DataSourceStreamReader):
    """Streaming leg of :func:`snaplog.read_changes` — the Delta
    ``readChangeFeed`` design point.  Offsets are snapshot ids (same as
    ``snaptable``), but each microbatch emits CHANGE ROWS — the table's
    columns plus ``_change_type`` / ``_commit_version`` /
    ``_commit_timestamp`` — planned by ``snaplog._change_chunks`` (the
    identical plan the batch reader executes, so the two can never
    drift).  Unlike ``snaptable`` this stream SURVIVES overwrite commits:
    a rewrite surfaces as delete+insert rows (or the writer's recorded
    exact change relation), so a downstream materialized view keeps
    applying deltas where the plain-rows stream would have to resync."""

    def __init__(self, options: dict, schema):
        self.table = _resolve_table(options)
        self.columns = schema.fieldNames()
        self.arrow_fields = _arrow_schema(schema)
        self.start_after = int(options.get("starting_snapshot", -1))
        # same backpressure contract as snaptable (clamped in
        # latestOffset — an offset is an ack)
        self.max_per_trigger = (
            int(options.get("max_snapshots_per_trigger", 0)) or None
        )
        self._last = self.start_after

    def initialOffset(self) -> dict:
        return {"snapshot": self.start_after}

    def latestOffset(self) -> dict:
        # clamp safe because partitions()/commit() advance _last to the
        # committed end before the first post-restart poll — see
        # SnapTableStreamReader.latestOffset for the regression rationale
        from event_stream_spark.sources.snaplog import snapshots

        ids = snapshots(self.table)
        head = ids[-1] if ids else self.start_after
        if self.max_per_trigger is not None:
            head = min(head, self._last + self.max_per_trigger)
        self._last = max(self._last, head)
        return {"snapshot": self._last}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        from event_stream_spark.sources.snaplog import _change_chunks, snapshots

        lo, hi = start["snapshot"], end["snapshot"]
        self._last = max(self._last, hi)
        ids = set(snapshots(self.table))
        # chunk planning for snapshot n needs manifests n AND n-1; history
        # vacuumed past the checkpoint must fail loudly, never skip deltas
        missing = [n for n in range(max(lo, 0), hi + 1) if n not in ids]
        if missing:
            raise ValueError(
                f"snapshots {missing} vacuumed past this consumer's "
                f"checkpoint ({lo}): resync from a full read"
            )
        return [
            CDFChunk(c, self.columns)
            for c in _change_chunks(self.table, lo, hi)
        ]

    def read(self, partition: CDFChunk) -> Iterator[tuple]:
        import pyarrow.parquet as pq

        ch = partition.chunk
        tbl = pq.read_table(ch["path"])
        tbl = _mask_positions(tbl, ch["include"], ch["exclude"])
        constants = {
            "_commit_version": ch["version"],
            "_commit_timestamp": float(ch["ts"]),
        }
        if ch["kind"] != "cdc":
            constants["_change_type"] = ch["kind"]
        if self.arrow_fields is not None:
            yield from _project_arrow(tbl, self.arrow_fields, constants)
            return
        n = tbl.num_rows
        have = set(tbl.column_names)
        out = [
            [constants[name]] * n
            if name in constants
            else tbl.column(name).to_pylist()
            if name in have
            else [None] * n
            for name in partition.columns
        ]
        yield from zip(*out) if out else iter(())

    def commit(self, end: dict) -> None:
        # mirror the committed end so the watermark can never regress
        self._last = max(self._last, end["snapshot"])


class SnapCDFDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "snapcdf"

    def schema(self) -> str:
        base = _table_ddl(_resolve_table(self.options))
        return (
            base + ", `_change_type` string, `_commit_version` bigint,"
            " `_commit_timestamp` double"
        )

    def reader(self, schema) -> DataSourceReader:
        raise NotImplementedError(
            "snapcdf is a streaming source; for a batch change scan use "
            "snaplog.read_changes(spark, table, since=..., until=...)"
        )

    def streamReader(self, schema) -> DataSourceStreamReader:
        return SnapCDFStreamReader(self.options, schema)


def register(spark) -> None:
    spark.dataSource.register(SnapTableDataSource)
    spark.dataSource.register(SnapCDFDataSource)
