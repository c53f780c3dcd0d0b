"""Data branches over the snapshot log — create, commit, merge.

The Nessie/"Git for data" workflow a training-data pipeline actually
runs: cut a branch of the corpus table, apply an experimental policy
(new dedup threshold, different quality cut) with ordinary commits/DML
on the branch, compare against main, and MERGE when green — main readers
never observe in-flight experiments.

Built on primitives this log already has:

- ``create_branch`` is a SHALLOW CLONE into ``<table>@<name>`` (zero
  data copied) whose manifest 0 records the base snapshot — the merge
  base, exactly a git merge-base;
- branch commits are ordinary ``snaplog.commit``/DML against the branch
  path (copy-on-write into the branch's directory: main never sees
  them);
- ``merge_branch`` is a three-way FILE-LEVEL merge: the branch's (adds,
  removes, in-place DV/entry modifications, schema and constraint
  changes) since base are replayed onto main's head in one atomic
  commit, conflict-checked the way Delta/Iceberg reconcile concurrent
  snapshots — a file removed or modified by the branch must be
  unchanged on main since base, and schema/constraints may change on at
  most one side (or identically on both).

Merged data files are HARD-LINKED from the branch directory into a
``data/m{snapshot}-…`` dir under main before the merge commit publishes,
so dropping a merged branch afterwards can never strand main (the same
reason clone promotion uses a rewriting compact).  ``read_changes``
across a merge commit derives insert/delete chunks from the manifest
diff (the merge records no explicit cdc), so CDF consumers see the
branch's net effect as ordinary changes.

Provenance: the reference has no table format at all (it streams to
sinks — es-core BlockSink.kt); branching extends this repo's §2.12
lakehouse surface alongside time travel, RESTORE, and SHALLOW CLONE.
"""
from __future__ import annotations

import os
import uuid

from pyspark.sql import SparkSession

from event_stream_spark.sources.snaplog import (
    _metadata_commit,
    _read_manifest,
    clone,
    snapshots,
)


class MergeConflict(RuntimeError):
    """The branch and main both changed the same file/schema since base."""


def branch_table(table: str, name: str) -> str:
    if "@" in name or "/" in name:
        raise ValueError(f"invalid branch name {name!r}")
    return f"{table}@{name}"


def create_branch(table: str, name: str, *, snapshot: int | None = None) -> str:
    """Cut branch ``name`` at ``snapshot`` (default: main's head).
    Returns the branch table path; commit/DML against it as usual."""
    bt = branch_table(table, name)
    clone(table, bt, snapshot=snapshot)
    return bt


def list_branches(table: str) -> list[str]:
    parent = os.path.dirname(os.path.abspath(table)) or "."
    stem = os.path.basename(os.path.abspath(table)) + "@"
    if not os.path.isdir(parent):
        return []
    from event_stream_spark.sources.snaplog import _LOG

    return sorted(
        d[len(stem):]
        for d in os.listdir(parent)
        if d.startswith(stem)
        and os.path.isdir(os.path.join(parent, d, _LOG))
    )


def drop_branch(table: str, name: str) -> None:
    """Delete the branch directory.  Safe after merge (merged files were
    hard-linked into main) and safe before merge (main never references
    branch-directory files until a merge publishes)."""
    import shutil

    shutil.rmtree(branch_table(table, name))


def _link_fresh(src: str, dst: str) -> None:
    """Hard-link ``src`` to ``dst`` with two safety properties the bare
    ``os.link`` lacks:

    - **fresh mtime**: a hard link preserves the source inode's mtime, so a
      file linked from an hours-old branch would look hours old the moment
      it lands in main's data dir — and a concurrent ``vacuum(ttl)`` on
      main, in the window between relink and the merge's metadata commit,
      would sail past its "younger than tmp_ttl_s" concurrent-writer guard
      and delete it, leaving the merge manifest pointing at missing files.
      ``os.utime(dst)`` stamps link time on the (shared) inode so freshly
      linked files enjoy the same TTL protection as freshly written ones.
    - **no silent basename aliasing**: the merge dir flattens branch files
      by basename.  Spark part-file names embed a per-write UUID so
      collisions don't happen today, but if two distinct branch files ever
      shared a basename, keep-existing-on-collision would silently alias
      both manifest entries to one file's bytes.  An existing ``dst`` must
      be the same inode (a retried link of the same source); anything else
      raises instead of corrupting.
    """
    if os.path.exists(dst):
        if not os.path.samefile(src, dst):
            raise RuntimeError(
                f"merge relink basename collision: {dst!r} already exists "
                f"and is not {src!r}"
            )
    else:
        os.link(src, dst)
    os.utime(dst)


def _relink_into_main(table: str, merge_dir: str, entry: dict, bt: str) -> dict:
    """Hard-link an entry's file (and DV sidecar) into ``merge_dir`` if it
    lives under the branch directory; return the rewritten entry."""
    e = dict(entry)
    bt_abs = os.path.abspath(bt) + os.sep
    for key in ("path",):
        p = os.path.abspath(e[key])
        if p.startswith(bt_abs):
            os.makedirs(merge_dir, exist_ok=True)
            dst = os.path.join(merge_dir, os.path.basename(p))
            _link_fresh(p, dst)
            e[key] = dst
    dv = e.get("dv")
    if dv:
        p = os.path.abspath(dv["path"])
        if p.startswith(bt_abs):
            os.makedirs(merge_dir, exist_ok=True)
            dst = os.path.join(merge_dir, os.path.basename(p))
            _link_fresh(p, dst)
            e["dv"] = {**dv, "path": dst}
    return e


def _branch_origin(bt: str, bids: list) -> dict:
    """The branch's current merge base: the most recent manifest carrying
    ``cloned_from`` (a rebase stamps a fresh one; ordinary data commits
    build fresh manifests without it; manifest 0 — the clone — always
    has it)."""
    for n in reversed(bids):
        m = _read_manifest(bt, n)
        if m.get("cloned_from"):
            return m["cloned_from"]
    return {}


def rebase_branch(
    spark: SparkSession, table: str, name: str
) -> int:
    """Re-point branch ``name``'s merge base to main's current head by
    applying MAIN's net changes since the old base onto the branch — the
    other half of the git workflow: a long-lived branch whose base went
    stale (main compacted, or rewrote files the branch also touched in a
    conflicting way) rebases to pick up main's state, resolves nothing
    silently (same conflict rules as merge, sides swapped), and becomes
    cleanly mergeable again.  Returns the branch's rebase snapshot id.

    After a successful rebase the branch's recorded base is main's head,
    so a subsequent ``merge_branch`` diffs only the branch's own work."""
    bt = branch_table(table, name)
    bids = snapshots(bt)
    if not bids:
        raise ValueError(f"no such branch {name!r} on {table!r}")
    origin = _branch_origin(bt, bids)
    if os.path.abspath(origin.get("table", "")) != os.path.abspath(table):
        raise ValueError(f"{bt!r} is not a branch of {table!r}")
    base = _read_manifest(table, origin["snapshot"])
    head_id = snapshots(table)[-1]
    head = _read_manifest(table, head_id)
    bm = _read_manifest(bt, bids[-1])

    base_files = {e["path"]: e for e in base["files"]}
    head_files = {e["path"]: e for e in head["files"]}
    branch_files = {e["path"]: e for e in bm["files"]}

    # main's net change since base
    m_added = [e for p, e in head_files.items() if p not in base_files]
    m_removed = {p for p in base_files if p not in head_files}
    m_modified = {
        p
        for p, e in head_files.items()
        if p in base_files and e != base_files[p]
    }
    # conflict rules (merge's, sides swapped): a file main removed or
    # modified must be untouched on the BRANCH since base
    conflicts = []
    for p in sorted(m_removed | m_modified):
        if p not in branch_files:
            conflicts.append(f"{p}: removed or rewritten on the branch")
        elif branch_files[p] != base_files[p]:
            conflicts.append(f"{p}: modified on both sides")
    if head["columns"] != base["columns"] and bm["columns"] != base[
        "columns"
    ] and head["columns"] != bm["columns"]:
        conflicts.append("<schema>: diverged on both sides")
    if conflicts:
        raise MergeConflict(
            f"cannot rebase branch {name!r} onto {table!r}:\n  "
            + "\n  ".join(conflicts)
        )

    drop = m_removed | m_modified
    incoming = [head_files[p] for p in sorted(m_modified)] + m_added

    def mutate(m: dict) -> None:
        kept = [e for e in m["files"] if e["path"] not in drop]
        m["files"] = kept + incoming
        if head["columns"] != base["columns"]:
            m["columns"] = head["columns"]
        m["op"] = "rebase_branch"
        m["data_change"] = True
        m["cloned_from"] = {"table": table, "snapshot": head_id}

    # the base pointer moves WITH the rebase commit (cloned_from stamped
    # into its manifest); ordinary data commits build fresh manifests
    # without it, so readers resolve the base by scanning back to the
    # most recent manifest that carries one (_branch_origin)
    return _metadata_commit(bt, mutate)


def merge_branch(
    spark: SparkSession,
    table: str,
    name: str,
    *,
    max_retries: int = 5,
    resolve: str = "refuse",
    key: str | None = None,
    prefer: str | None = None,
) -> int:
    """Three-way merge of branch ``name`` into ``table``'s head; returns
    the merge commit's snapshot id.  Raises :class:`MergeConflict` when
    the branch and main changed the same file entry (or both diverged
    the schema / constraint set) since the branch base.

    ``resolve="rows"`` (requires ``key``) opts into ROW-LEVEL three-way
    resolution when the file-level merge refuses: file granularity
    false-positives at scale — any two writers touching one hot file
    "conflict" even when their row sets are disjoint — so data conflicts
    fall through to :func:`merge_branch_rows`, which merges by key and
    refuses only on true same-key divergence (or resolves it per
    ``prefer``).  Schema/constraint divergence never falls through — that
    is a contract conflict no row merge can reconcile."""
    if resolve not in ("refuse", "rows"):
        raise ValueError(f"resolve must be 'refuse'|'rows', got {resolve!r}")
    bt = branch_table(table, name)
    bids = snapshots(bt)
    if not bids:
        raise ValueError(f"no such branch {name!r} on {table!r}")
    bm = _read_manifest(bt, bids[-1])
    origin = _branch_origin(bt, bids)
    if os.path.abspath(origin.get("table", "")) != os.path.abspath(table):
        raise ValueError(f"{bt!r} is not a branch of {table!r}")
    base = _read_manifest(table, origin["snapshot"])

    base_files = {e["path"]: e for e in base["files"]}
    branch_files = {e["path"]: e for e in bm["files"]}

    added = [e for p, e in branch_files.items() if p not in base_files]
    removed = {p for p in base_files if p not in branch_files}
    modified = {
        p
        for p, e in branch_files.items()
        if p in base_files and e != base_files[p]
    }

    schema_changed = bm["columns"] != base["columns"]
    cons_changed = (bm.get("constraints") or {}) != (
        base.get("constraints") or {}
    )

    merge_dir = None
    for _ in range(max_retries):
        if merge_dir is not None and os.path.isdir(merge_dir):
            # a CommitConflict retry re-plans under a new c{head+1} dir;
            # the prior attempt's hard-linked dir is unreferenced by any
            # manifest and would otherwise sit orphaned until a much later
            # vacuum ages it out — reclaim it eagerly (links only, the
            # branch still holds the inodes)
            import shutil

            shutil.rmtree(merge_dir, ignore_errors=True)
        head_id = snapshots(table)[-1]
        head = _read_manifest(table, head_id)
        head_files = {e["path"]: e for e in head["files"]}

        conflicts = []
        for p in sorted(removed | modified):
            if p not in head_files:
                conflicts.append(f"{p}: removed or rewritten on main")
            elif head_files[p] != base_files[p]:
                conflicts.append(f"{p}: modified on both sides")
        if schema_changed and head["columns"] != base["columns"] and (
            head["columns"] != bm["columns"]
        ):
            conflicts.append("<schema>: diverged on both sides")
        if cons_changed and (head.get("constraints") or {}) != (
            base.get("constraints") or {}
        ) and (head.get("constraints") or {}) != (bm.get("constraints") or {}):
            conflicts.append("<constraints>: diverged on both sides")
        if conflicts:
            data_only = not any(c.startswith("<") for c in conflicts)
            if resolve == "rows" and data_only:
                if key is None:
                    raise ValueError("resolve='rows' requires key=")
                return merge_branch_rows(
                    spark, table, name, key=key, prefer=prefer,
                    max_retries=max_retries,
                )
            raise MergeConflict(
                f"cannot merge branch {name!r} into {table!r}:\n  "
                + "\n  ".join(conflicts)
            )

        # standard c{version}-{token} naming: the CDF reader derives a
        # file's creation commit from its directory, and merged files are
        # first referenced at the merge commit (head_id + 1 — pinned via
        # expected_parent, so a contention retry re-plans the whole diff)
        merge_dir = os.path.join(
            table, "data", f"c{head_id + 1:012d}-{uuid.uuid4().hex[:12]}"
        )
        drop = removed | modified
        incoming = [
            _relink_into_main(table, merge_dir, branch_files[p], bt)
            for p in sorted(modified)
        ] + [_relink_into_main(table, merge_dir, e, bt) for e in added]

        def mutate(m: dict) -> None:
            kept = [e for e in m["files"] if e["path"] not in drop]
            m["files"] = kept + incoming
            if schema_changed:
                m["columns"] = bm["columns"]
            if cons_changed:
                if bm.get("constraints"):
                    m["constraints"] = bm["constraints"]
                else:
                    m.pop("constraints", None)
            m["op"] = "merge_branch"
            # a merge lands the branch's net data effect on main — the
            # change feed must surface it (manifest-diff fallback derives
            # the insert/delete chunks)
            m["data_change"] = True
            m["merged_branch"] = {
                "name": name,
                "branch_snapshot": bids[-1],
                "base_snapshot": origin["snapshot"],
            }

        from event_stream_spark.sources.snaplog import CommitConflict

        try:
            return _metadata_commit(table, mutate, expected_parent=head_id)
        except CommitConflict:
            continue  # head moved: re-diff against the new head and retry
    if merge_dir is not None and os.path.isdir(merge_dir):
        import shutil

        shutil.rmtree(merge_dir, ignore_errors=True)
    raise RuntimeError(f"merge contention: {max_retries} retries exhausted")


def merge_branch_rows(
    spark: SparkSession,
    table: str,
    name: str,
    *,
    key: str,
    prefer: str | None = None,
    max_retries: int = 5,
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
) -> int:
    """Row-level three-way merge of branch ``name`` into ``table``'s head,
    for KEY-IDENTIFIED tables (``key`` uniquely identifies a row on every
    side — the usual lakehouse primary-key contract merge_upsert already
    assumes).  Returns the merge commit's snapshot id.

    File-level merge refuses whenever both sides touched the same file —
    at scale that false-positives constantly (two writers DV-deleting
    disjoint rows of one hot file "conflict").  This merge compares ROWS:

    - the branch's delta since base = keys whose row differs between base
      and branch head (insert / update / delete, null-safe struct compare);
    - a delta key DIVERGES only if main also changed it since base AND the
      two sides disagree (both making the identical change is a no-op);
    - divergence refuses with sample keys, unless ``prefer="theirs"``
      (branch wins) or ``prefer="ours"`` (main wins — the branch change is
      dropped for those keys);
    - the surviving delta is applied to main's head exactly like
      merge_upsert: file-targeted copy-on-write (only head files whose
      ``key`` stats overlap the delta's key span are rewritten; everything
      else is carried verbatim), one atomic overwrite commit carrying a
      writer-recorded CDF change set and ``merged_branch`` attribution.

    Scale shape: three snapshot scans feeding two equi-joins on ``key``
    (base⋈branch⋈head) — ordinary shuffles, no driver materialization
    beyond a 5-row divergence sample and the delta's [min, max] key span;
    publication cost is O(touched files + delta), not O(table).

    Schema or constraint divergence between branch head and main head is a
    contract conflict no row merge can reconcile — refused up front.
    """
    from pyspark.sql import functions as F

    from event_stream_spark.sources.snaplog import (
        CommitConflict,
        _read_entries,
        commit,
        read_snapshot,
    )

    if prefer not in (None, "ours", "theirs"):
        raise ValueError(f"prefer must be None|'ours'|'theirs', got {prefer!r}")
    bt = branch_table(table, name)
    bids = snapshots(bt)
    if not bids:
        raise ValueError(f"no such branch {name!r} on {table!r}")
    bm = _read_manifest(bt, bids[-1])
    origin = _branch_origin(bt, bids)
    if os.path.abspath(origin.get("table", "")) != os.path.abspath(table):
        raise ValueError(f"{bt!r} is not a branch of {table!r}")

    base_snap = origin["snapshot"]
    B = read_snapshot(spark, table, snapshot=base_snap)
    R = read_snapshot(spark, bt)
    cols = R.columns
    if key not in cols:
        raise ValueError(f"key column {key!r} not in branch columns {cols}")

    def _packed(df, alias):
        # null-fill columns the frame lacks (base predates an additive
        # evolution both sides made identically — the rows merge must
        # still compare the full current schema)
        have = set(df.columns)
        typed = dict(bm["columns"])
        return df.select(
            F.col(key).alias("_k"),
            F.struct(
                *[
                    F.col(c) if c in have
                    else F.lit(None).cast(typed[c]).alias(c)
                    for c in cols
                ]
            ).alias(alias),
        )

    for _ in range(max_retries):
        head_id = snapshots(table)[-1]
        head = _read_manifest(table, head_id)
        if head["columns"] != bm["columns"]:
            raise MergeConflict(
                "<schema>: branch and main schemas differ — row-level "
                "merge requires identical columns"
            )
        if (head.get("constraints") or {}) != (bm.get("constraints") or {}):
            raise MergeConflict(
                "<constraints>: branch and main constraint sets differ"
            )
        H = read_snapshot(spark, table, snapshot=head_id)

        j = (
            _packed(B, "_brow")
            .join(_packed(R, "_rrow"), "_k", "full_outer")
            .join(_packed(H, "_hrow"), "_k", "full_outer")
        )
        b, r, h = F.col("_brow"), F.col("_rrow"), F.col("_hrow")
        branch_changed = ~b.eqNullSafe(r)
        head_changed = ~b.eqNullSafe(h)
        divergent = branch_changed & head_changed & ~r.eqNullSafe(h)

        if prefer is None:
            sample = [
                row["_k"]
                for row in j.filter(divergent).select("_k").limit(5).collect()
            ]
            if sample:
                raise MergeConflict(
                    f"row-level merge of branch {name!r} into {table!r}: "
                    f"key(s) changed divergently on both sides since base "
                    f"(sample: {sample}) — resolve with prefer='ours'|"
                    f"'theirs' or rebase the branch"
                )
        # apply the branch delta; under prefer='ours' divergent keys keep
        # main's row (the branch change is dropped); both-sides-identical
        # changes are no-ops and excluded so the rewrite never touches them
        apply = branch_changed & ~r.eqNullSafe(h)
        if prefer == "ours":
            apply = apply & ~divergent
        delta = j.filter(apply)

        upserts = delta.filter(r.isNotNull()).select("_rrow.*")
        del_keys = delta.filter(r.isNull()).select(F.col("_k").alias(key))
        all_keys = upserts.select(key).unionByName(del_keys).distinct()
        # the merge key is a primary key (same contract as merge_upsert):
        # a NULL key can neither full_outer-join its three versions nor be
        # replaced by the left_anti below (null never equi-joins), so a
        # null-key upsert would duplicate and a null-key delete would
        # silently no-op — refuse loudly instead
        if all_keys.filter(F.col(key).isNull()).limit(1).count():
            raise ValueError(
                f"row-level merge of branch {name!r}: delta contains a "
                f"NULL {key!r} — the merge key must be non-null"
            )

        # file-targeted publication (merge_upsert's range targeting): only
        # head files whose key stats overlap the delta span are rewritten
        bounds = all_keys.agg(
            F.min(key).alias("lo"), F.max(key).alias("hi")
        ).first()
        lo, hi = bounds["lo"], bounds["hi"]
        touched, untouched = [], []
        for e in head["files"]:
            st = (e.get("stats") or {}).get(key)
            if lo is None:
                untouched.append(e)  # empty delta: nothing to rewrite
            elif st is None or not (st[1] < lo or st[0] > hi):
                touched.append(e)
            else:
                untouched.append(e)
        if touched:
            current = _read_entries(spark, touched, head)
            kept = current.join(all_keys, key, "left_anti")
            merged = kept.unionByName(upserts)
        else:
            merged = upserts

        # writer-recorded change set: the merge knows exactly which rows
        # it touched, so the change feed costs O(delta) to read
        cdc = (
            delta.filter(r.isNotNull() & h.isNotNull())
            .select("_hrow.*")
            .withColumn("_change_type", F.lit("update_preimage"))
            .unionByName(
                delta.filter(r.isNotNull() & h.isNotNull())
                .select("_rrow.*")
                .withColumn("_change_type", F.lit("update_postimage"))
            )
            .unionByName(
                delta.filter(r.isNotNull() & h.isNull())
                .select("_rrow.*")
                .withColumn("_change_type", F.lit("insert"))
            )
            .unionByName(
                delta.filter(r.isNull() & h.isNotNull())
                .select("_hrow.*")
                .withColumn("_change_type", F.lit("delete"))
            )
        )
        if merged is upserts and lo is None:
            # nothing to apply: the branch is already contained in main —
            # publish no commit, the head already IS the merge result
            return head_id
        try:
            return commit(
                merged,
                table,
                mode="overwrite",
                carry_entries=untouched,
                expected_snapshot=head_id,
                stats_cols=stats_cols if stats_cols is not None else [key],
                bloom_cols=bloom_cols,
                cdc=cdc,
                extra_meta={
                    "merged_branch": {
                        "name": name,
                        "branch_snapshot": bids[-1],
                        "base_snapshot": base_snap,
                        "mode": "rows",
                        **({"prefer": prefer} if prefer else {}),
                    }
                },
            )
        except CommitConflict:
            continue  # head moved: re-read and re-merge against it
    raise RuntimeError(f"merge contention: {max_retries} retries exhausted")
