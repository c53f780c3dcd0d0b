#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Per-query timing includes plan + execution to a driver-side materialization
(count or small collect) — the same work the oracle harness measures.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import pandas as pd

#: entries excluded from default runs (run with --heavy); empty since the
#: round-7 suffix_lrs_full rewrite — kept so a future genuinely-heavy
#: entry has a declared, printed, never-silent lane
HEAVY_EXCLUDE: set[str] = set()
#: entries excluded from sweeps at sf >= 1 (run with --heavy): q27's pair
#: form is OUTPUT-BOUND by declared design (11M pair rows at sf1 — pure
#: Arrow materialization, ~26% of the r9 sweep wall), which masks real
#: regressions elsewhere; q27_agg is its 100 TB shape and stays timed.
#: q27's CORRECTNESS entry is untouched — this is a bench lane only.
SF1_EXCLUDE: set[str] = {"q27"}
#: entries whose timings are additionally recorded in BENCH_HEAVY.json
HEAVY_WATCHLIST: set[str] = {"suffix_lrs_full"}
#: this box's fastest observed single-thread probe (r9 calibration set);
#: normalized totals are value * (CALIB_BASELINE_S / calib_s) — the
#: machine-speed-corrected number round-over-round deltas must be read
#: against (three same-code r9 runs spanned 7.38-9.04 s raw while the
#: probe moved 0.85-2.0 s)
CALIB_BASELINE_S = 0.85
#: baseline for the PARALLEL calibration probe (r11): a fixed 32-way
#: CPU-bound Spark job timed right after warm-up, best observed on this
#: box (same convention as CALIB_BASELINE_S; measured 0.196-1.04 across
#: one hour on 2026-08-16).  The r10 forensics showed the single-thread
#: probe CANNOT see multi-core contention (the sweep ran 1.7x slower
#: while calib_s got FASTER); regression verdicts must be read against
#: value * (CALIB_PAR_BASELINE_S / calib_par_s).
CALIB_PAR_BASELINE_S = 0.195
#: in-process-vs-isolated ratio above which an entry is flagged as a
#: co-residency outlier in the artifact (its isolated number IS its
#: retime; the in-process one is the stress-lane distortion)
OUTLIER_RATIO = 3.0


def _sf_of(sf_dir: str) -> float | None:
    """Scale factor from a dir name: matches 'sf0.1', 'es_sf1_v1', …"""
    import re

    m = re.search(r"sf([0-9]+(?:\.[0-9]+)?)", os.path.basename(sf_dir.rstrip("/")))
    return float(m.group(1)) if m else None


def isolated_sweep(chunk_size: int = 16) -> dict:
    """Fork a fresh interpreter+JVM per chunk of queries; merge results.

    The in-process sweep runs every registry entry in ONE Spark session;
    timings there include cross-query co-residency effects (shared JVM
    heap, code-cache, matview registry) measured at up to 17x distortion
    on sf1 entries (r10 forensics).  Isolated mode bounds those effects
    to a chunk: per-query wall times come from a session that only ever
    ran its chunk.  The warm-up is DISCARDED in both modes (children
    time only their post-warm-up passes and report min-of-2), so
    isolated totals are comparable round-over-round — since r11 this is
    the HEADLINE lane; the in-process sweep stays recorded as the
    stress lane."""
    import __spark_entry__ as entry_mod

    names = list(entry_mod.queries())
    if "--heavy" not in sys.argv[1:]:
        # same exclusions as the in-process lane (the child processes
        # take the SPARK_GRAFT_BENCH_ONLY branch, which skips them) —
        # keeps isolated totals comparable to in-process runs
        exclude = set(HEAVY_EXCLUDE)
        sfg = _sf_of(os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
        if sfg is not None and sfg >= 1:
            exclude |= SF1_EXCLUDE
        skipped = sorted(exclude & set(names))
        if skipped:
            print(f"# excluded entries (use --heavy): {skipped}",
                  file=sys.stderr)
            names = [n for n in names if n not in exclude]
    chunks = [names[i : i + chunk_size] for i in range(0, len(names), chunk_size)]
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    chunk_calib: dict[int, float] = {}
    chunk_of: dict[str, int] = {}
    sf = None

    def _run_chunk(chunk: list[str], idx: int) -> None:
        nonlocal sf
        env = dict(
            os.environ,
            SPARK_GRAFT_BENCH_ONLY=",".join(chunk),
            SPARK_GRAFT_CHUNK_CALIB="1",
        )
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            capture_output=True, text=True, env=env,
        )
        rec = None
        for line in proc.stdout.splitlines():
            line = line.strip()
            if line.startswith("{") and '"queries"' in line:
                rec = json.loads(line)
                break
        if rec is None:
            for name in chunk:
                errors[name] = f"chunk subprocess failed: {proc.stderr[-300:]}"
            return
        for name, v in rec.get("queries", {}).items():
            # min-merge so a retime pass can only improve an entry
            if name not in timings or v < timings[name]:
                timings[name] = v
            chunk_of[name] = idx
        errors.update(rec.get("errors", {}))
        sf = rec.get("sf", sf)
        if rec.get("calib_par_s") is not None:
            chunk_calib[idx] = rec["calib_par_s"]

    for i, chunk in enumerate(chunks):
        _run_chunk(chunk, i)

    # outlier self-retime (one extra chunk, min-merged): a minute-scale
    # host transient inflates random entries 3-10x and the per-sweep
    # calibration probe cannot see it (r11 evidence: same-code isolated
    # sweeps spanned 10.4-15.6 s).  Per-CHUNK probes localize the
    # transient; any entry whose chunk probe read >1.5x the sweep's best
    # chunk probe gets ONE retime, and both the trigger and the retimed
    # names are recorded in the artifact — single clean-run numbers
    # instead of the "run it three times" ritual.
    retimed: list[str] = []
    if chunk_calib and len(chunks) > 1:
        best = min(chunk_calib.values())
        hot = {i for i, c in chunk_calib.items() if c > 1.5 * best}
        suspects = sorted(n for n, i in chunk_of.items() if i in hot)
        if suspects and len(suspects) <= 2 * chunk_size:
            for j in range(0, len(suspects), chunk_size):
                _run_chunk(suspects[j : j + chunk_size], len(chunks) + j)
            retimed = suspects
    out = {
        "value": round(sum(timings.values()), 4),
        "queries": timings,
        "sf": sf,
        "isolation": f"fresh JVM per {chunk_size}-query chunk, "
                     "warm-up discarded",
    }
    if chunk_calib:
        out["chunk_calib_par_s"] = {
            str(i): round(c, 4) for i, c in sorted(chunk_calib.items())
        }
    if retimed:
        out["retimed"] = retimed
    if errors:
        out["errors"] = errors
    return out


def run_isolated(chunk_size: int = 16) -> None:
    """CLI for the isolated lane alone (``--isolated``)."""
    rec = isolated_sweep(chunk_size)
    out = {"metric": "qset_total_wall", "unit": "sec", **rec}
    print(json.dumps(out))


def _calibrate() -> float:
    """Fixed single-thread CPU workload, timed — a machine-speed probe
    recorded alongside the query timings.  Round-over-round comparisons
    on this box carry ±15-20% environmental noise (measured r9: three
    same-code full runs spanned 7.38-9.04 s); dividing totals by the
    calibration ratio separates plan regressions from the host simply
    running slower that day."""
    start = time.perf_counter()
    s = 0
    for i in range(20_000_000):
        s += i
    return round(time.perf_counter() - start, 4)


def _calibrate_parallel(spark, cpus: int) -> float:
    """Fixed CPU-bound Spark job saturating every executor thread, timed
    (min of 2) — the MULTI-CORE machine-speed probe.  The r10 artifact
    proved the single-thread probe insufficient: the sweep ran 1.7x
    slower while ``calib_s`` got FASTER, i.e. the contention was
    per-core-share, invisible to one pinned thread.  This probe runs the
    same 32-way arithmetic the sweep's codegen stages run, so co-tenant
    load shows up in it proportionally."""
    best = float("inf")
    for _ in range(2):
        start = time.perf_counter()
        spark.range(0, cpus * 12_000_000, 1, cpus).selectExpr(
            "sum((id * 2654435761) % 1000003) AS s"
        ).collect()
        best = min(best, time.perf_counter() - start)
    return round(best, 4)


def main() -> None:
    if "--isolated" in sys.argv[1:]:
        return run_isolated()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    calib = _calibrate()

    from event_stream_spark.session import get_spark

    spark = get_spark("event-stream-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    # optional subset run (comma-separated names) — used to bisect whether
    # per-query drift tracks the number of co-resident entries in one
    # session (plan registry / matview / GC pressure) vs the queries
    # themselves
    sf_guess = _sf_of(sf_dir)
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        keep = {n.strip() for n in only.split(",") if n.strip()}
        queries = {n: f for n, f in queries.items() if n in keep}
    elif "--heavy" not in sys.argv[1:]:
        if sf_guess is not None and sf_guess >= 1:
            skipped = sorted(SF1_EXCLUDE & set(queries))
            if skipped:
                print(
                    f"# excluded output-bound entries at sf>=1 "
                    f"(use --heavy): {skipped}",
                    file=sys.stderr,
                )
                queries = {
                    n: f for n, f in queries.items() if n not in SF1_EXCLUDE
                }
        # Entries whose wall time would swamp the throughput signal run
        # only under `python bench.py --heavy`; the exclusion is printed,
        # never silent.  CURRENTLY EMPTY: suffix_lrs_full was the one
        # member until the round-7 segmented-doubling rewrite took it
        # from ~30 s to ~0.3 s at sf0.1 — it now runs in the default set,
        # and BENCH_HEAVY.json keeps tracking it as a watchlist entry.
        skipped = sorted(HEAVY_EXCLUDE & set(queries))
        if skipped:
            print(f"# excluded heavy entries (use --heavy): {skipped}",
                  file=sys.stderr)
            queries = {n: f for n, f in queries.items()
                       if n not in HEAVY_EXCLUDE}

    # warm the JVM + parquet footers + Arrow/pandas-UDF machinery once so
    # steady-state throughput is measured, not first-call classloading
    from event_stream_spark.queries import TABLES, t

    for name in TABLES:
        t(spark, sf_dir, name).count()

    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(4).select(_warm("id")).collect()

    # Steady-state methodology (JMH/TPC-style): one untimed warm-up execution
    # per query at the target SF, then the timed pass.  The warm-up absorbs
    # Catalyst optimization, Janino codegen compilation, and JVM JIT — one-time
    # compile costs that are noise at the 100 TB design point but otherwise
    # dominate at sf0.1 (measured 3-4× on first execution).  Warming at a
    # smaller SF does NOT work: AQE picks different physical plans per scale,
    # so the compiled code differs.
    def _release_persisted() -> None:
        """Unpersist RDDs left behind by the previous query.

        Registry entries that build iterative state (the suffix-doubling
        loop's localCheckpoint pieces, the range-partitioned rank seeds)
        must keep those blocks alive while their RESULT DataFrame is
        consumed — so they cannot unpersist before returning, and each
        completed query strands a few MEMORY_AND_DISK blocks.  In
        production every job is its own application and the blocks die
        with it; in this one-session 140+-query harness they accumulate
        until the storage pool starves execution (measured at sf1:
        suffix_lrs_full alone runs in ~97 s but OOMed after 140
        co-resident queries).  Releasing AFTER each materialization
        charges every query its own build cost and nothing else.

        Guarded by a cheap Scala-side isEmpty (~0.6 ms measured): py4j's
        Java-collection iteration protocol costs ~27 ms per call EVEN ON
        AN EMPTY MAP (iterator-proxy round-trips), and the proxy churn
        bleeds py4j-cleanup work into the next timed region — the r8
        bench showed a uniform ~15-20 ms inflation on cheap queries from
        exactly this.  Only the handful of RDD-persisting entries (the
        suffix trio) pay the full iteration now."""
        sc = spark.sparkContext
        if sc._jsc.sc().getPersistentRDDs().isEmpty():
            return
        for rdd in list(sc._jsc.getPersistentRDDs().values()):
            rdd.unpersist()

    for name in sorted(queries):
        try:
            queries[name](spark, sf_dir).toPandas()
        except Exception:
            pass  # a warm-up failure will resurface, timed, below
        _release_persisted()

    # multi-core contention probe: AFTER warm-up (JIT-hot), BEFORE the
    # timed passes — the machine state it measures is the one the sweep
    # runs under.  Isolated-lane child chunks run it too (the parent sets
    # SPARK_GRAFT_CHUNK_CALIB): per-chunk probes localize minute-scale
    # transients that a single per-sweep probe provably misses (r11).
    calib_par = (
        _calibrate_parallel(spark, cpus)
        if (not only or os.environ.get("SPARK_GRAFT_CHUNK_CALIB"))
        else None
    )

    # two timed executions per query, report the min — local[32] timings for
    # sub-second multi-stage jobs jitter ±2× (GC, task scheduling); min-of-N
    # is the standard steady-state estimator and is what a capacity plan
    # would use.  Per-pass totals are ALSO recorded: the r9 ask for a
    # same-code multi-run spread inside every artifact.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    pass_totals: list[float] = []
    for _ in range(2):
        pass_total = 0.0
        for name in sorted(queries):
            try:
                start = time.perf_counter()
                df = queries[name](spark, sf_dir)
                # force full execution + driver materialization (Arrow
                # transfer; row-based collect() adds ~0.4s/100k rows of pure
                # deserialization).  NO .limit() wrapper: CollectLimit
                # executes partitions in serial ramp-up waves (1, then
                # scaleUpFactor²…), which serializes every sub-limit query
                # and was measured at ~0.9s/query of pure scheduling
                # overhead; registry results are bounded at every SF
                df.toPandas()
            except Exception as exc:  # one broken query must not zero the run
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                _release_persisted()
                continue
            elapsed = round(time.perf_counter() - start, 6)
            _release_persisted()
            pass_total += elapsed
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed
        pass_totals.append(round(pass_total, 4))

    sf = _sf_of(sf_dir)

    total = round(sum(timings.values()), 4)
    # isolated lane (r11 headline): fresh JVM per 16-entry chunk, so the
    # recorded per-entry numbers carry no co-residency distortion.  Runs
    # in the default full sweep at the default sf dir (the driver's
    # BENCH_r{N} invocation); the in-process numbers above stay recorded
    # as the stress lane.  Skipped for subset runs, for non-default sf
    # dirs (the sf1 sweep pays per-chunk warm-up at 10x data — run
    # `--isolated` there explicitly), and under SPARK_GRAFT_NO_ISOLATED.
    iso = None
    default_sf = os.path.realpath("/root/testdata/sf0.1")
    if (
        not only
        and not os.environ.get("SPARK_GRAFT_NO_ISOLATED")
        and (
            os.path.realpath(sf_dir) == default_sf
            or "--with-isolated" in sys.argv[1:]
        )
    ):
        spark.stop()  # the 32-thread parent JVM must not co-tenant the lane
        iso = isolated_sweep()

    headline = iso["value"] if iso else total
    lane = "isolated" if iso else "inprocess"
    out = {
        "metric": "qset_total_wall",
        "value": headline,
        "lane": lane,
        "unit": "sec",
        "cpus": cpus,
        "queries": (
            iso["queries"] if iso
            else {k: round(v, 4) for k, v in timings.items()}
        ),
        "sf": sf,
        "calib_s": calib,
        "calib_baseline_s": CALIB_BASELINE_S,
        "value_calib_norm": round(headline * CALIB_BASELINE_S / calib, 4),
        "inprocess": {
            "value": total,
            "pass_totals": pass_totals,
            "queries": {k: round(v, 4) for k, v in timings.items()},
        },
    }
    if calib_par is not None:
        out["calib_par_s"] = calib_par
        out["calib_par_baseline_s"] = CALIB_PAR_BASELINE_S
        out["value_par_norm"] = round(
            headline * CALIB_PAR_BASELINE_S / calib_par, 4
        )
    if iso:
        # every entry's isolated number IS its retime; name the ones the
        # stress lane distorted past the ratio so round-over-round reads
        # never chase co-residency ghosts
        out["outliers"] = {
            k: {"inprocess": round(timings[k], 4), "isolated": v}
            for k, v in iso["queries"].items()
            if k in timings and v > 0 and timings[k] / v >= OUTLIER_RATIO
        }
        for key in ("chunk_calib_par_s", "retimed"):
            if key in iso:
                out[key] = iso[key]
        if iso.get("errors"):
            out.setdefault("errors", {}).update(iso["errors"])
    if errors:
        out.setdefault("errors", {}).update(errors)
    # Full record first; then a SHORT summary line that survives a
    # 2,000-char tail capture (the r4 driver log truncated the ~2.3 kB
    # 89-entry map and lost the total).  A consumer that keeps only the
    # last line still gets metric/value/sf; one that parses the first JSON
    # line still gets the per-query map.
    print(json.dumps(out))
    # durable full record beside the script (the stdout capture is lossy);
    # subset runs (bisection or --isolated child chunks) and runs at a
    # NON-DEFAULT sf dir (e.g. the synthetic-sf1 sweep, which records to
    # BENCH_SF1.json by hand) must not clobber the sf0.1 record
    default_dir = os.path.realpath("/root/testdata/sf0.1")
    bench_cmp = None
    if not only and os.path.realpath(sf_dir) == default_dir:
        here = os.path.dirname(os.path.abspath(__file__))
        # the canonical per-query record is BENCH_LOCAL.json (committed
        # every round; README documents it) — scaling runs at a non-default
        # core count get their own file so they cannot clobber it (the r11
        # driver's 8-core run overwrote the 32-core record)
        fname = (
            "BENCH_LOCAL.json"
            if cpus == (os.cpu_count() or cpus)
            else f"BENCH_LOCAL_c{cpus}.json"
        )
        path = os.path.join(here, fname)
        # round-over-round per-query comparison vs the record this run is
        # about to replace — printed as its own compact line so it survives
        # a 2,000-char tail capture that truncates the full record
        try:
            with open(path) as f:
                prev = json.load(f)
            if (
                prev.get("lane") == lane
                and prev.get("cpus") == cpus  # absent ⇒ unknown ⇒ no cmp
                and prev.get("sf") == sf
            ):
                pq, nq = prev.get("queries", {}), out["queries"]
                common = {
                    k: pq[k] / nq[k]
                    for k in pq.keys() & nq.keys()
                    if pq[k] > 0 and nq[k] > 0
                }
                if common:
                    import math

                    ratios = sorted(common.items(), key=lambda kv: kv[1])
                    bench_cmp = {
                        "metric": "bench_vs_local_record",
                        "n_common": len(common),
                        "geomean_speedup": round(
                            math.exp(
                                sum(math.log(r) for r in common.values())
                                / len(common)
                            ),
                            4,
                        ),
                        "n_regressed_gt10pct": sum(
                            1 for r in common.values() if r < 1 / 1.1
                        ),
                        "worst5": {k: round(v, 3) for k, v in ratios[:5]},
                        "best5": {k: round(v, 3) for k, v in ratios[-5:]},
                    }
        except (OSError, ValueError):
            pass
        try:
            with open(path, "w") as f:
                json.dump(out, f, indent=1)
        except OSError:
            pass
        if HEAVY_WATCHLIST & set(timings):
            # heavy-lane artifact: watchlist entries (formerly-heavy or
            # excluded ones) get their own round-over-round record, so
            # improvements to them are visible in a diffable file, not
            # README prose — written on every full run that covers them
            heavy_names = HEAVY_WATCHLIST
            try:
                hpath = os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "BENCH_HEAVY.json",
                )
                with open(hpath, "w") as f:
                    json.dump(
                        {
                            "metric": "heavy_lane_wall",
                            "unit": "sec",
                            "sf": sf,
                            "queries": {
                                k: round(v, 4)
                                for k, v in timings.items()
                                if k in heavy_names
                            },
                            "errors": {
                                k: v for k, v in errors.items()
                                if k in heavy_names
                            },
                        },
                        f,
                        indent=1,
                    )
            except OSError:
                pass
    if bench_cmp is not None:
        # between the full record and the summary: the last-2000-char tail
        # then carries comparison + summary together
        print(json.dumps(bench_cmp))
    head_q = out["queries"]
    slowest = dict(sorted(head_q.items(), key=lambda kv: -kv[1])[:5])
    summary = {
        "metric": "qset_total_wall",
        "value": headline,
        "lane": lane,
        "unit": "sec",
        "cpus": cpus,
        "sf": sf,
        "n_queries": len(head_q),
        "n_errors": len(out.get("errors", {})),
        "calib_s": calib,
        "calib_baseline_s": CALIB_BASELINE_S,
        "value_calib_norm": out["value_calib_norm"],
        "inprocess_value": total,
        "pass_totals": pass_totals,
        "slowest": {k: round(v, 4) for k, v in slowest.items()},
    }
    if calib_par is not None:
        summary["calib_par_s"] = calib_par
        summary["value_par_norm"] = out["value_par_norm"]
    print(json.dumps(summary))
    if iso is None:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
