#!/usr/bin/env python
"""End-to-end 100 TB rehearsal: the composed training-data pipeline run as
ONE job chain at the largest local scale, with wall-clock and shuffle
volume recorded per stage (VERDICT r4 ask #9 — the composed-pipeline
evidence a capacity review asks for first).

Chain (each stage an already-oracled operator or the snapshot log):

  crawl      10 synthetic crawl batches (sf0.1 documents ×10, ~30% exact
             re-fetch copies, the rest lightly perturbed) committed as 10
             snapshot-log appends — the atomic-ingest front door
  ingest     snapshot compaction + materialize the working corpus
  dedup      quality gate → exact dedup → minhash near-dup removal
             (``datapipe_clean_corpus`` verbatim) — FIRST, because crawl
             re-fetches make whole replica groups mutually containing;
             symmetric-containment curation before dedup would drop both
             sides of every copy pair (measured: 50k → 0 rows when run
             in the other order — the ordering is load-bearing)
  curate_v2  length trim → model-based quality keep → containment dedup
             (``datapipe_curate_v2`` verbatim over the deduped corpus)
  pack       ``seq_pack`` sequence packing over the survivors
  shard      ``shard_balance`` token-balanced training-shard assignment

Per-stage shuffle read/write bytes come from Spark's public REST API
(``/api/v1/applications/<app>/stages`` — the same numbers the UI shows),
deltas taken at stage boundaries.  At 100 TB the same chain is the same
plan shapes; the point of this artifact is that the per-stage shuffle
volume is bounded by the SCALE.md arithmetic (hash-width × rows for the
dedup exchanges, narrow projections everywhere else), not by corpus bytes.

Usage:  python scripts/rehearsal.py [workdir]      (default /tmp/es_rehearsal)
Prints one JSON line per stage plus a final summary line; paste the table
into README.md when the numbers move.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = 10
UI_PORT = 4049


def stage_totals(ui_base: str, app_id: str) -> tuple[int, int]:
    url = f"{ui_base}/api/v1/applications/{app_id}/stages"
    data = json.load(urllib.request.urlopen(url))
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in data),
        sum(s.get("shuffleReadBytes", 0) for s in data),
    )


def fmt_bytes(n: int) -> str:
    for unit in ("B", "KiB", "MiB", "GiB"):
        if n < 1024 or unit == "GiB":
            return f"{n:.1f} {unit}" if unit != "B" else f"{n} B"
        n /= 1024
    return f"{n} B"


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/es_rehearsal"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    from pyspark.sql import functions as F

    from event_stream_spark.session import get_spark
    from event_stream_spark.sources.snaplog import commit, compact, read_snapshot

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        "es-rehearsal", cpus=cpus,
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": str(UI_PORT)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    app = spark.sparkContext.applicationId
    # Spark binds 4050+ if the requested port is taken — read the ACTUAL
    # URL so a concurrent session cannot misroute (or corrupt) the metrics
    ui_base = spark.sparkContext.uiWebUrl

    src = spark.read.parquet(f"{SRC_SF}/documents.parquet")
    n_src = src.count()  # warm the scan before the clock starts

    results = []

    def run_stage(name, fn):
        w0, r0 = stage_totals(ui_base, app)
        t0 = time.perf_counter()
        out = fn()
        wall = round(time.perf_counter() - t0, 3)
        w1, r1 = stage_totals(ui_base, app)
        rec = {
            "stage": name, "wall_s": wall,
            "shuffle_write": w1 - w0, "shuffle_read": r1 - r0,
            **(out or {}),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
        return rec

    table = os.path.join(work, "crawl_snaptable")

    # -- crawl: 10 batches into the snapshot log ---------------------------
    def crawl():
        for k in range(REPLICAS):
            batch = src.select(
                (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
                # ~30% exact re-fetch copies; the rest perturbed by one
                # crawl-batch marker token (near-dups for minhash)
                F.when(
                    (F.lit(k) == 0) | (F.crc32(F.col("text")) % 10 < 3),
                    F.col("text"),
                ).otherwise(
                    F.concat_ws(" ", F.col("text"), F.lit(f"crawlmark{k}"))
                ).alias("text"),
                "lang", "source", "n_chars",
            )
            commit(batch, table, stats_cols=["doc_id"])
        return {"rows": n_src * REPLICAS, "snapshots": REPLICAS}

    run_stage("crawl", crawl)

    # -- ingest: compact + materialize the working corpus ------------------
    ingested = os.path.join(work, "ingested")

    def ingest():
        compact(spark, table, target_files=cpus)
        df = read_snapshot(spark, table)
        df.write.parquet(os.path.join(ingested, "documents.parquet"))
        return {"rows": spark.read.parquet(
            os.path.join(ingested, "documents.parquet")).count()}

    run_stage("ingest", ingest)

    # -- dedup: quality gate → exact → minhash near-dup --------------------
    deduped = os.path.join(work, "deduped")

    def dedup():
        from event_stream_spark.datapipe.pipeline import datapipe_clean_corpus

        keep = datapipe_clean_corpus(spark, ingested)
        (
            spark.read.parquet(os.path.join(ingested, "documents.parquet"))
            .join(keep, "doc_id", "left_semi")
            .write.parquet(os.path.join(deduped, "documents.parquet"))
        )
        return {"rows": spark.read.parquet(
            os.path.join(deduped, "documents.parquet")).count()}

    run_stage("dedup", dedup)

    # -- curate_v2: trim → quality keep → containment dedup ----------------
    curated = os.path.join(work, "curated")

    def curate():
        from event_stream_spark.datapipe.pipeline import datapipe_curate_v2

        keep = datapipe_curate_v2(spark, deduped)
        (
            spark.read.parquet(os.path.join(deduped, "documents.parquet"))
            .join(keep, "doc_id", "left_semi")
            .write.parquet(os.path.join(curated, "documents.parquet"))
        )
        return {"rows": spark.read.parquet(
            os.path.join(curated, "documents.parquet")).count()}

    run_stage("curate_v2", curate)

    # -- pack: sequence packing over the survivors -------------------------
    def pack():
        from event_stream_spark.datapipe.packing import seq_pack

        out = seq_pack(spark, curated)
        packed = os.path.join(work, "packed.parquet")
        out.write.parquet(packed)
        pdf = spark.read.parquet(packed)
        return {
            "rows": pdf.count(),
            "sequences": pdf.agg(
                F.countDistinct("lang", "shard", "seq_ix")
            ).first()[0],
        }

    run_stage("pack", pack)

    # -- shard: token-balanced training-shard assignment --------------------
    def shard():
        from event_stream_spark.datapipe.splits import shard_balance

        rows = shard_balance(spark, curated).collect()
        return {
            "rows": len(rows),
            "max_skew": round(max(abs(r["balance"] - 1.0) for r in rows), 4),
        }

    run_stage("shard", shard)

    summary = {
        "metric": "rehearsal_total_wall",
        "value": round(sum(r["wall_s"] for r in results), 3),
        "unit": "sec",
        "input_rows": n_src * REPLICAS,
        "final_rows": results[-3]["rows"],
        "shuffle_write_total": sum(r["shuffle_write"] for r in results),
        "cpus": cpus,
    }
    print(json.dumps(summary), flush=True)
    print("\n| stage | wall (s) | shuffle write | shuffle read | rows out |")
    print("|---|---|---|---|---|")
    for r in results:
        print(
            f"| {r['stage']} | {r['wall_s']} | {fmt_bytes(r['shuffle_write'])} "
            f"| {fmt_bytes(r['shuffle_read'])} | {r.get('rows', '—')} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
