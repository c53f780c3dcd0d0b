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
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))

    from event_stream_spark.session import get_spark

    spark = get_spark("event-stream-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()

    # warm the JVM + parquet footers once so steady-state throughput is
    # measured, not first-call classloading
    from event_stream_spark.queries import t

    for name in ("lineitem", "orders", "events"):
        t(spark, sf_dir, name).count()

    timings: dict[str, float] = {}
    for name in sorted(queries):
        start = time.perf_counter()
        df = queries[name](spark, sf_dir)
        # force full execution; limit collect size defensively
        df.limit(100000).collect()
        timings[name] = round(time.perf_counter() - start, 6)

    sf = None
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        pass

    total = round(sum(timings.values()), 6)
    print(
        json.dumps(
            {
                "metric": "qset_total_wall",
                "value": total,
                "unit": "sec",
                "queries": {k: round(v, 6) for k, v in timings.items()},
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
