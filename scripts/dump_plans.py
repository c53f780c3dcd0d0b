#!/usr/bin/env python
"""Dump `explain("formatted")` for registry entries to plans/<round>/.

Usage: python scripts/dump_plans.py <outsuffix> <name> [<name> ...]
       python scripts/dump_plans.py _before.txt all

Plans are captured at sf0.01 (small enough to plan instantly, large
enough that AQE/broadcast thresholds see real footer stats).  The judge
reads these files instead of running Spark — keep them committed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.01")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r11"))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)

    import __spark_entry__ as entry_mod
    from event_stream_spark.session import get_spark

    queries = entry_mod.queries()
    if names == ["all"]:
        names = sorted(queries)
    spark = get_spark("plan-dump", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = queries[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(OUT, f"{name}{suffix}"), "w") as f:
            f.write(plan)
        print(f"wrote {name}{suffix} ({plan.count(chr(10))} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
