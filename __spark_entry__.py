"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (Q19-style pricing summary) on sf0.001.
``queries()`` — every implemented operator/query from SURVEY.md §2 (Q-set +
data-pipeline extras), each ``(spark, sf_dir) -> DataFrame``.
``oracle_sql()`` — the DuckDB twin for each SQL-expressible entry.
"""

from __future__ import annotations

import glob
import json
import os

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: scan+filter+agg+sort end-to-end (Q19 pricing summary)."""
    from event_stream_spark.queries import q19

    return q19(spark, "/root/testdata/sf0.001")


def witness_ages(repo: str = _REPO) -> dict[str, int]:
    """name -> newest round with a green CORRECTNESS row (0 = never green).

    "Green" means hash_match true, or — for the rows-only-by-design
    entries — err == "no_oracle" with spark_rows recorded.  This is the
    single source of truth for the witness rotation; the guard tests in
    tests/test_registry_order.py call this same implementation.
    """
    ages: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        digits = os.path.basename(path)[13:-5]
        if not digits.isdigit():
            continue
        rnd = int(digits)
        try:
            with open(path) as fh:
                data = json.load(fh)
        except ValueError:
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            green = row.get("hash_match") is True or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if green:
                ages[name] = max(ages.get(name, 0), rnd)
    return ages


def _registry_names() -> list[str]:
    from event_stream_spark.queries import QUERIES

    names = set(QUERIES)
    try:
        from event_stream_spark.datapipe import DATAPIPE_QUERIES

        names |= set(DATAPIPE_QUERIES)
    except ImportError:
        pass
    return sorted(names)


def compute_witness_order() -> list[str]:
    """Least-recently-green-witnessed first, ties alphabetical.

    The driver hash-checks the FIRST 50 registry entries per round, so
    iteration order is part of the verification contract (VERDICT r4 ask
    #3).  Rotating by witness age guarantees every entry is re-witnessed
    on a bounded cadence.  Derived at import time from the
    CORRECTNESS_r0*.json artifacts (VERDICT r6 ask #1) so the order can
    never go stale when the driver lands a new artifact — the r6 failure
    mode of the previous hard-coded list.
    """
    ages = witness_ages()
    return sorted(_registry_names(), key=lambda n: (ages.get(n, 0), n))


# Driver correctness-gate ordering — computed, never hand-maintained.
WITNESS_ORDER: list[str] = compute_witness_order()

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from event_stream_spark.queries import QUERIES, plan_cached

    registry: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    registry.update(QUERIES)
    try:
        from event_stream_spark.datapipe import DATAPIPE_QUERIES

        registry.update(DATAPIPE_QUERIES)
    except ImportError:
        pass
    ordered = {n: registry[n] for n in WITNESS_ORDER if n in registry}
    ordered.update({n: f for n, f in registry.items() if n not in ordered})
    # prepared-plan cache: build+analyze each logical plan once per
    # (session, sf); execution still runs fully on every invocation
    return {name: plan_cached(name, fn) for name, fn in ordered.items()}


def oracle_sql() -> dict[str, str]:
    from event_stream_spark.queries import ORACLE_SQL

    sql: dict[str, str] = {}
    sql.update(ORACLE_SQL)
    try:
        from event_stream_spark.datapipe import DATAPIPE_ORACLE_SQL

        sql.update(DATAPIPE_ORACLE_SQL)
    except ImportError:
        pass
    return sql
