"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (Q19-style pricing summary) on sf0.001.
``queries()`` — every implemented operator/query from SURVEY.md §2 (Q-set +
data-pipeline extras), each ``(spark, sf_dir) -> DataFrame``.
``oracle_sql()`` — the DuckDB twin for each SQL-expressible entry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: scan+filter+agg+sort end-to-end (Q19 pricing summary)."""
    from event_stream_spark.queries import q19

    return q19(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from event_stream_spark.queries import QUERIES, plan_cached

    registry: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    registry.update(QUERIES)
    try:
        from event_stream_spark.datapipe import DATAPIPE_QUERIES

        registry.update(DATAPIPE_QUERIES)
    except ImportError:
        pass
    # prepared-plan cache: build+analyze each logical plan once per
    # (session, sf); execution still runs fully on every invocation
    return {name: plan_cached(name, fn) for name, fn in registry.items()}


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
