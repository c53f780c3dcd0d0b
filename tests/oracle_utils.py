"""Local stand-in for the driver's DuckDB-oracle comparison: run the Spark
query and the oracle SQL on the same parquet tables, normalize, and diff."""

from __future__ import annotations

import datetime as dt
import decimal
import math

import duckdb

from event_stream_spark.queries import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Driver-grade strictness: compare the EXACT double (no rounding
        # blur).  A 9-dp round here masked dup_spans's last-ulp divergence
        # for four rounds; any query emitting doubles must make both twins
        # bit-identical (integer-scaled rounding / DECIMAL), not rely on
        # the harness to forgive drift.
        return v.hex()
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    return v


def normalize_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Driver-style: sort columns by name, then sort rows (None-safe — cube/
    rollup rows carry NULL group keys; sort key stringifies per cell)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(normed, key=lambda row: tuple(str(v) for v in row))


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()
    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count differs: spark={len(s_rows)} duck={len(d_rows)}"
    a = normalize_rows(s_cols, s_rows)
    b = normalize_rows(d_cols, d_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        return False, f"values differ, first diffs: {diffs}"
    return True, "ok"
