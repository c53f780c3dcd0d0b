"""Q-set ↔ DuckDB oracle parity at sf0.01 — the local twin of the driver's
CORRECTNESS gate."""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare, duck_connection

import __spark_entry__ as entry_mod


@pytest.fixture(scope="module")
def duck():
    if not os.path.isdir(SF_CORRECT):
        pytest.skip("sf0.01 testdata not available")
    con = duck_connection(SF_CORRECT)
    yield con
    con.close()


def all_query_names():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    # every oracle key must have a query; queries without oracle are rows-only
    assert set(o) <= set(q)
    return sorted(o)


@pytest.mark.parametrize("name", all_query_names())
def test_query_matches_oracle(spark, duck, name):
    df = entry_mod.queries()[name](spark, SF_CORRECT)
    ok, msg = compare(df, duck, entry_mod.oracle_sql()[name])
    assert ok, f"{name}: {msg}"


def test_no_hugeint_oracle_columns(duck):
    """No oracle output column may be HUGEINT/UHUGEINT.

    DuckDB ``sum()`` over integer columns yields HUGEINT; a pandas-style
    fetch (as the driver uses) converts HUGEINT to float64, so the oracle
    serializes ``3.0`` where Spark serializes ``3`` — failing the value
    hash while rows/schema stay green (the r5 ``dup_spans`` red).  Cast
    such aggregates to BIGINT in the oracle SQL.  This guard makes the
    whole bug class structurally impossible.
    """
    offenders = {}
    for name, sql in entry_mod.oracle_sql().items():
        rel = duck.sql(sql)
        hug = [
            col
            for col, typ in zip(rel.columns, rel.types)
            if str(typ) in ("HUGEINT", "UHUGEINT")
        ]
        if hug:
            offenders[name] = hug
    assert not offenders, (
        f"oracle columns with HUGEINT type (cast to ::BIGINT): {offenders}"
    )


def test_rows_only_queries_run(spark):
    """Queries without an oracle entry still must run and return a DataFrame."""
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    for name in sorted(set(q) - set(o)):
        df = q[name](spark, SF_CORRECT)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
