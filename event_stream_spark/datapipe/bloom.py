"""Bloom-filter runtime pruning — the membership-purge pattern at 100 TB.

Scenario: purge a huge fact stream (``events``) of all rows belonging to a
flagged key set (users with at least one ``error`` event — the abuse-purge /
GDPR-delete shape).  The naive plan shuffles or broadcasts the full flagged
set against every fact row.  The scalable plan is the classic runtime-filter
split that engines inject automatically for selective joins (Spark's
``spark.sql.optimizer.runtime.bloomFilter.enabled``) — built here explicitly
as a reusable relational operator, because a pipeline author needs it in
places the optimizer can't see (cross-job purges, pre-computed block sets):

1. **Build** (distributed, one tiny agg): each flagged key sets ``K`` bit
   positions ``pmod(xxhash64(key, j), M)``; positions fold into a bitmap of
   ``M/64`` longs via ``bit_or`` — the artifact is CONSTANT-SIZE regardless
   of key-set cardinality, so fetching it to the driver is a bounded ≤
   ``M/64``-row action (memoized per (session, sf), the ``_query_vector``
   pattern), not a data-dependent collect.
2. **Prune** (map-side, zero joins, whole-stage codegen): the bitmap rides
   into the probe scan as a literal array; a row whose ``K`` probe bits are
   not all set is DEFINITELY clean — it skips the join entirely.  No
   false negatives, by Bloom construction.
3. **Exact verify** (candidates only): bloom-pass rows — the flagged rows
   plus a false-positive sliver (~(1-e^{-Kn/M})^K) — anti-join the real
   flagged set.  The expensive join now touches a small fraction of the
   fact table.

The final answer is EXACT (bloom false positives are re-checked; false
negatives don't exist), so the DuckDB oracle is the plain anti-join — the
bloom internals are a physical optimization, invisible in the result.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from event_stream_spark.queries import t, _session_key

BLOOM_M = 1 << 10  # bits
BLOOM_WORDS = BLOOM_M // 64
BLOOM_K = 3
#: a user is flagged once their error-event count reaches this (>= 1 would
#: flag every synthetic user — the purge must leave survivors to summarize)
ERROR_THRESHOLD = 20

#: constant-size bitmap cache, keyed like similarity._QUERY_VEC_CACHE
_BLOOM_CACHE: dict[tuple[str, str], list[int]] = {}


def _positions(key: Column) -> list[Column]:
    """The K bit positions for a key — same expressions on build and probe."""
    return [
        F.pmod(F.xxhash64(key, F.lit(j)), F.lit(BLOOM_M)) for j in range(BLOOM_K)
    ]


def _flagged(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "events")
        .filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.count("*").alias("ne"))
        .filter(F.col("ne") >= ERROR_THRESHOLD)
        .select("user_id")
    )


def bloom_bitmap(spark: SparkSession, sf: str) -> list[int]:
    """BLOOM_WORDS longs: the flagged-user bloom filter, built with one
    distributed aggregation (explode K positions → word/bit split →
    ``bit_or`` partial-agg per 64-bit word) and fetched as ≤ BLOOM_WORDS
    rows."""
    ck = (_session_key(spark), sf)
    bm = _BLOOM_CACHE.get(ck)
    if bm is None:
        rows = (
            _flagged(spark, sf)
            .select(
                F.explode(F.array(*_positions(F.col("user_id")))).alias("pos")
            )
            .select(
                F.expr("cast(pos div 64 as int)").alias("w"),
                F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("bit"),
            )
            .groupBy("w")
            .agg(F.bit_or("bit").alias("bits"))
            .collect()
        )
        bm = [0] * BLOOM_WORDS
        for r in rows:
            bm[r["w"]] = r["bits"]
        _BLOOM_CACHE[ck] = bm
    return bm


def bloom_prune(spark: SparkSession, sf: str) -> DataFrame:
    """Kept-events summary after purging flagged users, computed via
    bloom-prune + exact verify: per event_type, surviving row count and
    value sum."""
    e = t(spark, sf, "events")
    bm = bloom_bitmap(spark, sf)
    lit_map = F.array(*[F.lit(w).cast("long") for w in bm])
    probe = e.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        lit_map.alias("bm"),
        *[p.alias(f"p{j}") for j, p in enumerate(_positions(F.col("user_id")))],
    )
    hits = [
        F.expr(
            f"(element_at(bm, cast(p{j} div 64 as int) + 1)"
            f" & shiftleft(1L, cast(p{j} % 64 as int))) <> 0"
        )
        for j in range(BLOOM_K)
    ]
    maybe_flagged = reduce(lambda a, b: a & b, hits)
    cols = ["event_id", "user_id", "event_type", "value"]
    # definitely-clean rows never see a join; candidates get the exact check
    clean_fast = probe.filter(~maybe_flagged).select(*cols)
    verified = (
        probe.filter(maybe_flagged)
        .select(*cols)
        .join(_flagged(spark, sf), "user_id", "left_anti")
        .select(*cols)
    )
    kept = clean_fast.unionByName(verified)
    return (
        kept.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("event_type")
    )


# The bloom split is physical-only: candidates are exactly re-verified and
# non-candidates are provably clean, so the oracle is the plain anti-join.
BLOOM_PRUNE_SQL = f"""
    WITH flagged AS (
        SELECT user_id FROM events WHERE event_type = 'error'
        GROUP BY user_id HAVING count(*) >= {ERROR_THRESHOLD}
    )
    SELECT event_type, count(*)::BIGINT AS n, round(sum(value), 2) AS sum_value
    FROM events e
    WHERE NOT EXISTS (SELECT 1 FROM flagged f WHERE f.user_id = e.user_id)
    GROUP BY event_type
    ORDER BY event_type
"""
