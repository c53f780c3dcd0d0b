"""The declared correctness query set (SURVEY.md §2.11, Q1–Q20) plus
capability-depth extensions Q21–Q24.

Each query witnesses one or more reference operators (cited per entry) over
the driver's synthetic tables.  Every entry exists twice, with IDENTICAL
column names: a Spark DataFrame builder here and an ANSI-SQL DuckDB oracle in
``ORACLE_SQL``.  Determinism: total ORDER BY everywhere; floating aggregates
rounded as annotated before hashing (rounding applied in BOTH dialects).

Scale notes per query are inline — the headline ones: joins against dimension
tables use broadcast when small (AQE decides from runtime stats otherwise),
aggregations are partial-agg + shuffle (map-side combine free from Catalyst),
window queries shuffle once on the partition key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from event_stream_spark.operators.timegrid import TIME_GAPFILL_SQL

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _session_key(spark: SparkSession) -> str:
    """Cache key that cannot alias across stop/start cycles (``id()`` can be
    reused after GC; applicationId is unique per app) and distinguishes
    ``newSession()`` clones within an app (clones share the applicationId
    but have their own catalog and SQLConf — a cached DataFrame or a conf
    pin must not leak across them; q36's valve-scoped clone relies on
    this).  The JVM identity hash is stable for the session's lifetime,
    and any cached entry keeps its session alive via the DataFrame
    reference, so the hash cannot be recycled while a cache row exists."""
    return (
        f"{spark.sparkContext.applicationId}:{spark._jsparkSession.hashCode()}"
    )


_TABLE_CACHE: dict[tuple[str, str], DataFrame] = {}

#: (query name, session id, sf dir) → built DataFrame.  Prepared-plan cache:
#: a registry query is a pure function of (session, sf dir), so the logical
#: plan can be built+analyzed once and re-executed many times — the Python-
#: side construction of wide plans (64-column aggregates, 16-hash signatures)
#: costs ~1s of py4j round trips, which would otherwise be paid per run.
#: Execution is NOT cached — every run scans, shuffles, and aggregates anew.
_PLAN_CACHE: dict[tuple[str, str, str], DataFrame] = {}

#: sessions whose timezone/NTZ confs have been pinned by t() (see its doc)
_CONF_PINNED: set[str] = set()


def plan_cached(
    name: str, fn: Callable[[SparkSession, str], DataFrame]
) -> Callable[[SparkSession, str], DataFrame]:
    """Wrap a registry query with the prepared-plan cache."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        key = (name, _session_key(spark), sf_dir)
        df = _PLAN_CACHE.get(key)
        if df is None:
            df = fn(spark, sf_dir)
            _PLAN_CACHE[key] = df
        return df

    wrapped.__name__ = getattr(fn, "__name__", name)
    wrapped.__doc__ = fn.__doc__
    return wrapped


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a synthetic table, tolerating TIMESTAMP(NANOS) parquet columns.

    Spark has no nanosecond timestamp type and refuses NANOS parquet columns
    outright; with ``nanosAsLong`` they read as raw nanos which we floor to
    microseconds JVM-side (integer division — a double division would lose
    precision above 2^53 ns).  DuckDB's TIMESTAMP_NS fetch truncates the same
    way, so oracle comparisons agree.

    DataFrames are memoized per (session, path): the footer/schema probe and
    relation setup run once, not once per query.
    """
    path = f"{sf_dir}/{name}.parquet"
    skey = _session_key(spark)
    key = (skey, path)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached

    import pyarrow.dataset as ds

    ns_cols = [
        f.name for f in ds.dataset(path, format="parquet").schema
        if str(f.type) == "timestamp[ns]"
    ]
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Naive (no-timezone) parquet timestamps must land as TIMESTAMP (LTZ)
    # under a UTC session tz: the stored int64 micros are then the epoch
    # verbatim — zero timezone arithmetic — which is exactly how DuckDB's
    # epoch_us reads the same file, and epoch helpers (unix_micros) reject
    # NTZ outright.  UTC session tz is a CONTRACT of this engine (all
    # Q-set time functions assume it; the oracle runs in UTC) — get_spark
    # sets both at construction; for foreign sessions (the driver passes
    # its own) they are pinned here ONCE per session, not per read, so a
    # read is otherwise conf-neutral.  The post-read cast below is
    # forward-compat insurance only (it fires if a future Spark ignores or
    # renames the conf and NTZ leaks through the read).
    if skey not in _CONF_PINNED:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        _CONF_PINNED.add(skey)
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    ntz_cols = [name for name, dt in df.dtypes if dt == "timestamp_ntz"]
    for c in ntz_cols:
        # session tz is UTC (set above), so this cast maps the naive wall
        # value to the identical epoch — bit-equal to the non-NTZ read path
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    _TABLE_CACHE[key] = df
    return df


# ---------------------------------------------------------------------------
# Q1–Q20
# ---------------------------------------------------------------------------

def q1(spark, sf):
    """F1 filter + P8 projection — non-empty 'blocks' analog."""
    return (
        t(spark, sf, "orders")
        .filter(F.col("o_totalprice") > 100)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(100)
    )


def q2(spark, sf):
    """F2 event-type membership filter."""
    return (
        t(spark, sf, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("event_id", "event_type")
        .orderBy("event_id")
    )


def q3(spark, sf):
    """P2/P3 flatten analog: child-table scan with range filter."""
    return (
        t(spark, sf, "lineitem")
        .filter(F.col("l_orderkey") <= 100)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    )


def q4(spark, sf):
    """J1 equi-join on key (orders ⋈ customer).  Dimension side broadcast
    when under threshold; AQE otherwise — no manual hint needed."""
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .select("o_orderkey", "c_name")
        .orderBy("o_orderkey")
        .limit(1000)
    )


def q5(spark, sf):
    """J2 gap-fill as anti-join: spark.range is a generated leaf (no scan)."""
    want = spark.range(1, 1001).select(F.col("id").alias("h"))
    have = (
        t(spark, sf, "events")
        .filter(F.col("event_id") <= 1000)
        .select(F.col("event_id").alias("h"))
        .distinct()
    )
    return want.join(have, on="h", how="left_anti").orderBy("h")


def q6(spark, sf):
    """F5 dedup via ranking window — first-seen-per-key (lastSeen semantics)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t(spark, sf, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id")
        .orderBy("user_id")
    )


def q7(spark, sf):
    """U1 union."""
    e = t(spark, sf, "events")
    lo = e.filter(F.col("event_id") < 100).select("event_id")
    hi = e.filter((F.col("event_id") >= 100) & (F.col("event_id") < 200)).select(
        "event_id"
    )
    return lo.unionAll(hi).orderBy("event_id")


def q8_intersect(spark, sf):
    """Set ops (capability parity — free from Spark SQL)."""
    e = t(spark, sf, "events")
    click = e.filter(F.col("event_type") == "click").select("user_id")
    view = e.filter(F.col("event_type") == "view").select("user_id")
    return click.intersect(view).orderBy("user_id")


def q8_except(spark, sf):
    e = t(spark, sf, "events")
    click = e.filter(F.col("event_type") == "click").select("user_id")
    purchase = e.filter(F.col("event_type") == "purchase").select("user_id")
    return click.subtract(purchase).orderBy("user_id")  # EXCEPT (set semantics)


def q9(spark, sf):
    """O1/O2 ordering + top-k.  Spark plans ORDER BY + LIMIT as TakeOrderedAndProject
    — per-partition top-k then merge, no global sort at scale."""
    return (
        t(spark, sf, "events")
        .select("event_id", "value")
        .orderBy(F.col("value").desc(), "event_id")
        .limit(50)
    )


def q10(spark, sf):
    """O5 sliding window (ring-buffer 'windowed') as a 5-row analytic avg.
    event_id tiebreak keeps the frame deterministic under ts ties."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    return (
        t(spark, sf, "events")
        .select(
            "event_id",
            "value",
            F.round(F.avg("value").over(w), 6).alias("avg5"),
        )
        .orderBy("event_id")
        .limit(500)
    )


def q11(spark, sf):
    """F6 distinct-until-changed via lag."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t(spark, sf, "events")
        .withColumn("prev", F.lag("event_type").over(w))
        .filter(~F.col("prev").eqNullSafe(F.col("event_type")))
        .select("event_id")
        .orderBy("event_id")
        .limit(500)
    )


def q12(spark, sf):
    """O4 count-window analog: grouped aggregation (partial agg map-side)."""
    return (
        t(spark, sf, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("total"))
        .orderBy("user_id")
    )


def q13(spark, sf):
    """Event-time tumbling window (hour) — our watermark-window capability."""
    return (
        t(spark, sf, "events")
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("h"), F.col("event_type")
        )
        .agg(F.count("*").alias("n"))
        .orderBy("h", "event_type")
    )


def q14(spark, sf):
    """Aggregation depth: ROLLUP over a 3-way join (nation/customer broadcast)."""
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    n = t(spark, sf, "nation")
    joined = o.join(c, o["o_custkey"] == c["c_custkey"]).join(
        n, c["c_nationkey"] == n["n_nationkey"]
    )
    return (
        joined.rollup("n_name", "o_orderstatus")
        .agg(F.count("*").alias("n"))
        .orderBy(
            F.col("n_name").asc_nulls_first(),
            F.col("o_orderstatus").asc_nulls_first(),
        )
    )


def q15(spark, sf):
    """X1/X4 hash functions (sha2 == DuckDB sha256, lowercase hex)."""
    return (
        t(spark, sf, "events")
        .filter(F.col("event_id") <= 100)
        .select(
            "event_id",
            F.sha2(F.col("event_id").cast("string"), 256).alias("h"),
        )
        .orderBy("event_id")
    )


def q16(spark, sf):
    """K3 splayed-path expression (FileOutput.kt:16-37)."""
    return (
        t(spark, sf, "events")
        .filter(F.col("event_id") <= 100)
        .select(
            "event_id",
            F.substring(
                F.sha2(F.col("event_id").cast("string"), 256), 1, 4
            ).alias("splay"),
            F.lpad(F.col("event_id").cast("string"), 10, "0").alias("fname"),
        )
        .orderBy("event_id")
    )


def q17(spark, sf):
    """F3 tri-state predicate as CASE WHEN."""
    keep = (
        F.when(F.col("event_type").isNull(), F.lit(True))
        .when(F.col("event_type") == "click", F.lit(True))
        .otherwise(F.lit(False))
    )
    return (
        t(spark, sf, "events")
        .select("event_id", keep.alias("keep"))
        .orderBy("event_id")
        .limit(500)
    )


def q18(spark, sf):
    """F2 as a left-semi join (EXISTS form)."""
    o = t(spark, sf, "orders")
    l = t(spark, sf, "lineitem").filter(F.col("l_discount") > 0.05)
    return (
        o.join(l, o["o_orderkey"] == l["l_orderkey"], "left_semi")
        .select("o_orderkey")
        .orderBy("o_orderkey")
        .limit(500)
    )


def q19(spark, sf):
    """TPC-H-style pricing summary: scan+filter+agg+sort end-to-end.
    The filter and the 7-column projection both reach the parquet scan."""
    l = t(spark, sf, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("s_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("s_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("s_disc"),
            F.round(F.avg("l_quantity"), 4).alias("a_qty"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q20(spark, sf):
    """Distinct-count capability parity (exact; approx_count_distinct is the
    scale path — see datapipe.textstats for its use)."""
    return t(spark, sf, "events").agg(
        F.count_distinct(F.col("user_id")).alias("n_users")
    )


def q21(spark, sf):
    """NOT EXISTS anti-join: orders with no discounted lineitem — the
    complement of Q18 (left-anti plans identically to the gap-fill J2)."""
    o = t(spark, sf, "orders")
    l = t(spark, sf, "lineitem").filter(F.col("l_discount") > 0.05)
    return (
        o.join(l, o["o_orderkey"] == l["l_orderkey"], "left_anti")
        .select("o_orderkey")
        .orderBy("o_orderkey")
        .limit(500)
    )


def q22(spark, sf):
    """CUBE over (event_type, weekday): all 4 grouping combinations in one
    pass — Catalyst expands to a single Expand + partial agg (vs 4 scans)."""
    e = t(spark, sf, "events").select(
        "event_type", F.dayofweek("ts").alias("wd"), "value"
    )
    return (
        e.cube("event_type", "wd")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .orderBy(
            F.col("event_type").asc_nulls_first(), F.col("wd").asc_nulls_first()
        )
    )


def q23(spark, sf):
    """Ranking family: ntile quartiles + dense_rank per user over event time
    (one window shuffle on user_id serves both functions)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = t(spark, sf, "events")
    return (
        e.select(
            "event_id",
            "user_id",
            F.ntile(4).over(w).alias("quartile"),
            F.dense_rank().over(w).alias("rnk"),
        )
        .orderBy("event_id")
        .limit(500)
    )


def q24(spark, sf):
    """Pivot-style conditional aggregation: one pass, one shuffle, N
    FILTER-style aggregates (the scalable alternative to a pivot explode)."""
    e = t(spark, sf, "events")
    cnt = lambda ty: F.count(F.when(F.col("event_type") == ty, 1)).alias(f"n_{ty}")
    return (
        e.groupBy("user_id")
        .agg(cnt("click"), cnt("view"), cnt("purchase"))
        .orderBy("user_id")
    )


#: sessionization gap: a new session starts after >30 min of user inactivity
SESSION_GAP_US = 30 * 60 * 1_000_000
FUNNEL_WINDOW_US = 3_600_000_000  # 1-hour per-step conversion window (q29)


def q25(spark, sf):
    """Gap-based sessionization: per user, a new session starts when the gap
    since their previous event exceeds 30 minutes; per-session aggregates.

    Scale shape: one shuffle on user_id serves BOTH window passes (lag,
    then running sum of session starts) AND the final (user_id, session_seq)
    groupBy — Catalyst sees the compatible partitioning and inserts no
    further exchange.  Gap arithmetic is in epoch microseconds so the
    DuckDB oracle is bit-identical (no truncation-semantics drift).
    The streaming counterpart is ``streaming.windows.sessionized_counts``
    (``F.session_window`` + watermark); this batch form is the
    oracle-checkable twin.
    """
    e = t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev = F.lag(us).over(w)
    new_s = F.when(prev.isNull() | (us - prev > SESSION_GAP_US), 1).otherwise(0)
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = e.select(
        "user_id", "ts", "event_id", "value", new_s.alias("new_s")
    ).select(
        "user_id",
        "ts",
        "value",
        F.sum("new_s").over(cum).alias("session_seq"),
    )
    return (
        s.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.unix_micros(F.min("ts")).alias("t_start_us"),
            F.unix_micros(F.max("ts")).alias("t_end_us"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("user_id", "session_seq")
    )


def q26(spark, sf):
    """As-of join: each purchase event is enriched with the same user's
    latest click at or before it (point-in-time lookup,
    ``operators/asof.py``).

    Scale shape: one shuffle on user_id over clicks+purchases, then a
    linear window pass — the union+window as-of formulation; the DuckDB
    oracle is the engine's native ASOF LEFT JOIN, a genuinely independent
    algorithm for the same semantics.
    """
    from event_stream_spark.operators.asof import as_of_join

    e = t(spark, sf, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    j = as_of_join(
        purchases,
        clicks,
        on="user_id",
        right_cols=["event_id", "ts", "value"],
        tiebreak=["event_id"],
    )
    return j.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("event_id_r").alias("match_id"),
        F.unix_micros("ts_r").alias("match_ts_us"),
        F.col("value_r").alias("match_value"),
    ).orderBy("event_id")


def q27(spark, sf):
    """Interval-overlap range join (``operators/rangejoin.py``): purchase
    windows [ts, ts+10min] × error windows [ts, ts+2min], keyless — which
    errors were in flight while each purchase was open.

    Scale shape: bin-blocked equi-join on a 10-minute bin key (one hash
    shuffle, ≤2 bins per interval) with the overlap test as a residual
    filter — never the BroadcastNestedLoopJoin a raw inequality join plans
    to.  The DuckDB oracle runs the SAME semantics through its IEJoin
    operator — a genuinely independent range-join algorithm.
    """
    from event_stream_spark.operators.rangejoin import interval_overlap_join

    e = t(spark, sf, "events")
    us = F.unix_micros(F.col("ts"))
    purch = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        us.alias("p_start"),
        (us + 600_000_000).alias("p_end"),
    )
    err = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id"),
        us.alias("e_start"),
        (us + 120_000_000).alias("e_end"),
    )
    j = interval_overlap_join(
        purch,
        err,
        left_start="p_start",
        left_end="p_end",
        right_start="e_start",
        right_end="e_end",
        bin_width_us=600_000_000,
    )
    return j.select(
        "p_id",
        "e_id",
        (F.least("p_end", "e_end") - F.greatest("p_start", "e_start")).alias(
            "overlap_us"
        ),
    ).orderBy("p_id", "e_id")


def q27_agg(spark, sf):
    """Aggregate form of the interval-overlap join: per purchase window,
    how many error windows were in flight and for how many total
    microseconds.  Same bin-blocked range join as q27, but the pair set is
    reduced BEFORE materialization — this is the shape a 100 TB run uses.

    Scale shape: q27's pair output grows ~quadratically with interval
    density in a fixed time domain (sf1 already materializes 11M pairs —
    85% of its wall is output hashing, not the join; at 100x the pair set
    is ~1e10 rows and unbenchable).  Aggregating on p_id caps the result
    at |purchases| rows at ANY density, and Catalyst pushes a partial
    aggregate above the join residual inside the same stage, so nothing
    wider than (p_id, count, sum) ever crosses the second shuffle.  The
    pair-form q27 stays in the registry as the correctness witness for
    the operator's per-pair semantics.
    """
    from event_stream_spark.operators.rangejoin import interval_overlap_join

    e = t(spark, sf, "events")
    us = F.unix_micros(F.col("ts"))
    purch = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        us.alias("p_start"),
        (us + 600_000_000).alias("p_end"),
    )
    err = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id"),
        us.alias("e_start"),
        (us + 120_000_000).alias("e_end"),
    )
    j = interval_overlap_join(
        purch,
        err,
        left_start="p_start",
        left_end="p_end",
        right_start="e_start",
        right_end="e_end",
        bin_width_us=600_000_000,
    )
    return (
        j.groupBy("p_id")
        .agg(
            F.count("*").alias("n_overlaps"),
            F.sum(
                F.least("p_end", "e_end") - F.greatest("p_start", "e_start")
            ).alias("overlap_us_total"),
        )
        .orderBy("p_id")
    )


def q28(spark, sf):
    """Exact distributed percentiles: p50/p90/p99 of extended price per
    return flag over lineitem (``F.percentile`` — Spark's exact
    sort-based percentile aggregate, continuous interpolation).

    Scale shape: ordinary partial-agg + one shuffle on the 3-value group
    key; the per-group sort is distributed inside the aggregate buffer.
    DuckDB's quantile_cont uses the same linear-interpolation definition,
    so values match bit-for-bit after rounding.
    """
    li = t(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


def q29(spark, sf):
    """Ordered funnel analysis: view → click → purchase, each step strictly
    after the previous one and within a 1-hour conversion window, per user;
    emits users reaching each step.

    Scale shape (r11 rewrite, guide §2.4): ONE events scan and ONE
    user_id exchange — the sequential step dependency is two running
    conditional mins over a RANGE frame ending at ``us - 1`` (the
    ``funnel_latency`` construction: the earliest view strictly before a
    click IS the user's global first view whenever one exists), then a
    single per-user conditional-min aggregate on the same partitioning.
    Pre-r11 this was three type-filtered scans + two shuffled joins + a
    distinct + a three-way left-join chain over persisted stage relations;
    the window form deletes all of it and keeps O(1) state per row.
    Equivalence with the join form is oracle-checked.
    """
    e = t(spark, sf, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    strictly_before = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    first_view = F.min(
        F.when(F.col("event_type") == "view", F.col("us"))
    ).over(strictly_before)
    s1 = e.select(
        "user_id",
        "event_type",
        "us",
        (
            (F.col("event_type") == "click")
            & (F.col("us") <= first_view + FUNNEL_WINDOW_US)
        ).alias("click_ok"),
    )
    first_qclick = F.min(F.when(F.col("click_ok"), F.col("us"))).over(
        strictly_before
    )
    s2 = s1.select(
        "user_id",
        "event_type",
        "us",
        "click_ok",
        (
            (F.col("event_type") == "purchase")
            & (F.col("us") <= first_qclick + FUNNEL_WINDOW_US)
        ).alias("purchase_ok"),
    )
    per_user = s2.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("us"))).alias("t1"),
        F.min(F.when(F.col("click_ok"), F.col("us"))).alias("t2"),
        F.min(F.when(F.col("purchase_ok"), F.col("us"))).alias("t3"),
    )
    return (
        per_user.select(
            "user_id",
            (
                F.when(F.col("t3").isNotNull(), 3)
                .when(F.col("t2").isNotNull(), 2)
                .when(F.col("t1").isNotNull(), 1)
                .otherwise(0)
            ).alias("funnel_step"),
        )
        .groupBy("funnel_step")
        .agg(F.count("*").alias("n_users"))
        .orderBy("funnel_step")
    )


def funnel_latency(spark, sf):
    """Step-latency percentiles for the q29 funnel: among converting users,
    exact p50/p90 of view→click and click→purchase lag plus the full
    view→purchase time-to-convert — the "where does the funnel stall"
    readout every product-analytics stack pairs with the step counts.

    Scale shape (r11 rewrite, guide §2.4): ONE events scan and ONE
    user_id exchange replace the pre-r11 three type-filtered scans + two
    shuffled joins.  The sequential dependency (t2 needs t1, t3 needs t2)
    is expressed as running conditional mins over a RANGE frame ending at
    ``us - 1``: for any row, the earliest view strictly before it IS the
    user's global first view whenever one exists (mins only move left), so
    "click after the first view, within the window" is decidable per row
    — no join back.  Both window passes and the per-user aggregate share
    the single user_id partitioning; state per row is O(1) (two running
    mins), never a collected array.  Equivalence with the join form is
    oracle-checked (same DuckDB twin).
    """
    e = t(spark, sf, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    ).filter(F.col("event_type").isin("view", "click", "purchase"))
    strictly_before = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    first_view = F.min(
        F.when(F.col("event_type") == "view", F.col("us"))
    ).over(strictly_before)
    s1 = e.select(
        "user_id",
        "event_type",
        "us",
        (
            (F.col("event_type") == "click")
            & (F.col("us") <= first_view + FUNNEL_WINDOW_US)
        ).alias("click_ok"),
    )
    first_qclick = F.min(F.when(F.col("click_ok"), F.col("us"))).over(
        strictly_before
    )
    s2 = s1.select(
        "user_id",
        "event_type",
        "us",
        "click_ok",
        (
            (F.col("event_type") == "purchase")
            & (F.col("us") <= first_qclick + FUNNEL_WINDOW_US)
        ).alias("purchase_ok"),
    )
    per_user = (
        s2.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("us"))).alias("t1"),
            F.min(F.when(F.col("click_ok"), F.col("us"))).alias("t2"),
            F.min(F.when(F.col("purchase_ok"), F.col("us"))).alias("t3"),
        )
        .filter(F.col("t3").isNotNull())
    )
    lags = per_user.select(
        (F.col("t2") - F.col("t1")).alias("view_to_click_us"),
        (F.col("t3") - F.col("t2")).alias("click_to_purchase_us"),
        (F.col("t3") - F.col("t1")).alias("view_to_purchase_us"),
    )
    aggs = []
    for c in ("view_to_click_us", "click_to_purchase_us", "view_to_purchase_us"):
        for q, nm in ((0.5, "p50"), (0.9, "p90")):
            aggs.append(F.round(F.expr(f"percentile({c}, {q})"), 4).alias(f"{nm}_{c}"))
    return lags.agg(F.count("*").alias("n_converters"), *aggs)


def q30(spark, sf):
    """Weekly cohort retention: users grouped by the week of their first
    event; per (cohort week, week offset) the distinct users active.

    Scale shape: the first-event timestamp is an unordered whole-partition
    window min over the SAME user_id exchange the rows already need — one
    events scan, no join (the old groupBy-min + join-back form scanned
    events twice and joined corpus-sized sides); the final count-distinct
    shuffles on the (cohort, offset) pair.  date_trunc('week') starts
    Monday in both engines, so offsets are exact multiples of 7 days.
    """
    e = t(spark, sf, "events").select("user_id", "ts")
    t0 = F.min("ts").over(Window.partitionBy("user_id"))
    j = e.select(
        "user_id",
        F.date_trunc("week", t0).cast("date").alias("cohort_week"),
        (
            F.datediff(
                F.date_trunc("week", "ts").cast("date"),
                F.date_trunc("week", t0).cast("date"),
            )
            / 7
        )
        .cast("int")
        .alias("week_offset"),
    )
    return (
        j.groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


def q31(spark, sf):
    """SCD2-style keyed point-in-interval join: each user's signup events
    define profile "versions" valid [signup, next signup); every click is
    joined to the version active at its timestamp — the keyed path of
    ``operators/rangejoin.py``.

    Scale shape: versions are built with one lead() window on user_id; the
    join co-partitions on (bin, user_id) — the keyed bin join never
    degenerates to a per-user cross product even for power users, because
    the bin key splits a user's history across time.  Clicks enter as
    zero-length intervals.
    """
    from event_stream_spark.operators.rangejoin import interval_overlap_join

    e = t(spark, sf, "events")
    us = F.unix_micros(F.col("ts"))
    # An open-ended validity of +inf would explode the bin sequence, so the
    # last version is capped at the USER's event horizon — a window max over
    # the same user_id shuffle, no job at plan-build time (the r3 version
    # ran an eager corpus-wide .head() scan here).  Result-equal to capping
    # at the global corpus horizon: every click of a user is <= that user's
    # max event time, so membership in the last version's interval is
    # decided by c_at >= v_from under either cap (the oracle states the
    # same semantics with the global max — results provably identical).
    # The window max includes the signup row itself, so user_hz >= v_from
    # and the fallback interval is never inverted.
    versions = (
        e.select(
            "user_id",
            "event_id",
            "event_type",
            us.alias("us"),
            F.max(us).over(Window.partitionBy("user_id")).alias("user_hz"),
        )
        .filter(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.col("event_id").alias("version_id"),
            F.col("us").alias("v_from"),
            "user_hz",
        )
        .withColumn(
            "v_to",
            F.coalesce(
                F.lead("v_from").over(
                    Window.partitionBy("user_id").orderBy("v_from", "version_id")
                )
                - 1,
                F.col("user_hz"),
            ),
        )
        .drop("user_hz")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        us.alias("c_at"),
        us.alias("c_end"),  # zero-length interval: a point-in-time probe
    )
    j = interval_overlap_join(
        clicks,
        versions,
        left_start="c_at",
        left_end="c_end",
        right_start="v_from",
        right_end="v_to",
        bin_width_us=86_400_000_000,  # 1-day bins
        on=["user_id"],
    )
    return j.select("click_id", "user_id", "version_id", "c_at").orderBy(
        "click_id", "version_id"
    )


def q32(spark, sf):
    """TPC-H Q5-style local-supplier volume: 6-way join
    (region→nation→{customer,supplier}→orders→lineitem) with a region
    filter and a one-year order window, revenue per nation.

    Scale shape: Catalyst's join reordering + AQE pick the physical order;
    region/nation/customer/supplier broadcast under the 64 MB threshold, so
    the only exchanges are the orders⋈lineitem equi-join and the final
    4-row aggregate — the canonical star-schema plan.  The date filter is
    pushed to the orders scan (PushedFilters), pruning before the join.
    """
    li = t(spark, sf, "lineitem")
    o = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    c = t(spark, sf, "customer")
    s = t(spark, sf, "supplier")
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(
            s,
            (li["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(n, s["s_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
    )
    return (
        j.groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


def fuzzy_match_q(spark, sf):
    """Entity resolution: every 100th customer name probed against the full
    customer master for edit-distance ≤ 1 matches (``operators/fuzzy.py``,
    deletion-neighborhood blocking — candidates from an equi-join on
    ≤k-deletion strings, never |probe|×|master| levenshtein; serial-number
    name shapes like ``Customer#000…`` stay output-sensitive where segment
    blocking would mega-bucket on the constant prefix).

    The DuckDB oracle IS the brute-force all-pairs levenshtein join, so the
    hash-match doubles as a completeness proof for the blocking.
    """
    from event_stream_spark.operators.fuzzy import fuzzy_match

    c = t(spark, sf, "customer")
    probes = c.filter(F.col("c_custkey") % 100 == 0).select("c_custkey", "c_name")
    return fuzzy_match(
        c.select("c_custkey", "c_name"),
        probes,
        text="c_name",
        key="c_custkey",
        k=1,
        broadcast_probes=True,  # probes are 1% of the master — provably small
    ).select(
        F.col("p_key").alias("probe_key"),
        F.col("m_key").alias("match_key"),
        "dist",
    )


def sketch_profile(spark, sf):
    """Approximate sketches per event type: HyperLogLog++ distinct users and
    GK-sketch approximate median value, alongside the exact twins — the
    cardinality/quantile profiling pass a 100 TB pipeline runs where exact
    computation would shuffle the full key set.

    Scale shape: both sketches are single-pass, mergeable, fixed-size
    aggregation buffers — partial aggregation map-side, tiny merge traffic
    (KBs per partition vs the full distinct key set).  Rows-only in the
    driver gate (HLL/GK internals aren't SQL-replayable); the accuracy
    contract vs the exact twins is pinned in pytest instead.
    """
    e = t(spark, sf, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users_exact"),
            F.approx_count_distinct("user_id", 0.02).alias("n_users_hll"),
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50_exact"),
            F.round(F.expr("percentile_approx(value, 0.5, 1000)"), 4).alias(
                "p50_approx"
            ),
        )
        .orderBy("event_type")
    )


def sketch_exact(spark, sf):
    """Exact twins of ``sketch_profile``'s sketches — COUNT(DISTINCT) and the
    exact interpolated median per event type — split out so the driver's
    hash-match gate witnesses them (the sketch columns themselves stay
    rows-only in ``sketch_profile``; their 5% accuracy contract vs these
    exact values is pinned in ``tests/test_functions.py``).

    Scale shape: one key-shuffle on the (tiny) event_type key; the distinct
    count and exact percentile both partial-aggregate map-side.  At 100 TB a
    pipeline would run the sketch variant — this entry exists to prove the
    sketches against ground truth at test scale.
    """
    e = t(spark, sf, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users_exact"),
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50_exact"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("event_type")
    )


def time_gapfill_q(spark, sf):
    """Hypertable-style hourly resample of ``events.value`` per user with
    LOCF and linear interpolation (``operators/timegrid.py``) — the
    event-time generalisation of the reference's height-axis gap-fill
    (ContiguousFlow.kt:17-30): missing grid points are synthesised and
    filled from neighbouring observations instead of re-fetched.

    The registry slice bounds the key set (user_id < 50, pushed to the
    scan) so the materialized result stays SF-independent — grid density is
    span/step per key, so an unbounded slice measures transfer volume
    rather than operator work."""
    from event_stream_spark.operators.timegrid import time_gapfill

    return time_gapfill(t(spark, sf, "events").filter(F.col("user_id") < 50))


#: trailing window for the anomaly baseline: the 20 observations strictly
#: before the current one; scores need at least 10 of them
ANOMALY_LOOKBACK = 20
ANOMALY_MIN_OBS = 10


def ts_anomaly(spark, sf):
    """Rolling z-score anomaly detection per user: each event's value scored
    against the mean/stddev of its trailing ``ANOMALY_LOOKBACK`` observations
    (strictly preceding — the scored point never contaminates its own
    baseline), flagged when \\|z\\| > 3.  The observability-pipeline twin of
    the reference's monotonic-stream assumptions: where the reference only
    detects *missing* heights (ContiguousFlow.kt:17-30), this detects
    *deviant* values on the same ordered-stream shape.

    Scale shape: one hash-exchange on ``user_id``, all three frame
    aggregates (count/avg/stddev) share it with a bounded ROWS frame —
    state per key is 20 rows regardless of series length.  The flag is
    computed from the ROUNDED score in both engines so the boundary cannot
    flip between float implementations.  Registry slice bounded to
    user_id < 50 (pushed to the scan) like ``time_gapfill``."""
    e = t(spark, sf, "events").filter(F.col("user_id") < 50)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ANOMALY_LOOKBACK, -1)
    )
    z = F.round(
        (F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w),
        6,
    )
    scored = e.select(
        "event_id",
        "user_id",
        "ts",
        F.round("value", 6).alias("value"),
        F.when(
            (F.count("value").over(w) >= ANOMALY_MIN_OBS)
            & (F.stddev_samp("value").over(w) > 0),
            z,
        ).alias("zscore"),
    )
    return scored.withColumn(
        "is_anomaly",
        F.when(F.col("zscore").isNotNull(), F.abs("zscore") > 3),
    ).orderBy("user_id", "ts", "event_id")


TS_ANOMALY_SQL = f"""
    WITH w AS (
        SELECT event_id, user_id, ts, value,
               count(value) OVER tw AS n_prev,
               avg(value) OVER tw AS mu,
               stddev_samp(value) OVER tw AS sd
        FROM events
        WHERE user_id < 50
        WINDOW tw AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN {ANOMALY_LOOKBACK} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, ts, round(value, 6) AS value,
           CASE WHEN n_prev >= {ANOMALY_MIN_OBS} AND sd > 0
                THEN round((value - mu) / sd, 6) END AS zscore,
           CASE WHEN n_prev >= {ANOMALY_MIN_OBS} AND sd > 0
                THEN abs(round((value - mu) / sd, 6)) > 3 END AS is_anomaly
    FROM w
    ORDER BY user_id, ts, event_id
"""


def json_extract(spark, sf):
    """Semi-structured extraction: parse the ``events.props`` JSON column
    with a FIXED schema (``from_json`` with ``k INT`` — the engine's
    no-inference stance, same contract as the decode layer's fixed-schema
    ``from_json`` over RPC frames, SURVEY §1.3 / MessageType.kt:44) and
    aggregate over the extracted field.

    Scale shape: ``from_json`` is JVM-side codegen (Jackson under
    whole-stage codegen — no Python), Catalyst defers it until referenced
    and prunes unreferenced fields; the aggregate partial-combines
    map-side, one key-shuffle on a tiny group domain."""
    e = t(spark, sf, "events")
    k = F.from_json("props", "k INT")["k"]
    return (
        e.select((k % 10).alias("k_bucket"), "event_type", "value")
        .groupBy("k_bucket", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .orderBy("k_bucket", "event_type")
    )


ATTR_LOOKBACK_DAYS = 7


def attribution(spark, sf):
    """Last-touch marketing attribution: every purchase is attributed to
    the SAME user's most recent click within a 7-day (ATTR_LOOKBACK_DAYS)
    lookback — the standard conversion-attribution join.  The click's
    channel comes out of the ``props`` JSON (fixed-schema ``from_json``,
    the ``json_extract`` contract); purchases whose latest click is older
    than the lookback (or who never clicked) attribute to NULL.

    Scale shape: the keyed as-of operator (one user_id shuffle over
    clicks+purchases, linear window pass — ``operators/asof.py``); the
    lookback is a post-join null-out, NOT a second join.  The DuckDB twin
    is the engine's native ASOF LEFT JOIN with the same expiry CASE — an
    independent algorithm for the same semantics.
    """
    from event_stream_spark.operators.asof import as_of_join

    e = t(spark, sf, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    k = F.from_json("props", "k INT")["k"]
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", k.alias("channel")
    )
    j = as_of_join(
        purchases,
        clicks,
        on="user_id",
        right_cols=["event_id", "ts", "channel"],
        tiebreak=["event_id"],
    )
    lb_us = ATTR_LOOKBACK_DAYS * 86400 * 1_000_000
    p_us = F.unix_micros(F.col("ts"))
    c_us = F.unix_micros(F.col("ts_r"))
    live = c_us >= p_us - F.lit(lb_us)
    return (
        j.select(
            "event_id",
            "user_id",
            p_us.alias("ts_us"),
            F.when(live, F.col("event_id_r")).alias("click_id"),
            F.when(live, F.col("channel_r")).alias("channel"),
            F.when(live, p_us - c_us).alias("lag_us"),
        )
        .orderBy("event_id")
    )


JSON_EXTRACT_SQL = """
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
           event_type, count(*) AS n, round(avg(value), 6) AS avg_value
    FROM events
    GROUP BY 1, 2
    ORDER BY k_bucket, event_type
"""


# ---------------------------------------------------------------------------
# Registry + oracle SQL
# ---------------------------------------------------------------------------



#: explicit pivot columns — passing values to pivot() keeps the plan a
#: single deterministic aggregate (no extra distinct-scan job to discover
#: them, and the output schema is fixed at plan time)
PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q33(spark, sf):
    """PIVOT: daily event matrix — one row per day, one count column per
    event type (the wide activity report every dashboard asks of a long
    event table).

    Scale shape: `pivot(values=...)` with explicit values compiles to ONE
    hash aggregate with 5 conditional-count expressions — a single day-key
    shuffle with map-side partial aggregation, identical cost to the
    hand-written CASE form the oracle uses; absent cells coalesce to 0 so
    both engines emit identical integers.
    """
    e = t(spark, sf, "events")
    return (
        e.groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", PIVOT_TYPES)
        .agg(F.count(F.lit(1)))
        .select(
            "day",
            *[
                F.coalesce(F.col(c), F.lit(0)).cast("long").alias(f"n_{c}")
                for c in PIVOT_TYPES
            ],
        )
        .orderBy("day")
    )




def q34(spark, sf):
    """UNPIVOT: the inverse of q33 — the wide daily matrix melted back to
    long (day, event_type, n) form, dropping empty cells.  Wide→long is
    the standard reshape between reporting marts and modeling inputs;
    round-tripping q33 through it reproduces the plain groupBy counts
    exactly (pinned by pytest).

    Scale shape: ``unpivot`` is a generate-style projection — 5 narrow
    rows out per input row, zero additional exchanges beyond q33's one
    aggregate; the n > 0 filter drops the coalesced empty cells so the
    long form matches the sparse groupBy exactly.
    """
    wide = q33(spark, sf)
    return (
        wide.unpivot(
            "day",
            [f"n_{c}" for c in PIVOT_TYPES],
            "event_type",
            "n",
        )
        .withColumn("event_type", F.expr("substring(event_type, 3)"))
        .filter(F.col("n") > 0)
        .orderBy("day", "event_type")
    )




def q35(spark, sf):
    """GROUPING SETS: event totals at three explicit granularities —
    (event_type, day-of-week), (event_type), and grand total — with
    ``grouping_id`` disambiguating which level each row belongs to (the
    surface CUBE/ROLLUP can't express: an arbitrary, non-lattice subset
    of groupings computed in one pass).

    Scale shape: one Expand + one hash aggregate — rows are replicated
    once per grouping set map-side and partially aggregated before the
    single exchange, identical to CUBE's physical strategy but with
    exactly the 3 requested sets instead of the full 4-set lattice.
    """
    e = t(spark, sf, "events").select(
        "event_type", F.dayofweek("ts").alias("dow"), "value"
    )
    e.createOrReplaceTempView("q35_events")
    return spark.sql(
        """
        SELECT event_type, dow,
               CAST(grouping_id(event_type, dow) AS BIGINT) AS gid,
               CAST(count(*) AS BIGINT) AS n,
               -- integer-scale BEFORE the sum: a commutative BIGINT sum is
               -- bit-identical at any partial-aggregation order, where
               -- round(sum(double)) could split on last-ulp drift
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c
        FROM q35_events
        GROUP BY GROUPING SETS ((event_type, dow), (event_type), ())
        ORDER BY gid, event_type, dow
        """
    )


#: shared SQL text for q36 — identical in Spark and DuckDB (both speak
#: standard WITH RECURSIVE), so the oracle IS the query modulo the view name
_Q36_BODY = """
WITH RECURSIVE seq AS (
  SELECT o_custkey, o_orderdate,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM {orders}
), chain AS (
  -- anchors: orders with no predecessor within the 30-day gap
  SELECT s.o_custkey, s.rn AS anchor_rn, s.rn,
         s.o_orderdate AS chain_start, s.o_orderdate AS cur_date,
         CAST(1 AS BIGINT) AS chain_len
  FROM seq s LEFT JOIN seq p
    ON p.o_custkey = s.o_custkey AND p.rn = s.rn - 1
  WHERE p.rn IS NULL OR s.o_orderdate > p.o_orderdate + INTERVAL 30 DAY
  UNION ALL
  -- extend each chain to the next order while the gap stays <= 30 days
  SELECT c.o_custkey, c.anchor_rn, n.rn, c.chain_start, n.o_orderdate,
         c.chain_len + CAST(1 AS BIGINT)
  FROM chain c JOIN seq n
    ON n.o_custkey = c.o_custkey AND n.rn = c.rn + 1
  WHERE n.o_orderdate <= c.cur_date + INTERVAL 30 DAY
)
SELECT o_custkey, CAST(chain_start AS DATE) AS chain_start,
       CAST(max(chain_len) AS BIGINT) AS chain_len,
       CAST(max(cur_date) AS DATE) AS chain_end
FROM chain
GROUP BY o_custkey, anchor_rn, chain_start
ORDER BY o_custkey, chain_start
"""


def q36(spark, sf):
    """WITH RECURSIVE: per-customer order *chains* (runs of consecutive
    orders each placed within 30 days of the previous), computed by
    fixpoint recursion — anchor rows seed each chain, the recursive member
    extends it one order per iteration until the gap rule fails.  The
    islands problem solved the way a graph engine would, exercising
    Spark 4's recursive-CTE support (SPARK-24497) end-to-end.

    Scale shape: each iteration is one equi-join of the frontier (rows
    added last round — the surviving chains only, a shrinking set) against
    the rn-indexed seq relation, partitioned by o_custkey; iteration count
    is the LONGEST chain (max 6 at sf0.1, data-bounded by the 30-day gap
    rule), not the row count.  The oracle runs the IDENTICAL SQL text in
    DuckDB — both engines speak standard WITH RECURSIVE.
    """
    # the engine's runaway-recursion valve defaults to 1M TOTAL rows
    # across iterations — an sf1 orders table legitimately produces more
    # (the chain relation is ~|orders| x avg chain length).  Scale the
    # valve with the input instead of disabling it: still finite, still
    # a backstop against a broken gap rule.
    #
    # The scale signal is the optimizer's sizeInBytes estimate (parquet
    # file bytes — pure driver-side metadata, no job), not a count():
    # the count was a FULL orders scan per execution just to size the
    # valve.  A compressed orders row is >20 bytes, so bytes ≥ rows*20 —
    # the same headroom the count-based form gave — while staying finite
    # and input-proportional.
    #
    # The override lives in a CLONED session (shared SparkContext,
    # isolated SQLConf): the DataFrame is lazy, so the valve must hold at
    # materialization time — a try/finally around sql() would restore it
    # before the recursion ever runs, and setting it on the shared
    # session would weaken the runaway backstop for every later
    # recursive query in the same process (the bench runs the whole
    # registry in one session).  The returned DataFrame pins its clone
    # alive; nothing else ever sees the raised limit.
    orders_bytes = int(
        t(spark, sf, "orders")
        ._jdf.queryExecution()
        .optimizedPlan()
        .stats()
        .sizeInBytes()
    )
    scoped = spark.newSession()
    scoped.conf.set(
        "spark.sql.cteRecursionRowLimit", str(max(1_000_000, orders_bytes))
    )
    t(scoped, sf, "orders").createOrReplaceTempView("q36_orders")
    return scoped.sql(_Q36_BODY.format(orders="q36_orders"))


def q37(spark, sf):
    """LATERAL correlated subquery with ORDER BY + LIMIT: each AUTOMOBILE
    customer's top-3 orders by price — the per-row top-k idiom SQL users
    reach for before learning window functions, here executed natively.

    Scale shape: Catalyst decorrelates the LATERAL into a
    WindowGroupLimit (partial top-k per input partition BEFORE the
    o_custkey exchange, so only <=3 rows per key per partition shuffle)
    + row_number filter + a BroadcastHashJoin against the filtered
    customer side — no per-row subquery execution anywhere.  Verified via
    .explain: the partial WindowGroupLimit bounds the shuffle at any
    corpus size.
    """
    t(spark, sf, "orders").createOrReplaceTempView("q37_orders")
    t(spark, sf, "customer").createOrReplaceTempView("q37_customer")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM q37_customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM q37_orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 3
        ) o
        WHERE c.c_mktsegment = 'AUTOMOBILE'
        ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey
        """
    )


def q38(spark, sf):
    """RANGE-frame sliding window: for every event, the count and value
    sum of the SAME user's events in the trailing hour — event-time
    sliding aggregates computed per row without self-join or explode
    (the load/velocity feature a fraud or rate-limit pipeline computes).

    Scale shape: ONE user_id exchange + one in-partition sort; the RANGE
    frame over unix-micros is a sliding two-pointer pass per partition
    (state = the frame contents, bounded by per-user events/hour), never
    a per-row rescan.  Both engines run the frame over the same BIGINT
    microsecond key, so boundary inclusion is bit-identical.
    """
    from pyspark.sql import Window

    e = t(spark, sf, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            us.alias("ts_us"),
            F.count(F.lit(1)).over(w).alias("n_hour"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .over(w)
            .alias("value_c_hour"),
        )
        .orderBy("event_id")
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q1": q1,
    "q2": q2,
    "q3": q3,
    "q4": q4,
    "q5": q5,
    "q6": q6,
    "q7": q7,
    "q8_intersect": q8_intersect,
    "q8_except": q8_except,
    "q9": q9,
    "q10": q10,
    "q11": q11,
    "q12": q12,
    "q13": q13,
    "q14": q14,
    "q15": q15,
    "q16": q16,
    "q17": q17,
    "q18": q18,
    "q19": q19,
    "q20": q20,
    "q21": q21,
    "q22": q22,
    "q23": q23,
    "q24": q24,
    "q25": q25,
    "q26": q26,
    "q27": q27,
    "q27_agg": q27_agg,
    "q28": q28,
    "q29": q29,
    "q30": q30,
    "q31": q31,
    "q32": q32,
    "q33": q33,
    "q34": q34,
    "q35": q35,
    "q36": q36,
    "q37": q37,
    "q38": q38,
    "fuzzy_match": fuzzy_match_q,
    "sketch_profile": sketch_profile,
    "sketch_exact": sketch_exact,
    "time_gapfill": time_gapfill_q,
    "ts_anomaly": ts_anomaly,
    "json_extract": json_extract,
    "attribution": attribution,
    "funnel_latency": funnel_latency,
}

ORACLE_SQL: dict[str, str] = {
    "q38": """
        SELECT event_id, user_id,
               epoch_us(ts) AS ts_us,
               CAST(count(*) OVER w AS BIGINT) AS n_hour,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w
                    AS BIGINT) AS value_c_hour
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        ORDER BY event_id
    """,
    # identical SQL text both engines — standard WITH RECURSIVE
    "q36": _Q36_BODY.format(orders="orders"),
    "q37": """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 3
        ) o
        WHERE c.c_mktsegment = 'AUTOMOBILE'
        ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey
    """,
    "q1": """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > 100 ORDER BY o_orderkey LIMIT 100
    """,
    "q2": """
        SELECT event_id, event_type FROM events
        WHERE event_type IN ('click','purchase') ORDER BY event_id
    """,
    "q3": """
        SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        WHERE l_orderkey <= 100 ORDER BY l_orderkey, l_linenumber
    """,
    "q4": """
        SELECT o.o_orderkey, c.c_name FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        ORDER BY o.o_orderkey LIMIT 1000
    """,
    "q5": """
        SELECT g.h FROM (SELECT generate_series AS h FROM generate_series(1,1000)) g
        ANTI JOIN (SELECT DISTINCT event_id FROM events WHERE event_id <= 1000) e
        ON g.h = e.event_id
        ORDER BY g.h
    """,
    "q6": """
        SELECT event_id, user_id FROM (
            SELECT event_id, user_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
            FROM events) WHERE rn = 1 ORDER BY user_id
    """,
    "q7": """
        SELECT event_id FROM events WHERE event_id < 100
        UNION ALL
        SELECT event_id FROM events WHERE event_id >= 100 AND event_id < 200
        ORDER BY event_id
    """,
    "q8_intersect": """
        SELECT user_id FROM events WHERE event_type='click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type='view'
        ORDER BY user_id
    """,
    "q8_except": """
        SELECT user_id FROM events WHERE event_type='click'
        EXCEPT
        SELECT user_id FROM events WHERE event_type='purchase'
        ORDER BY user_id
    """,
    "q9": """
        SELECT event_id, value FROM events
        ORDER BY value DESC, event_id LIMIT 50
    """,
    "q10": """
        SELECT event_id, value,
               ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS avg5
        FROM events ORDER BY event_id LIMIT 500
    """,
    "q11": """
        SELECT event_id FROM (
            SELECT event_id, event_type,
                   LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
            FROM events)
        WHERE prev IS DISTINCT FROM event_type ORDER BY event_id LIMIT 500
    """,
    "q12": """
        SELECT user_id, COUNT(*) AS n, ROUND(SUM(value), 6) AS total
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    "q13": """
        SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2 ORDER BY h, event_type
    """,
    "q14": """
        SELECT n_name, o_orderstatus, COUNT(*) AS n
        FROM orders o
        JOIN customer c ON o_custkey = c_custkey
        JOIN nation n ON c_nationkey = n_nationkey
        GROUP BY ROLLUP(n_name, o_orderstatus)
        ORDER BY n_name NULLS FIRST, o_orderstatus NULLS FIRST
    """,
    "q15": """
        SELECT event_id, sha256(CAST(event_id AS VARCHAR)) AS h
        FROM events WHERE event_id <= 100 ORDER BY event_id
    """,
    "q16": """
        SELECT event_id,
               substring(sha256(CAST(event_id AS VARCHAR)), 1, 4) AS splay,
               lpad(CAST(event_id AS VARCHAR), 10, '0') AS fname
        FROM events WHERE event_id <= 100 ORDER BY event_id
    """,
    "q17": """
        SELECT event_id,
               CASE WHEN event_type IS NULL THEN TRUE
                    WHEN event_type = 'click' THEN TRUE
                    ELSE FALSE END AS keep
        FROM events ORDER BY event_id LIMIT 500
    """,
    "q18": """
        SELECT o_orderkey FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05)
        ORDER BY o_orderkey LIMIT 500
    """,
    "q19": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 4) AS s_qty,
               ROUND(SUM(l_extendedprice), 4) AS s_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS s_disc,
               ROUND(AVG(l_quantity), 4) AS a_qty,
               COUNT(*) AS n
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q20": """
        SELECT COUNT(DISTINCT user_id) AS n_users FROM events
    """,
    "q21": """
        SELECT o_orderkey FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05)
        ORDER BY o_orderkey LIMIT 500
    """,
    # DuckDB dayofweek: Sunday=0 → +1 matches Spark's dayofweek (Sunday=1)
    "q22": """
        SELECT event_type, wd, COUNT(*) AS n, round(SUM(value), 4) AS total
        FROM (SELECT event_type, dayofweek(ts) + 1 AS wd, value FROM events)
        GROUP BY CUBE(event_type, wd)
        ORDER BY event_type NULLS FIRST, wd NULLS FIRST
    """,
    "q23": """
        SELECT event_id, user_id,
               ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS quartile,
               dense_rank() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rnk
        FROM events ORDER BY event_id LIMIT 500
    """,
    "q24": """
        SELECT user_id,
               COUNT(*) FILTER (event_type = 'click') AS n_click,
               COUNT(*) FILTER (event_type = 'view') AS n_view,
               COUNT(*) FILTER (event_type = 'purchase') AS n_purchase
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    # epoch_us == Spark unix_micros; CAST the window SUM to BIGINT because
    # DuckDB widens SUM(int) to HUGEINT while Spark stays at long.
    "q25": """
        WITH marked AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                             OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                                > 1800000000
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
            SELECT user_id, ts, value,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS session_seq
            FROM marked
        )
        SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
               COUNT(*) AS n_events,
               epoch_us(MIN(ts)) AS t_start_us,
               epoch_us(MAX(ts)) AS t_end_us,
               ROUND(SUM(value), 4) AS total_value
        FROM sess
        GROUP BY user_id, session_seq
        ORDER BY user_id, session_seq
    """,
    # DuckDB's native ASOF LEFT JOIN — an independent algorithm for the
    # same point-in-time semantics as the union+window Spark operator.
    "q26": """
        WITH l AS (SELECT * FROM events WHERE event_type = 'purchase'),
             r AS (SELECT * FROM events WHERE event_type = 'click')
        SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
               r.event_id AS match_id, epoch_us(r.ts) AS match_ts_us,
               r.value AS match_value
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ts >= r.ts
        ORDER BY l.event_id
    """,
    # DuckDB plans this raw inequality join through IEJoin — an independent
    # range-join algorithm vs the Spark operator's bin blocking.
    "q27": """
        WITH p AS (SELECT event_id AS p_id, epoch_us(ts) AS p_start,
                          epoch_us(ts) + 600000000 AS p_end
                   FROM events WHERE event_type = 'purchase'),
             e AS (SELECT event_id AS e_id, epoch_us(ts) AS e_start,
                          epoch_us(ts) + 120000000 AS e_end
                   FROM events WHERE event_type = 'error')
        SELECT p_id, e_id,
               LEAST(p_end, e_end) - GREATEST(p_start, e_start) AS overlap_us
        FROM p JOIN e ON p_start <= e_end AND e_start <= p_end
        ORDER BY p_id, e_id
    """,
    # aggregate witnessed form: result bounded at |purchases| rows at any
    # interval density (q27's pair form is the per-pair correctness
    # witness).  CASTs pin DuckDB's COUNT/SUM (BIGINT/HUGEINT) to the
    # Spark long.
    "q27_agg": """
        WITH p AS (SELECT event_id AS p_id, epoch_us(ts) AS p_start,
                          epoch_us(ts) + 600000000 AS p_end
                   FROM events WHERE event_type = 'purchase'),
             e AS (SELECT event_id AS e_id, epoch_us(ts) AS e_start,
                          epoch_us(ts) + 120000000 AS e_end
                   FROM events WHERE event_type = 'error')
        SELECT p_id,
               CAST(COUNT(*) AS BIGINT) AS n_overlaps,
               CAST(SUM(LEAST(p_end, e_end) - GREATEST(p_start, e_start))
                    AS BIGINT) AS overlap_us_total
        FROM p JOIN e ON p_start <= e_end AND e_start <= p_end
        GROUP BY p_id
        ORDER BY p_id
    """,
    "q28": """
        SELECT l_returnflag,
               ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
               ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
               ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
               COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "q29": """
        WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        s1 AS (SELECT user_id, min(us) AS t1 FROM e
               WHERE event_type = 'view' GROUP BY user_id),
        s2 AS (SELECT e.user_id, min(us) AS t2 FROM e JOIN s1 USING (user_id)
               WHERE event_type = 'click' AND us > t1 AND us <= t1 + 3600000000 GROUP BY e.user_id),
        s3 AS (SELECT e.user_id, min(us) AS t3 FROM e JOIN s2 USING (user_id)
               WHERE event_type = 'purchase' AND us > t2 AND us <= t2 + 3600000000 GROUP BY e.user_id),
        u AS (SELECT DISTINCT user_id FROM e)
        SELECT CASE WHEN t3 IS NOT NULL THEN 3
                    WHEN t2 IS NOT NULL THEN 2
                    WHEN t1 IS NOT NULL THEN 1
                    ELSE 0 END AS funnel_step,
               count(*) AS n_users
        FROM u LEFT JOIN s1 USING (user_id)
               LEFT JOIN s2 USING (user_id)
               LEFT JOIN s3 USING (user_id)
        GROUP BY funnel_step ORDER BY funnel_step
    """,
    "q30": """
        WITH f AS (SELECT user_id, min(ts) AS t0 FROM events GROUP BY user_id)
        SELECT CAST(date_trunc('week', t0) AS DATE) AS cohort_week,
               CAST(date_diff('day', date_trunc('week', t0),
                              date_trunc('week', ts)) / 7 AS INT) AS week_offset,
               count(DISTINCT e.user_id) AS n_users
        FROM events e JOIN f USING (user_id)
        GROUP BY cohort_week, week_offset
        ORDER BY cohort_week, week_offset
    """,
    "q31": """
        WITH v AS (
            SELECT user_id, event_id AS version_id, epoch_us(ts) AS v_from,
                   coalesce(lead(epoch_us(ts)) OVER
                              (PARTITION BY user_id
                               ORDER BY epoch_us(ts), event_id) - 1,
                            (SELECT max(epoch_us(ts)) FROM events)) AS v_to
            FROM events WHERE event_type = 'signup'),
        c AS (SELECT user_id, event_id AS click_id, epoch_us(ts) AS c_at
              FROM events WHERE event_type = 'click')
        SELECT click_id, c.user_id, version_id, c_at
        FROM c JOIN v ON c.user_id = v.user_id
                     AND c_at >= v_from AND c_at <= v_to
        ORDER BY click_id, version_id
    """,
    "q35": """
        -- DuckDB dayofweek is 0=Sunday; Spark's is 1=Sunday — align
        SELECT event_type, dayofweek(ts) + 1 AS dow,
               CAST(grouping(event_type) * 2 + grouping(dayofweek(ts) + 1) AS BIGINT) AS gid,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c
        FROM events
        GROUP BY GROUPING SETS ((event_type, dayofweek(ts) + 1), (event_type), ())
        ORDER BY gid, event_type, dow
    """,
    "q34": """
        SELECT CAST(ts AS DATE) AS day, event_type,
               CAST(count(*) AS BIGINT) AS n
        FROM events
        GROUP BY CAST(ts AS DATE), event_type
        ORDER BY day, event_type
    """,
    "q33": """
        SELECT CAST(ts AS DATE) AS day,
               CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_click,
               CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS n_error,
               CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchase,
               CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS n_signup,
               CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS n_view
        FROM events
        GROUP BY CAST(ts AS DATE)
        ORDER BY day
    """,
    "q32": """
        SELECT n_name,
               round(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
    # brute-force all-pairs levenshtein: an independent algorithm for the
    # same semantics — hash-match proves the PassJoin blocking complete
    "fuzzy_match": """
        WITH p AS (SELECT c_custkey, c_name FROM customer
                   WHERE c_custkey % 100 = 0)
        SELECT p.c_custkey AS probe_key, m.c_custkey AS match_key,
               levenshtein(p.c_name, m.c_name) AS dist
        FROM p JOIN customer m
          ON p.c_custkey <> m.c_custkey
         AND abs(len(p.c_name) - len(m.c_name)) <= 1
         AND levenshtein(p.c_name, m.c_name) <= 1
        ORDER BY probe_key, match_key
    """,
    # sketch_profile: rows-only by design — HLL++/GK sketch internals are
    # engine-specific; accuracy vs exact twins is pinned in pytest.  The
    # exact twins are hash-checked separately via sketch_exact below.
    # DuckDB quantile_cont == Spark percentile (exact interpolated median).
    "sketch_exact": """
        SELECT event_type,
               COUNT(DISTINCT user_id) AS n_users_exact,
               ROUND(quantile_cont(value, 0.5), 4) AS p50_exact,
               COUNT(*) AS n_rows
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "time_gapfill": TIME_GAPFILL_SQL,
    "ts_anomaly": TS_ANOMALY_SQL,
    "json_extract": JSON_EXTRACT_SQL,
    "funnel_latency": """
        WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        s1 AS (SELECT user_id, min(us) AS t1 FROM e
               WHERE event_type = 'view' GROUP BY user_id),
        s2 AS (SELECT e.user_id, min(us) AS t2, min(t1) AS t1b
               FROM e JOIN s1 USING (user_id)
               WHERE event_type = 'click' AND us > t1 AND us <= t1 + 3600000000
               GROUP BY e.user_id),
        s3 AS (SELECT e.user_id, min(us) AS t3, min(t2) AS t2b, min(t1b) AS t1c
               FROM e JOIN s2 USING (user_id)
               WHERE event_type = 'purchase' AND us > t2 AND us <= t2 + 3600000000
               GROUP BY e.user_id),
        lags AS (SELECT t2b - t1c AS view_to_click_us,
                        t3 - t2b AS click_to_purchase_us,
                        t3 - t1c AS view_to_purchase_us
                 FROM s3)
        SELECT count(*) AS n_converters,
               round(quantile_cont(view_to_click_us, 0.5), 4) AS p50_view_to_click_us,
               round(quantile_cont(view_to_click_us, 0.9), 4) AS p90_view_to_click_us,
               round(quantile_cont(click_to_purchase_us, 0.5), 4) AS p50_click_to_purchase_us,
               round(quantile_cont(click_to_purchase_us, 0.9), 4) AS p90_click_to_purchase_us,
               round(quantile_cont(view_to_purchase_us, 0.5), 4) AS p50_view_to_purchase_us,
               round(quantile_cont(view_to_purchase_us, 0.9), 4) AS p90_view_to_purchase_us
        FROM lags
    """,
    "attribution": f"""
        WITH l AS (SELECT * FROM events WHERE event_type = 'purchase'),
             r AS (SELECT user_id, ts, event_id,
                          CAST(json_extract_string(props, '$.k') AS INTEGER)
                              AS channel
                   FROM events WHERE event_type = 'click')
        SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
               CASE WHEN epoch_us(r.ts) >= epoch_us(l.ts) - {7 * 86400 * 1_000_000}
                    THEN r.event_id END AS click_id,
               CASE WHEN epoch_us(r.ts) >= epoch_us(l.ts) - {7 * 86400 * 1_000_000}
                    THEN r.channel END AS channel,
               CASE WHEN epoch_us(r.ts) >= epoch_us(l.ts) - {7 * 86400 * 1_000_000}
                    THEN epoch_us(l.ts) - epoch_us(r.ts) END AS lag_us
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ts >= r.ts
        ORDER BY l.event_id
    """,
}
