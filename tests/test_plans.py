"""Physical-plan quality gates — the 100 TB stance, asserted.

Each test pins a property of the executed plan that must survive scale-up:
filters and projections reach the parquet scan, small dimensions broadcast,
top-k never global-sorts, single-shuffle aggregations stay single-shuffle,
and JVM-only pipelines contain no Python evaluation nodes.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT


@pytest.fixture(autouse=True)
def _fresh_cache(spark):
    """Plan text must not depend on which OTHER tests ran first: operators
    ``.persist()`` shared relations and never unpersist (the bench's
    release step drops them; a pytest session doesn't), and CacheManager
    substitution re-prints a cached subplan under EVERY reference — a
    foreign leftover can double a gate's operator counts (observed: the
    OPH ``partial_min`` gate reading 64 under full-suite ordering vs 32
    isolated).  Every plan gate therefore starts from an empty cache;
    persists created by the operator under test itself are unaffected."""
    spark.catalog.clearCache()
    yield


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_pushed_to_scan(spark):
    """Q1 shape: predicate lands in PushedFilters; scan reads 2 columns."""
    from event_stream_spark.queries import QUERIES

    p = plan(QUERIES["q1"](spark, SF_CORRECT))
    scan = next(l for l in p.splitlines() if "FileScan parquet" in l)
    assert "PushedFilters: [" in scan and "o_totalprice" in scan.split("PushedFilters")[1]
    read = re.search(r"ReadSchema: struct<([^>]*)>", scan).group(1)
    assert sorted(f.split(":")[0] for f in read.split(",")) == [
        "o_orderkey",
        "o_totalprice",
    ]


def test_dimension_join_broadcasts(spark):
    """Q4: orders ⋈ customer — the dimension side broadcasts (no shuffle of
    the fact side on the join key)."""
    from event_stream_spark.queries import QUERIES

    p = plan(QUERIES["q4"](spark, SF_CORRECT))
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p


def test_topk_uses_take_ordered(spark):
    """Q9: ORDER BY … LIMIT k plans as TakeOrderedAndProject (per-partition
    top-k + driver merge), never a global sort."""
    from event_stream_spark.queries import QUERIES

    p = plan(QUERIES["q9"](spark, SF_CORRECT))
    assert "TakeOrderedAndProject" in p


def test_exact_dedup_single_shuffle(spark):
    """dedup_exact: one hash-partitioning exchange (partial agg map-side);
    the text column never moves — only doc_id and the 64-hex digest."""
    from event_stream_spark.datapipe.dedup import dedup_exact

    df = dedup_exact(spark, SF_CORRECT)
    p = plan(df)
    hash_exchanges = [
        l for l in p.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert len(hash_exchanges) == 1
    assert "partial_min" in p or "partial_count" in p  # map-side combine
    assert "text#" not in hash_exchanges[0]  # pruned before the shuffle


def test_simhash_stays_jvm_side(spark):
    """simhash pipeline contains no Python evaluation node — every op is
    JVM/codegen (ArrowEval/BatchEvalPython would mark a slow path)."""
    from event_stream_spark.datapipe.dedup import dedup_simhash

    p = plan(dedup_simhash(spark, SF_CORRECT))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_embedding_dedup_bucket_keyed(spark):
    """dedup_embedding candidates come from (band, bucket) grouping — the
    plan has NO join before the tile verify: no cartesian/nested-loop pair
    expansion (the old bi<=bj block self-join), just one hashpartitioning
    exchange on the bucket key feeding FlatMapGroupsInPandas."""
    from event_stream_spark.datapipe.dedup import dedup_embedding

    p = plan(dedup_embedding(spark, SF_CORRECT))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p
    assert "FlatMapGroupsInPandas" in p
    bucket_exchanges = [
        l
        for l in p.splitlines()
        if "Exchange hashpartitioning" in l and "band_id" in l and "cell_grp" in l
    ]
    assert len(bucket_exchanges) == 1


def test_lake_range_scan_prunes_buckets(spark, tmp_path):
    """Height-bucketed block lake: a [lo, hi] range scan keeps the bucket
    partition filter + height pushdown at the scan."""
    from event_stream_spark.sources.blocks import _range_scan, write_block_lake

    src = spark.range(1, 2001).selectExpr(
        "id AS height", "CAST(id AS STRING) AS payload"
    )
    lake = str(tmp_path / "lake")
    write_block_lake(src, src, lake, bucket_size=500)
    df = _range_scan(spark, lake, "blocks", 600, 900, 500)
    p = plan(df)
    scan = next(l for l in p.splitlines() if "FileScan parquet" in l)
    assert "PartitionFilters: [" in scan and "height_bucket" in scan
    assert [r["height"] for r in df.orderBy("height").limit(3).collect()] == [
        600,
        601,
        602,
    ]


def test_decontaminate_broadcasts_eval_side(spark):
    """Benchmark decontamination: the eval shingle set broadcasts — the
    training-side shingle relation is never shuffled on the shingle key."""
    from event_stream_spark.datapipe import decontaminate

    p = plan(decontaminate(spark, SF_CORRECT))
    assert "BroadcastHashJoin" in p
    # the only shingle-key exchange is the eval side's tiny distinct — the
    # training side must probe the broadcast, never hash-partition on s
    shingle_exchanges = [
        l
        for l in p.splitlines()
        if "Exchange hashpartitioning" in l and re.search(r"\bs#", l)
    ]
    assert len(shingle_exchanges) == 1
    assert "SortMergeJoin" not in p


def test_corpus_mix_is_shuffle_free(spark):
    """Stratified sampling is a narrow filter: no hash-partitioning exchange
    anywhere in the plan (the only exchange is the presentation sort)."""
    from event_stream_spark.datapipe import corpus_mix

    p = plan(corpus_mix(spark, SF_CORRECT))
    assert "Exchange hashpartitioning" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_vocab_topk_take_ordered(spark):
    """Vocabulary top-k: partial count map-side, TakeOrderedAndProject for
    the limit — never a global sort of the token histogram."""
    from event_stream_spark.datapipe import vocab_topk

    p = plan(vocab_topk(spark, SF_CORRECT))
    assert "TakeOrderedAndProject" in p
    assert "partial_count" in p


def test_seq_pack_window_partitioned(spark):
    """Sequence packing's cumulative-sum window is partitioned by
    (lang, shard) — never a single-partition global window."""
    from event_stream_spark.datapipe import seq_pack

    p = plan(seq_pack(spark, SF_CORRECT))
    win_exchanges = [
        l
        for l in p.splitlines()
        if "Exchange hashpartitioning" in l and "lang" in l and "shard" in l
    ]
    assert len(win_exchanges) == 1
    assert "Exchange SinglePartition" not in p


def test_dup_spans_linear_joins(spark):
    """Duplicated-span analysis never pairwise-expands documents: no
    cartesian / nested-loop joins, no Python evaluation nodes."""
    from event_stream_spark.datapipe import dup_spans

    p = plan(dup_spans(spark, SF_CORRECT))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_as_of_join_single_shuffle(spark):
    """q26 (as-of join): exactly one hash exchange on the join key — the
    union+window formulation never expands an inequality-join pair fan-out
    (no NestedLoop/Cartesian in the plan)."""
    from event_stream_spark.queries import q26

    p = plan(q26(spark, SF_CORRECT))
    hash_exchanges = [
        l for l in p.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert len(hash_exchanges) == 1
    assert "user_id" in hash_exchanges[0]
    assert "NestedLoop" not in p and "Cartesian" not in p


def test_chunk_docs_shuffle_free(spark):
    """chunk_docs: tokenize → explode starts → slice are all narrow — no
    hash exchange anywhere (the trailing ORDER BY is presentation-only)."""
    from event_stream_spark.datapipe.packing import chunk_docs

    p = plan(chunk_docs(spark, SF_CORRECT))
    assert "Exchange hashpartitioning" not in p
    assert "Generate explode" in p  # the chunk-start explode, in codegen


def test_events_ts_never_ntz(spark):
    """Naive parquet timestamps must load as TIMESTAMP (LTZ), never
    TIMESTAMP_NTZ, even when the session pins inferTimestampNTZ=true — the
    driver's session defaults differ from ours, and epoch helpers
    (unix_micros, q25/q26) reject NTZ outright.  Regression for the round-2
    correctness failure."""
    from event_stream_spark.queries import _TABLE_CACHE, t

    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        _TABLE_CACHE.clear()
        df = t(spark, SF_CORRECT, "events")
        assert dict(df.dtypes)["ts"] == "timestamp"
        # and the epoch expression that killed q25 must analyze cleanly
        from pyspark.sql import functions as F

        df.select(F.unix_micros("ts")).limit(1).collect()
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        _TABLE_CACHE.clear()


def test_range_join_is_bin_blocked(spark):
    """q27's interval-overlap join must plan as an equi-join on the bin key
    (hash exchange + residual filter), never BroadcastNestedLoopJoin or
    CartesianProduct — the raw inequality-join plan that is O(n*m) at any
    scale."""
    from event_stream_spark.queries import q27

    p = plan(q27(spark, SF_CORRECT))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p and "NestedLoop" not in p


def test_url_dedup_broadcasts_blocklist(spark):
    """url_dedup: the blocklist anti-join must broadcast (blocklists are KBs
    at any corpus scale) — never a shuffled anti-join of the corpus."""
    from event_stream_spark.datapipe.webops import url_dedup

    p = plan(url_dedup(spark, SF_CORRECT))
    assert "BroadcastHashJoin" in p and "LeftAnti" in p


def test_dedup_paragraph_shuffles_hash_not_text(spark):
    """dedup_paragraph: the first-occurrence window shuffles only
    (xxhash64, doc_id, para_idx) — the paragraph string is projected away
    before every exchange."""
    from event_stream_spark.datapipe.webops import dedup_paragraph

    p = plan(dedup_paragraph(spark, SF_CORRECT))
    for line in p.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "para#" not in line and "text#" not in line


def test_funnel_all_joins_keyed(spark):
    """q29: every join in the funnel is an equi-join on user_id — no
    nested-loop fan-out anywhere in the chained step aggregations."""
    from event_stream_spark.queries import q29

    p = plan(q29(spark, SF_CORRECT))
    assert "NestedLoop" not in p and "Cartesian" not in p


def test_scd2_join_keyed_no_nested_loop(spark):
    """q31: the keyed interval join must stay an equi-join on
    (bin, user_id) — no nested-loop or per-user cross product."""
    from event_stream_spark.queries import q31

    p = plan(q31(spark, SF_CORRECT))
    assert "NestedLoop" not in p and "Cartesian" not in p


def test_q31_plan_build_runs_no_job(spark):
    """Building q31's plan must not launch a Spark job: the r3 version ran
    an eager corpus-wide .head() scan to resolve the horizon at plan time
    (VERDICT r3 nit 2); the horizon is now a window max inside the plan."""
    from event_stream_spark.queries import q31, t

    t(spark, SF_CORRECT, "events")  # warm the table cache (footer probe)
    sc = spark.sparkContext
    before = sc._jsc.sc().dagScheduler().numTotalJobs()
    q31(spark, SF_CORRECT)
    assert sc._jsc.sc().dagScheduler().numTotalJobs() == before


def test_event_lake_prunes_date_partitions(spark, tmp_path):
    """A date-ranged scan over the daily-partitioned event lake must prune
    at PLAN time: PartitionFilters carries the event_date bounds and the
    scan's selected partitions shrink to the requested span."""
    from event_stream_spark.queries import t
    from event_stream_spark.sources.eventlake import read_event_lake, write_event_lake

    lake = str(tmp_path / "eventlake")
    write_event_lake(t(spark, SF_CORRECT, "events"), lake)

    df = read_event_lake(spark, lake, "2024-01-10", "2024-01-12")
    p = plan(df)
    assert "PartitionFilters" in p and "event_date" in p
    # 3 requested days out of 30 in the corpus
    n_days = df.select("event_date").distinct().count()
    assert n_days == 3
    # row-level ts pushdown still reaches the reader within touched days
    p2 = plan(df.filter(F.col("user_id") == 7).select("event_id"))
    assert "PushedFilters" in p2 and "user_id" in p2.split("PushedFilters", 1)[1][:200]


def test_event_lake_compaction(spark, tmp_path):
    """compact_event_lake: a fragmented lake (16 files/day from parallel
    microbatch writers) compacts to 1 file/day with identical content, the
    (user_id, ts) within-file sort restored, and partition pruning
    untouched."""
    import glob as _glob

    from event_stream_spark.queries import t
    from event_stream_spark.sources.eventlake import (
        compact_event_lake,
        read_event_lake,
    )

    lake = str(tmp_path / "fraglake")
    ev = t(spark, SF_CORRECT, "events")
    # fragment: random 16-way split per day (the streaming-append shape)
    (
        ev.withColumn("event_date", F.to_date("ts"))
        .repartition(16)
        .write.partitionBy("event_date")
        .parquet(lake)
    )
    days = _glob.glob(f"{lake}/event_date=*")
    assert max(len(_glob.glob(d + "/*.parquet")) for d in days) > 4

    before = sorted(
        tuple(r) for r in read_event_lake(spark, lake).drop("event_date").collect()
    )
    compact_event_lake(spark, lake)

    days = _glob.glob(f"{lake}/event_date=*")
    assert days and all(len(_glob.glob(d + "/*.parquet")) == 1 for d in days)
    after_df = read_event_lake(spark, lake)
    after = sorted(tuple(r) for r in after_df.drop("event_date").collect())
    assert after == before  # row-for-row content equality
    # within-file (user_id, ts) sort restored: each file is monotone
    import pyarrow.parquet as pq

    f = _glob.glob(days[0] + "/*.parquet")[0]
    tbl = pq.read_table(f, columns=["user_id", "ts"]).to_pandas()
    key = list(zip(tbl["user_id"], tbl["ts"]))
    assert key == sorted(key)
    # partition pruning still works on the compacted layout
    one_day = str(after_df.select(F.min("event_date")).head()[0])
    p = plan(read_event_lake(spark, lake, one_day, one_day))
    assert "PartitionFilters" in p and "event_date" in p


def test_event_lake_rewrite_is_idempotent(spark, tmp_path):
    """Dynamic partition overwrite: re-writing the same data replaces
    partitions in place — same count, no duplicates."""
    from event_stream_spark.queries import t
    from event_stream_spark.sources.eventlake import read_event_lake, write_event_lake

    lake = str(tmp_path / "eventlake2")
    ev = t(spark, SF_CORRECT, "events")
    write_event_lake(ev, lake)
    n1 = read_event_lake(spark, lake).count()
    write_event_lake(ev, lake)
    n2 = read_event_lake(spark, lake).count()
    assert n1 == n2 == ev.count()


def test_bucketed_warehouse_join_is_shuffle_free(spark, tmp_path):
    """write_block_warehouse: the J1 blocks ⋈ block_results equi-join over
    hash-bucketed tables plans with NO exchange on either side — the
    zero-shuffle co-located join SCALE.md promises."""
    from event_stream_spark.sources import blockstream
    from event_stream_spark.sources.blocks import (
        read_block_warehouse,
        write_block_warehouse,
    )

    blockstream.register(spark)
    src = (
        spark.read.format("blockstream")
        .option("backend", "synthetic")
        .option("from_height", "1")
        .option("to_height", "400")
        .load()
    )
    blocks = src.select("height", "block_json")
    results = src.select("height", "block_results_json")
    write_block_warehouse(
        blocks, results, str(tmp_path / "wh"), table_prefix="t_bwh", buckets=8
    )
    b, r = read_block_warehouse(spark, "t_bwh")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        p = plan(b.join(r, "height"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        for t_ in ("t_bwh_blocks", "t_bwh_block_results"):
            spark.sql(f"DROP TABLE IF EXISTS {t_}")
    assert "SortMergeJoin" in p
    assert "Exchange" not in p  # co-bucketed: no shuffle on either side
    assert "Bucketed: true" in p  # and genuinely via the bucketed scan
    # (a per-task local Sort remains: Spark never consumes sortBy metadata
    # for sort elimination — SPARK-19256; the win asserted here is the
    # zero-NETWORK join)


def test_corpus_split_shuffle_free(spark):
    """corpus_split: the hash assignment is a narrow projection — no hash
    exchange anywhere (the trailing ORDER BY is presentation-only)."""
    from event_stream_spark.datapipe.splits import corpus_split

    p = plan(corpus_split(spark, SF_CORRECT))
    assert "Exchange hashpartitioning" not in p


def test_heavy_hitters_never_shuffles_full_key_set(spark):
    """heavy_hitters: candidates broadcast into the verify join (the token
    stream is never hash-exchanged on the raw word key before the candidate
    filter), and the exact count aggregates candidate occurrences only."""
    from event_stream_spark.datapipe.splits import heavy_hitters

    df = heavy_hitters(spark, SF_CORRECT)
    p = plan(df)
    assert "BroadcastHashJoin" in p  # candidate semi-filter
    # the only hash exchange keys on the post-filter word column, i.e. the
    # aggregation of candidate occurrences — count them to catch a future
    # formulation that adds a full-vocabulary exchange
    assert p.count("Exchange hashpartitioning") <= 2  # partial/final agg split
    assert df.count() > 0  # the corpus genuinely has hitters at K=200


def test_ivf_lake_prunes_list_partitions(spark, tmp_path):
    """The written IVF layout (partitionBy(list_id)) must prune probes at
    PLAN time: the IN-list lands in PartitionFilters and only the probed
    list directories are scanned — SCALE.md's IVF claim, gated (VERDICT r3
    item 4)."""
    from event_stream_spark.datapipe.similarity import (
        ivf_assignments,
        read_ivf_lake,
        write_ivf_lake,
    )

    assigned, _ = ivf_assignments(spark, SF_CORRECT)
    lake = str(tmp_path / "ivf_lake")
    write_ivf_lake(assigned, lake)

    df = read_ivf_lake(spark, lake, [0, 3, 7, 9])
    p = plan(df)
    assert "PartitionFilters" in p and "list_id" in p.split("PartitionFilters", 1)[1][:200]
    assert df.select("list_id").distinct().count() == 4
    # full-lake row parity: the layout loses nothing
    assert read_ivf_lake(spark, lake).count() == assigned.count()


def test_ivf_seed_build_is_cached(spark):
    """Repeated ann_ivf_topk plan builds must not re-run the seed jobs
    (count + nlist-row collect) — the r3 bench regression (VERDICT r3
    nit 3)."""
    from event_stream_spark.datapipe.similarity import ann_ivf_topk

    ann_ivf_topk(spark, SF_CORRECT)  # warm seed + table caches
    sc = spark.sparkContext
    before = sc._jsc.sc().dagScheduler().numTotalJobs()
    ann_ivf_topk(spark, SF_CORRECT)
    assert sc._jsc.sc().dagScheduler().numTotalJobs() == before


def test_q32_star_schema_broadcasts_dims(spark):
    """q32 (TPC-H Q5 shape): region/nation/customer/supplier broadcast; the
    o_orderdate window is pushed to the orders scan."""
    from event_stream_spark.queries import q32

    p = plan(q32(spark, SF_CORRECT))
    assert p.count("BroadcastHashJoin") >= 3
    assert "NestedLoop" not in p and "Cartesian" not in p
    scan = [l for l in p.splitlines() if "PushedFilters" in l and "o_orderdate" in l]
    assert scan, "date filter must reach the orders parquet scan"


def test_fuzzy_match_broadcasts_probe_keys(spark):
    """fuzzy_match with broadcast_probes=True: the probe key set broadcasts —
    the master is never shuffled for candidate generation, and no
    nested-loop join appears."""
    from event_stream_spark.queries import fuzzy_match_q

    p = plan(fuzzy_match_q(spark, SF_CORRECT))
    assert "BroadcastHashJoin" in p
    assert "NestedLoop" not in p and "Cartesian" not in p


def test_fuzzy_match_big_probe_has_no_forced_broadcast(spark):
    """Default broadcast_probes=None must not force the probe-key broadcast
    (hint hygiene, VERDICT r3 item 2): deletion blocking carries no hints
    at all by default; PassJoin blocking's only hint is the
    provably-bounded short-text relation.  Either way a huge probe batch
    can degrade to sort-merge instead of OOMing the driver."""
    from event_stream_spark.operators.fuzzy import fuzzy_match
    from event_stream_spark.queries import t

    c = t(spark, SF_CORRECT, "customer").select("c_custkey", "c_name")

    def hints(df):
        return df._jdf.queryExecution().analyzed().toString().count("ResolvedHint")

    free = fuzzy_match(c, c, text="c_name", key="c_custkey", k=1)
    forced = fuzzy_match(
        c, c, text="c_name", key="c_custkey", k=1, broadcast_probes=True
    )
    assert hints(free) == 0  # deletion blocking: no hint unless asserted
    assert hints(forced) == 1  # the explicit probe-neighborhood broadcast
    assert "Cartesian" not in plan(free) and "NestedLoop" not in plan(free)
    free_pj = fuzzy_match(
        c, c, text="c_name", key="c_custkey", k=1, blocking="passjoin"
    )
    forced_pj = fuzzy_match(
        c, c, text="c_name", key="c_custkey", k=1,
        broadcast_probes=True, blocking="passjoin",
    )
    assert hints(free_pj) == 1  # short-master bounded-domain broadcast only
    assert hints(forced_pj) == 2  # + the explicit probe-key broadcast
    assert "Cartesian" not in plan(free_pj) and "NestedLoop" not in plan(free_pj)


def test_fuzzy_match_deletion_blocking_is_hash_join_on_delstr(spark):
    """The deletion-neighborhood path: candidates come from ONE equi-join
    on the neighborhood string (codegen transform/explode, no UDF, no
    nested loop), so a corpus of serial-number-shaped keys cannot create
    a constant-segment mega-bucket — the failure that made PassJoin
    quadratic on TPC-H names at sf1 (15+ min → ~10 s)."""
    from event_stream_spark.operators.fuzzy import fuzzy_match
    from event_stream_spark.queries import t

    c = t(spark, SF_CORRECT, "customer").select("c_custkey", "c_name")
    p = plan(
        fuzzy_match(
            c, c.limit(50), text="c_name", key="c_custkey",
            k=1, broadcast_probes=True,
        )
    )
    assert "BroadcastHashJoin" in p
    assert "delstr" in p
    assert "NestedLoop" not in p and "Cartesian" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_corpus_shuffle_rank_is_bucket_partitioned(spark):
    """corpus_shuffle: the corpus-sized row_number window is hash-partitioned
    on the bucket key — the only SinglePartition exchange in the plan feeds
    the 256-group offsets window, never corpus-sized data — and the offsets
    relation broadcasts into the rank side."""
    from event_stream_spark.datapipe.shuffleops import corpus_shuffle

    p = plan(corpus_shuffle(spark, SF_CORRECT))
    rank_window = next(
        l for l in p.splitlines() if "row_number()" in l and "Window" in l
    )
    assert "[bucket#" in rank_window  # partition spec present, not global
    assert p.count("Exchange SinglePartition") == 1
    assert p.index("Exchange SinglePartition") > p.index("BroadcastExchange")
    assert "hashpartitioning(bucket#" in p


def test_corpus_sample_uses_take_ordered(spark):
    """corpus_sample: exact-k hash sample compiles to TakeOrderedAndProject
    (per-partition heaps + driver merge) — no global sort, no shuffle."""
    from event_stream_spark.datapipe.shuffleops import corpus_sample

    p = plan(corpus_sample(spark, SF_CORRECT))
    assert "TakeOrderedAndProject" in p
    assert "Exchange" not in p


def test_time_gapfill_single_window_exchange(spark):
    """time_gapfill: the two window passes (ASC running LOCF, DESC running
    next-observation) share ONE hashpartitioning(user_id) exchange — the
    second pass re-sorts within partitions, never re-shuffles — and both
    use RUNNING frames only (no quadratic UnboundedFollowing frame); the
    grid is synthesised executor-side (Generate explode(sequence(...)))."""
    from event_stream_spark.queries import QUERIES

    p = plan(QUERIES["time_gapfill"](spark, SF_CORRECT))
    assert p.count("+- Window ") == 2
    first_w = p.index("+- Window ")
    second_w = p.index("+- Window ", first_w + 1)
    assert "Exchange" not in p[first_w:second_w]  # shared key exchange
    assert "unboundedfollowing" not in p.lower()
    assert "Generate explode(sequence(" in p
    assert "SinglePartition" not in p
    assert "NestedLoop" not in p and "Cartesian" not in p


def test_ts_anomaly_single_exchange_bounded_frame(spark):
    """ts_anomaly: all three baseline aggregates (count/avg/stddev) share
    one Window behind one hashpartitioning(user_id) exchange; the frame is
    bounded ROWS (constant state per key, no unbounded accumulation) and
    the user slice is pushed to the parquet scan."""
    from event_stream_spark.queries import QUERIES

    p = plan(QUERIES["ts_anomaly"](spark, SF_CORRECT))
    assert p.count("+- Window ") == 1
    assert p.count("Exchange hashpartitioning") == 1
    assert "unboundedpreceding" not in p.lower()
    assert "unboundedfollowing" not in p.lower()
    scan = next(l for l in p.splitlines() if "FileScan parquet" in l)
    assert "user_id" in scan.split("PushedFilters")[1]


def test_zorder_lake_narrows_all_dimensions(spark, tmp_path):
    """Z-order layout: after clustering events on (user_id, ts), the mean
    per-file footer-stat span of BOTH dimensions is a small fraction of the
    domain — so min/max pruning works for predicates on either column.  A
    ts-sorted baseline proves the contrast: its ts spans are tiny but every
    file covers (almost) the full user_id domain."""
    from event_stream_spark.queries import t
    from event_stream_spark.sources.zorder import (
        file_span_fractions,
        write_zorder_lake,
    )

    e = t(spark, SF_CORRECT, "events").select("event_id", "user_id", "ts", "value")
    zpath = str(tmp_path / "zlake")
    write_zorder_lake(e, zpath, ["user_id", "ts"], num_files=16)
    zspan = file_span_fractions(zpath, ["user_id", "ts"])
    assert zspan["user_id"] < 0.5 and zspan["ts"] < 0.5, zspan

    bpath = str(tmp_path / "ts_sorted")
    e.repartitionByRange(16, "ts").sortWithinPartitions("ts").write.parquet(bpath)
    bspan = file_span_fractions(bpath, ["user_id", "ts"])
    assert bspan["user_id"] > 0.9  # single-key layout can't serve user probes
    assert zspan["user_id"] < bspan["user_id"] / 2

    # layout change is content-neutral: same rows, filters agree
    back = spark.read.parquet(zpath)
    assert back.count() == e.count()
    probe = lambda df: sorted(
        r.event_id for r in df.filter("user_id = 7").collect()
    )
    assert probe(back) == probe(e)


def test_zorder_key_stays_jvm_side(spark):
    """The Morton key (quantile fold + bit interleave) is pure codegen —
    no Python evaluation nodes in a plan that computes it."""
    from event_stream_spark.queries import t
    from event_stream_spark.sources.zorder import zorder_col

    e = t(spark, SF_CORRECT, "events")
    df = e.select(zorder_col(e, ["user_id", "ts"], bits_per_dim=4).alias("z"))
    p = plan(df)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_json_extract_stays_jvm_side(spark):
    """json_extract: fixed-schema from_json is JVM codegen — no Python
    evaluation nodes — and the aggregate partial-combines map-side behind
    a single key exchange."""
    from event_stream_spark.queries import QUERIES

    p = plan(QUERIES["json_extract"](spark, SF_CORRECT))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "partial_count" in p or "partial_avg" in p
    assert p.count("Exchange hashpartitioning") == 1


def test_embed_project_arrow_kernel_no_hash_exchange(spark):
    """embed_project: one Arrow-batched projection over a pruned scan
    (vec_id + embedding only), zero hash exchanges — runs at scan speed;
    the only exchange is the range partition for the oracle's total order."""
    from event_stream_spark.datapipe import DATAPIPE_QUERIES

    p = plan(DATAPIPE_QUERIES["embed_project"](spark, SF_CORRECT))
    assert "ArrowEvalPython" in p
    assert "Exchange hashpartitioning" not in p
    scan = next(l for l in p.splitlines() if "FileScan parquet" in l)
    read = re.search(r"ReadSchema: struct<([^>]*)>", scan).group(1)
    assert sorted(f.split(":")[0] for f in read.split(",")) == [
        "embedding",
        "vec_id",
    ]


def test_dedup_cluster_best_joins_narrow_quality(spark):
    """dedup_cluster_best: the documents scan feeding the quality join
    reads only (doc_id, text) — no full-width corpus columns ride the
    shuffle — and no nested-loop/cartesian join appears anywhere."""
    from event_stream_spark.datapipe import DATAPIPE_QUERIES

    p = plan(DATAPIPE_QUERIES["dedup_cluster_best"](spark, SF_CORRECT))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    for line in p.splitlines():
        if "FileScan parquet" in line and "documents" in line:
            read = re.search(r"ReadSchema: struct<([^>]*)>", line).group(1)
            cols = sorted(f.split(":")[0] for f in read.split(","))
            assert cols == ["doc_id", "text"], cols


def test_ann_join_candidates_are_band_equi_join(spark):
    """ann_join (batched multi-query ANN): candidate pairs come from an
    equi-join on the (band, sig) LSH key — never a query×corpus Cartesian or
    nested-loop expansion — and the embeddings never ride the candidate
    exchange (the pair relation shuffles only (band, sig, id) longs)."""
    from event_stream_spark.datapipe.similarity import ann_join

    p = plan(ann_join(spark, SF_CORRECT))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    # the candidate join keys on the banded signature
    assert "band" in p and "sig" in p
    # candidate-generation exchanges carry no embedding column
    for line in p.splitlines():
        if "Exchange hashpartitioning" in line and (
            "band" in line and "sig" in line
        ):
            assert "embedding" not in line and "qv" not in line and "cv" not in line


def test_bpe_pairs_topk_and_jvm_only(spark):
    """bpe_pairs: top-k merge candidates go through TakeOrderedAndProject
    (never a global Sort), both aggregations carry map-side partial
    aggregation, and the whole pipeline is JVM codegen (no Python nodes)."""
    from event_stream_spark.datapipe.bpe import bpe_pairs

    p = plan(bpe_pairs(spark, SF_CORRECT))
    assert "TakeOrderedAndProject" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "partial_count" in p or "partial" in p.lower()


def test_bloom_prune_is_codegen_with_candidate_only_join(spark):
    """bloom_prune: the bitmap probe is a literal-array codegen filter (no
    Python nodes, no extra shuffle of the fact side for the prune), and the
    exact-verify join exists only on the candidate branch."""
    from event_stream_spark.datapipe.bloom import bloom_prune

    p = plan(bloom_prune(spark, SF_CORRECT))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    # the prune is expressed with element_at against the literal bitmap
    assert "element_at" in p


def test_quality_classify_is_codegen_single_feature_shuffle(spark):
    """quality_classify: model inference is pure codegen (no Python nodes);
    the only corpus-scale exchange is the per-doc feature aggregation."""
    from event_stream_spark.datapipe.classify import quality_classify

    p = plan(quality_classify(spark, SF_CORRECT))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_corpus_temp_mix_broadcasts_factor_table(spark):
    """corpus_temp_mix: the per-language factor relation broadcasts back to
    the corpus (the big side never shuffles on lang), copy expansion is
    codegen explode — no Python nodes, no corpus-keyed exchange."""
    from event_stream_spark.datapipe.shuffleops import corpus_temp_mix

    p = plan(corpus_temp_mix(spark, SF_CORRECT))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "BroadcastHashJoin" in p
    # no corpus-sized exchange keyed on lang (only the tiny counts agg is)
    corpus_lang_exchanges = [
        l
        for l in p.splitlines()
        if "Exchange hashpartitioning(lang" in l and "doc_id" in l
    ]
    assert corpus_lang_exchanges == []


def test_bpe_tokenize_is_joinless_codegen(spark):
    """bpe_tokenize: applying learned merges is a literal replace chain —
    no joins at all (the merge table travels as literals), no Python nodes;
    the per-doc aggregation is the only exchange."""
    from event_stream_spark.datapipe.bpe import bpe_tokenize

    p = plan(bpe_tokenize(spark, SF_CORRECT))
    assert "Join" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    exchanges = [l for l in p.splitlines() if "Exchange" in l]
    assert len(exchanges) <= 2  # doc_id agg (+ presentation sort)


def test_corpus_lake_scan_prunes_lang_and_split(spark, tmp_path):
    """(lang, split)-partitioned corpus lake: a train/'de' read prunes at
    PLAN time — both predicates land in PartitionFilters, and the scan's
    data columns exclude the partition columns (they come from the paths)."""
    from event_stream_spark.datapipe.splits import (
        read_corpus_lake,
        write_corpus_lake,
    )

    write_corpus_lake(spark, SF_CORRECT, str(tmp_path))
    df = read_corpus_lake(spark, str(tmp_path), lang="de", split="train")
    p = plan(df)
    scan = next(l for l in p.splitlines() if "FileScan parquet" in l)
    pf = scan.split("PartitionFilters", 1)[1][:300]
    assert "lang" in pf and "split" in pf
    # correctness of the pruned read vs an unpartitioned filter
    expect = (
        spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
        .filter("lang = 'de'")
        .count()
    )
    got_all_splits = sum(
        read_corpus_lake(spark, str(tmp_path), lang="de", split=s).count()
        for s in ("train", "val", "test")
    )
    assert got_all_splits == expect and df.count() > 0


def test_bm25_broadcasts_query_side(spark):
    """bm25: the corpus-sized posting list never shuffles on the term key —
    the literal query batch and the df relation broadcast into it; per-query
    top-k needs no global sort."""
    from event_stream_spark.datapipe.retrieval import bm25_topk

    p = plan(bm25_topk(spark, SF_CORRECT))
    # qterms + df enter via broadcast; postings (the big side) are never the
    # build side of anything and never sort-merge
    assert p.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    # the corpus is tokenized once: scoring reads the materialized posting
    # list (parquet), so no second documents scan feeds the score join
    assert p.count("Scan parquet") >= 2  # documents (stats) + posting matview


def test_pagerank_iterations_stay_narrow(spark):
    """graph_pagerank: the iteration loop exchanges only (src/dst, long)
    rows — the documents relation (text#) never appears in any exchange,
    and there is no cartesian pair expansion."""
    from event_stream_spark.datapipe.graph import graph_pagerank

    p = plan(graph_pagerank(spark, SF_CORRECT))
    assert "CartesianProduct" not in p
    for l in p.splitlines():
        if "Exchange" in l:
            assert "text#" not in l


def test_pagerank_no_degree_sized_array(spark):
    """Skew gate (VERDICT r4 ask #5): the per-node contribution fold is a
    plain integer SUM with constant state per group — no collect_list /
    ObjectHashAggregate materializing a degree-sized array for a dense hub.
    Proved two ways: the plan contains no object aggregate, and a 10^5-edge
    star graph executes with the hub's rank exact."""
    from pyspark.sql import functions as F

    from event_stream_spark.datapipe.graph import pagerank_iterations

    hub_deg = 100_000
    spokes = spark.range(1, hub_deg + 1).select(
        F.lit(0).cast("long").alias("a"), F.col("id").alias("b")
    )
    edges = spokes.union(
        spokes.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).select(F.col("a").alias("src"), F.col("b").alias("dst"))

    pr, deg = pagerank_iterations(edges, iters=2)
    p = plan(pr)
    assert "collect_list" not in p and "ObjectHashAggregate" not in p, (
        "degree-sized array state in the production aggregation"
    )
    rows = {r.doc_id: r.pr for r in pr.collect()}
    assert len(rows) == hub_deg + 1
    # exact fixed-point reference for a star: hub absorbs all spoke mass
    FP = 10**12
    n = hub_deg + 1
    hub, spoke = FP // n, FP // n
    for _ in range(2):
        acc_hub = hub_deg * (spoke // 1)  # each spoke deg=1
        acc_spoke = hub // hub_deg
        hub = (3 * FP) // (20 * n) + (17 * acc_hub) // 20
        spoke = (3 * FP) // (20 * n) + (17 * acc_spoke) // 20
    assert rows[0] == ((hub + 500_000) // 1_000_000) / 1e6
    assert rows[1] == ((spoke + 500_000) // 1_000_000) / 1e6


def test_dup_spans_clean_stays_linear(spark):
    """dup_spans_clean: no pairwise doc×doc expansion, and document text
    never rides an exchange (all shuffles move narrow word/span rows)."""
    from event_stream_spark.datapipe import dup_spans_clean

    p = plan(dup_spans_clean(spark, SF_CORRECT))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    for l in p.splitlines():
        if "Exchange" in l:
            assert "text#" not in l


def test_dsir_weights_model_is_constant_size(spark):
    """dsir_weights: the corpus never shuffles on anything wider than the
    (doc_id, bucket) rows; the model relation joins back as a BROADCAST
    hash join (never a sort-merge shuffling the corpus on the bucket key),
    and the only nested-loop is the 1-row totals cross (the lm_score /
    pagerank scalar-broadcast shape)."""
    from event_stream_spark.datapipe import dsir_weights

    p = plan(dsir_weights(spark, SF_CORRECT))
    assert "CartesianProduct" not in p
    # scoring join-back: bucket-keyed BroadcastHashJoin, corpus side probes
    assert any(
        "BroadcastHashJoin" in l and re.search(r"\[b#\d+L\]", l)
        for l in p.splitlines()
    )
    for l in p.splitlines():
        if "Exchange" in l:
            assert "text#" not in l
        if "BroadcastNestedLoopJoin" in l:
            assert "Cross" in l  # only the 1-row totals broadcast


def test_char_dup_spans_hashes_not_text(spark):
    """char_dup_spans: gram anchors shuffle as md5 HASHES — the raw text /
    substrings never ride an exchange; no doc×doc expansion."""
    from event_stream_spark.datapipe import char_dup_spans

    p = plan(char_dup_spans(spark, SF_CORRECT))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    for l in p.splitlines():
        if "Exchange" in l:
            assert "text#" not in l


def test_pq_probe_is_lut_scan_topk(spark):
    """ann_pq_topk probe plan: after the (cached) codebook training and
    the one-time encode materialization, the probe is a pure JVM scan of
    the M int-code columns → literal-LUT element_at sum → TakeOrdered.
    No join, no exchange, and ZERO Python stages — the encode kernel runs
    once at index build, never per probe (the LSH/IVF probe stance)."""
    from event_stream_spark.datapipe.similarity import ann_pq_topk

    p = plan(ann_pq_topk(spark, SF_CORRECT))
    assert "TakeOrdered" in p
    for bad in ("Join", "Cartesian", "Exchange hashpartitioning",
                "ArrowEvalPython", "BatchEvalPython"):
        assert bad not in p, bad


def test_pq_codebook_build_is_cached(spark):
    """Repeated ann_pq_topk plan builds must not re-run the training jobs
    (count + seed collect + Lloyd-round aggregate) — same contract as the
    IVF seed cache."""
    from event_stream_spark.datapipe.similarity import ann_pq_topk

    ann_pq_topk(spark, SF_CORRECT)  # warm codebook + table caches
    sc = spark.sparkContext
    before = sc._jsc.sc().dagScheduler().numTotalJobs()
    ann_pq_topk(spark, SF_CORRECT)
    assert sc._jsc.sc().dagScheduler().numTotalJobs() == before


def test_lcs_pairs_is_equi_join_plus_islands(spark):
    """lcs_pairs stays relational: the gram-match relation is an equi-join
    on the 60-bit gram key (never a nested-loop/cartesian pairing), the
    island computation is one (a, b, diag) window, and no Python stage
    appears anywhere — the whole operator is JVM codegen."""
    from event_stream_spark.datapipe.corpusops import lcs_pairs

    p = plan(lcs_pairs(spark, SF_CORRECT))
    for bad in ("CartesianProduct", "BroadcastNestedLoop", "EvalPython"):
        assert bad not in p, bad
    assert "Window" in p


def test_ivfpq_probe_is_list_filtered_case_lut_scan(spark):
    """ann_ivfpq_topk probe: scan of the materialized (vec_id, list_id,
    codes) relation → list_id IN-filter → CASE-dispatched literal-LUT sum
    → TakeOrdered.  Zero Python stages, zero joins, zero exchanges — the
    IVFADC probe is pure pruned-scan codegen."""
    from event_stream_spark.datapipe.similarity import ann_ivfpq_topk

    p = plan(ann_ivfpq_topk(spark, SF_CORRECT))
    assert "TakeOrdered" in p
    for bad in ("Join", "Cartesian", "Exchange hashpartitioning",
                "ArrowEvalPython", "BatchEvalPython"):
        assert bad not in p, bad


def test_ivfpq_build_is_cached(spark):
    """Repeated ann_ivfpq_topk plan builds run no jobs once the coarse
    seeds, residual codebooks, and encoded matview are warm."""
    from event_stream_spark.datapipe.similarity import ann_ivfpq_topk

    ann_ivfpq_topk(spark, SF_CORRECT)
    sc = spark.sparkContext
    before = sc._jsc.sc().dagScheduler().numTotalJobs()
    ann_ivfpq_topk(spark, SF_CORRECT)
    assert sc._jsc.sc().dagScheduler().numTotalJobs() == before


def test_ivfpq_code_lake_prunes_and_is_narrow(spark, tmp_path):
    """The written IVFADC layout: codes partitioned by list_id prune
    probes at PLAN time (PartitionFilters) and the scanned columns are
    the M int codes + vec_id — the float embedding never exists in the
    lake at all."""
    from event_stream_spark.datapipe.similarity import (
        ivfpq_codes,
        read_ivf_lake,
        write_ivf_lake,
    )

    codes = ivfpq_codes(spark, SF_CORRECT)
    lake = str(tmp_path / "ivfpq_lake")
    write_ivf_lake(codes, lake)

    df = read_ivf_lake(spark, lake, [0, 5])
    p = plan(df)
    assert "PartitionFilters" in p
    assert "list_id" in p.split("PartitionFilters", 1)[1][:200]
    assert "embedding" not in p  # the lake carries only codes
    assert read_ivf_lake(spark, lake).count() == codes.count()


def test_semantic_decon_is_shuffle_free_arrow_kernel(spark):
    """decontaminate_semantic: the corpus side streams through ONE Arrow
    kernel against the driver-collected eval matrix — no join, no
    corpus-sized exchange anywhere in the plan (the HOF-cosine ×
    broadcast-join formulation was measured unusable at 200k×4k)."""
    from event_stream_spark.datapipe.similarity import decontaminate_semantic

    p = plan(decontaminate_semantic(spark, SF_CORRECT))
    assert "MapInPandas" in p
    assert "Join" not in p and "CartesianProduct" not in p


def test_suffix_lrs_bucketed_sort_no_cartesian(spark):
    """suffix_lrs: the corpus-wide suffix sort runs bucketed (two-phase,
    no corpus-sized SinglePartition window on the big relation), document
    texts enter the LCP stage via broadcast, and nothing goes quadratic."""
    from event_stream_spark.datapipe.suffix import suffix_lrs

    p = plan(suffix_lrs(spark, SF_CORRECT))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "_bkt" in p  # the bucketed two-phase suffix sort
    assert "BroadcastHashJoin" in p  # capd texts broadcast into the pairs


def test_q33_pivot_is_single_aggregate(spark):
    """q33: pivot with explicit values compiles to ONE hash aggregate over
    a single day-key exchange — no distinct-discovery scan, no join."""
    from event_stream_spark.queries import QUERIES

    p = plan(QUERIES["q33"](spark, SF_CORRECT))
    assert "Join" not in p
    assert p.count("Scan parquet") == 1


def test_q36_recursion_frontier_joins_keyed(spark):
    """q36: the recursive-CTE fixpoint must advance via keyed equi-joins
    of the frontier against the rn-indexed seq relation — no Cartesian /
    nested-loop fallback, and iteration count bounded by chain length
    (six at sf0.1), not row count."""
    from event_stream_spark.queries import QUERIES

    p = plan(QUERIES["q36"](spark, SF_CORRECT))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_q36_matches_window_islands(spark):
    """q36's recursive chains must equal the classic gaps-and-islands
    window formulation (break marks + running sum) computed without any
    recursion — two independent formulations, one answer."""
    from pyspark.sql import Window

    from event_stream_spark.queries import QUERIES, t

    o = t(spark, SF_CORRECT, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    brk = F.when(
        prev.isNull()
        | (F.col("o_orderdate") > prev + F.expr("INTERVAL 30 DAY")),
        1,
    ).otherwise(0)
    islands = (
        o.withColumn("brk", brk)
        .withColumn("island", F.sum("brk").over(w))
        .groupBy("o_custkey", "island")
        .agg(
            F.min("o_orderdate").cast("date").alias("chain_start"),
            F.count("*").cast("long").alias("chain_len"),
            F.max("o_orderdate").cast("date").alias("chain_end"),
        )
        .drop("island")
    )
    rec = QUERIES["q36"](spark, SF_CORRECT)
    assert rec.exceptAll(islands).count() == 0
    assert islands.exceptAll(rec.select(*islands.columns)).count() == 0


def test_q37_lateral_decorrelates_to_window_group_limit(spark):
    """q37: the correlated LATERAL LIMIT must decorrelate into a partial
    WindowGroupLimit (<=k rows per key per partition cross the shuffle)
    plus a broadcast of the filtered customer side — never a per-row
    subquery or nested loop."""
    from event_stream_spark.queries import QUERIES

    p = plan(QUERIES["q37"](spark, SF_CORRECT))
    assert "WindowGroupLimit" in p
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_shard_balance_no_global_sort_window(spark):
    """shard_balance: the size ranking must run per substratum — never a
    corpus-wide SinglePartition window — and the serpentine deal must
    actually balance: every shard's token total within 1% of the mean at
    sf0.01."""
    from event_stream_spark.datapipe.splits import shard_balance

    df = shard_balance(spark, SF_CORRECT)
    p = plan(df)
    # the ranking window is keyed by the substratum — a corpus-wide
    # single-partition window would show an empty partition spec
    assert re.search(r"row_number\(\) windowspecdefinition\(sub#", p)
    # any SinglePartition exchange must feed a keyless aggregate (the
    # 8-row mean), never the ranking itself
    lines = p.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            assert "keys=[]" in lines[i + 1], lines[i : i + 2]
    rows = df.collect()
    assert len(rows) == 8
    # +-5% at 500 docs (31 docs/substratum = ~2 deal blocks, so partial
    # tail blocks dominate); convergence is 1/blocks -- the 10x sweep in
    # SCALE.md measures <1% at 20k docs
    assert all(abs(r["balance"] - 1.0) < 0.05 for r in rows)


def test_domain_stats_narrow_shuffles(spark):
    """domain_stats: dup detection shuffles the 32-char hash, not the
    document text, and no join degenerates to a nested loop; the dup
    totals agree with an independent distinct-hash count."""
    from event_stream_spark.datapipe.webops import domain_stats
    from event_stream_spark.queries import t

    df = domain_stats(spark, SF_CORRECT)
    p = plan(df)
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    # every shuffle keys on the 32-char hash or the domain — the text
    # column is projected away before any exchange
    keys = set(re.findall(r"hashpartitioning\((\w+)#", p))
    assert keys <= {"h", "domain"}, keys
    rows = df.collect()
    d = t(spark, SF_CORRECT, "documents")
    n_unique_singletons = (
        d.groupBy(F.md5("text")).count().filter("count = 1").count()
    )
    total_docs = d.count()
    assert sum(r["n_dup"] for r in rows) == total_docs - n_unique_singletons


def test_q38_range_frame_single_exchange(spark):
    """q38: the trailing-hour RANGE frame must be one user_id exchange +
    one Window node — never a self-join or explode re-expression."""
    from event_stream_spark.queries import QUERIES

    p = plan(QUERIES["q38"](spark, SF_CORRECT))
    assert "Join" not in p
    assert p.count("Scan parquet") == 1
    assert re.search(r"specifiedwindowframe\(RangeFrame", p)


def test_contrastive_pairs_bucket_probed_negatives(spark):
    """contrastive_pairs: negative sampling is a bucket-key equi-join
    (never anchor x corpus), and the labels are sound — every anchor
    carries at least one negative, and no sampled negative collides with
    that anchor's labeled positives or itself."""
    from collections import defaultdict

    from event_stream_spark.datapipe.contrastive import contrastive_pairs

    df = contrastive_pairs(spark, SF_CORRECT)
    p = plan(df)
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "text#" not in p  # document text never enters this plan
    rows = df.collect()
    by = defaultdict(lambda: {"pos": set(), "neg": set()})
    partners = defaultdict(set)  # near-dup partnership is SYMMETRIC
    for r in rows:
        by[r["anchor"]][r["label"]].add(r["other"])
        if r["label"] == "pos":
            partners[r["anchor"]].add(r["other"])
            partners[r["other"]].add(r["anchor"])
    for anchor, d in by.items():
        assert d["pos"], anchor  # anchors only exist via a positive pair
        assert d["neg"], anchor
        assert len(d["neg"]) <= 2
        assert anchor not in d["neg"]
        # no negative is a labeled near-dup partner in EITHER orientation
        # (canonical a<b pairs: an anchor can be the b-side of another)
        assert not (partners[anchor] & d["neg"]), anchor


def test_robots_eval_rfc_semantics(spark):
    """robots_eval: longest-prefix match governs, allow wins length ties,
    a blanket disallow is carved out only by its allow rules, unmatched
    paths default to allowed; the rule join broadcasts."""
    from event_stream_spark.datapipe.webops import robots_eval

    df = robots_eval(spark, SF_CORRECT)
    p = plan(df)
    assert "BroadcastHashJoin" in p
    rows = {r["doc_id"]: r for r in df.collect()}
    # derive expectations straight from the rule algebra
    from event_stream_spark.queries import t

    docs = {
        r["doc_id"]: (r["source"], r["lang"])
        for r in t(spark, SF_CORRECT, "documents").collect()
    }
    for doc_id, r in rows.items():
        source, lang = docs[doc_id]
        k = int(source[3:])
        page = doc_id % 40
        path = f"/{lang}/page{page}" + ("/" if doc_id % 3 == 0 else "")
        if lang == "de" and path.startswith("/de/page1"):
            assert r["allowed"], (doc_id, path)  # carve-out beats /de
        elif lang == "de":
            assert not r["allowed"], (doc_id, path)
        elif k % 3 == 0 and lang != "fr":
            assert not r["allowed"], (doc_id, path)  # blanket disallow
        elif k % 3 == 0 and lang == "fr":
            assert r["allowed"], (doc_id, path)  # allow carve-out
        elif k % 2 == 1 and lang == "en" and path.startswith("/en/page2"):
            assert not r["allowed"], (doc_id, path)
        else:
            assert r["allowed"], (doc_id, path)  # no match -> allowed


def test_minhash_oph_plan_is_one_hash_pass_plus_band_join(spark):
    """dedup_minhash_oph: the signature is ONE conditional-min aggregate
    over single-hashed shingles (no K-hash projection), candidates come
    from a (band_id, band_key) equi-join — no Cartesian/nested-loop, no
    Python evaluation anywhere in the plan."""
    from event_stream_spark.datapipe import minhash_oph_pairs

    p = plan(minhash_oph_pairs(spark, SF_CORRECT))
    assert "CartesianProduct" not in p and "NestedLoop" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "band_key" in p
    # densification is pure projection (coalesce chains), codegen'd: the
    # signature is a single 16-bin min-aggregate family, instantiated once
    # per scan instance of the self-join (two sides -> 2 x 16 partials).
    # Both conjuncts are load-bearing: the functions=[partial_min literal
    # pins that the signature aggregate IS a map-side partial min (not a
    # post-shuffle one), and the 32 bound caps the bin-min partials at
    # 16 x the two self-join scan instances — a K-hash projection would
    # blow past it.  (The r8 form `<= 16 or "min(" in p` was vacuous: the
    # second disjunct held whenever any min appeared.)
    assert "functions=[partial_min" in p
    assert p.count("partial_min") <= 32


def test_manifest_stats_flip_smj_to_broadcast_first_run(spark, tmp_path):
    """Cost-informed first run (read_snapshot plan_stats=True): a table
    whose RAW parquet bytes exceed autoBroadcastJoinThreshold but whose
    LIVE size (after DV deletions, known to the manifest) fits under it
    plans BroadcastHashJoin immediately — no prior run, no AQE repair.
    The control (plan_stats=False) shows Spark's static raw-bytes
    estimate planning a SortMergeJoin for the identical join."""
    from pyspark.sql import functions as F

    from event_stream_spark.sources.snaplog import (
        commit,
        delete_where_dv,
        read_snapshot,
        table_stats,
    )

    table = str(tmp_path / "tbl")
    # ~50k rows of random-ish strings: raw parquet comfortably > 64KB
    commit(
        spark.range(50_000).selectExpr(
            "id AS k", "repeat(sha2(cast(id as string), 256), 4) AS pad"
        ),
        table,
    )
    # DV-delete ~99.8%: live size collapses, raw bytes don't move
    delete_where_dv(spark, table, "k >= 100")
    st = table_stats(table)
    assert st["live_rows"] == 100 and st["deleted_rows"] == 49_900
    assert st["live_bytes"] < st["bytes"] // 100

    big = spark.range(200_000).selectExpr("id AS k", "id * 2 AS w")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # threshold sits between live and raw size: the manifest knows the
        # side fits, Spark's static estimate says it doesn't
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(st["bytes"] // 10)
        )
        assert st["live_bytes"] <= st["bytes"] // 10 < st["bytes"]

        control = big.join(
            read_snapshot(spark, table), "k"
        )._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in control

        hinted = big.join(
            read_snapshot(spark, table, plan_stats=True), "k"
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in hinted
        assert "SortMergeJoin" not in hinted
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_manifest_stats_drive_cbo_join_reorder(spark, tmp_path):
    """VERDICT r10 #5: manifest stats surfaced into the SESSION CATALOG
    (rowCount / sizeInBytes / min-max / KMV NDV) change a 3-table join's
    ORDER under Catalyst CostBasedJoinReorder — no hint, no scan, no
    decision code of ours.  Stats-absent twin tables over the very same
    parquet directories keep the written order, isolating the cause to
    the statistics alone."""
    import glob
    import os
    import re

    from event_stream_spark.sources.snaplog import _read_manifest, commit
    from event_stream_spark.sources.snapcatalog import (
        manifest_column_stats,
        snapshot_table,
    )

    specs = [
        ("cbo_big", 100_000, "a", "ja"),
        ("cbo_mid", 5_000, "b", "jb"),
        ("cbo_small", 100, "c", "jc"),
    ]
    tables = {}
    try:
        for nm, n, pk, fk in specs:
            t = str(tmp_path / nm)
            commit(
                spark.range(n)
                .selectExpr(f"id AS {pk}", f"id % 100 AS {fk}")
                .coalesce(4),
                t,
                stats_cols=[pk, fk],
                ndv_cols=[pk, fk],
            )
            tables[nm] = t
            snapshot_table(spark, t, nm)
            # stats-absent twin over the SAME linked data directory
            view = glob.glob(os.path.join(t, "_catalog", f"{nm}-s*"))[0]
            spark.sql(f"DROP TABLE IF EXISTS {nm}_raw")
            spark.sql(
                f"CREATE TABLE {nm}_raw ({pk} bigint, {fk} bigint) "
                f"USING parquet LOCATION '{os.path.abspath(view)}'"
            )

        # the manifest-only stats are right: FK NDV exact (under KMV k),
        # PK NDV within the KMV error band, min/max exact
        st = manifest_column_stats(_read_manifest(tables["cbo_big"], 0))
        assert st["ja"]["ndv"] == 100
        # KMV k=128 → ~9% std error; ±30% (3.4σ) bounds any draw, and
        # join ORDERING needs only order-of-magnitude NDV
        assert abs(st["a"]["ndv"] - 100_000) <= 30_000
        assert (st["a"]["min"], st["a"]["max"]) == (0, 99_999)
        # ... and landed in the catalog
        desc = "\n".join(
            map(str, spark.sql("DESC EXTENDED cbo_big").collect())
        )
        assert "100000 rows" in desc

        def order(q):
            s = spark.newSession()
            s.conf.set("spark.sql.cbo.enabled", "true")
            s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
            plan = s.sql(q)._jdf.queryExecution().optimizedPlan().toString()
            seen = []
            for m in re.findall(r"spark_catalog\.default\.(\w+)", plan):
                if m not in seen:
                    seen.append(m)
            return seen

        # deliberately bad given order: big x mid first (fk-fk, est 5M
        # rows) although big x small then x mid is far cheaper
        q = (
            "SELECT * FROM {b} JOIN {m} ON {b}.ja = {m}.jb "
            "JOIN {s} ON {b}.ja = {s}.jc"
        )
        raw = order(q.format(b="cbo_big_raw", m="cbo_mid_raw", s="cbo_small_raw"))
        assert raw == ["cbo_big_raw", "cbo_mid_raw", "cbo_small_raw"]
        with_stats = order(q.format(b="cbo_big", m="cbo_mid", s="cbo_small"))
        assert with_stats == ["cbo_big", "cbo_small", "cbo_mid"], with_stats
    finally:
        for nm, _n, _pk, _fk in specs:
            spark.sql(f"DROP TABLE IF EXISTS {nm}")
            spark.sql(f"DROP TABLE IF EXISTS {nm}_raw")


def test_boilerplate_lines_single_pass(spark):
    """r11 single-pass form: every per-doc column derives from ONE marked
    left join + one aggregation — the old semi/anti-join fan-out (four
    corpus-scale executions of the paragraph pipeline, 22 scans) must not
    come back."""
    from event_stream_spark.datapipe import boilerplate_lines

    p = plan(boilerplate_lines(spark, SF_CORRECT))
    assert "LeftSemi" not in p and "LeftAnti" not in p
    assert p.count("Scan parquet") <= 6


def test_dup_spans_clean_single_pass(spark):
    """r11 single-pass form: covered positions are marked with a left join
    and reduced in ONE doc_id aggregation (no anti-join + separate total
    count re-executing the token relation)."""
    from event_stream_spark.datapipe import dup_spans_clean

    p = plan(dup_spans_clean(spark, SF_CORRECT))
    assert "LeftAnti" not in p
    assert p.count("Scan parquet") <= 6


def test_url_dedup_window_keep_first(spark):
    """r11 keep-first-by-window form: one documents scan, one canon_url
    exchange, and the rank filter pushed into WindowGroupLimit — not the
    min-aggregate self-join (two scans + two extra exchanges)."""
    from event_stream_spark.datapipe import url_dedup

    p = plan(url_dedup(spark, SF_CORRECT))
    assert p.count("Scan parquet") == 1
    assert "WindowGroupLimit" in p
    assert p.count("hashpartitioning(canon_url") == 1


def test_dedup_incremental_window_keep_first(spark):
    """r11 keep-first-by-window form: the existing-corpus anti-join runs
    ONCE (one LeftAnti, two documents scans) and keep-first is a window
    group-limit, not a min-aggregate self-join over a re-executed
    anti-join."""
    from event_stream_spark.datapipe import dedup_incremental

    p = plan(dedup_incremental(spark, SF_CORRECT))
    assert p.count("LeftAnti") == 1
    assert p.count("Scan parquet") == 2
    assert "WindowGroupLimit" in p


def test_funnel_latency_single_scan_no_joins(spark):
    """r11 funnel rewrite: ONE events scan, ONE user_id exchange shared by
    both running-min window passes and the per-user aggregate — the
    pre-r11 three type-filtered scans + two shuffled joins are gone."""
    from event_stream_spark.queries import funnel_latency

    p = plan(funnel_latency(spark, SF_CORRECT))
    assert p.count("Scan parquet") == 1
    assert "Join" not in p
    assert p.count("Window") == 2
    assert p.count("hashpartitioning(user_id") == 1


def test_q29_funnel_single_scan_no_joins(spark):
    """r11 funnel rewrite (same construction as funnel_latency): one scan,
    one user_id exchange, zero joins — replaces the persisted-stage
    join-chain form."""
    from event_stream_spark.queries import q29

    p = plan(q29(spark, SF_CORRECT))
    assert p.count("Scan parquet") == 1
    assert "Join" not in p
    assert p.count("hashpartitioning(user_id") == 1


def test_robots_eval_single_scan_aggregated_winner(spark):
    """r11 rewrite: winner per doc is a max(struct(...)) aggregate over ONE
    broadcast-left-joined scan — no second corpus scan, no doc_id
    SortMergeJoin back, no per-doc window sort."""
    from event_stream_spark.datapipe.webops import robots_eval

    p = plan(robots_eval(spark, SF_CORRECT))
    assert p.count("Scan parquet") == 1
    assert "SortMergeJoin" not in p
    assert p.count("BroadcastHashJoin") == 1
    assert "Window " not in p


def test_heavy_hitters_single_python_pass(spark):
    """r11: the Misra-Gries kernel emits candidates AND the per-partition
    token tally in one pass, persisted for its two consumers — so the
    token stream crosses the Python boundary once and the global total
    costs no extra corpus scan (pre-r11: a third full scan+explode)."""
    from event_stream_spark.datapipe.splits import heavy_hitters

    p = plan(heavy_hitters(spark, SF_CORRECT))
    # both consumers (candidate distinct, total sum) read the persisted
    # MG summary, never re-run the kernel
    assert p.count("InMemoryTableScan") == 2


def test_embedding_exact_single_payload_scan(spark):
    """r11: both tile sides derive from ONE embeddings scan joined against
    the broadcast doubled block-membership list; the block list itself is
    persisted (4 references).  No SortMergeJoin anywhere — the payload is
    never shuffled on a key."""
    from event_stream_spark.datapipe.dedup import dedup_embedding_exact

    p = plan(dedup_embedding_exact(spark, SF_CORRECT))
    assert p.count("InMemoryTableScan") == 4
    assert "SortMergeJoin" not in p
    assert p.count("BroadcastHashJoin") == 1  # the memb attach


def test_multimodal_meta_synthesizes_media_once(spark):
    """r11: the five decode branches read the persisted media relation —
    payload synthesis runs once per execution, not once per branch."""
    from event_stream_spark.datapipe.multimodal import multimodal_meta

    p = plan(multimodal_meta(spark, SF_CORRECT))
    assert p.count("InMemoryTableScan") == 5


def test_q30_cohort_single_scan_window_min(spark):
    """r11: the per-user first-event timestamp is a whole-partition window
    min over the one user_id exchange — ONE events scan, no join (the old
    groupBy-min + join-back form scanned events twice)."""
    from event_stream_spark.queries import QUERIES

    p = plan(QUERIES["q30"](spark, SF_CORRECT))
    assert p.count("Scan parquet") == 1
    assert "Join" not in p
    assert p.count("hashpartitioning(user_id") == 1


def test_char_entropy_single_scan_window_totals(spark):
    """r11: per-doc totals (n, alphabet) are whole-partition window
    aggregates over the freq relation — ONE documents scan / char explode,
    no join-back (the old totals groupBy + join re-exploded the corpus)."""
    from event_stream_spark.datapipe import char_entropy

    p = plan(char_entropy(spark, SF_CORRECT))
    assert p.count("Scan parquet") == 1
    assert "Join" not in p


def test_domain_stats_single_scan_window_dupflag(spark):
    """r11: the exact-dup flag is a whole-partition window count over one
    md5(text)-keyed exchange — ONE documents scan, no join whose build
    side has corpus-scale key cardinality (the old sizes groupBy +
    join-back could never broadcast at size)."""
    from event_stream_spark.datapipe import domain_stats

    p = plan(domain_stats(spark, SF_CORRECT))
    assert p.count("Scan parquet") == 1
    assert "Join" not in p


def test_bm25_postings_pruned_at_scan_df_from_pruned(spark):
    """r11: both posting reads are pruned to the query terms AT THE SCAN
    (PushedFilters In(term, ...)), df derives from the pruned subset (no
    full-vocabulary term shuffle feeding a whole-vocab broadcast), and dl
    is computed once (persisted) for its two consumers."""
    from event_stream_spark.datapipe.retrieval import bm25_topk

    p = plan(bm25_topk(spark, SF_CORRECT))
    scans = [l for l in p.splitlines() if "FileScan parquet" in l]
    # 2 executed posting scans, both term-pruned; the other FileScan lines
    # are the persisted dl's subplan re-printed under its InMemoryRelation
    # references (full postings by design: dl/avgdl need every term)
    pruned = [l for l in scans if "In(term, " in l]
    assert len(pruned) == 2
    assert p.count("InMemoryTableScan") == 2  # dl: stats + scoring join


def test_curate_v2_no_redundant_base_scan(spark):
    """r11: length_trim's keep-set IS the base relation (one row per doc)
    and the quality keep-set reads quality_scored directly — the separate
    all-documents base scan and quality_classify's all-documents left
    join are gone: 5 documents-table scans -> 3 (cuts agg + flag join +
    word explode)."""
    from event_stream_spark.datapipe.pipeline import datapipe_curate_v2

    p = plan(datapipe_curate_v2(spark, SF_CORRECT))
    assert p.count("documents.parquet") == 3
