"""Corpus-wide suffix array by prefix doubling + exact LCP — the suffix-
array family of dedup analyses (Lee et al., "Deduplicating Training Data
Makes Language Models Better", builds exact-substring dedup on suffix
arrays; the gram-hash operators ``dup_spans``/``char_dup_spans`` are the
probabilistic cousins — this module is the EXACT construction).

Two cleanly separated pieces:

1. **Suffix ORDER** (Manber–Myers prefix doubling, the standard
   distributed SA construction): round 0 ranks suffixes by first char;
   round j computes rank(pos, 2k) = dense_rank(rank(pos,k), rank(pos+k,k))
   — a narrow self-equi-join plus one distributed dense rank.  The loop
   EARLY-EXITS as soon as every rank is distinct (natural text
   individuates within ~16–32 chars): distinct length-k ranks mean every
   suffix pair differs inside its k-prefix, so rank_k order IS the full
   suffix order.
2. **Exact LCP of SA-adjacent pairs** by binary refinement over the two
   capped document strings directly: seven chained ``substring``-equality
   CASE steps (k = 64, 32, …, 1) — whole-stage-codegen string compares,
   no joins against intermediate rank tables at all.  Both-suffixes-
   exhausted overshoot is trimmed by the final least(remaining) cap.

The registry ships BOTH scopes: ``suffix_lrs`` caps documents at their
first ``SUFFIX_CAP`` = 64 chars (boilerplate and template duplication
live at prefix scale; the cap bounds the round count at log2(cap) and
keeps the position relation linear in corpus size) and uses the direct
capped-suffix sort; ``suffix_lrs_full`` runs the PREFIX-DOUBLING loop
over whole documents (``SUFFIX_FULL_CAP`` = 1024 ≥ every corpus doc),
seeded by a direct sort of the 64-char prefix — the standard hybrid:
sort what fits in a bounded key, double only beyond it.  Its LCP stage
is two-phase (codegen chain to 64, Arrow exact-LCP for the saturated
long-duplicate tail) because an 11-step chain exceeds the JVM 64 KB
codegen method limit — see ``_pair_lcp``.
Suffix comparisons never cross document boundaries: rank lookups past a
document's end simply miss (LEFT JOIN → NULL → coalesced to the -1
sentinel), giving string-truncation semantics identical in both engines.

Scale shape: every doubling round exchanges only (doc_id, pos, rank)
rows — the text is touched in the initial character explode and in the
final LCP projection, and never rides any rank exchange.  The
distributed rank is two-phase over a RANGE-partitioned, MATERIALIZED
layout (see ``_range_parted`` for why the materialization is load-
bearing: sampled boundaries are nondeterministic across independent
executions of a shared subplan, and an earlier arithmetic-bucket design
serialized under leading-key skew).  No corpus-sized window ever runs
on a single partition.  At 100 TB the build is ≤ log2(cap) rounds of
linear narrow shuffles — the published MapReduce SA recipe.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from event_stream_spark.queries import t

#: per-document prefix cap: bounds doubling rounds at log2(64) = 6
SUFFIX_CAP = 64
#: a suffix counts as "duplicated" when it shares ≥ this many leading
#: chars with its suffix-array neighbor (Lee et al. use 50 BPE tokens on
#: full-scale corpora; 20 chars is the same screen at this doc length)
SUFFIX_DUP_MIN = 20
#: floor for the two-phase distributed rank's bucket count — see
#: ``_rank_parts`` (the live value scales with the cluster)
_RANK_PARTS = 32
#: doubling-loop working sets at or below this row count have their
#: rank-lookup side BROADCAST (the full rank relation then streams with
#: ZERO exchange — the per-round shuffle of the n-row relation was the
#: loop's dominant cost); above it the loop falls back to the spillable
#: shuffle-hash join.  ~48 B/row ⇒ the 4M default builds a ≤200 MB hash
#: relation, safely under the driver/executor budget; env-overridable
#: for clusters with different memory headroom.
_TIED_BCAST_MAX = 4_000_000


def _tied_bcast_max() -> int:
    env = os.environ.get("SPARK_GRAFT_TIED_BCAST_MAX")
    return int(env) if env else _TIED_BCAST_MAX


def _rank_parts(df: DataFrame) -> int:
    """Bucket count for the two-phase rank: ``max(32, cluster default
    parallelism)``, env-overridable via ``SPARK_GRAFT_RANK_PARTS``.

    A fixed 32 was correct on ``local[32]`` but is a scale ceiling: on a
    1000-core cluster it would serialize every rank sort into 32 tasks.
    Rank values are partition-boundary-independent (``_range_parted``),
    so the bucket count cannot change results — only parallelism.
    Locally (defaultParallelism == cores ≤ 32) this resolves to the same
    32 the bench has always used, keeping the lane comparable."""
    env = os.environ.get("SPARK_GRAFT_RANK_PARTS")
    if env:
        return int(env)
    return max(_RANK_PARTS, df.sparkSession.sparkContext.defaultParallelism)


def _range_parted(
    df: DataFrame, cols: list[str], parts: int | None = None,
    track: list | None = None,
) -> DataFrame:
    """Range-partition ``df`` on ``cols`` and MATERIALIZE the result with
    its partition id stamped as ``_bkt``.

    Two subtleties make this exact:

    - ``repartitionByRange``'s sampled boundaries (and
      ``spark_partition_id()``) are NONDETERMINISTIC across physical
      executions — if the ranked branch and the offsets branch of a
      two-phase rank re-executed the exchange independently, their
      partitionings could disagree and merge/split rank classes (a bug
      this module shipped with and a test caught).  The DISK_ONLY
      persist pins ONE materialized partitioning that both branches
      read — on heap this relation (the build's widest: it carries the
      string sort keys) was the measured GC-thrash driver at 43M
      suffixes in a 12 GB JVM; a lost block recomputes through the one
      partitioner object fixed at materialization, so determinism holds
      (strictly safer than the lineage-truncating checkpoint this
      replaces).
    - the FINAL rank values are boundary-independent (a rank over a total
      key order doesn't care where the partition cuts fall), so the
      output is deterministic even though the sampled boundaries aren't.

    Range partitioning (vs arithmetic first-key bucketing, the previous
    design) balances by the FULL key, so a skewed leading key — every
    web doc starting 'http', every synthetic doc starting 'w' — cannot
    serialize the sort into one bucket (measured: the 10× sweep corpus
    has a single first char, which put 100% of suffixes in one bucket)."""
    from pyspark import StorageLevel

    if parts is None:
        parts = _rank_parts(df)
    part = df.repartitionByRange(
        parts, *[F.col(c) for c in cols]
    ).withColumn("_bkt", F.spark_partition_id())
    ckpt = part.persist(StorageLevel.DISK_ONLY)
    if track is not None:
        track.append(ckpt)
    return ckpt


def _suffix_key_boundaries(
    spark: SparkSession, sf: str, cap: int, keylen: int, parts: int,
) -> list[tuple[str, int, int]]:
    """parts−1 (sfx, doc_id, pos) boundary tuples for LITERAL range
    binning of the suffix relation, from a driver-side document sample.

    Literal boundaries replace ``repartitionByRange`` + DISK_ONLY persist
    (``_range_parted``): the binning expression is embedded in the plan,
    so every consumer branch computes the SAME bucketization by
    construction — the materialization that existed only to pin one
    sampled partitioning (its documented purpose) becomes unnecessary,
    deleting the sampling job, the range exchange, and a corpus-sized
    disk write from every fresh execution (the seed alone measured 62 s
    of suffix_lrs_full's 90 s build at sf1).  A ~256-document sample
    yields thousands of suffix keys — boundary quality comparable to the
    range partitioner's own reservoir sample."""
    docs = t(spark, sf, "documents")
    n_docs = docs.count()  # parquet metadata count — no data scan
    if n_docs == 0:
        return []
    frac = min(1.0, 256.0 / n_docs)
    rows = (
        docs.select("doc_id", F.substring("text", 1, cap).alias("s"))
        .sample(False, frac, 13)
        .collect()
    )
    keys: list[tuple[str, int, int]] = []
    for r in rows:
        s = r["s"] or ""
        for p in range(1, len(s) + 1):
            keys.append((s[p - 1 : p - 1 + keylen], r["doc_id"], p))
    keys.sort()
    if not keys:
        return []
    return [keys[i * len(keys) // parts] for i in range(1, parts)]


def _bkt_key_expr(bnds: list[tuple[str, int, int]], col: str = "sfx"):
    """Bucket id from VALUE-ONLY boundaries: equal keys always share a
    bucket (the invariant ``_group_rank2``'s group-boundary detection
    needs).  Linear codegen: each term references the key attribute."""
    e = F.lit(0)
    for bs, _d, _p in bnds:
        e = e + F.when(F.col(col) >= bs, 1).otherwise(0)
    return e


def _bkt_tuple_expr(
    bnds: list[tuple], c1: str, c2: str, c3: str
):
    """Bucket id from full-tuple boundaries (perfect balance even under
    massive key duplication — ties split across buckets, which the
    window-adjacency consumers tolerate by design)."""
    e = F.lit(0)
    for b1, b2, b3 in bnds:
        gt = (F.col(c1) > b1) | (
            (F.col(c1) == b1)
            & ((F.col(c2) > b2) | ((F.col(c2) == b2) & (F.col(c3) >= b3)))
        )
        e = e + F.when(gt, 1).otherwise(0)
    return e


def _dense_rank2(
    df: DataFrame, c1: str, c2: str, parts: int | None = None,
    track: list | None = None,
) -> DataFrame:
    """Append global ``r`` = dense_rank() ordered by (c1, c2), two-phase:
    range-partition on the keys (equal keys co-locate, partitions are
    ordered), dense-rank within each partition, then shift by the
    cumulative distinct-count of the partitions before — the corpus-sized
    relation never passes through a SinglePartition window."""
    part = _range_parted(df, [c1, c2], parts, track)
    w = Window.partitionBy("_bkt").orderBy(c1, c2)
    ranked = part.withColumn("_dr", F.dense_rank().over(w))
    # ≤ _RANK_PARTS rows: the unpartitioned cumsum window is driver-scale
    woff = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        ranked.groupBy("_bkt")
        .agg(F.max("_dr").alias("_n"))
        .select("_bkt", F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off"))
    )
    return (
        ranked.join(F.broadcast(offs), "_bkt")
        .withColumn("r", (F.col("_off") + F.col("_dr")).cast("long"))
        .drop("_bkt", "_dr", "_off")
    )


def _group_rank2(
    df: DataFrame, key: str, parts: int | None = None,
    track: list | None = None, bkt=None,
) -> DataFrame:
    """Append global ``r`` = GROUP-START rank over ``key`` (the sorted
    position of the first row of the row's tie group — ``1 + count of
    rows strictly smaller``) and boolean ``settled`` (tie group has size
    1), in ONE range exchange + one per-bucket sort.

    Group-start ranks are the encoding that makes SEGMENTED doubling
    possible: when a tie group [r, r+g) later splits, the new sub-group
    starts stay inside [r, r+g) and every OTHER suffix's rank is
    untouched — so settled suffixes never need re-ranking.  (Dense ranks
    — the previous encoding — renumber globally on every split, forcing
    each round to re-sort the full relation.)

    Boundary detection is lag/lead inside the one bucket window (equal
    keys co-locate under range partitioning, so groups never span
    buckets); no second exchange, no per-group window that a giant tie
    class could serialize.

    ``bkt``: optional LITERAL bucket expression (``_bkt_key_expr`` over
    driver-sampled boundaries — must keep equal keys in one bucket).
    When given, the range exchange + DISK_ONLY persist of the wide keyed
    relation disappear entirely: both consumer branches (ranked rows and
    per-bucket counts) compute the same bucketization from the literals,
    so the materialization that pinned one sampled partitioning is no
    longer needed — the window's one hash exchange is all that remains
    (measured: the 62 s suffix_lrs_full seed at sf1 → 21 s)."""
    if bkt is not None:
        part = df.withColumn("_bkt", bkt)
    else:
        part = _range_parted(df, [key], parts, track)
    w = Window.partitionBy("_bkt").orderBy(key)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    first = ~F.col(key).eqNullSafe(F.lag(key).over(w))
    last_ = ~F.col(key).eqNullSafe(F.lead(key).over(w))
    ranked = part.select(
        "*",
        F.row_number().over(w).alias("_rn"),
        (first & last_).alias("settled"),
        F.when(first, F.row_number().over(w)).alias("_fst"),
    ).withColumn("_gs", F.last("_fst", ignorenulls=True).over(run))
    woff = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        ranked.groupBy("_bkt")
        .agg(F.count("*").alias("_n"))
        .select("_bkt", F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off"))
    )
    return (
        ranked.join(F.broadcast(offs), "_bkt")
        .withColumn("r", (F.col("_off") + F.col("_gs")).cast("long"))
        .drop("_bkt", "_rn", "_fst", "_gs", "_off")
    )


def _row_number2(
    df: DataFrame, cols: list[str], out: str, parts: int | None = None
) -> DataFrame:
    """Append global ``out`` = row_number() ordered by ``cols`` — same
    two-phase scheme with count offsets."""
    part = _range_parted(df, cols, parts)
    w = Window.partitionBy("_bkt").orderBy(*cols)
    ranked = part.withColumn("_rn", F.row_number().over(w))
    woff = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        ranked.groupBy("_bkt")
        .agg(F.count("*").alias("_n"))
        .select("_bkt", F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off"))
    )
    return (
        ranked.join(F.broadcast(offs), "_bkt")
        .withColumn(out, (F.col("_off") + F.col("_rn")).cast("long"))
        .drop("_bkt", "_rn", "_off")
    )


def suffix_order(
    spark: SparkSession, sf: str, cap: int = SUFFIX_CAP,
    seed: int | None = None, with_classes: bool = True,
) -> tuple[DataFrame, int, int | None]:
    """(ranks, n, m) — ranks is (doc_id, pos, dlen, r) where ``r`` ranks
    every suffix of every capped document in full lexicographic suffix
    order (group-start encoding: equal capped suffixes share the rank of
    their tie group's first sorted position; ``ORDER BY r`` is the full
    suffix order either way); ``n`` is the total suffix count, ``m`` the
    number of distinct rank classes (m == n ⇔ fully individuated).

    SEGMENTED prefix doubling: after each round, suffixes whose rank is
    unique (``settled``) — or whose whole tie sub-group is exhausted
    (every member's remaining text ≤ k and equal: identical suffixes
    that can never split, ``frozen``) — leave the working set; their
    group-start ranks are final by construction.  Each round therefore:

    - looks up rank(pos+k) for WORKING suffixes only, via an inner
      equi-join against the full rank relation (the miss case is
      deterministic — positions are contiguous 1..dlen, so pos+k > dlen
      ⇔ no row — and becomes the -1 shorter-suffix sentinel without a
      join).  AQE broadcasts the working side once it collapses, making
      the lookup a single scan of the full relation with NO exchange of
      it;
    - splits each tie group by (r, _r2) via groupBy — partial (map-side)
      aggregation collapses even a degenerate all-identical-docs group
      to one row per sub-group, so no window ever serializes on a giant
      tie class — and assigns sub-group-start ranks r + (count of
      strictly-smaller _r2 within the group);
    - unions the updated working rows back with the untouched
      settled/frozen majority and checkpoints.

    On natural text the working set collapses within a round or two past
    the seed (random contexts individuate fast; what stays is true
    long-range duplication), so the per-round shuffle is proportional to
    the surviving DUPLICATION, not the corpus — the fix for the measured
    superlinear 10× sweep of the earlier dense-rank design, which
    re-range-sorted all n suffixes every round."""
    d = t(spark, sf, "documents").select(
        "doc_id", F.substring("text", 1, cap).alias("s")
    )
    # round 0 seeds the ranks with a SEED-char prefix window per suffix
    # (not a single character): the loop then starts at k = seed, cutting
    # log2(seed) rounds — each round costs 3-6 s of fixed exchange/job
    # latency at local[32] regardless of data size, so round COUNT is the
    # small-scale cost driver.  A ≤seed-char string is a perfectly fine
    # range-partition key (the direct path range-partitions on 64-char
    # keys); shorter windows near document ends sort prefix-first, which
    # is exactly the suffix-order semantics the -1 rank sentinel
    # preserves later.  Callers that want the doubling recurrence
    # exercised from small k keep the default; the full-text production
    # path seeds at SUFFIX_CAP (direct-sort the bounded prefix, double
    # only beyond it — the standard hybrid).
    seed = min(seed if seed is not None else 16, cap)
    pos0 = (
        d.select(
            "doc_id",
            "s",
            F.length("s").alias("dlen"),
            F.posexplode(F.split(F.col("s"), "(?!^)")).alias("pos0", "ch"),
        )
        # Spark's split leaves one trailing "" element — a phantom
        # position past the document end whose empty string would rank
        # equal ACROSS documents and corrupt every LCP
        .filter(F.col("ch") != "")
        .select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            "dlen",
            F.col("s").substr(F.col("pos0") + 1, F.lit(seed)).alias("sfx"),
        )
    )
    ckpts: list[DataFrame] = []
    bnds = _suffix_key_boundaries(spark, sf, cap, seed, _rank_parts(pos0))
    lvl = _group_rank2(
        pos0, "sfx", track=ckpts, bkt=_bkt_key_expr(bnds)
    ).select("doc_id", "pos", "dlen", "r", "settled")
    k = seed
    # one driver-scalar job per round: materializes the round's lazy
    # checkpoint and yields the early-exit test.  ``settled`` here means
    # "rank final" — unique, or frozen-identical (see loop body).
    lvl = lvl.localCheckpoint(eager=False)
    ckpts.append(lvl)
    n, working = lvl.agg(
        F.count("*"), F.count(F.when(~F.col("settled"), 1))
    ).head()
    # the seed's range-partitioned checkpoint carries the 64-char sfx
    # sort keys — by far the widest relation of the whole build (~7 GB
    # at 50M suffixes).  The narrow (ints + bool) rank relation is now
    # materialized, so release the wide one BEFORE the loop allocates
    # anything (measured: keeping it through round 1 OOMed a 12 GB
    # driver that the release survives comfortably)
    for old in ckpts[:-1]:
        old.unpersist()
    del ckpts[:-1]
    # PIECE accounting: the full relation is maintained as a lazy union
    # of DISJOINT materialized pieces — rows settled at the seed, rows
    # settled in each round, and the current tied set.  A round therefore
    # checkpoints ONLY its updated tied rows (|tied| collapses fast on
    # natural text), never rewrites the n-row relation; the big seed
    # checkpoint is written once and only ever scanned.
    settled_parts: list[DataFrame] = [lvl.filter(F.col("settled"))]
    cur = lvl  # the relation whose ~settled rows form the working set

    def _full() -> DataFrame:
        out = settled_parts[0]
        for p in settled_parts[1:]:
            out = out.unionByName(p)
        return out.unionByName(cur.filter(~F.col("settled")))

    while k < cap and working:
        tied = cur.filter(~F.col("settled"))
        # rank-at-pos-k lookup: inner join against the full relation;
        # the miss case (pos+k past the document end → the -1 sentinel:
        # shorter suffix sorts first) is decided arithmetically, not by
        # an outer join — which is what lets AQE build the (collapsing)
        # working side and stream the full side with zero exchange
        fullr = _full().select(
            F.col("doc_id").alias("_d"),
            F.col("pos").alias("_p"),
            F.col("r").alias("_r2"),
        )
        # join strategy by MEASURED working-set size (the count the loop
        # already pays for its exit test — never Catalyst's estimate,
        # which is absent for LogicalRDD checkpoints):
        #   - working small (the common case — natural text collapses the
        #     tied set within a round or two): BROADCAST the tied side and
        #     STREAM the full rank relation — the n-row union of pieces
        #     crosses no exchange at all, where the previous shuffle-hash
        #     form re-shuffled all n rows EVERY round (measured at sf1:
        #     the loop was 89 s of suffix_lrs_full's 126 s fresh build);
        #   - working large (massive duplication, or round 1 on a corpus
        #     that has not individuated): spillable shuffle-hash, the
        #     safe strategy when a broadcast build could compete with the
        #     live checkpoint blocks for heap (measured: OOM at 50M
        #     suffixes when broadcast was unconditional).
        lookup = tied.filter(F.col("pos") + k <= F.col("dlen"))
        cond = (F.col("doc_id") == F.col("_d")) & (
            F.col("pos") + k == F.col("_p")
        )
        if working <= _tied_bcast_max():
            hit = fullr.join(F.broadcast(lookup), cond).drop("_d", "_p")
        else:
            hit = lookup.hint("shuffle_hash").join(fullr, cond).drop(
                "_d", "_p"
            )
        miss = tied.filter(F.col("pos") + k > F.col("dlen")).withColumn(
            "_r2", F.lit(-1).cast("long")
        )
        tied2 = hit.unionByName(miss)
        # split each tie group by _r2: sub-group-start rank = r + count
        # of strictly smaller _r2 inside the group.  One row per
        # sub-group after partial agg; the window runs over sub-group
        # COUNTS (tiny), never over member rows.
        grp = tied2.groupBy("r", "_r2").agg(F.count("*").alias("_c"))
        wg = (
            Window.partitionBy("r")
            .orderBy("_r2")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offs = grp.select(
            "r",
            "_r2",
            (F.col("r") + F.coalesce(F.sum("_c").over(wg), F.lit(0)))
            .cast("long")
            .alias("_newr"),
            # rank final when the sub-group is a singleton, or when the
            # whole sub-group is exhausted-and-equal (_r2 = -1 with
            # c > 1 ⇒ every member's suffix is the same ≤ k-char string
            # — identical forever, so no later round can split it)
            ((F.col("_c") == 1) | (F.col("_r2") == -1)).alias("_set"),
        )
        # same measured-size gate for the sub-group join-back: offs has at
        # most one row per (r, _r2) sub-group ≤ working rows, so when the
        # lookup side broadcast, this side is broadcast-safe a fortiori —
        # the round then exchanges NOTHING
        offs_j = (
            F.broadcast(offs)
            if working <= _tied_bcast_max()
            else offs.hint("shuffle_hash")
        )
        tied_new = tied2.join(offs_j, ["r", "_r2"]).select(
            "doc_id",
            "pos",
            "dlen",
            F.col("_newr").alias("r"),
            F.col("_set").alias("settled"),
        )
        # materialize ONLY the round's tied rows (disjoint piece); the
        # settled majority stays in its already-materialized pieces
        cur = tied_new.localCheckpoint(eager=False)
        k *= 2
        working = cur.filter(~F.col("settled")).count()
        settled_parts.append(cur.filter(F.col("settled")))
        if os.environ.get("SPARK_SUFFIX_DEBUG"):
            import sys as _sys

            print(f"suffix_order: k={k} working={working}",
                  file=_sys.stderr, flush=True)
    # m (distinct rank classes) == n ⇔ every suffix individuated — ties
    # can survive as frozen identical suffixes (marked settled), so the
    # distinct count is the truth, not the settled tally.  One narrow
    # integer agg over the final relation — computed only when the caller
    # asked (``suffix_lrs_full`` never reads it, and the distinct is a
    # full n-row exchange per fresh build).
    full = _full()
    m1 = full.select("r").distinct().count() if with_classes else None
    return full.select("doc_id", "pos", "dlen", "r"), n, m1


def suffix_sa_direct(
    spark: SparkSession, sf: str, cap: int = SUFFIX_CAP
) -> DataFrame:
    """(doc_id, pos, dlen, sp) — suffix-array position by DIRECT
    distributed sort of the capped suffix strings: with the ≤``cap``-char
    cap, a suffix IS a bounded sort key, so one two-phase ranked window
    (range-partitioned on the full suffix key — balanced under ANY
    leading-key skew) replaces the whole doubling loop.  This is the fast
    path the registry entry uses; ``suffix_order``'s prefix doubling is
    the scale path for long/uncapped contexts, where materializing suffix
    strings as sort keys would blow the exchange up by the context
    length.  A pytest pins the two paths to the same order."""
    d = t(spark, sf, "documents").select(
        "doc_id", F.substring("text", 1, cap).alias("s")
    )
    pos0 = (
        d.select(
            "doc_id",
            "s",
            F.length("s").alias("dlen"),
            F.posexplode(F.split(F.col("s"), "(?!^)")).alias("pos0", "ch"),
        )
        .filter(F.col("ch") != "")  # trailing "" from split — see suffix_order
        .select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            "dlen",
            F.col("s").substr(F.col("pos0") + 1, F.lit(cap)).alias("sfx"),
        )
    )
    return _row_number2(pos0, ["sfx", "doc_id", "pos"], "sp").select(
        "doc_id", "pos", "dlen", "sp"
    )


def _pair_lcp(
    withtext: DataFrame, cap: int, keep: list[str] | None = None
) -> DataFrame:
    """Append exact-LCP column ``_l`` for every (_sa @ pa, _sb @ pb) pair.

    cap ≤ 64: the pure-codegen binary chain (7 substring-equality steps).

    cap > 64: the chain CANNOT simply be lengthened — each step
    references the accumulated ``l`` three times, so the expression tree
    grows ~3^steps and an 11-step (cap=1024) chain OOMs Janino during
    whole-stage-codegen compilation (measured: heap exhaustion at
    sf0.001).  Two phases instead: the 64-chain stays the codegen hot
    path for EVERY pair; pairs it saturates (``l >= 64`` ⇔ the first
    64-char window matched, impossible otherwise since the remaining
    steps sum to 63) are re-refined by an Arrow ``pandas_udf`` computing
    the true common-prefix length directly.  The saturated set is
    output-sensitive — only suffixes with ≥64-char exact repeats, i.e.
    the long-duplicate tail the analysis exists to find — so the
    Python-side work is proportional to true long duplication, not to
    the corpus.  Both branches filter one deterministic subplan, and the
    union keys (da, pa, db, pb) partition exactly."""
    if keep is None:
        keep = ["da", "pa", "la", "db", "pb", "lb"]
    # stepwise columns, not the composed expression: the composed form
    # compiled above these joins but still EVALUATED its ~3^7 duplicated
    # tree per row — measured 24 s at sf1 for what the stepwise form does
    # in ~1.5 s with 14 substring calls per row (see _lcp_cols)
    stepped = _lcp_cols(
        withtext.select(*keep, "_sa", "_sb"),
        "_sa", "_sb", min(cap, SUFFIX_CAP), "_l64", pa="pa", pb="pb",
    )
    if cap <= SUFFIX_CAP:
        return stepped.select(
            *keep, F.col("_l64").cast("long").alias("_l")
        )

    @F.pandas_udf("long")
    def _exact_lcp(sa, sb, pa, pb):
        import pandas as pd

        out = []
        for a, b, i, j in zip(sa, sb, pa, pb):
            x, y = a[i - 1:], b[j - 1:]
            n = min(len(x), len(y), cap)
            # largest l with x[:l] == y[:l], by bisection over C-speed
            # slice equality (≤ log2(cap)+1 block compares each) — the
            # former per-character Python loop cost ~100 ns/char over the
            # saturated tail (1.09M pairs × ≤1024 chars at sf1)
            if x[:n] == y[:n]:
                out.append(n)
                continue
            lo, hi = 0, n - 1  # not fully equal ⇒ LCP < n
            while lo < hi:
                mid = (lo + hi + 1) // 2
                if x[:mid] == y[:mid]:
                    lo = mid
                else:
                    hi = mid - 1
            out.append(lo)
        return pd.Series(out, dtype="int64")

    # No filter/union branching: Filter-pushdown would re-inline the
    # chain into each branch's predicate (substitution through the step
    # projections re-composes the full tree in the pushed predicate) and
    # the codegen method grows beyond the JVM's 64 KB limit (measured:
    # 19k-line generated file, interpreted fallback).  Instead the chain
    # result is an ATTRIBUTE (computed once by the step projections), the
    # strings are blanked for non-saturated pairs (cheap attribute refs
    # only), and the Arrow UDF runs over every row but compares two empty
    # strings on the blanked majority: Python-side work stays
    # proportional to true ≥64-char duplication, the output-sensitive
    # tail.
    sat = F.col("_l64") >= SUFFIX_CAP
    step2 = stepped.select(
        *keep, "_l64",
        F.when(sat, F.col("_sa")).otherwise(F.lit("")).alias("_ga"),
        F.when(sat, F.col("_sb")).otherwise(F.lit("")).alias("_gb"),
    )
    return step2.select(
        *keep,
        F.when(
            F.col("_l64") < SUFFIX_CAP, F.col("_l64").cast("long")
        ).otherwise(_exact_lcp("_ga", "_gb", "pa", "pb")).alias("_l"),
    )


def suffix_lrs(spark: SparkSession, sf: str) -> DataFrame:
    """Per document: exact longest-repeated-substring length (the longest
    prefix any of its suffixes shares with ANY other suffix in the whole
    corpus — cross-document or internal) and the count of its suffixes
    whose repeat is ≥ ``SUFFIX_DUP_MIN`` chars, over the first
    ``SUFFIX_CAP`` chars of each doc.

    The max-LCP-per-suffix identity: in suffix-array order, the longest
    prefix a suffix shares with any other suffix is the max of its LCP
    with its two SA NEIGHBORS — so the full pairwise structure collapses
    to n−1 adjacent pairs, each refined to an exact LCP by the binary
    substring chain (no joins — pairs come from a lag/lead window over
    the range-parted layout, see ``_per_suffix_direct``).
    """
    return _lrs_projection(_per_suffix_direct(spark, sf, SUFFIX_CAP))


def _lcp_cols(
    df: DataFrame, a: str, b: str, cap: int, out: str,
    pa: str | None = None, pb: str | None = None,
) -> DataFrame:
    """Append ``out`` = exact LCP of the (whole) suffix strings in columns
    ``a`` and ``b`` — the same binary refinement as ``_binary_lcp``, but
    built as log2(cap)+1 CHAINED PROJECTIONS (one running-offset column
    per step) instead of one composed expression.

    Why the difference is load-bearing here: each refinement step
    references the accumulated offset three times, so the composed
    expression tree grows ~3^steps; as a column chain every step
    references the previous step's ATTRIBUTE (evaluated once), and
    CollapseProject refuses to merge the projections (non-cheap output,
    multiply referenced), so generated code stays linear in the step
    count.  The composed form worked above a join (``_pair_lcp``), but
    placed in the projection between the two adjacency windows it made
    the whole-stage method exceed the JVM's 64 KB limit — Janino "Code
    grows beyond 64 KB", whole-stage fallback to interpreted evaluation,
    measured 187 s vs 0.4 s per fresh execution at sf1.  Even where the
    composed form compiled (above the full path's text joins), it
    EVALUATED the full ~3^7 tree per row — measured 24 s at sf1 for what
    the stepwise form does with 14 substring calls per row.

    ``pa``/``pb``: optional 1-based start-offset COLUMNS (suffix start
    within the document string); omitted means the strings are the
    suffixes themselves (offset 1)."""
    sa = F.col(pa) if pa else F.lit(1)
    sb = F.col(pb) if pb else F.lit(1)
    cur = df.withColumn(out, F.lit(0))
    k = cap
    while k >= 1:
        step = F.when(
            F.col(a).substr(sa + F.col(out), F.lit(k))
            == F.col(b).substr(sb + F.col(out), F.lit(k)),
            F.lit(k),
        ).otherwise(F.lit(0))
        cur = cur.withColumn(out, F.col(out) + step)
        k //= 2
    return cur


def _neighbor_max(step2: DataFrame, bnd: DataFrame):
    """m = max LCP with the two SA neighbors, assembled from the
    within-bucket lag/lead pair LCPs (``_lp``/``_ln``) plus the bucket-
    boundary pair LCPs (``_in`` for a bucket's first row, ``_out`` for
    its last — broadcast-joined on ``_bkt``).  ``_lp`` is NULL exactly on
    bucket-first rows and ``_ln`` exactly on bucket-last rows, so the
    boundary terms slot in precisely where the window pairs are missing.
    Rows where every term is NULL (a corpus with a single suffix) drop —
    matching the old pair-union construction, where such a suffix never
    appeared in any adjacent pair."""
    joined = step2.join(F.broadcast(bnd), "_bkt", "left")
    m = F.greatest(
        F.coalesce(F.col("_lp"), F.lit(-1)),
        F.coalesce(F.col("_ln"), F.lit(-1)),
        F.coalesce(F.when(F.col("_lp").isNull(), F.col("_in")), F.lit(-1)),
        F.coalesce(F.when(F.col("_ln").isNull(), F.col("_out")), F.lit(-1)),
    )
    return joined.select("doc_id", "pos", m.alias("m")).filter(
        F.col("m") >= 0
    )


def _per_suffix_direct(
    spark: SparkSession, sf: str, cap: int
) -> DataFrame:
    """(doc_id, pos, m) — for every suffix, the longest prefix it shares
    with ANY other suffix in the corpus (max LCP with its two SA
    neighbors), by WINDOW ADJACENCY over the range-parted suffix layout.

    The key identity: after ``_range_parted`` on the full suffix key,
    SA-adjacent pairs are *within buckets* (plus one boundary pair per
    consecutive nonempty bucket), so a ``lag`` window yields every
    adjacent pair with no global row_number, no SA self-join, and —
    because the capped document makes ``sfx`` the COMPLETE suffix — no
    text joins either: the LCP chain runs on the suffix column itself.
    The old shape (global sp → self-join on sp−1 → two doc-text joins →
    pair union → groupBy(doc,pos)) paid two n-row hash exchanges, a
    2(n−1)-row union aggregation, and re-ran the bucket sort twice; this
    shape pays one n-row ``_bkt`` exchange and two window passes over one
    sort.  The boundary pairs (≤ one per bucket) come from a min/max
    struct aggregation over the same binned relation — partial-agg
    collapses each scan partition to ≤ parts rows, so the branch costs a
    scan, not a sort.  Bucketization is LITERAL (driver-sampled boundary
    tuples embedded in the plan — ``_suffix_key_boundaries``), so the
    main and edge branches agree by construction and nothing needs the
    ``_range_parted`` persist: no sampling job, no range exchange, no
    corpus-wide DISK_ONLY write."""
    d = t(spark, sf, "documents").select(
        "doc_id", F.substring("text", 1, cap).alias("s")
    )
    pos0 = (
        d.select(
            "doc_id",
            F.posexplode(F.split(F.col("s"), "(?!^)")).alias("pos0", "ch"),
            "s",
        )
        .filter(F.col("ch") != "")  # trailing "" from split — see suffix_order
        .select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            F.col("s").substr(F.col("pos0") + 1, F.lit(cap)).alias("sfx"),
        )
    )
    bnds = _suffix_key_boundaries(spark, sf, cap, cap, _rank_parts(pos0))
    part = pos0.withColumn(
        "_bkt", _bkt_tuple_expr(bnds, "sfx", "doc_id", "pos")
    )
    w = Window.partitionBy("_bkt").orderBy("sfx", "doc_id", "pos")
    # remaining-length caps: sfx IS the whole capped suffix, so
    # len(sfx) == dlen − pos + 1 exactly — the old la−pa+1 / lb−pb+1
    lagged = part.withColumn("_psfx", F.lag("sfx").over(w))
    step1 = _lcp_cols(lagged, "_psfx", "sfx", cap, "_lc").withColumn(
        "_lp",
        F.when(F.col("_psfx").isNull(), F.lit(None).cast("long")).otherwise(
            F.least(
                F.col("_lc").cast("long"),
                F.length("_psfx"),
                F.length("sfx"),
            )
        ),
    )
    step2 = step1.withColumn("_ln", F.lead("_lp").over(w))
    # bucket-boundary pairs: per-bucket first/last suffix via min/max
    # struct (field order == sort order), LCP between consecutive
    # nonempty buckets' (last, next-first) — ≤ _rank_parts rows
    st = F.struct("sfx", "doc_id", "pos")
    edges = part.groupBy("_bkt").agg(
        F.min(st).alias("_f"), F.max(st).alias("_l")
    )
    wb = Window.orderBy("_bkt")
    e2 = edges.select(
        "_bkt",
        F.lag("_l").over(wb)["sfx"].alias("_psfx"),
        F.col("_f")["sfx"].alias("_fsfx"),
    )
    bnd = _lcp_cols(e2, "_psfx", "_fsfx", cap, "_elc").select(
        "_bkt",
        F.when(
            F.col("_psfx").isNull(), F.lit(None).cast("long")
        ).otherwise(
            F.least(
                F.col("_elc").cast("long"),
                F.length("_psfx"),
                F.length("_fsfx"),
            )
        ).alias("_in"),
    ).withColumn("_out", F.lead("_in").over(Window.orderBy("_bkt")))
    return _neighbor_max(step2, bnd)


def _per_suffix_ranked(
    spark: SparkSession, sf: str, ranks: DataFrame, cap: int,
    parts: int | None = None, n: int | None = None,
) -> DataFrame:
    """(doc_id, pos, m) — window-adjacency per-suffix max LCP over a
    prefix-doubling RANK relation (doc_id, pos, dlen, r).  Same shape as
    ``_per_suffix_direct`` but the relation carries no suffix strings, so
    each adjacent pair fetches both documents' capped text by doc_id join
    before the two-phase LCP (codegen chain to 64, Arrow refinement for
    the saturated long-duplicate tail — see ``_pair_lcp``).  The pair
    LCPs are projected NARROW before the ``lead`` window, so even when
    the text join breaks the ``_bkt`` partitioning (a shuffled join at
    scale), the window's re-exchange moves only (ints, long) rows, never
    document text.

    Bucketization is LITERAL here too: the rank relation is a union of
    already-materialized checkpoint pieces, so a cheap sample of it
    (``n`` is known exactly from the doubling loop) yields boundary
    tuples and the ``_range_parted`` persist disappears — both the main
    window branch and the edge-bounds branch re-scan the local pieces,
    which costs less than writing the relation to disk once."""
    if parts is None:
        parts = _rank_parts(ranks)
    frac = min(1.0, (parts * 64.0) / n) if n else 1.0
    bnds = sorted(
        (r["r"], r["doc_id"], r["pos"])
        for r in ranks.select("r", "doc_id", "pos")
        .sample(False, frac, 13)
        .collect()
    )
    bnds = [bnds[i * len(bnds) // parts] for i in range(1, parts)] if bnds else []
    part = ranks.withColumn(
        "_bkt", _bkt_tuple_expr(bnds, "r", "doc_id", "pos")
    )
    w = Window.partitionBy("_bkt").orderBy("r", "doc_id", "pos")
    prev = part.select(
        "_bkt", "r", "doc_id", "pos", "dlen",
        F.lag("doc_id").over(w).alias("_pd"),
        F.lag("pos").over(w).alias("_pp"),
        F.lag("dlen").over(w).alias("_pl"),
    )
    capd = t(spark, sf, "documents").select(
        "doc_id", F.substring("text", 1, cap).alias("s")
    )
    tb = capd.select(F.col("doc_id").alias("_tdb"), F.col("s").alias("_sb"))
    ta = capd.select(F.col("doc_id").alias("_tda"), F.col("s").alias("_sa"))
    # current row = b side (always present); prev row = a side (absent on
    # bucket-first rows: LEFT-join miss → blank string, chain 0, and the
    # da-NULL guard nulls the pair out — no Arrow work on blanks either)
    wt = (
        prev.join(tb, F.col("_tdb") == F.col("doc_id"))
        .join(ta, F.col("_tda") == F.col("_pd"), "left")
        .select(
            "_bkt", "r",
            F.col("_pd").alias("da"),
            F.coalesce(F.col("_pp"), F.lit(1)).alias("pa"),
            F.col("_pl").alias("la"),
            F.col("doc_id").alias("db"),
            F.col("pos").alias("pb"),
            F.col("dlen").alias("lb"),
            F.coalesce(F.col("_sa"), F.lit("")).alias("_sa"),
            "_sb",
        )
    )
    lcp = _pair_lcp(
        wt, cap, keep=["_bkt", "r", "da", "pa", "la", "db", "pb", "lb"]
    )
    step1 = lcp.select(
        "_bkt", "r",
        F.col("db").alias("doc_id"),
        F.col("pb").alias("pos"),
        F.when(F.col("da").isNull(), F.lit(None).cast("long")).otherwise(
            F.least(
                F.col("_l"),
                F.col("la") - F.col("pa") + 1,
                F.col("lb") - F.col("pb") + 1,
            )
        ).alias("_lp"),
    )
    w2 = Window.partitionBy("_bkt").orderBy("r", "doc_id", "pos")
    step2 = step1.withColumn("_ln", F.lead("_lp").over(w2))
    # bucket-boundary pairs, text attached per tiny pair row
    st = F.struct("r", "doc_id", "pos", "dlen")
    edges = part.groupBy("_bkt").agg(
        F.min(st).alias("_f"), F.max(st).alias("_l")
    )
    wb = Window.orderBy("_bkt")
    e2 = edges.select("_bkt", F.lag("_l").over(wb).alias("_pv"), "_f")
    pairs = e2.select(
        "_bkt",
        F.col("_pv")["doc_id"].alias("da"),
        F.coalesce(F.col("_pv")["pos"], F.lit(1)).alias("pa"),
        F.col("_pv")["dlen"].alias("la"),
        F.col("_f")["doc_id"].alias("db"),
        F.col("_f")["pos"].alias("pb"),
        F.col("_f")["dlen"].alias("lb"),
    )
    ewt = (
        pairs.join(tb, F.col("_tdb") == F.col("db"))
        .join(ta, F.col("_tda") == F.col("da"), "left")
        .withColumn("_sa", F.coalesce(F.col("_sa"), F.lit("")))
    )
    elcp = _pair_lcp(
        ewt, cap, keep=["_bkt", "da", "pa", "la", "db", "pb", "lb"]
    )
    bnd = elcp.select(
        "_bkt",
        F.when(F.col("da").isNull(), F.lit(None).cast("long")).otherwise(
            F.least(
                F.col("_l"),
                F.col("la") - F.col("pa") + 1,
                F.col("lb") - F.col("pb") + 1,
            )
        ).alias("_in"),
    ).withColumn("_out", F.lead("_in").over(Window.orderBy("_bkt")))
    return _neighbor_max(step2, bnd)


def _lrs_projection(per_suffix: DataFrame) -> DataFrame:
    """Per-document (lrs_len, n_dup_suffixes) over the shared per-suffix
    max-LCP relation."""
    return (
        per_suffix.groupBy("doc_id")
        .agg(
            F.max("m").cast("long").alias("lrs_len"),
            F.count(F.when(F.col("m") >= SUFFIX_DUP_MIN, 1))
            .cast("long")
            .alias("n_dup_suffixes"),
        )
        .orderBy("doc_id")
    )


def suffix_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT substring-dedup spans (the actual dedup product of Lee et
    al. 2022 §4.1 "ExactSubstr": remove every duplicated span ≥ a
    threshold, found via suffix array + adjacent LCP — here the merged
    per-document char intervals, over the first ``SUFFIX_CAP`` chars):
    each suffix whose neighbor-LCP ``m ≥ SUFFIX_DUP_MIN`` covers
    ``[pos, pos+m)``; overlapping/adjacent intervals merge; per doc the
    covered char total and merged span count.  ``dup_chars`` is exactly
    the byte count ExactSubstr would cut.

    Scale shape: the SA build is the shared machinery (one bounded-key
    range sort); the interval merge is a per-document window over ≤ cap
    rows — no skew risk regardless of corpus-wide duplication, because
    the partition key is doc_id, not the duplicated content."""
    ps = _per_suffix_direct(spark, sf, SUFFIX_CAP)
    iv = ps.filter(F.col("m") >= SUFFIX_DUP_MIN).select(
        "doc_id", "pos", (F.col("pos") + F.col("m")).alias("_e")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    # classic sorted interval merge: a row opens a NEW span when it
    # starts past the running max end of everything before it
    flagged = iv.select(
        "doc_id", "pos", "_e",
        (F.col("pos") > F.coalesce(F.max("_e").over(wprev), F.lit(-1)))
        .cast("int")
        .alias("_new"),
    )
    grouped = flagged.withColumn("_grp", F.sum("_new").over(wrun))
    spans = grouped.groupBy("doc_id", "_grp").agg(
        (F.max("_e") - F.min("pos")).alias("_len")
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.sum("_len").cast("long").alias("dup_chars"),
        F.count("*").cast("long").alias("n_spans"),
    )
    docs = t(spark, sf, "documents").select("doc_id")
    return (
        docs.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("dup_chars"), F.lit(0)).cast("long").alias("dup_chars"),
            F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
        )
        .orderBy("doc_id")
    )


def _sa_lcp_prefix(cap: int) -> str:
    """Shared DuckDB CTE chain ending at ``per_suffix`` (doc_id, pos, m):
    the direct capped-suffix sort (one window — the doubling loop is
    rank-order-equivalent, pinned by pytest), then the same binary
    substring-LCP chain per adjacent pair."""
    parts = [f"""
    WITH capd AS (SELECT doc_id, substring(text, 1, {cap}) AS s FROM documents),
    pos0 AS (
        SELECT doc_id, CAST(i AS BIGINT) AS pos, length(s) AS dlen,
               substring(s, i, {cap}) AS sfx
        FROM capd, LATERAL (SELECT unnest(range(1, length(s) + 1)) AS i)),
    sa AS (SELECT doc_id, pos, dlen,
                  row_number() OVER (ORDER BY sfx, doc_id, pos) AS sp
           FROM pos0),
    adj AS (
        SELECT x.doc_id AS da, x.pos AS pa, x.dlen AS la,
               y.doc_id AS db, y.pos AS pb, y.dlen AS lb
        FROM sa x JOIN sa y ON y.sp = x.sp + 1),
    l_init AS (
        SELECT adj.*, ta.s AS sa_, tb.s AS sb_, 0 AS l
        FROM adj
        JOIN capd ta ON ta.doc_id = adj.da
        JOIN capd tb ON tb.doc_id = adj.db)"""]
    cur = "l_init"
    k = cap
    step = 0
    while k >= 1:
        nxt = f"l_{step}"
        parts.append(f""",
    {nxt} AS (
        SELECT da, pa, la, db, pb, lb, sa_, sb_,
               l + CASE WHEN substring(sa_, pa + l, {k})
                             = substring(sb_, pb + l, {k})
                        THEN {k} ELSE 0 END AS l
        FROM {cur})""")
        cur = nxt
        k //= 2
        step += 1
    parts.append(f""",
    lcp AS (SELECT da, pa, db, pb,
                   least(l, la - pa + 1, lb - pb + 1) AS lcp
            FROM {cur}),
    suff AS (SELECT da AS doc_id, pa AS pos, lcp FROM lcp
             UNION ALL
             SELECT db AS doc_id, pb AS pos, lcp FROM lcp),
    per_suffix AS (SELECT doc_id, pos, max(lcp) AS m
                   FROM suff GROUP BY doc_id, pos)""")
    return "".join(parts)


def _lrs_sql(cap: int = SUFFIX_CAP, dup_min: int = SUFFIX_DUP_MIN) -> str:
    return _sa_lcp_prefix(cap) + f"""
    SELECT doc_id,
           CAST(max(m) AS BIGINT) AS lrs_len,
           CAST(count(CASE WHEN m >= {dup_min} THEN 1 END) AS BIGINT)
               AS n_dup_suffixes
    FROM per_suffix
    GROUP BY doc_id
    ORDER BY doc_id"""


def _dedup_sql(cap: int = SUFFIX_CAP, dup_min: int = SUFFIX_DUP_MIN) -> str:
    """Twin of :func:`suffix_dedup`: identical interval algebra (open a
    span at pos > running-max end, merge, sum covered chars)."""
    return _sa_lcp_prefix(cap) + f""",
    iv AS (SELECT doc_id, pos, pos + m AS e
           FROM per_suffix WHERE m >= {dup_min}),
    flagged AS (
        SELECT doc_id, pos, e,
               CASE WHEN pos > coalesce(max(e) OVER (
                        PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ), -1) THEN 1 ELSE 0 END AS is_new
        FROM iv),
    grouped AS (
        SELECT doc_id, pos, e,
               SUM(is_new) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        FROM flagged),
    spans AS (SELECT doc_id, grp, max(e) - min(pos) AS len
              FROM grouped GROUP BY doc_id, grp)
    SELECT d.doc_id,
           CAST(coalesce(sum(s.len), 0) AS BIGINT) AS dup_chars,
           CAST(count(s.grp) AS BIGINT) AS n_spans
    FROM documents d LEFT JOIN spans s ON s.doc_id = d.doc_id
    GROUP BY d.doc_id
    ORDER BY d.doc_id"""


SUFFIX_LRS_SQL = _lrs_sql()
SUFFIX_DEDUP_SQL = _dedup_sql()

#: full-text path bound: a power of two ≥ every synthetic corpus doc
#: (max measured 577 chars at sf0.1) — so "capped at 1024" IS the whole
#: document, and the doubling loop runs its real multi-round schedule
#: (log2(1024) = 10 rounds max, early-exiting when ranks individuate)
SUFFIX_FULL_CAP = 1024


def suffix_lrs_full(spark: SparkSession, sf: str) -> DataFrame:
    """``suffix_lrs`` over FULL document text, built on the PREFIX-
    DOUBLING suffix order (``suffix_order``) instead of the direct
    capped-suffix sort — the end-to-end proof of the scale path the
    64-char registry entry declares as its long-string fallback.

    Why doubling here: with full documents as sort keys, the direct path
    would exchange O(corpus x doc_len) bytes of materialized suffix
    strings; the doubling loop exchanges only (doc_id, pos, rank) rows
    per round — at 100 TB that is the difference between shuffling the
    corpus times its context length and shuffling log2(len) narrow
    integer relations (the published MapReduce SA recipe).

    Duplicate documents keep ranks tied through every round (their
    suffixes are identical strings), so the loop runs to the cap bound;
    the deterministic (r, doc_id, pos) row-number then breaks those ties
    exactly like the oracle's ORDER BY sfx, doc_id, pos.  Output schema
    and semantics match ``suffix_lrs`` — only the cap differs."""
    ranks, n, _m = suffix_order(
        spark, sf, cap=SUFFIX_FULL_CAP, seed=SUFFIX_CAP, with_classes=False
    )
    parts = max(4, min(_rank_parts(ranks), 1 + n // 20_000))
    return _lrs_projection(
        _per_suffix_ranked(spark, sf, ranks, SUFFIX_FULL_CAP, parts, n=n)
    )


SUFFIX_LRS_FULL_SQL = _lrs_sql(cap=SUFFIX_FULL_CAP)
