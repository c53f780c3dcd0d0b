"""Fuzzy string matching (entity resolution): find master-table strings
within edit distance k of each probe string, without an all-pairs
levenshtein scan.

PassJoin-style segment blocking (Li, Deng, Feng — "PASS-JOIN: a
partition-based method for similarity joins", PVLDB 5(3), 2011):

- every master string of length l is partitioned into k+1 contiguous
  segments; by pigeonhole, any string within edit distance k contains at
  least one segment VERBATIM, at a start position shifted by at most k;
- probes therefore generate, for each master length l in [len-k, len+k]
  and each segment spec of l, the substrings at start shifts [-k, +k] —
  a constant ≤ (2k+1)²(k+1) candidate keys per probe;
- candidates = equi-join on (length, segment id, segment text);
  ``levenshtein() <= k`` verifies survivors (candidate count is
  output-sensitive, never |probe|×|master|).

Scale shape: the probe side of an ER job is usually small (a dirty ingest
batch vs a master of 10⁹+); pass ``broadcast_probes=True`` to assert that
and its exploded key set broadcasts so the master segment relation —
2(k+1) short rows per master string — streams through a broadcast hash
join with NO shuffle of the master; the only exchange is the final
distinct over candidate pairs, linear in candidates.  With the default
``broadcast_probes=None`` no hint is forced and AQE picks the strategy
from runtime stats, so a large probe batch degrades to a sort-merge join
instead of OOMing the driver on a forced broadcast.

Completeness edge (strings shorter than k+1 chars): floor-splitting a
master of length l ≤ k leaves at least one empty segment, so the
pigeonhole guarantee breaks and segment blocking can miss matches (e.g.
master "a" vs probe "bc" at k=2).  Those masters take a separate path:
their distinct texts form a provably bounded relation (≤ |Σ|^k strings
exist at length ≤ k), expanded per compatible probe length and
equi-joined on length — hash joins only, never a nested loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _master_segments(df: DataFrame, text: str, key: str, k: int) -> DataFrame:
    """(key, text, l, seg_id, seg) — k+1 contiguous segments per string."""
    l = F.length(text)
    segs = []
    m = k + 1
    for i in range(m):
        # floor-split: seg i covers [i*l/m, (i+1)*l/m)
        start = (l * i / m).cast("int") + 1
        seglen = (l * (i + 1) / m).cast("int") - (l * i / m).cast("int")
        segs.append(
            F.struct(
                F.lit(i).alias("seg_id"),
                F.substring(F.col(text), start, seglen).alias("seg"),
            )
        )
    return (
        df.select(
            F.col(key).alias("m_key"),
            F.col(text).alias("m_text"),
            l.alias("l"),
            F.explode(F.array(*segs)).alias("s"),
        )
        .select("m_key", "m_text", "l", F.col("s.seg_id"), F.col("s.seg"))
        .filter(F.col("seg") != "")
    )


def _probe_keys(df: DataFrame, text: str, key: str, k: int) -> DataFrame:
    """(key, text, l, seg_id, seg) — candidate substrings for every master
    length within ±k and every segment spec, at start shifts [-k, +k]."""
    m = k + 1
    lt = F.length(text)
    rows = []
    for dl in range(-k, k + 1):  # master length l = len(probe) + dl
        l = lt + dl
        for i in range(m):
            start0 = (l * i / m).cast("int") + 1
            seglen = (l * (i + 1) / m).cast("int") - (l * i / m).cast("int")
            for shift in range(-k, k + 1):
                # a segment occurrence starts at position >= 1; shifts that
                # land before that have no valid occurrence (and Spark would
                # read pos<=0 as from-the-END, generating junk candidates)
                start = start0 + shift
                rows.append(
                    F.struct(
                        l.alias("l"),
                        F.lit(i).alias("seg_id"),
                        F.when(
                            start >= 1,
                            F.substring(F.col(text), start, seglen),
                        ).alias("seg"),
                    )
                )
    return (
        df.select(
            F.col(key).alias("p_key"),
            F.col(text).alias("p_text"),
            F.explode(F.array_distinct(F.array(*rows))).alias("c"),
        )
        .select("p_key", "p_text", F.col("c.l"), F.col("c.seg_id"), F.col("c.seg"))
        .filter(F.col("seg") != "")
    )


def _short_master_pairs(
    master: DataFrame, probes: DataFrame, *, text: str, key: str, k: int
) -> DataFrame:
    """Candidate (probe, master) pairs for masters of length <= k, where
    segment blocking loses its pigeonhole guarantee.

    The distinct short texts are a bounded domain (≤ |Σ|^k strings exist at
    length ≤ k — a few thousand at k=2 over ASCII), so they broadcast by
    construction; each is expanded to every compatible probe length
    (|len(p) - l| <= k, so len(p) <= 2k) and equi-joined on length — a
    BroadcastHashJoin, never a nested loop.  At 10⁹ masters this relation
    stays tiny; the key-attach join back to master rows is linear in the
    (rare) short-master count.
    """
    l = F.length(text)
    short = master.filter(l <= k).select(
        F.col(key).alias("m_key"), F.col(text).alias("m_text")
    )
    expanded = (
        short.select("m_text")
        .distinct()
        .select(
            "m_text",
            F.explode(
                F.sequence(
                    F.greatest(F.lit(0), F.length("m_text") - k),
                    F.length("m_text") + k,
                )
            ).alias("pl"),
        )
    )
    hits = (
        probes.select(
            F.col(key).alias("p_key"),
            F.col(text).alias("p_text"),
            F.length(text).alias("pl"),
        )
        .join(F.broadcast(expanded), "pl")
        .filter(F.levenshtein("p_text", "m_text") <= k)
        .select("p_key", "p_text", "m_text")
    )
    return hits.join(short, "m_text").select("p_key", "p_text", "m_key", "m_text")


def fuzzy_match(
    master: DataFrame,
    probes: DataFrame,
    *,
    text: str,
    key: str,
    k: int = 1,
    broadcast_probes: bool | None = None,
) -> DataFrame:
    """(p_key, m_key, dist) for every (probe, master) pair with
    ``levenshtein <= k`` and different keys; each pair exactly once.

    ``broadcast_probes=True`` asserts the probe batch is small and forces
    its exploded key set through a broadcast (the classic ER shape: dirty
    batch vs huge master).  Default ``None`` leaves the strategy to
    Catalyst/AQE so a large probe batch cannot OOM on a forced hint.
    """
    seg = _master_segments(master.filter(F.length(text) > k), text, key, k)
    pk = _probe_keys(probes, text, key, k)
    if broadcast_probes:
        pk = F.broadcast(pk)
    # masters of length > k: PassJoin segment blocking (pigeonhole-complete);
    # masters of length <= k: bounded-domain direct pass — disjoint by
    # construction, so the union never double-counts a pair
    cand = (
        seg.join(pk, ["l", "seg_id", "seg"])
        .select("p_key", "p_text", "m_key", "m_text")
        .unionByName(
            _short_master_pairs(master, probes, text=text, key=key, k=k)
        )
        .filter(F.col("m_key") != F.col("p_key"))
        .distinct()
    )
    return (
        cand.select(
            "p_key",
            "m_key",
            F.levenshtein("p_text", "m_text").alias("dist"),
        )
        .filter(F.col("dist") <= k)
        .orderBy("p_key", "m_key")
    )
