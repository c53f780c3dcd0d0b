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

Scale shape: the probe side of an ER job is small (a dirty ingest batch
vs a master of 10⁹+), so its exploded key set broadcasts and the master
segment relation — 2(k+1) short rows per master string — streams through a
broadcast hash join with NO shuffle of the master; the only exchange is the
final distinct over candidate pairs, linear in candidates.
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
                rows.append(
                    F.struct(
                        l.alias("l"),
                        F.lit(i).alias("seg_id"),
                        F.substring(F.col(text), start0 + shift, seglen).alias(
                            "seg"
                        ),
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


def fuzzy_match(
    master: DataFrame,
    probes: DataFrame,
    *,
    text: str,
    key: str,
    k: int = 1,
) -> DataFrame:
    """(p_key, m_key, dist) for every (probe, master) pair with
    ``levenshtein <= k`` and different keys; each pair exactly once."""
    seg = _master_segments(master, text, key, k)
    pk = _probe_keys(probes, text, key, k)
    cand = (
        seg.join(F.broadcast(pk), ["l", "seg_id", "seg"])
        .filter(F.col("m_key") != F.col("p_key"))
        .select("p_key", "p_text", "m_key", "m_text")
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
