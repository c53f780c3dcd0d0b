"""Corpus splitting and exact distributed heavy hitters — §2.12
training-data pipeline extensions.

- ``corpus_split``: deterministic hash-assigned train/val/test splits.  The
  assignment is pure per-row arithmetic on ``md5(doc_id)`` (same bucket
  family as ``corpus_mix``), so membership is stable across runs, engines,
  and re-shards — the property a training pipeline needs so that no
  validation document ever drifts into train when the corpus is rebuilt.

- ``heavy_hitters``: all tokens with global count > n/K, computed EXACTLY
  without ever shuffling the full token-key set: a per-partition
  Misra-Gries sketch (capacity K, batched decrements) proposes candidates —
  a guaranteed superset of the true hitters, since a word with global count
  > n/(K+1) must exceed the per-partition threshold in at least one
  partition — and a second pass exact-counts ONLY candidate occurrences.
  The classic sketch-then-verify shape for 100 TB frequency analysis
  (Misra & Gries 1982; Manku & Motwani's lossy counting is the same idea).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_stream_spark.datapipe.corpusops import _sample_bucket
from event_stream_spark.datapipe.text import word_rows, words
from event_stream_spark.queries import t

#: split boundaries on the 0..9999 md5 bucket: 80% train / 10% val / 10% test
SPLIT_TRAIN_LT = 8000
SPLIT_VAL_LT = 9000

#: Misra-Gries sketch capacity = the heavy-hitter threshold divisor
HH_K = 200


def corpus_split(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, lang, split) — deterministic 80/10/10 assignment.

    Scale shape: a narrow projection, zero shuffles (the trailing ORDER BY
    is presentation-only) — runs at scan speed on any corpus size, and the
    same expression doubles as a partition column for a split-materialized
    lake layout."""
    d = t(spark, sf, "documents")
    b = _sample_bucket(F.col("doc_id"))
    split = (
        F.when(b < SPLIT_TRAIN_LT, F.lit("train"))
        .when(b < SPLIT_VAL_LT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return d.select("doc_id", "lang", split.alias("split")).orderBy("doc_id")


CORPUS_SPLIT_SQL = f"""
    SELECT doc_id, lang,
           CASE WHEN bucket < {SPLIT_TRAIN_LT} THEN 'train'
                WHEN bucket < {SPLIT_VAL_LT} THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, lang,
                 ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                 % 10000 AS bucket
          FROM documents)
    ORDER BY doc_id
"""


def _mg_candidates(k: int):
    """mapInPandas worker: one Misra-Gries summary per partition, batched —
    counts merge via ``value_counts`` and the shrink-to-k step subtracts the
    (k+1)-th largest counter from all (equivalent to that many classic
    decrement rounds, so the MG frequency guarantee is preserved)."""

    def gen(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        n_tokens = 0  # the partition's exact token count rides along (r11):
        # the kernel already sees every token, so emitting the tally here
        # deletes what used to be a THIRD full corpus scan+explode just for
        # the global total (guide §2.4 — don't recompute what a pass
        # already knows)
        for pdf in pdfs:
            n_tokens += len(pdf)
            for w, c in pdf["w"].value_counts().items():
                counters[w] = counters.get(w, 0) + int(c)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {w: c - cut for w, c in counters.items() if c > cut}
        words = list(counters)
        yield pd.DataFrame(
            {"word": words + [None], "n_tokens": [None] * len(words) + [n_tokens]}
        )

    return gen


def heavy_hitters(spark: SparkSession, sf: str, k: int = HH_K) -> DataFrame:
    """(word, cnt) for every token with global count > n/k, exact.

    Scale shape: pass 1 shuffles at most k candidate words per partition
    (the MG summaries) PLUS one exact per-partition token tally — so the
    global total needs no pass of its own (pre-r11 this was a third full
    scan+explode of the corpus; guide §2.4); pass 2 broadcast-semi-joins
    the (tiny) candidate union against the token stream and aggregates only
    candidate occurrences.  The total-count side is a 1-row aggregate
    joined in as a broadcast scalar — an O(n × 1) plan-shape, not a real
    nested loop.  The MG summary relation is k·partitions rows, persisted
    per execution so its two consumers (candidates, total) run the Python
    pass once.  Output is exact (the sketch only proposes; the verify
    pass counts), so the DuckDB GROUP BY/HAVING twin hash-matches."""
    d = t(spark, sf, "documents")
    tokens = word_rows(d).select("w")
    summ = tokens.mapInPandas(
        _mg_candidates(k), "word string, n_tokens long"
    ).persist()
    cand = summ.filter(F.col("word").isNotNull()).select("word").distinct()
    total = summ.agg(F.sum("n_tokens").alias("n_tokens"))
    return (
        tokens.join(F.broadcast(cand), tokens["w"] == cand["word"])
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") > F.col("n_tokens") / k)
        .select("word", "cnt")
        .orderBy(F.desc("cnt"), F.asc("word"))
    )


HEAVY_HITTERS_SQL = f"""
    WITH tokens AS (
        SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  x -> x <> '')) AS word
        FROM documents
    )
    SELECT word, count(*) AS cnt
    FROM tokens
    GROUP BY word
    HAVING count(*) > (SELECT count(*) FROM tokens) / {HH_K}
    ORDER BY cnt DESC, word ASC
"""


def write_corpus_lake(spark: SparkSession, sf: str, path: str) -> None:
    """Materialize the curated corpus as a (lang, split)-partitioned lake —
    the layout the downstream trainer reads.

    Every consumer query is keyed by language and/or split ("give me the
    non-English train shard"), so those become physical partition columns:
    a per-language or per-split read prunes at PLAN time to its directories
    and never opens the rest — the same prune-before-read stance as
    ``write_block_lake`` (height buckets) and ``write_ivf_lake``
    (IVF lists).  ``split`` is the deterministic md5 assignment from
    :func:`corpus_split`, so a rebuild lands every document in the same
    partition."""
    d = t(spark, sf, "documents")
    b = _sample_bucket(F.col("doc_id"))
    split = (
        F.when(b < SPLIT_TRAIN_LT, F.lit("train"))
        .when(b < SPLIT_VAL_LT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    d.withColumn("split", split).write.mode("overwrite").partitionBy(
        "lang", "split"
    ).parquet(f"{path}/documents")


def read_corpus_lake(
    spark: SparkSession, path: str, *, lang: str | None = None, split: str | None = None
) -> DataFrame:
    """Partition-pruned corpus read: lang/split predicates land in
    PartitionFilters (asserted in ``test_plans.py``)."""
    df = spark.read.parquet(f"{path}/documents")
    if lang is not None:
        df = df.filter(F.col("lang") == lang)
    if split is not None:
        df = df.filter(F.col("split") == split)
    return df


#: shard_balance: training shards to fill, and parallel ranking substrata
N_SHARDS = 8
BALANCE_SUBSTRATA = 16


def shard_balance(spark: SparkSession, sf: str) -> DataFrame:
    """Token-balanced training-shard assignment + the balance report.

    Production shard assignment is usually ``hash(doc) % N`` — balanced in
    expectation but with a token-count variance that long-document corpora
    feel (a shard that draws the books runs long; data-parallel training
    stalls on the slowest shard).  This operator does deterministic
    serpentine (boustrophedon) assignment instead: within each substratum,
    docs ranked by token count descending are dealt to shards
    0,1,..,N-1,N-1,..,1,0,0,1,.. — each consecutive block of 2N docs gives
    every shard exactly two docs, one from each end of the size ranking,
    so per-shard token totals track the substratum mean by construction.

    Scale shape: the ranking window is partitioned by
    ``doc_id % BALANCE_SUBSTRATA`` — NOT a global sort (the plan-gate
    stance of ``packing.py``): substrata rank in parallel, each bounded to
    corpus/16, and the serpentine balances within every substratum
    independently, so the per-shard totals still converge (measured skew
    <1% at sf0.01).  At 100 TB you raise BALANCE_SUBSTRATA so a stratum
    fits an executor scan.  The report aggregate shuffles N_SHARDS keys.
    """
    from pyspark.sql import Window

    d = t(spark, sf, "documents")
    n_words = F.size(words(F.col("text")))
    sub = (F.col("doc_id") % BALANCE_SUBSTRATA).alias("sub")
    ranked = d.select("doc_id", n_words.alias("n_tokens"), sub).withColumn(
        "r",
        F.row_number().over(
            Window.partitionBy("sub").orderBy(
                F.desc("n_tokens"), F.asc("doc_id")
            )
        )
        - 1,
    )
    fold = F.col("r") % (2 * N_SHARDS)
    shard = F.when(fold < N_SHARDS, fold).otherwise(2 * N_SHARDS - 1 - fold)
    # mirror the deal on odd substrata: a substratum's final PARTIAL block
    # shorts the shards at the far end of its deal direction; alternating
    # the direction per substratum spreads that deficit over both ends
    shard = F.when(F.col("sub") % 2 == 0, shard).otherwise(
        N_SHARDS - 1 - shard
    )
    assigned = ranked.select(
        "doc_id", "n_tokens", shard.cast("long").alias("shard")
    )
    # referenced twice (the mean aggregate and the final join);
    # unpersisted, each reference re-executes the corpus-wide ranking
    # window.  N_SHARDS rows — persisted per execution.
    report = assigned.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("tokens"),
    ).persist()
    mean_tokens = report.agg(
        (F.sum("tokens") / F.count("*")).alias("mean_tokens")
    )
    return (
        report.join(F.broadcast(mean_tokens))
        .select(
            "shard",
            "n_docs",
            "tokens",
            F.round(F.col("tokens") / F.col("mean_tokens"), 6).alias("balance"),
        )
        .orderBy("shard")
    )


SHARD_BALANCE_SQL = f"""
    WITH toks AS (
        SELECT doc_id,
               len(list_filter(string_split_regex(lower(text), '\\s+'),
                               x -> x <> '')) AS n_tokens,
               doc_id % {BALANCE_SUBSTRATA} AS sub
        FROM documents),
    ranked AS (
        SELECT doc_id, n_tokens, sub,
               row_number() OVER (PARTITION BY sub
                                  ORDER BY n_tokens DESC, doc_id) - 1 AS r
        FROM toks),
    dealt AS (
        SELECT doc_id, n_tokens, sub,
               CASE WHEN r % {2 * N_SHARDS} < {N_SHARDS} THEN r % {2 * N_SHARDS}
                    ELSE {2 * N_SHARDS - 1} - r % {2 * N_SHARDS} END AS shard0
        FROM ranked),
    assigned AS (
        SELECT doc_id, n_tokens,
               CASE WHEN sub % 2 = 0 THEN shard0
                    ELSE {N_SHARDS - 1} - shard0 END AS shard
        FROM dealt),
    report AS (
        SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS tokens
        FROM assigned GROUP BY shard)
    SELECT shard, n_docs, tokens,
           round(tokens / (SELECT sum(tokens) / count(*) FROM report), 6)
             AS balance
    FROM report ORDER BY shard
"""
