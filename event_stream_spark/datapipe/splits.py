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
from event_stream_spark.datapipe.text import word_rows
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
        for pdf in pdfs:
            for w, c in pdf["w"].value_counts().items():
                counters[w] = counters.get(w, 0) + int(c)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {w: c - cut for w, c in counters.items() if c > cut}
        yield pd.DataFrame({"word": list(counters)})

    return gen


def heavy_hitters(spark: SparkSession, sf: str, k: int = HH_K) -> DataFrame:
    """(word, cnt) for every token with global count > n/k, exact.

    Scale shape: pass 1 shuffles at most k candidate words per partition
    (the MG summaries), never the full key set; pass 2 broadcast-semi-joins
    the (tiny) candidate union against the token stream and aggregates only
    candidate occurrences.  The total-count side is a 1-row aggregate
    joined in as a broadcast scalar — an O(n × 1) plan-shape, not a real
    nested loop.  Output is exact (the sketch only proposes; the verify
    pass counts), so the DuckDB GROUP BY/HAVING twin hash-matches."""
    d = t(spark, sf, "documents")
    tokens = word_rows(d).select("w")
    cand = (
        tokens.mapInPandas(_mg_candidates(k), "word string")
        .select("word")
        .distinct()
    )
    total = tokens.agg(F.count("*").alias("n_tokens"))
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
