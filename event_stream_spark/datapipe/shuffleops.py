"""Deterministic corpus ordering — global shuffle and exact-size sampling.

Training-data pipelines need a *reproducible* global shuffle of the corpus
before sequence packing (so that shard N of the shuffled corpus is
bit-identical across rebuilds) and exact-k uniform samples for eval slices.
Both are expressed as pure hash arithmetic on ``md5(doc_id, seed)`` — the
same engine-portable bucket family as ``corpus_mix``/``corpus_split``
(datapipe/corpusops.py, datapipe/splits.py) — so membership and order are
stable across runs, engines, and cluster sizes.

- ``corpus_shuffle``: assigns every document its position in the seeded
  random permutation.  A naive ``row_number() OVER (ORDER BY hash)`` is a
  single-partition window — the classic 100 TB scale-killer — so the rank
  is computed with the standard two-phase distributed scheme: hash keys are
  bucketed by their first byte, per-bucket counts (256 rows) turn into
  cumulative offsets on the driver-scale side, and the global position is
  ``offset(bucket) + row_number() within bucket``.  The only exchanges over
  corpus-sized data are one hash-partition on ``bucket`` (the rank window)
  and the presentation range-sort; the ordering (bucket, key) == (key)
  because the bucket is a prefix of the key.

- ``corpus_sample``: exact-k deterministic uniform sample = top-k by the
  seeded hash.  Spark executes this as TakeOrderedAndProject (per-partition
  heaps, no global sort) — plan-gated in tests/test_plans.py.

No reference twin: the reference streams blocks in height order and never
reorders (SURVEY.md §2.6); these are §2.12 training-data extensions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from event_stream_spark.queries import t

#: permutation seed — part of the output contract (reproducible shards)
SHUFFLE_SEED = 42
#: sample seed kept distinct from the shuffle seed so the sampled slice is
#: not just the head of the shuffled corpus
SAMPLE_SEED = 7
SAMPLE_K = 500


def _shuffle_key(doc_id: Column, seed: int) -> Column:
    """Seeded permutation key: md5 over ``<doc_id>:<seed>`` — identical
    string arithmetic in Spark and DuckDB (lowercase hex)."""
    return F.md5(F.concat(doc_id.cast("string"), F.lit(f":{seed}")))


def corpus_shuffle(spark: SparkSession, sf: str, seed: int = SHUFFLE_SEED) -> DataFrame:
    """(doc_id, pos) — position of each document in the seeded permutation.

    Scale shape: per-bucket counts are a 256-group partial aggregate (one
    tiny exchange); the cumulative-offset window runs over those 256 rows
    only; the corpus-sized rank window is hash-partitioned on ``bucket``.
    Nothing corpus-sized ever passes through a SinglePartition operator
    except the final presentation sort's range exchange.
    """
    d = t(spark, sf, "documents")
    key = _shuffle_key(F.col("doc_id"), seed)
    keyed = d.select("doc_id", key.alias("k"),
                     F.conv(F.substring(key, 1, 2), 16, 10).cast("int").alias("bucket"))
    counts = keyed.groupBy("bucket").agg(F.count("*").alias("n"))
    # 256 rows: the unpartitioned cumsum window is driver-scale by design
    w_off = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "bucket", F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("offset")
    )
    w_rank = Window.partitionBy("bucket").orderBy("k", "doc_id")
    return (
        keyed.withColumn("r", F.row_number().over(w_rank))
        .join(F.broadcast(offsets), "bucket")
        .select("doc_id", (F.col("offset") + F.col("r")).alias("pos"))
        .orderBy("pos")
    )


CORPUS_SHUFFLE_SQL = f"""
    SELECT doc_id,
           row_number() OVER (ORDER BY md5(doc_id::VARCHAR || ':{SHUFFLE_SEED}'),
                              doc_id) AS pos
    FROM documents
    ORDER BY pos
"""


def corpus_sample(
    spark: SparkSession, sf: str, k: int = SAMPLE_K, seed: int = SAMPLE_SEED
) -> DataFrame:
    """(doc_id, lang, sample_key) — exact-k deterministic uniform sample.

    Scale shape: ``ORDER BY hash LIMIT k`` compiles to
    TakeOrderedAndProject — each task keeps a k-row heap, the driver merges
    num_partitions × k rows; no corpus-wide sort, no full shuffle.
    """
    d = t(spark, sf, "documents")
    key = _shuffle_key(F.col("doc_id"), seed)
    return (
        d.select("doc_id", "lang", key.alias("sample_key"))
        .orderBy("sample_key", "doc_id")
        .limit(k)
    )


CORPUS_SAMPLE_SQL = f"""
    SELECT doc_id, lang, md5(doc_id::VARCHAR || ':{SAMPLE_SEED}') AS sample_key
    FROM documents
    ORDER BY sample_key, doc_id
    LIMIT {SAMPLE_K}
"""
