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

from event_stream_spark.datapipe.corpusops import _sample_bucket
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


# ---------------------------------------------------------------------------
# Temperature-based mixture resampling
# ---------------------------------------------------------------------------

MIX_TEMP = 2.0  # T > 1 flattens the language distribution (upsamples rare)


def corpus_temp_mix(spark: SparkSession, sf: str, temp: float = MIX_TEMP) -> DataFrame:
    """Temperature-based multilingual mixture resampling (the mBERT/XLM-R
    recipe): target language share ∝ n_lang^(1/T), realized as a per-doc
    repeat factor f = p_lang · N / n_lang — integer copies plus one extra
    copy with probability frac(f), decided by the deterministic md5 bucket
    (same family as ``corpus_split``, so membership is engine- and
    re-shard-stable).  Emits one row per (doc_id, copy).

    Scale shape: fully relational — the per-language counts are one
    map-side-combined aggregation to ≤|langs| rows, the factor table
    broadcast-joins back (never shuffles the corpus), and copy expansion is
    a codegen ``explode(sequence)``; output volume is Σ f·n ≈ N by
    construction.  f is rounded to 4 dp and the extra-copy threshold is an
    integer bucket compare, so the decision cannot split on last-ulp
    ``pow`` differences between engines."""
    d = t(spark, sf, "documents")
    # referenced twice (the Z/N totals and the factor table); unpersisted,
    # each reference re-executes the corpus-wide language count.
    # |langs| rows — persisted per execution.
    counts = d.groupBy("lang").agg(F.count("*").alias("n")).persist()
    tot = counts.agg(
        F.sum(F.pow(F.col("n").cast("double"), 1.0 / temp)).alias("z"),
        F.sum("n").alias("big_n"),
    )
    fac = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.round(
            F.pow(F.col("n").cast("double"), 1.0 / temp)
            / F.col("z")
            * F.col("big_n").cast("double")
            / F.col("n").cast("double"),
            4,
        ).alias("f"),
    )
    base = F.floor("f").cast("int")
    thr = F.round((F.col("f") - base) * 10000).cast("long")
    copies = (base + (_sample_bucket(F.col("doc_id")) < thr).cast("int")).alias(
        "copies"
    )
    return (
        d.select("doc_id", "lang")
        .join(F.broadcast(fac), "lang")
        .select("doc_id", "lang", copies)
        .filter(F.col("copies") > 0)
        .select(
            "doc_id",
            "lang",
            F.explode(F.sequence(F.lit(1), F.col("copies"))).alias("copy"),
        )
        .orderBy("doc_id", "copy")
    )


CORPUS_TEMP_MIX_SQL = f"""
    WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    tot AS (SELECT sum(pow(n::DOUBLE, 1.0 / {MIX_TEMP})) AS z,
                   sum(n) AS big_n FROM c),
    fac AS (
        SELECT lang,
               round(pow(n::DOUBLE, 1.0 / {MIX_TEMP}) / z
                     * big_n::DOUBLE / n::DOUBLE, 4) AS f
        FROM c CROSS JOIN tot
    ),
    cp AS (
        SELECT d.doc_id, d.lang,
               CAST(floor(f) AS INT)
               + CASE WHEN ('0x' || substring(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT
                           % 10000
                           < CAST(round((f - floor(f)) * 10000) AS BIGINT)
                      THEN 1 ELSE 0 END AS copies
        FROM documents d JOIN fac USING (lang)
    )
    SELECT doc_id, lang, unnest(range(1, copies + 1)) AS copy
    FROM cp WHERE copies > 0
    ORDER BY doc_id, copy
"""


# ---------------------------------------------------------------------------
# Stratified exact-k sampling
# ---------------------------------------------------------------------------

STRAT_K = 20  # per-language sample size


def corpus_sample_stratified(
    spark: SparkSession, sf: str, k: int = STRAT_K, seed: int = SAMPLE_SEED
) -> DataFrame:
    """Exact-k deterministic uniform sample PER LANGUAGE (the eval-set /
    annotation-batch construction shape: equal representation per stratum
    regardless of corpus skew), via a hash-ranked window per lang.

    Scale shape: one hash exchange on the lang key; each group ranks by the
    seeded md5 permutation key and keeps k rows.  Strata are independent —
    at 100 TB a hot language is one window partition, and AQE's skew
    handling splits it; no global sort, no cross-strata coordination.
    Deterministic: same seed → same sample under any partitioning, because
    the rank key is a pure function of doc_id.
    """
    from pyspark.sql import Window

    d = t(spark, sf, "documents")
    key = _shuffle_key(F.col("doc_id"), seed)
    w = Window.partitionBy("lang").orderBy("sample_key", "doc_id")
    return (
        d.select("doc_id", "lang", key.alias("sample_key"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("doc_id", "lang", "sample_key", "rn")
        .orderBy("lang", "rn")
    )


CORPUS_SAMPLE_STRAT_SQL = f"""
    SELECT doc_id, lang, sample_key, rn
    FROM (
        SELECT doc_id, lang,
               md5(doc_id::VARCHAR || ':{SAMPLE_SEED}') AS sample_key,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY md5(doc_id::VARCHAR || ':{SAMPLE_SEED}'),
                                           doc_id) AS rn
        FROM documents
    )
    WHERE rn <= {STRAT_K}
    ORDER BY lang, rn
"""


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis)
# ---------------------------------------------------------------------------

WSAMPLE_K = 200
WSAMPLE_SEED = 13


def corpus_sample_weighted(
    spark: SparkSession, sf: str, k: int = WSAMPLE_K, seed: int = WSAMPLE_SEED
) -> DataFrame:
    """Exact-k WEIGHTED sample without replacement (Efraimidis &
    Spirakis 2006): each doc draws u ~ U(0,1) from its md5 and competes
    with key u^(1/w) — the top-k keys are a weighted sample where
    P(selected) tracks weight w (here w = n_chars: length-proportional
    sampling, the "sample by token budget" shape; swap any positive score
    in).  Implemented in the monotone-equivalent log form ln(u)/w — one
    ``ln`` per row instead of ``pow`` — integer-scaled ×1e6 and rounded
    to a WHOLE number (the lm_score ln contract: absorbs last-ulp libm
    drift between engines), ties broken by doc_id.

    Scale shape: ORDER BY key LIMIT k compiles to TakeOrderedAndProject —
    per-task k-row heaps, no corpus sort, no full shuffle (plan-gated for
    the uniform sibling; same physical shape)."""
    d = t(spark, sf, "documents")
    # u in (0, 1]: (h + 1) / 2^32 over the first 8 md5 hex chars
    h = F.conv(
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"),
                                   F.lit(f":{seed}"))), 1, 8),
        16, 10,
    ).cast("long")
    u = (h + 1) / F.lit(float(1 << 32))
    key = F.round(F.log(u) / F.col("n_chars") * 1e6).cast("long")
    return (
        d.select("doc_id", "lang", "n_chars", key.alias("wkey_p6"))
        .orderBy(F.desc("wkey_p6"), "doc_id")
        .limit(k)
    )


CORPUS_SAMPLE_WEIGHTED_SQL = f"""
    SELECT doc_id, lang, n_chars,
           CAST(round(ln((('0x' || substring(md5(doc_id::VARCHAR || ':{WSAMPLE_SEED}'), 1, 8))::BIGINT + 1)
                         / {float(1 << 32)})
                      / n_chars * 1e6) AS BIGINT) AS wkey_p6
    FROM documents
    ORDER BY wkey_p6 DESC, doc_id
    LIMIT {WSAMPLE_K}
"""
