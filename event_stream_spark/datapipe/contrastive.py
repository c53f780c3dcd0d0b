"""Contrastive training-pair construction (SimCSE/DPR-style dataset prep).

A contrastive or embedding-training pipeline needs (anchor, positive,
negative) examples mined from the corpus itself: positives = documents
that ARE near-duplicates (the same signal dedup removes, reused as
supervision), negatives = deterministic pseudo-random non-partners.

- **Positives**: the verified simhash near-dup pairs
  (:func:`event_stream_spark.datapipe.dedup.simhash_near_pairs` — the
  Manku et al. pigeonhole construction, already oracle-twinned).
- **Negatives**: for each distinct anchor, ``NEG_K`` probes into an
  md5-bucketed corpus: probe j hashes (anchor, j) to one of
  ``NEG_BUCKETS`` buckets and takes the bucket member minimizing
  md5(anchor | doc) — deterministic, replayable, and never a full
  anchor × corpus expansion.  The anchor itself and its positive
  partners are excluded; a probe landing on an UNLABELED near-dup is the
  standard false-negative risk every in-batch-negative recipe accepts.

Scale shape: the probe join is an equi-join on the bucket key, so its
intermediate is |anchors| × |corpus|/NEG_BUCKETS × NEG_K rows of narrow
(ids + 16-char hash) tuples; NEG_BUCKETS scales with the corpus to keep
per-probe candidates O(1) (at 100 TB you'd raise it so a bucket is a few
thousand docs).  The per-(anchor, probe) argmin is one map-side-combined
aggregate; document text never rides any exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_stream_spark.queries import t

#: negatives per anchor, and the corpus bucket count for probe sampling
NEG_K = 2
NEG_BUCKETS = 64


def _bkt(col):
    """The house md5 bucket: first 8 hex chars as BIGINT, mod NEG_BUCKETS."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("long") % NEG_BUCKETS
    )


def contrastive_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """(anchor, other, label) long-form training pairs: every verified
    near-dup pair as a positive, NEG_K hash-probed negatives per anchor."""
    from event_stream_spark.datapipe.dedup import simhash_near_pairs

    # referenced four times below (pos, anchors, both exclusion legs);
    # Catalyst re-inlines the verified-pair pipeline per reference and
    # exchange reuse does not fire across them — persist the tiny pair
    # list so candidate verification runs once per execution (recomputed
    # from parquet every run; the bench's release step drops the blocks
    # after each materialization)
    pairs = simhash_near_pairs(spark, sf).select("a", "b").persist()
    pos = pairs.select(
        F.col("a").alias("anchor"),
        F.col("b").alias("other"),
        F.lit("pos").alias("label"),
    )
    anchors = pairs.select(F.col("a").alias("anchor")).distinct()
    docs = t(spark, sf, "documents").select(
        "doc_id", _bkt(F.col("doc_id")).alias("bkt")
    )
    probes = anchors.select(
        "anchor",
        F.explode(
            F.array(*[F.lit(j) for j in range(NEG_K)])
        ).alias("j"),
    ).select(
        "anchor",
        "j",
        _bkt(F.concat_ws(":", F.col("anchor"), F.col("j"))).alias("bkt"),
    )
    tie = F.md5(F.concat_ws("|", F.col("anchor"), F.col("doc_id")))
    # exclusion covers BOTH orientations: pairs are canonical a<b, but an
    # anchor may appear as the b-side of another pair — without the
    # reversed leg that partner could be drawn as a negative
    labeled = pairs.select(
        F.col("a").alias("anchor"), F.col("b").alias("doc_id")
    ).unionByName(
        pairs.select(F.col("b").alias("anchor"), F.col("a").alias("doc_id"))
    )
    cand = (
        probes.join(docs, "bkt")
        .filter(F.col("doc_id") != F.col("anchor"))
        .join(
            labeled,
            ["anchor", "doc_id"],
            "left_anti",  # never sample a labeled positive as a negative
        )
        .select("anchor", "j", "doc_id", tie.alias("tie"))
    )
    neg = (
        cand.groupBy("anchor", "j")
        .agg(F.min_by("doc_id", "tie").alias("other"))
        .select("anchor", "other", F.lit("neg").alias("label"))
        .distinct()  # two probes of one anchor may land on the same doc
    )
    return pos.unionByName(neg).orderBy("anchor", "label", "other")


#: DuckDB replay: the full simhash-pair construction (the verified
#: DEDUP_SIMHASH_PAIRS_SQL text inlined as a CTE) + the same bucket-probe
#: argmin negatives.  Built lazily to share the pair SQL verbatim.
def _contrastive_sql() -> str:
    from event_stream_spark.datapipe.dedup import DEDUP_SIMHASH_PAIRS_SQL

    return f"""
    WITH pairs AS ({DEDUP_SIMHASH_PAIRS_SQL}),
    pos AS (
        SELECT a AS anchor, b AS other, 'pos' AS label FROM pairs
    ),
    anchors AS (SELECT DISTINCT a AS anchor FROM pairs),
    docs AS (
        SELECT doc_id,
               ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                 % {NEG_BUCKETS} AS bkt
        FROM documents
    ),
    probes AS (
        SELECT anchor, j,
               ('0x' || substring(md5(anchor::VARCHAR || ':' || j::VARCHAR),
                                  1, 8))::BIGINT % {NEG_BUCKETS} AS bkt
        FROM anchors, (SELECT unnest(range({NEG_K})) AS j)
    ),
    cand AS (
        SELECT p.anchor, p.j, d.doc_id,
               md5(p.anchor::VARCHAR || '|' || d.doc_id::VARCHAR) AS tie
        FROM probes p JOIN docs d USING (bkt)
        WHERE d.doc_id != p.anchor
          AND NOT EXISTS (SELECT 1 FROM pairs q
                          WHERE (q.a = p.anchor AND q.b = d.doc_id)
                             OR (q.b = p.anchor AND q.a = d.doc_id))
    ),
    neg AS (
        SELECT DISTINCT anchor, min_by(doc_id, tie) AS other, 'neg' AS label
        FROM cand GROUP BY anchor, j
    )
    SELECT anchor, other, label FROM pos
    UNION ALL
    SELECT anchor, other, label FROM neg
    ORDER BY anchor, label, other
    """


CONTRASTIVE_PAIRS_SQL = _contrastive_sql()
