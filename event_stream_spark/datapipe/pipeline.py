"""The composed training-data prep pipeline — the flagship datapipe DAG:

    documents → quality gate → exact-dedup survivors → near-dup removal
              → clean corpus manifest

Each stage is one of the already-verified operators; this module wires them
the way a production preprocessing job would, and the whole composition is
oracle-checked end-to-end (the DuckDB twin re-runs every stage in SQL).

Scale shape: quality gating is a scan-local filter (no shuffle); exact dedup
one hash shuffle; near-dup removal joins the (tiny) minhash pair list
broadcast-style against the survivor set — the expensive candidate
generation runs once over the deduped, quality-passing subset only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_stream_spark.datapipe.dedup import (
    DEDUP_MINHASH_SQL,
    dedup_exact,
    minhash_lsh_pairs,
)
from event_stream_spark.datapipe.textstats import text_quality

QUALITY_MIN = 0.5


def datapipe_clean_corpus(spark: SparkSession, sf: str) -> DataFrame:
    """Surviving doc_ids after the full prep chain, with provenance counts.

    Drop rules (standard prep order):
      1. quality < QUALITY_MIN                      (cheap scan filter first)
      2. exact duplicate, not the min-doc_id copy    (hash groupBy)
      3. near-duplicate: the HIGHER doc_id of every minhash pair ≥ 0.5
         (pair list from the already-verified LSH operator)
    """
    q = text_quality(spark, sf).filter(F.col("quality") >= QUALITY_MIN)
    survivors = dedup_exact(spark, sf).select("doc_id").join(q, "doc_id", "left_semi")
    near = minhash_lsh_pairs(spark, sf, threshold=0.5)
    drop_b = near.select(F.col("b").alias("doc_id")).distinct()
    clean = survivors.join(drop_b, "doc_id", "left_anti")
    return clean.select("doc_id").orderBy("doc_id")


# The oracle replays all three stages; the minhash CTE is the verified
# DEDUP_MINHASH_SQL inlined as a subquery.
DATAPIPE_CLEAN_SQL = f"""
    WITH quality AS (
        SELECT doc_id,
               round(least(1.0, len(ws) / 50.0)
                     * (1.0 - length(regexp_replace(text, '[^.!?,;:]', '', 'g'))::DOUBLE
                              / greatest(length(text), 1))
                     * (CASE WHEN length(text)::DOUBLE / greatest(len(ws),1)
                             BETWEEN 3 AND 12 THEN 1.0 ELSE 0.5 END), 6) AS quality
        FROM (SELECT doc_id, text,
                     list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ws
              FROM documents)
    ),
    exact_survivors AS (
        SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)
    ),
    near_pairs AS ({DEDUP_MINHASH_SQL})
    SELECT s.doc_id
    FROM exact_survivors s
    JOIN quality q ON q.doc_id = s.doc_id AND q.quality >= {QUALITY_MIN}
    WHERE s.doc_id NOT IN (SELECT b FROM near_pairs)
    ORDER BY s.doc_id
"""


def datapipe_curate_v2(spark: SparkSession, sf: str) -> DataFrame:
    """Round-4 curation chain — the composition proof for the newer
    operators, wired the way a production recipe orders them:

      1. per-language length-outlier trim  (percentile cuts, broadcast back)
      2. model-based quality filter        (logistic ``quality_classify`` keep)
      3. containment dedup                 (drop the CONTAINED doc of every
                                            ≥0.8 pair — the excerpt loses,
                                            its container carries the text)

    Each stage is an already-oracled operator; the composition is replayed
    end-to-end by the DuckDB twin (each stage's verified SQL inlined as a
    subquery).  Scale shape: stages 1–2 are keyed-agg + broadcast-join
    filters over narrow projections; the containment candidate machinery
    runs once over the full corpus and its pair list is drop-side tiny.
    """
    from event_stream_spark.datapipe.classify import (
        KEEP_THRESHOLD,
        quality_scored,
    )
    from event_stream_spark.datapipe.dedup import containment_pairs
    from event_stream_spark.datapipe.textstats import length_trim

    # length_trim emits EXACTLY one row per document (documents ⋈ its own
    # per-lang cuts table — every doc's lang has a cuts row), so its
    # keep-filtered doc_ids ARE the base relation: the separate documents
    # scan + semi-join the old form paid added nothing.  Likewise the
    # quality keep-set is exactly quality_scored ≥ threshold (q_score is
    # never NULL there), skipping quality_classify's all-documents
    # left-join back.  Three corpus scans → one per stage.
    lt = length_trim(spark, sf).filter(F.col("keep")).select("doc_id")
    qc = (
        quality_scored(spark, sf)
        .filter(F.col("q_score") >= KEEP_THRESHOLD)
        .select("doc_id")
    )
    contained = (
        containment_pairs(spark, sf).select(F.col("a").alias("doc_id")).distinct()
    )
    return (
        lt.join(qc, "doc_id", "left_semi")
        .join(contained, "doc_id", "left_anti")
        .orderBy("doc_id")
    )


def _curate_v2_sql() -> str:
    from event_stream_spark.datapipe.classify import QUALITY_CLASSIFY_SQL
    from event_stream_spark.datapipe.dedup import DEDUP_CONTAINMENT_SQL
    from event_stream_spark.datapipe.textstats import LENGTH_TRIM_SQL

    return f"""
    SELECT d.doc_id
    FROM documents d
    JOIN ({LENGTH_TRIM_SQL}) lt ON lt.doc_id = d.doc_id AND lt.keep
    JOIN ({QUALITY_CLASSIFY_SQL}) qc ON qc.doc_id = d.doc_id AND qc.keep
    WHERE d.doc_id NOT IN (SELECT a FROM ({DEDUP_CONTAINMENT_SQL}))
    ORDER BY d.doc_id
"""


DATAPIPE_CURATE_V2_SQL = _curate_v2_sql()
