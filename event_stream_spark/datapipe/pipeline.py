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
from event_stream_spark.queries import t

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
