"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (Q19-style pricing summary) on sf0.001.
``queries()`` — every implemented operator/query from SURVEY.md §2 (Q-set +
data-pipeline extras), each ``(spark, sf_dir) -> DataFrame``.
``oracle_sql()`` — the DuckDB twin for each SQL-expressible entry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: scan+filter+agg+sort end-to-end (Q19 pricing summary)."""
    from event_stream_spark.queries import q19

    return q19(spark, "/root/testdata/sf0.001")


# Driver correctness-gate ordering.  The driver hash-checks the FIRST 50
# registry entries per round, so ordering is part of the verification
# contract.  Policy (VERDICT r4 ask #3, enforced by
# tests/test_registry_order.py since r6): rotate by witness age — the 50
# least-recently-GREEN-witnessed entries first, where "green" means a
# CORRECTNESS_r0N row with hash_match true, or (for the two rows-only-by-
# design entries) err == "no_oracle" with spark_rows recorded.  Round-6
# window = dup_spans (r5 hash-red from the DuckDB-HUGEINT float64 fetch,
# oracle now casts ::BIGINT), the 28 r5-new entries plus sketch_profile
# (no driver rows yet), then the alphabetically-first 20 of the 47
# entries last witnessed r4.  Ties at the boundary are broken
# alphabetically; the guard test recomputes all of this from the
# CORRECTNESS_r0*.json artifacts so the rotation can't silently drift.
# Registry membership is still the union of QUERIES + DATAPIPE_QUERIES —
# this list only fixes iteration order, and a safety net below appends
# anything not named here.
WITNESS_ORDER: list[str] = [
    'dup_spans', 'ann_ivfpq_topk', 'ann_pq_topk', 'boilerplate_lines',
    'bpe_fertility', 'cdc_chunks', 'char_dup_spans', 'char_entropy',
    'corpus_sample_weighted', 'curriculum_order', 'decontaminate_semantic', 'dedup_soft',
    'dsir_weights', 'dup_spans_clean', 'embed_outliers', 'graph_triangles',
    'langid_confusion', 'lcs_pairs', 'lm_score_kn', 'q33',
    'q34', 'q35', 'quality_gopher', 'source_overlap',
    'suffix_lrs', 'suffix_lrs_full', 'text_diversity', 'text_novelty', 'text_readability',
    'winnow_fingerprints', 'sketch_profile', 'ann_join', 'attribution',
    'bloom_prune', 'bm25_topk', 'bpe_learn', 'bpe_pairs',
    'bpe_tokenize', 'chunk_docs', 'collocations', 'corpus_mix',
    'corpus_report', 'corpus_sample', 'corpus_sample_stratified', 'corpus_shuffle',
    'corpus_split', 'corpus_temp_mix', 'datapipe_clean_corpus', 'datapipe_curate_v2',
    'decontaminate', 'dedup_cluster_best', 'dedup_containment', 'dedup_exact_norm',
    'dedup_incremental', 'dedup_paragraph', 'dedup_paragraph_clean', 'embed_project',
    'embed_quantize', 'funnel_latency', 'fuzzy_match', 'heavy_hitters',
    'json_extract', 'length_trim', 'lm_score', 'lm_score_bigram',
    'mmr_rerank', 'multimodal_meta', 'pii_scrub', 'quality_classify',
    'seq_pack', 'sketch_exact', 'text_fingerprint', 'text_langid',
    'text_repetition', 'tfidf_topterms', 'time_gapfill', 'ts_anomaly',
    'url_dedup', 'vocab_topk', 'ann_ivf_topk', 'ann_lsh_topk',
    'ann_topk_brute', 'dedup_clusters', 'dedup_embedding', 'dedup_embedding_exact',
    'dedup_exact', 'dedup_minhash', 'dedup_ngram_jaccard', 'dedup_simhash',
    'dedup_simhash_pairs', 'embed_kmeans', 'graph_pagerank', 'q1',
    'q10', 'q11', 'q12', 'q13',
    'q14', 'q15', 'q16', 'q17',
    'q18', 'q19', 'q2', 'q20',
    'q21', 'q22', 'q23', 'q24',
    'q25', 'q26', 'q27', 'q28',
    'q29', 'q3', 'q30', 'q31',
    'q32', 'q4', 'q5', 'q6',
    'q7', 'q8_except', 'q8_intersect', 'q9',
    'semdedup', 'text_quality', 'text_tokens',
]

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from event_stream_spark.queries import QUERIES, plan_cached

    registry: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    registry.update(QUERIES)
    try:
        from event_stream_spark.datapipe import DATAPIPE_QUERIES

        registry.update(DATAPIPE_QUERIES)
    except ImportError:
        pass
    ordered = {n: registry[n] for n in WITNESS_ORDER if n in registry}
    ordered.update({n: f for n, f in registry.items() if n not in ordered})
    # prepared-plan cache: build+analyze each logical plan once per
    # (session, sf); execution still runs fully on every invocation
    return {name: plan_cached(name, fn) for name, fn in ordered.items()}


def oracle_sql() -> dict[str, str]:
    from event_stream_spark.queries import ORACLE_SQL

    sql: dict[str, str] = {}
    sql.update(ORACLE_SQL)
    try:
        from event_stream_spark.datapipe import DATAPIPE_ORACLE_SQL

        sql.update(DATAPIPE_ORACLE_SQL)
    except ImportError:
        pass
    return sql
