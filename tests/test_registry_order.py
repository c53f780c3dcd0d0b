"""Registry-order contract: the driver hash-checks the first 50 queries()
entries per round, so ordering is part of the correctness-verification
surface (VERDICT r3 item 1)."""

from __future__ import annotations

import __spark_entry__ as entry_mod

DRIVER_WINDOW = 50

# entries with no CORRECTNESS row in rounds 1-3 (r1/r2/r3 window overflow);
# every one must sit inside the round-4 driver window
NEVER_WITNESSED = {
    "pii_scrub", "text_repetition", "dup_spans", "seq_pack", "chunk_docs",
    "url_dedup", "dedup_paragraph", "dedup_paragraph_clean",
    "dedup_incremental", "embed_quantize", "lm_score",
}
R2_ONLY = {
    "text_langid", "text_fingerprint", "multimodal_meta",
    "datapipe_clean_corpus", "decontaminate", "corpus_mix", "vocab_topk",
    "tfidf_topterms",
}
NEW_IN_R4 = {
    "sketch_exact", "corpus_split", "heavy_hitters", "embed_project",
    "dedup_cluster_best", "ann_join", "bpe_pairs", "bpe_learn",
    "bloom_prune", "quality_classify", "corpus_temp_mix", "bpe_tokenize",
    "corpus_report", "bm25_topk", "collocations", "graph_pagerank",
    "mmr_rerank", "lm_score_bigram", "dedup_containment", "length_trim",
    "datapipe_curate_v2", "corpus_sample_stratified", "dedup_exact_norm",
    "attribution", "funnel_latency",
}


def test_witness_order_is_exact_registry_permutation():
    order = entry_mod.WITNESS_ORDER
    reg = list(entry_mod.queries())
    assert len(order) == len(set(order)), "duplicate names in WITNESS_ORDER"
    assert set(order) == set(reg), (
        f"WITNESS_ORDER out of sync with registry: "
        f"missing={set(reg) - set(order)} stale={set(order) - set(reg)}"
    )
    assert reg == order, "queries() must iterate in WITNESS_ORDER"


def test_unwitnessed_entries_lead_the_driver_window():
    window = set(list(entry_mod.queries())[:DRIVER_WINDOW])
    must_be_inside = NEVER_WITNESSED | R2_ONLY | NEW_IN_R4
    assert must_be_inside <= window, (
        f"outside driver window: {must_be_inside - window}"
    )


def test_window_rows_only_is_multimodal_only():
    """Every windowed entry except multimodal_meta has a DuckDB oracle, so
    the driver's no_oracle count stays multimodal-only (VERDICT item 9)."""
    window = list(entry_mod.queries())[:DRIVER_WINDOW]
    oracles = entry_mod.oracle_sql()
    rows_only = [n for n in window if n not in oracles]
    assert rows_only == ["multimodal_meta"], rows_only
