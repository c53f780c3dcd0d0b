"""Registry-order contract: the driver hash-checks the first 50 queries()
entries per round, so ordering is part of the correctness-verification
surface.  Round-5 policy (VERDICT r4 ask #3): rotate by witness age —
least-recently-driver-witnessed entries lead, so no driver row goes stale
while the substrate underneath it is rewritten."""

from __future__ import annotations

import __spark_entry__ as entry_mod

DRIVER_WINDOW = 50

# the one r4 hash-mismatch (fixed this round) — must re-witness green
RED_IN_R4 = {"dup_spans"}
# rewritten this round → driver row must be re-proved
REWRITTEN_R5 = {"graph_pagerank"}
# entries whose last CORRECTNESS row is r3 (absent from CORRECTNESS_r04);
# their shared substrate (shingle mat-view, row-based shingle_rows) was
# rewritten after those rows were recorded
LAST_WITNESSED_R3 = {
    "ann_ivf_topk", "ann_lsh_topk", "ann_topk_brute", "dedup_clusters",
    "dedup_embedding", "dedup_embedding_exact", "dedup_exact",
    "dedup_minhash", "dedup_ngram_jaccard", "dedup_simhash",
    "dedup_simhash_pairs", "embed_kmeans", "semdedup", "text_quality",
    "text_tokens",
    "q1", "q2", "q3", "q4", "q5", "q6", "q7", "q8_intersect", "q8_except",
    "q9", "q10", "q11", "q12", "q13", "q14", "q15", "q16", "q17", "q18",
    "q19", "q20", "q21", "q22", "q23", "q24", "q25", "q26", "q27", "q28",
    "q29", "q30", "q31", "q32",
    # sketch_profile is also r3-stale but rows-only by design; its exact
    # twins are hash-checked via sketch_exact, so it yields its window
    # slot to hash-checkable entries
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


def test_stale_and_changed_entries_fill_the_driver_window():
    window = set(list(entry_mod.queries())[:DRIVER_WINDOW])
    must_be_inside = RED_IN_R4 | REWRITTEN_R5 | LAST_WITNESSED_R3
    assert must_be_inside <= window, (
        f"outside driver window: {must_be_inside - window}"
    )
    # exactly these fill the window — no fresh-r4 row displaces a stale one
    assert len(must_be_inside) == DRIVER_WINDOW


def test_window_is_fully_hash_checkable():
    """Every windowed entry has a DuckDB oracle, so the driver's no_oracle
    count this round is zero inside the window (the two rows-only-by-design
    entries, multimodal_meta and sketch_profile, sit past the boundary with
    fresh r4 rows)."""
    window = list(entry_mod.queries())[:DRIVER_WINDOW]
    oracles = entry_mod.oracle_sql()
    rows_only = [n for n in window if n not in oracles]
    assert rows_only == [], rows_only
