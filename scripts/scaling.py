#!/usr/bin/env python
"""Reproducible scaling harness behind README's "Measured scaling" notes.

Two sections:
- 10× size sweep: synthetic corpora at 1× and 10× (constant doc length,
  planted shared paragraphs, random 64-d vectors), round-3 operators timed
  at both sizes — the asymptotics check.
- skew sweep (``--skew``): same-size corpora, uniform vs hot-key — one user
  holding 10% of all events, 2% of events packed into a single range-join
  bin, and a 400-doc exact near-dup clique — timing the range join, dedup
  family, sessionization, and funnel under AQE skew handling
  (spark.sql.adaptive.skewJoin is on in the session defaults).

Runs on local[$SPARK_GRAFT_CPUS], min-of-2 wall times.  Usage:

    python scripts/scaling.py [workdir]          # 10x sweep (default /tmp/es_scaling)
    python scripts/scaling.py --skew [workdir]   # skew sweep
"""

from __future__ import annotations

import os
import random
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = [f"w{i}" for i in range(2000)]


def gen_docs(
    n: int,
    path: str,
    seed: int = 7,
    clique: int = 0,
    twins: bool = False,
    hot_word: str | None = None,
) -> None:
    """``clique`` > 0 plants that many EXACT-duplicate docs (one hot
    sha-bucket for exact dedup, one hot band-bucket for minhash).
    ``twins`` makes every ``i % 10 == 1`` doc a one-word-substituted copy of
    doc i-1 — a planted near-dup PAIR per 10 docs, so the near-dup graph's
    edge count grows linearly with the corpus (the realistic regime for
    graph-op scaling, vs the clique's pathological n² edges).  ``hot_word``
    is appended to EVERY doc — a stop-word-shaped posting-list hot key for
    the retrieval skew scenario."""
    rng = random.Random(seed)
    shared = " ".join(rng.choice(VOCAB) for _ in range(10))
    clique_txt = " ".join(rng.choice(VOCAB) for _ in range(40))
    rows = []
    prev: list[str] = []
    for i in range(n):
        words = [rng.choice(VOCAB) for _ in range(40)]
        if twins and i % 10 == 1 and prev:
            words = list(prev)
            words[17] = rng.choice(VOCAB)
        if i % 20 == 5:  # 5% of docs embed the shared paragraph
            words[10:20] = shared.split()
        prev = words
        if hot_word:
            words = words + [hot_word]
        txt = clique_txt if clique and i % (n // clique) == 0 else " ".join(words)
        rows.append((i, txt, rng.choice(["en", "de", "fr"]), f"src{i % 10}", len(txt)))
    os.makedirs(path, exist_ok=True)
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(f"{path}/documents.parquet")


def gen_events(
    n: int,
    path: str,
    seed: int = 7,
    hot_user_frac: float = 0.0,
    hot_bin_frac: float = 0.0,
) -> None:
    """Synthetic events over 30 days; ``hot_user_frac`` routes that share of
    ALL rows to user 0 (funnel/sessionization key skew), ``hot_bin_frac``
    packs that share into one 10-minute span (range-join bin skew)."""
    rng = np.random.default_rng(seed)
    users = rng.integers(1, max(2, n // 100), n)
    if hot_user_frac:
        users[rng.random(n) < hot_user_frac] = 0
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = rng.integers(0, span_us, n)
    if hot_bin_frac:
        hot = rng.random(n) < hot_bin_frac
        ts[hot] = span_us // 2 + rng.integers(0, 600_000_000, int(hot.sum()))
    types = rng.choice(
        ["view", "click", "purchase", "error", "signup"], n, p=[0.4, 0.3, 0.15, 0.1, 0.05]
    )
    os.makedirs(path, exist_ok=True)
    pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "user_id": users.astype("int64"),
            "ts": pd.to_datetime(ts, unit="us"),
            "event_type": types,
            "value": rng.random(n).round(4),
        }
    ).to_parquet(f"{path}/events.parquet")


def gen_vecs(n: int, path: str, seed: int = 7) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(path, exist_ok=True)
    v = rng.standard_normal((n, 64)).astype(np.float32)
    pd.DataFrame(
        {"vec_id": np.arange(n), "embedding": list(v), "label": np.zeros(n, "int32")}
    ).to_parquet(f"{path}/embeddings.parquet")


def run_skew(work: str) -> None:
    """Uniform vs hot-key at the SAME size: the wall-time ratio is the skew
    penalty, with AQE skew-join splitting active."""
    from event_stream_spark.datapipe.dedup import dedup_exact, dedup_minhash
    from event_stream_spark.queries import q25, q27, q29
    from event_stream_spark.session import get_spark

    uni, skew = f"{work}/uniform", f"{work}/skewed"
    gen_events(60_000, uni)
    gen_events(60_000, skew, hot_user_frac=0.10, hot_bin_frac=0.02)
    gen_docs(20_000, uni)
    gen_docs(20_000, skew, clique=400)

    spark = get_spark("skew", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    spark.sparkContext.setLogLevel("ERROR")

    def timeit(fn, arg: str) -> float:
        best = float("inf")
        for _ in range(2):
            s = time.perf_counter()
            fn(spark, arg).toPandas()
            best = min(best, time.perf_counter() - s)
        return best

    print("60k events (10% on one user, 2% in one bin) / 20k docs (400-doc clique):")
    for name, fn in [
        ("q27_range_join", q27),
        ("q25_sessionize", q25),
        ("q29_funnel", q29),
        ("dedup_exact", dedup_exact),
        ("dedup_minhash", dedup_minhash),
    ]:
        tu, tsk = timeit(fn, uni), timeit(fn, skew)
        print(f"{name}: uniform {tu:.2f}s -> skewed {tsk:.2f}s  ({tsk / tu:.1f}x)")

    # retrieval skew: a stop-word-shaped term in EVERY doc; the query that
    # contains it makes the whole corpus a scoring candidate
    from event_stream_spark.datapipe.retrieval import bm25_topk

    hot = f"{work}/hotterm"
    gen_docs(20_000, hot, hot_word="thehot")
    tu = timeit(lambda sp, a: bm25_topk(sp, a, queries=[(0, "w17 w33")]), uni)
    tsk = timeit(lambda sp, a: bm25_topk(sp, a, queries=[(1, "thehot w17")]), hot)
    print(f"bm25 hot-term: cold-term query {tu:.2f}s -> all-docs-term query {tsk:.2f}s  ({tsk / tu:.1f}x)")

    # graph skew: linear-edge twins vs one 400-doc clique (dense component):
    # iteration cost tracks EDGES, and the clique packs ~80k of them into
    # one component
    from event_stream_spark.datapipe.graph import graph_pagerank

    tw = f"{work}/twins"
    gen_docs(20_000, tw, twins=True)
    tu, tsk = timeit(graph_pagerank, tw), timeit(graph_pagerank, skew)
    print(f"graph_pagerank: twin edges {tu:.2f}s -> clique edges {tsk:.2f}s  ({tsk / tu:.1f}x)")
    spark.stop()


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--skew"]
    if "--skew" in sys.argv[1:]:
        run_skew(argv[0] if argv else "/tmp/es_skew")
        return
    work = argv[0] if argv else "/tmp/es_scaling"
    one, ten = f"{work}/1x", f"{work}/10x"
    gen_docs(20_000, one), gen_docs(200_000, ten)
    gen_vecs(20_000, one), gen_vecs(200_000, ten)
    gen_events(60_000, one), gen_events(600_000, ten)

    from event_stream_spark.datapipe.bloom import bloom_prune
    from event_stream_spark.datapipe.bpe import bpe_fertility, bpe_pairs
    from event_stream_spark.datapipe.corpusops import (
        cdc_chunks,
        char_dup_spans,
        curriculum_order,
        lcs_pairs,
        dsir_weights,
        dup_spans_clean,
        lm_score,
    )
    from event_stream_spark.datapipe.dedup import dedup_soft
    from event_stream_spark.datapipe.suffix import suffix_lrs, suffix_lrs_full
    from event_stream_spark.datapipe.graph import graph_pagerank
    from event_stream_spark.datapipe.retrieval import bm25_topk, collocations
    from event_stream_spark.datapipe.similarity import (
        ann_join,
        ann_ivfpq_topk,
        ann_pq_topk,
        decontaminate_semantic,
        embed_quantize,
    )
    from event_stream_spark.datapipe.contrastive import contrastive_pairs
    from event_stream_spark.datapipe.splits import shard_balance
    from event_stream_spark.datapipe.webops import (
        dedup_incremental,
        dedup_paragraph,
        dedup_paragraph_clean,
        domain_stats,
        robots_eval,
        url_dedup,
    )
    from event_stream_spark.session import get_spark

    spark = get_spark("scaling", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    spark.sparkContext.setLogLevel("ERROR")

    def timeit(fn, arg: str) -> float:
        best = float("inf")
        for _ in range(2):
            s = time.perf_counter()
            fn(spark, arg).toPandas()
            best = min(best, time.perf_counter() - s)
        return best

    for name, fn in [
        ("url_dedup", url_dedup),
        ("dedup_paragraph", dedup_paragraph),
        ("dedup_paragraph_clean", dedup_paragraph_clean),
        ("dedup_incremental", dedup_incremental),
        ("embed_quantize", embed_quantize),
        ("lm_score", lm_score),
        ("ann_join", ann_join),
        ("ann_pq_topk", ann_pq_topk),
        ("ann_ivfpq_topk", ann_ivfpq_topk),
        ("bpe_pairs", bpe_pairs),
        ("bloom_prune", bloom_prune),
        ("bm25_topk", bm25_topk),
        ("collocations", collocations),
        ("dup_spans_clean", dup_spans_clean),
        ("dsir_weights", dsir_weights),
        ("char_dup_spans", char_dup_spans),
        ("lcs_pairs", lcs_pairs),
        # round-5 additions
        ("dedup_soft", dedup_soft),
        ("decontaminate_semantic", decontaminate_semantic),
        ("suffix_lrs", suffix_lrs),
        ("suffix_lrs_full", suffix_lrs_full),
        ("cdc_chunks", cdc_chunks),
        ("bpe_fertility", bpe_fertility),
        ("curriculum_order", curriculum_order),
        # round-7 additions
        ("shard_balance", shard_balance),
        ("domain_stats", domain_stats),
        ("contrastive_pairs", contrastive_pairs),
        ("robots_eval", robots_eval),
    ]:
        t1, t10 = timeit(fn, one), timeit(fn, ten)
        print(f"{name}: {t1:.2f}s -> {t10:.2f}s  ({t10 / t1:.1f}x on 10x data)")

    # linear-edge near-dup corpora (planted twin pairs, not a clique) for
    # the iterative graph op: edges ∝ docs, so the 10× ratio isolates the
    # per-iteration join+agg cost rather than output growth
    one_g, ten_g = f"{work}/1x_graph", f"{work}/10x_graph"
    gen_docs(20_000, one_g, twins=True), gen_docs(200_000, ten_g, twins=True)
    t1, t10 = timeit(graph_pagerank, one_g), timeit(graph_pagerank, ten_g)
    print(f"graph_pagerank: {t1:.2f}s -> {t10:.2f}s  ({t10 / t1:.1f}x on 10x edges)")
    spark.stop()


if __name__ == "__main__":
    main()
