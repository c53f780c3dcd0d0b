#!/usr/bin/env python
"""Reproducible 10× scaling harness behind README's "Measured scaling" notes.

Generates synthetic corpora at 1× and 10× (constant doc length, planted
shared paragraphs, random 64-d vectors), runs the round-3 operators at both
sizes on local[$SPARK_GRAFT_CPUS], and prints min-of-2 wall times with the
scaling factor.  Usage:

    python scripts/scaling.py [workdir]    # default /tmp/es_scaling
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


def gen_docs(n: int, path: str, seed: int = 7) -> None:
    rng = random.Random(seed)
    shared = " ".join(rng.choice(VOCAB) for _ in range(10))
    rows = []
    for i in range(n):
        words = [rng.choice(VOCAB) for _ in range(40)]
        if i % 20 == 5:  # 5% of docs embed the shared paragraph
            words[10:20] = shared.split()
        txt = " ".join(words)
        rows.append((i, txt, rng.choice(["en", "de", "fr"]), f"src{i % 10}", len(txt)))
    os.makedirs(path, exist_ok=True)
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(f"{path}/documents.parquet")


def gen_vecs(n: int, path: str, seed: int = 7) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(path, exist_ok=True)
    v = rng.standard_normal((n, 64)).astype(np.float32)
    pd.DataFrame(
        {"vec_id": np.arange(n), "embedding": list(v), "label": np.zeros(n, "int32")}
    ).to_parquet(f"{path}/embeddings.parquet")


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/es_scaling"
    one, ten = f"{work}/1x", f"{work}/10x"
    gen_docs(20_000, one), gen_docs(200_000, ten)
    gen_vecs(20_000, one), gen_vecs(200_000, ten)

    from event_stream_spark.datapipe.corpusops import lm_score
    from event_stream_spark.datapipe.similarity import embed_quantize
    from event_stream_spark.datapipe.webops import (
        dedup_incremental,
        dedup_paragraph,
        dedup_paragraph_clean,
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
    ]:
        t1, t10 = timeit(fn, one), timeit(fn, ten)
        print(f"{name}: {t1:.2f}s -> {t10:.2f}s  ({t10 / t1:.1f}x on 10x data)")
    spark.stop()


if __name__ == "__main__":
    main()
