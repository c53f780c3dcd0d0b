"""Shared text primitives for the data-pipeline operators.

Tokenization and shingling are defined ONCE here and mirrored verbatim in the
DuckDB oracle SQL — any drift between the two breaks hash-match, so both
dialects use: lowercase → split on \\s+ → drop empties → distinct word
3-gram shingles joined by single spaces.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def words(text: Column | str) -> Column:
    t = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(t), r"\s+"), lambda w: w != "")


def shingles(ws: Column, n: int = 3) -> Column:
    """Distinct word n-grams as space-joined strings; [] if fewer than n words."""
    idx = F.when(
        F.size(ws) >= n, F.sequence(F.lit(1), F.size(ws) - (n - 1))
    ).otherwise(F.expr("array()").cast("array<int>"))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(ws, i + j) for j in range(n)]
        ),
    )
    return F.array_distinct(grams)


def word_rows(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pos, w) — the tokenization contract as ROWS: lowercase,
    split \\s+, drop empties.  THE single definition every row-based text
    operator builds on (shingles, repetition, vocab) — the DuckDB oracles
    mirror this exact contract, so it must not fork per operator."""
    return docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("pos", "w"),
    ).filter(F.col("w") != "")


def shingle_rows(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, s) — distinct word n-gram shingles as ROWS.

    The row formulation beats the array-HOF one by ~10×: explode the words,
    then ``lead()`` windows assemble n-grams — every op is whole-stage
    codegen, one shuffle on doc_id.  (Array ``transform``/``element_at``
    lambdas evaluate interpreted, per element.)  Semantics identical to
    ``shingles(words(text), n)``: lowercase, split \\s+, drop empties,
    consecutive n-grams space-joined, distinct per doc.
    """
    w = word_rows(docs, text_col)
    win = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("w")] + [F.lead("w", j).over(win) for j in range(1, n)]
    s = F.when(parts[-1].isNotNull(), F.concat_ws(" ", *parts))
    return (
        w.select("doc_id", s.alias("s"))
        .filter(F.col("s").isNotNull())
        .distinct()
    )


def doc_shingles(spark, sf: str, n: int = 3) -> DataFrame:
    """Shared (doc_id, s) shingle relation for the documents table."""
    from event_stream_spark.datapipe.matview import materialized
    from event_stream_spark.queries import t

    return materialized(
        spark, f"shingles|{sf}|{n}", lambda: shingle_rows(t(spark, sf, "documents"), n)
    )


def lsh_bands(sig: Column, bands: int = 4, rows: int = 4, sep: str = "|") -> Column:
    """Band keys: separator-joined ``rows``-slices of the signature (the
    separator prevents concat ambiguity between numeric signature values)."""
    return F.array(
        *[F.concat_ws(sep, F.slice(sig, b * rows + 1, rows)) for b in range(bands)]
    )


def lsh_plan(
    threshold: float, n_hashes: int = 16, *, exact: bool = True, grid: int = 200
):
    """Pick (bands, rows) for banded MinHash-LSH at a similarity
    ``threshold``: minimizes the S-curve error ∫|P(cand|s) − step_t(s)| ds
    with P = 1 − (1 − s^rows)^bands — the standard Mining-of-Massive-
    Datasets construction, computed by deterministic numeric quadrature so
    the choice is reproducible.  ``exact=True`` (default) considers only
    splits with bands·rows == ``n_hashes`` — the signature is already paid
    for, use all of it; ``exact=False`` also allows shorter signatures.
    Returns (bands, rows, fp_area, fn_area): fp = expected candidate mass
    below the threshold (wasted verify work), fn = missed mass above it
    (lost recall).  ``dedup_minhash``'s (4, 4) at t=0.5 is this function's
    answer for its 16-hash signature."""
    best = None
    for rows in range(1, n_hashes + 1):
        for bands in range(1, n_hashes // rows + 1):
            if exact and bands * rows != n_hashes:
                continue
            fp = fn = 0.0
            for i in range(grid):
                s = (i + 0.5) / grid
                p = 1.0 - (1.0 - s**rows) ** bands
                if s < threshold:
                    fp += p / grid
                else:
                    fn += (1.0 - p) / grid
            err = fp + fn
            cand = (err, bands, rows, fp, fn)
            if best is None or cand < best:
                best = cand
    _, bands, rows, fp, fn = best
    return bands, rows, fp, fn
