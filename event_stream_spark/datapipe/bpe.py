"""BPE merge-candidate counting — the inner loop of byte-pair-encoding
tokenizer training, re-expressed relationally.

One BPE training iteration is: (1) count word frequencies over the corpus,
(2) explode each *distinct* word (plus an end-of-word marker) into adjacent
symbol pairs, (3) weight each pair by its word's corpus frequency and pick
the top merge candidates.  This is exactly two map-side-combinable
aggregations — a textbook Spark shape:

- The word-frequency aggregation is the only shuffle that sees corpus-scale
  data, and partial aggregation collapses it to the *distinct-word*
  cardinality per partition before the exchange.
- The pair explosion runs over the distinct-word relation (orders of
  magnitude smaller than the corpus at 100 TB — vocabulary grows ~O(corpus^β),
  β≈0.7 by Heaps' law), entirely in whole-stage codegen.
- The pair aggregation key space is tiny (symbol pairs), so the second
  exchange is near-constant size after map-side combine; top-k goes through
  TakeOrderedAndProject (per-partition heads, merge on driver), never a
  global sort.

Tokenization follows the single corpus-wide contract in
``datapipe/text.py::word_rows`` (lowercase → split \\s+ → drop empties); the
DuckDB oracle mirrors it verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_stream_spark.datapipe.text import word_rows
from event_stream_spark.queries import t

BPE_TOP = 20
BPE_EOW = "_"  # end-of-word marker (outside the corpus charset a-z)


def bpe_pairs(spark: SparkSession, sf: str, top: int = BPE_TOP) -> DataFrame:
    """Top ``top`` BPE merge candidates: (l, r, cnt) of adjacent character
    pairs over marker-terminated words, weighted by word frequency."""
    wc = (
        word_rows(t(spark, sf, "documents"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .select(F.concat(F.col("w"), F.lit(BPE_EOW)).alias("sym"), "freq")
    )
    ex = wc.select(
        "sym",
        "freq",
        F.explode(F.sequence(F.lit(1), F.length("sym") - 1)).alias("i"),
    )
    pr = ex.select(
        F.expr("substring(sym, i, 1)").alias("l"),
        F.expr("substring(sym, i + 1, 1)").alias("r"),
        "freq",
    )
    return (
        pr.groupBy("l", "r")
        .agg(F.sum("freq").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "l", "r")
        .limit(top)
    )


BPE_PAIRS_SQL = f"""
    WITH w AS (
        SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  x -> x <> '')) AS w
        FROM documents
    ),
    wc AS (
        SELECT w || '{BPE_EOW}' AS sym, count(*) AS freq FROM w GROUP BY w
    ),
    pr AS (
        SELECT substring(sym, gi, 1) AS l,
               substring(sym, gi + 1, 1) AS r,
               freq
        FROM (SELECT sym, freq, unnest(range(1, length(sym))) AS gi FROM wc)
    )
    SELECT l, r, sum(freq)::BIGINT AS cnt
    FROM pr GROUP BY l, r
    ORDER BY cnt DESC, l, r
    LIMIT {BPE_TOP}
"""
