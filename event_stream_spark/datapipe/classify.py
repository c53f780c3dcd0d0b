"""Model-based quality filtering — the classifier-filter stage of a
training-data pipeline (fastText/CCNet-style quality classifier), expressed
as distributed inference of a fixed linear model.

The model is a logistic regression over cheap corpus features (shipped as
literal weights — the "pretrained classifier" a pipeline distributes to
executors); inference is pure whole-stage codegen: one word-explode +
grouped feature aggregation per doc, then a literal dot product + sigmoid.
No Python, no model server, no shuffle beyond the per-doc feature agg.

Scale shape: features aggregate on doc_id with map-side partials (words for
one doc are co-located after the single exchange); the model itself is O(1)
literals in the plan — at 100 TB the only data-volume term is the word
explode, identical to ``text_tokens``.  A real learned model swaps the
weight constants; the plan shape is unchanged.

Feature tokenization follows ``datapipe/text.py::word_rows`` (the single
corpus-wide contract); the DuckDB oracle replays features, dot product, and
sigmoid with the same operation order, and ``keep`` is derived from the
ROUNDED score in both engines so the decision boundary cannot split on
last-ulp exp() differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_stream_spark.datapipe.text import word_rows
from event_stream_spark.queries import t

#: tiny function-word list (present in the synthetic corpus vocabulary)
STOPWORDS = ("a", "the", "of", "to", "and", "in")

#: fixed logistic weights: bias, log-length, mean word length, stopword
#: fraction, unique-token fraction — centered so the synthetic corpus
#: straddles the decision boundary (both classes non-trivially populated)
W0, W_LEN, W_WLEN, W_STOP, W_UNIQ = -5.3, 0.5, 0.3, 8.0, 3.0

KEEP_THRESHOLD = 0.5


def quality_scored(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, q_score) for every document WITH at least one token — the
    inference core of :func:`quality_classify`, exposed so composition
    pipelines (``datapipe_curate_v2``) can consume the keep-set directly:
    ``keep`` is true iff the doc appears here with q_score ≥
    KEEP_THRESHOLD (q_score is never NULL on this relation), so the
    all-documents left-join below adds nothing to a keep-side consumer
    except a second corpus scan."""
    w = word_rows(t(spark, sf, "documents"))
    feats = w.groupBy("doc_id").agg(
        F.count("*").alias("n_tok"),
        F.sum(F.length("w")).alias("sum_len"),
        F.sum(F.when(F.col("w").isin(*STOPWORDS), 1).otherwise(0)).alias("n_stop"),
        F.countDistinct("w").alias("n_uniq"),
    )
    n = F.col("n_tok").cast("double")
    z = (
        F.lit(W0)
        + F.lit(W_LEN) * F.log(n + F.lit(1.0))
        + F.lit(W_WLEN) * (F.col("sum_len").cast("double") / n)
        + F.lit(W_STOP) * (F.col("n_stop").cast("double") / n)
        + F.lit(W_UNIQ) * (F.col("n_uniq").cast("double") / n)
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return feats.select("doc_id", score.alias("q_score"))


def quality_classify(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, q_score, keep): logistic quality score per document and the
    threshold decision."""
    scored = quality_scored(spark, sf)
    return (
        t(spark, sf, "documents")
        .select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            "q_score",
            F.coalesce(F.col("q_score") >= KEEP_THRESHOLD, F.lit(False)).alias(
                "keep"
            ),
        )
        .orderBy("doc_id")
    )


_STOP_SQL = ", ".join(f"'{s}'" for s in STOPWORDS)

QUALITY_CLASSIFY_SQL = f"""
    WITH w AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  x -> x <> '')) AS w
        FROM documents
    ),
    f AS (
        SELECT doc_id,
               count(*) AS n_tok,
               sum(length(w)) AS sum_len,
               sum(CASE WHEN w IN ({_STOP_SQL}) THEN 1 ELSE 0 END) AS n_stop,
               count(DISTINCT w) AS n_uniq
        FROM w GROUP BY doc_id
    ),
    s AS (
        SELECT doc_id,
               round(1.0 / (1.0 + exp(-({W0}
                   + {W_LEN} * ln(n_tok::DOUBLE + 1.0)
                   + {W_WLEN} * (sum_len::DOUBLE / n_tok::DOUBLE)
                   + {W_STOP} * (n_stop::DOUBLE / n_tok::DOUBLE)
                   + {W_UNIQ} * (n_uniq::DOUBLE / n_tok::DOUBLE)))), 6) AS q_score
        FROM f
    )
    SELECT d.doc_id, s.q_score,
           coalesce(s.q_score >= {KEEP_THRESHOLD}, FALSE) AS keep
    FROM documents d LEFT JOIN s USING (doc_id)
    ORDER BY d.doc_id
"""
