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


# ---------------------------------------------------------------------------
# Iterative BPE training — N greedy merge rounds
# ---------------------------------------------------------------------------

BPE_SEP = "|"  # symbol-boundary separator (outside the corpus charset)
BPE_ROUNDS = 6

#: learned merges per (session, sf, rounds) — like similarity._IVF_SEED_CACHE,
#: so repeated plan builds re-run no round jobs
_MERGE_CACHE: dict[tuple[str, str, int], list[tuple[int, str, str, int]]] = {}


def _word_syms(spark: SparkSession, sf: str) -> DataFrame:
    """(s, freq): each distinct word as a separator-joined symbol string
    (chars + end-of-word marker), with its corpus frequency."""
    wc = (
        word_rows(t(spark, sf, "documents"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    syms = F.concat(F.split("w", ""), F.array(F.lit(BPE_EOW)))
    return wc.select(F.array_join(syms, BPE_SEP).alias("s"), "freq")


def _pair_counts(df: DataFrame) -> DataFrame:
    """(l, r, cnt): adjacent-symbol pair counts weighted by word freq —
    all codegen (split / element_at / partial-agg sum)."""
    ex = df.select(
        F.split("s", r"\|").alias("a"), "freq"
    ).select(
        "a",
        "freq",
        # sequence(1, 0) counts DOWN in Spark — a fully-merged
        # single-symbol word must contribute no pairs, not index a[2]
        F.explode(
            F.when(
                F.size("a") >= 2, F.sequence(F.lit(1), F.size("a") - 1)
            ).otherwise(F.expr("array()").cast("array<int>"))
        ).alias("i"),
    )
    return (
        ex.select(
            F.element_at("a", F.col("i")).alias("l"),
            F.element_at("a", F.col("i") + 1).alias("r"),
            "freq",
        )
        .groupBy("l", "r")
        .agg(F.sum("freq").alias("cnt"))
    )


def _merged(df: DataFrame, l: str, r: str) -> DataFrame:
    """Apply one merge greedily: ``replace`` consumes non-overlapping
    ``l SEP r`` occurrences left-to-right — exactly the BPE single-pass
    merge scan (a merged token never re-pairs with the following symbol in
    the same round)."""
    return df.select(
        F.replace("s", F.lit(l + BPE_SEP + r), F.lit(l + r)).alias("s"),
        "freq",
    )


def bpe_merges(
    spark: SparkSession, sf: str, rounds: int = BPE_ROUNDS
) -> list[tuple[int, str, str, int]]:
    """The learned merge table [(round, l, r, cnt)].  Each round is one
    distributed pair-count aggregation plus a 1-row fetch (the
    ``embed_kmeans`` collect-per-round shape); the chosen pair becomes a
    literal in the next round's ``replace`` chain."""
    from event_stream_spark.queries import _session_key

    ck = (_session_key(spark), sf, rounds)
    merges = _MERGE_CACHE.get(ck)
    if merges is None:
        merges = []
        # round k's head() re-executes the whole chain from the base —
        # without the persist that is k+1 corpus-scale word-frequency
        # shuffles across the loop (quadratic in rounds); persisted, the
        # base aggregation runs once and each round adds only its
        # replace-projection + pair-count pass
        cur = _word_syms(spark, sf).persist()
        for rnd in range(rounds):
            row = (
                _pair_counts(cur).orderBy(F.desc("cnt"), "l", "r").limit(1).head()
            )
            if row is None:
                break
            merges.append((rnd, row["l"], row["r"], int(row["cnt"])))
            cur = _merged(cur, row["l"], row["r"])
        _MERGE_CACHE[ck] = merges
    return merges


def bpe_learn(spark: SparkSession, sf: str, rounds: int = BPE_ROUNDS) -> DataFrame:
    """Iterative BPE tokenizer training: ``rounds`` greedy merge rounds over
    the corpus, returning the learned merge table (rnd, l, r, cnt).

    Scale shape, per round: the symbol relation stays at DISTINCT-WORD
    cardinality (Heaps'-law-small vs the corpus — the corpus-scale
    word-frequency shuffle happens once, before round 0), the pair-count
    aggregation is map-side combined to the tiny pair key space, the merge
    itself is a codegen ``replace`` projection (no shuffle), and the chosen
    pair travels as a literal (1-row fetch, memoized per session/sf).  The
    DuckDB oracle replays every round verbatim via unrolled CTEs — same
    split, same greedy non-overlapping replace, same (cnt DESC, l, r)
    tie-break."""
    from functools import reduce

    merges = bpe_merges(spark, sf, rounds)
    # every union branch below re-inlines the chain from the base symbol
    # relation (branch k = base + k replace projections): unpersisted,
    # the corpus word-frequency shuffle runs once PER ROUND instead of
    # once per execution.  Distinct-word-sized (Heaps'-law small);
    # recomputed from parquet each run — the bench's release step drops
    # the blocks after every materialization.
    cur = _word_syms(spark, sf).persist()
    outs = []
    for rnd, l, r, _cnt in merges:
        outs.append(
            _pair_counts(cur)
            .orderBy(F.desc("cnt"), "l", "r")
            .limit(1)
            .select(F.lit(rnd).alias("rnd"), "l", "r", "cnt")
        )
        cur = _merged(cur, l, r)
    return reduce(lambda a, b: a.unionByName(b), outs).orderBy("rnd")


def _bpe_ctes(rounds: int = BPE_ROUNDS) -> str:
    """The shared learn-chain CTEs (word freqs, per-round pair counts/top
    pair/merged vocab) — used by both the learn oracle and the tokenize
    oracle so the two can never drift."""
    parts = [
        f"""w AS (
        SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  x -> x <> '')) AS w
        FROM documents),
    f AS (SELECT w, count(*) AS freq FROM w GROUP BY w),
    wc0 AS (SELECT array_to_string(list_append(string_split(w, ''), '{BPE_EOW}'),
                                   '{BPE_SEP}') AS s, freq FROM f)"""
    ]
    for i in range(rounds):
        parts.append(
            f"""pc{i} AS (
        SELECT a[gi] AS l, a[gi + 1] AS r, sum(freq)::BIGINT AS cnt
        FROM (SELECT string_split(s, '{BPE_SEP}') AS a, freq,
                     unnest(range(1, len(string_split(s, '{BPE_SEP}')))) AS gi
              FROM wc{i})
        GROUP BY a[gi], a[gi + 1]),
    p{i} AS (SELECT l, r, cnt FROM pc{i} ORDER BY cnt DESC, l, r LIMIT 1)"""
        )
        parts.append(
            f"""wc{i + 1} AS (
        SELECT replace(s, p.l || '{BPE_SEP}' || p.r, p.l || p.r) AS s, freq
        FROM wc{i} CROSS JOIN p{i} p)"""
        )
    return ",\n    ".join(parts)


def _bpe_learn_sql(rounds: int = BPE_ROUNDS) -> str:
    sel = " UNION ALL ".join(
        f"SELECT {i} AS rnd, l, r, cnt FROM p{i}" for i in range(rounds)
    )
    return (
        "WITH "
        + _bpe_ctes(rounds)
        + f"\n    SELECT * FROM ({sel}) ORDER BY rnd"
    )


BPE_LEARN_SQL = _bpe_learn_sql()


def bpe_tokenize(spark: SparkSession, sf: str, rounds: int = BPE_ROUNDS) -> DataFrame:
    """Apply the learned merge table to the corpus: per document, the word
    count and the BPE token count after ``rounds`` merges — the
    learn→apply loop a tokenizer pipeline runs end-to-end.

    Scale shape: the merges are literals (memoized 1-row fetches via
    :func:`bpe_merges`), so tokenization is a pure codegen projection — a
    chain of ``rounds`` ``replace`` calls per word occurrence, zero joins.
    The deliberate choice is per-occurrence CPU over a tokenize-the-vocab +
    join-back formulation: the join would add a corpus-scale shuffle on the
    word key, and at 100 TB shuffle bytes dominate a few string replaces
    per row.  The only exchange is the final per-doc aggregation."""
    merges = bpe_merges(spark, sf, rounds)
    w = word_rows(t(spark, sf, "documents"))
    syms = F.concat(F.split("w", ""), F.array(F.lit(BPE_EOW)))
    s = F.array_join(syms, BPE_SEP)
    for _rnd, l, r, _cnt in merges:
        s = F.replace(s, F.lit(l + BPE_SEP + r), F.lit(l + r))
    n_sym = F.size(F.split(s, r"\|"))
    return (
        w.select("doc_id", n_sym.alias("n_sym"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sym").alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    )


def _bpe_tokenize_sql(rounds: int = BPE_ROUNDS) -> str:
    apply_expr = f"array_to_string(list_append(string_split(o.w, ''), '{BPE_EOW}'), '{BPE_SEP}')"
    for i in range(rounds):
        apply_expr = (
            f"replace({apply_expr}, p{i}.l || '{BPE_SEP}' || p{i}.r, p{i}.l || p{i}.r)"
        )
    crosses = " ".join(f"CROSS JOIN p{i}" for i in range(rounds))
    return (
        "WITH "
        + _bpe_ctes(rounds)
        + f""",
    occ AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  x -> x <> '')) AS w
        FROM documents),
    tok AS (
        SELECT o.doc_id,
               len(string_split({apply_expr}, '{BPE_SEP}')) AS n_sym
        FROM occ o {crosses})
    SELECT doc_id, count(*)::BIGINT AS n_words, sum(n_sym)::BIGINT AS n_bpe_tokens
    FROM tok GROUP BY doc_id ORDER BY doc_id"""
    )


BPE_TOKENIZE_SQL = _bpe_tokenize_sql()


def bpe_fertility(
    spark: SparkSession, sf: str, rounds: int = BPE_ROUNDS
) -> DataFrame:
    """Per language: tokenizer FERTILITY (BPE tokens per word) and
    compression (chars per token) under the learned merge table — the
    standard cross-lingual tokenizer-quality report (a language with
    fertility ≫ another pays proportionally more sequence length for the
    same text; the mBERT/XLM-R literature tunes vocab allocations on
    exactly this number).

    Scale shape: same as ``bpe_tokenize`` — merges are literals, so the
    per-occurrence token count is a pure codegen ``replace`` chain with
    ``lang`` carried through the word explode (no join back to the
    documents table at all); the only exchange is the per-language
    aggregation, map-side-combined down to |langs| rows.  Ratios use the
    pure-BIGINT HALF-UP identity (the ``dup_spans`` contract)."""
    merges = bpe_merges(spark, sf, rounds)
    d = t(spark, sf, "documents")
    # word_rows' tokenization contract (lowercase, split \s+, drop
    # empties) with lang carried inline — forking the explode here avoids
    # a corpus-scale doc_id join just to recover the language column
    w = d.select(
        "lang",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")
    syms = F.concat(F.split("w", ""), F.array(F.lit(BPE_EOW)))
    s = F.array_join(syms, BPE_SEP)
    for _rnd, l, r, _cnt in merges:
        s = F.replace(s, F.lit(l + BPE_SEP + r), F.lit(l + r))
    n_sym = F.size(F.split(s, r"\|"))
    return (
        w.select("lang", F.length("w").alias("n_chars_w"), n_sym.alias("n_sym"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sym").alias("n_tokens"),
            F.sum("n_chars_w").alias("n_chars"),
        )
        .select(
            "lang",
            "n_words",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_chars").cast("long").alias("n_chars"),
            F.expr("(n_tokens * 2000000 + n_words) div (2 * n_words)")
            .cast("long")
            .alias("fertility_p6"),
            F.expr("(n_chars * 2000000 + n_tokens) div (2 * n_tokens)")
            .cast("long")
            .alias("chars_per_token_p6"),
        )
        .orderBy("lang")
    )


def _bpe_fertility_sql(rounds: int = BPE_ROUNDS) -> str:
    apply_expr = (
        f"array_to_string(list_append(string_split(o.w, ''), '{BPE_EOW}'), "
        f"'{BPE_SEP}')"
    )
    for i in range(rounds):
        apply_expr = (
            f"replace({apply_expr}, p{i}.l || '{BPE_SEP}' || p{i}.r, p{i}.l || p{i}.r)"
        )
    crosses = " ".join(f"CROSS JOIN p{i}" for i in range(rounds))
    return (
        "WITH "
        + _bpe_ctes(rounds)
        + f""",
    occ AS (
        SELECT lang,
               unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  x -> x <> '')) AS w
        FROM documents),
    tok AS (
        SELECT o.lang, length(o.w) AS n_chars_w,
               len(string_split({apply_expr}, '{BPE_SEP}')) AS n_sym
        FROM occ o {crosses}),
    per AS (
        SELECT lang, count(*) AS n_words, sum(n_sym) AS n_tokens,
               sum(n_chars_w) AS n_chars
        FROM tok GROUP BY lang)
    SELECT lang, n_words,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST((n_tokens * 2000000 + n_words) // (2 * n_words) AS BIGINT)
               AS fertility_p6,
           CAST((n_chars * 2000000 + n_tokens) // (2 * n_tokens) AS BIGINT)
               AS chars_per_token_p6
    FROM per
    ORDER BY lang"""
    )


BPE_FERTILITY_SQL = _bpe_fertility_sql()
