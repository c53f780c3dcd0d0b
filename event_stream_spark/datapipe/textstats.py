"""Text analysis operators over the ``documents`` table: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

Every operator is a pure column expression with an exactly-mirrored DuckDB
oracle.  Formulas are deliberately simple + deterministic; at 100 TB each is
a narrow projection over the text scan (no shuffle at all until the optional
aggregation on top).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_stream_spark.datapipe.text import words
from event_stream_spark.queries import t

# small per-language stopword lists for the n-gram/stopword-hit heuristic
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "que"],
}
LANG_ORDER = ["en", "de", "fr", "es"]  # deterministic tie precedence


def text_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """Whitespace token count + BPE-ish subword estimate (a length-based
    regex proxy: tokens ≈ words + ceil(chars/4) overflow of long words)."""
    d = t(spark, sf, "documents")
    ws = words(F.col("text"))
    n_words = F.size(ws)
    # long words cost extra subword units: sum ceil(len/4) - 1 over words > 4 chars
    extra = F.aggregate(
        ws,
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.when(F.length(w) > 4, F.ceil(F.length(w) / 4) - 1).otherwise(0),
    )
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        (n_words + extra).alias("n_tokens_est"),
    ).orderBy("doc_id")


TEXT_TOKENS_SQL = """
    WITH w AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ws
        FROM documents)
    SELECT doc_id,
           len(ws) AS n_words,
           len(ws) + list_sum(list_transform(ws,
               x -> CASE WHEN length(x) > 4 THEN cast(ceil(length(x)/4.0) AS BIGINT) - 1
                         ELSE 0 END))::BIGINT AS n_tokens_est
    FROM w ORDER BY doc_id
"""


def text_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Quality score in [0,1]: length saturation × (1 − punctuation ratio) ×
    mean-word-length sanity band.  Deterministic arithmetic, rounded 6dp."""
    d = t(spark, sf, "documents")
    ws = words(F.col("text"))
    n_chars = F.length("text")
    n_words = F.size(ws)
    punct = F.length(F.regexp_replace(F.col("text"), r"[^.!?,;:]", ""))
    mean_wl = n_chars / F.greatest(n_words, F.lit(1))
    len_sat = F.least(F.lit(1.0), n_words / F.lit(50.0))
    punct_pen = 1.0 - punct / F.greatest(n_chars, F.lit(1))
    wl_ok = F.when((mean_wl >= 3) & (mean_wl <= 12), F.lit(1.0)).otherwise(F.lit(0.5))
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(len_sat * punct_pen * wl_ok, 6).alias("quality"),
    ).orderBy("doc_id")


TEXT_QUALITY_SQL = """
    WITH w AS (
        SELECT doc_id, text,
               list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ws
        FROM documents)
    SELECT doc_id, len(ws) AS n_words,
           round(least(1.0, len(ws) / 50.0)
                 * (1.0 - length(regexp_replace(text, '[^.!?,;:]', '', 'g'))::DOUBLE
                          / greatest(length(text), 1))
                 * (CASE WHEN length(text)::DOUBLE / greatest(len(ws),1) BETWEEN 3 AND 12
                         THEN 1.0 ELSE 0.5 END), 6) AS quality
    FROM w ORDER BY doc_id
"""


def text_langid(spark: SparkSession, sf: str) -> DataFrame:
    """Language-ID heuristic: CJK char check, else stopword-hit argmax with
    fixed precedence (en > de > fr > es), 'und' (undetermined) when no hits."""
    d = t(spark, sf, "documents")
    ws = F.array_distinct(words(F.col("text")))
    hits = {
        lang: F.size(
            F.array_intersect(ws, F.array(*[F.lit(w) for w in sw]))
        )
        for lang, sw in STOPWORDS.items()
    }
    best = F.greatest(*[hits[lang] for lang in LANG_ORDER])
    pred = F.when(F.col("text").rlike("[一-鿿]"), F.lit("zh"))
    pred = pred.when(best == 0, F.lit("und"))
    for lang in LANG_ORDER:
        pred = pred.when(hits[lang] == best, F.lit(lang))
    return d.select("doc_id", pred.alias("lang_pred")).orderBy("doc_id")


def _duck_hits(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_intersect(ws, [{lst}]))"


TEXT_LANGID_SQL = f"""
    WITH w AS (
        SELECT doc_id, text,
               list_distinct(list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x <> '')) AS ws
        FROM documents)
    SELECT doc_id,
           CASE
             WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
             WHEN greatest({_duck_hits('en')}, {_duck_hits('de')},
                           {_duck_hits('fr')}, {_duck_hits('es')}) = 0 THEN 'und'
             WHEN {_duck_hits('en')} = greatest({_duck_hits('en')}, {_duck_hits('de')},
                           {_duck_hits('fr')}, {_duck_hits('es')}) THEN 'en'
             WHEN {_duck_hits('de')} = greatest({_duck_hits('en')}, {_duck_hits('de')},
                           {_duck_hits('fr')}, {_duck_hits('es')}) THEN 'de'
             WHEN {_duck_hits('fr')} = greatest({_duck_hits('en')}, {_duck_hits('de')},
                           {_duck_hits('fr')}, {_duck_hits('es')}) THEN 'fr'
             ELSE 'es'
           END AS lang_pred
    FROM w ORDER BY doc_id
"""


def text_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Document fingerprint: lexicographic-min md5 over distinct word
    3-gram shingles (winnowing-lite rolling signature); null if < 3 words.

    Row-based shingles (codegen lead() windows) → md5 → groupBy-min → left
    join restores shingle-less docs as null."""
    from event_stream_spark.datapipe.text import doc_shingles

    d = t(spark, sf, "documents")
    fp = (
        doc_shingles(spark, sf, 3)
        .select("doc_id", F.md5("s").alias("h"))
        .groupBy("doc_id")
        .agg(F.min("h").alias("fingerprint"))
    )
    return d.select("doc_id").join(fp, "doc_id", "left").orderBy("doc_id")


TEXT_FINGERPRINT_SQL = """
    WITH w AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ws
        FROM documents)
    SELECT doc_id,
           CASE WHEN len(ws) >= 3 THEN
             list_min(list_transform(
               list_distinct(list_transform(range(1, len(ws) - 1),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])),
               x -> md5(x)))
           ELSE NULL END AS fingerprint
    FROM w ORDER BY doc_id
"""


def corpus_report(spark: SparkSession, sf: str) -> DataFrame:
    """Data-card summary: CUBE(lang, source) rollup of document counts,
    exact-distinct text counts (the dup-rate numerator), word totals and
    mean length — the one-query corpus report a dataset release ships.

    Scale shape: a single CUBE aggregation — Spark expands grouping sets
    and map-side-combines each; the only corpus-scale exchange carries
    (lang, source, md5, partial counts).  The distinct-text count rides the
    same shuffle as a 16-byte hash (text itself never moves)."""
    d = t(spark, sf, "documents")
    n_words = F.size(words(F.col("text")))
    return (
        d.select("lang", "source", F.md5("text").alias("h"), n_words.alias("nw"), "n_chars")
        .cube("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("h").alias("n_distinct_texts"),
            F.sum("nw").alias("n_words"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
        .orderBy(
            F.col("lang").asc_nulls_first(), F.col("source").asc_nulls_first()
        )
    )


CORPUS_REPORT_SQL = """
    SELECT lang, source,
           count(*)::BIGINT AS n_docs,
           count(DISTINCT md5(text))::BIGINT AS n_distinct_texts,
           sum(len(list_filter(string_split_regex(lower(text), '\\s+'),
                               x -> x <> '')))::BIGINT AS n_words,
           round(avg(n_chars), 2) AS avg_chars
    FROM documents
    GROUP BY CUBE (lang, source)
    ORDER BY lang NULLS FIRST, source NULLS FIRST
"""


# ---------------------------------------------------------------------------
# Per-language length-outlier trim
# ---------------------------------------------------------------------------

TRIM_LO = 0.05
TRIM_HI = 0.95


def length_trim(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language length-outlier trim: docs outside their language's
    [p5, p95] char-length band are flagged for removal — the standard
    "too short / suspiciously long" cleaning cut, calibrated per stratum
    instead of with global magic constants (a p95 for zh is very different
    from one for en).

    Scale shape: one partial-agg shuffle on the (tiny-cardinality) lang key
    computes both exact percentiles (``F.percentile``, sort-based state
    inside the aggregate buffer — same engine machinery as q28, where the
    heavy-group caveat and the `percentile_approx` escape hatch are
    documented); the cutoff table is a handful of rows and broadcasts back
    onto the scan, so flagging is a narrow codegen projection.  DuckDB's
    ``quantile_cont`` shares the linear-interpolation definition, so the
    oracle matches bit-for-bit after rounding.
    """
    d = t(spark, sf, "documents")
    cuts = d.groupBy("lang").agg(
        F.round(F.expr(f"percentile(n_chars, {TRIM_LO})"), 4).alias("p_lo"),
        F.round(F.expr(f"percentile(n_chars, {TRIM_HI})"), 4).alias("p_hi"),
    )
    keep = (F.col("n_chars") >= F.col("p_lo")) & (F.col("n_chars") <= F.col("p_hi"))
    return (
        d.join(F.broadcast(cuts), "lang")
        .select("doc_id", "lang", "n_chars", "p_lo", "p_hi", keep.alias("keep"))
        .orderBy("doc_id")
    )


LENGTH_TRIM_SQL = f"""
    WITH cuts AS (
        SELECT lang,
               round(quantile_cont(n_chars, {TRIM_LO}), 4) AS p_lo,
               round(quantile_cont(n_chars, {TRIM_HI}), 4) AS p_hi
        FROM documents GROUP BY lang
    )
    SELECT doc_id, d.lang, n_chars, p_lo, p_hi,
           (n_chars >= p_lo AND n_chars <= p_hi) AS keep
    FROM documents d JOIN cuts USING (lang)
    ORDER BY doc_id
"""


def text_readability(spark: SparkSession, sf: str) -> DataFrame:
    """Flesch Reading Ease and Flesch–Kincaid grade per document — the
    classic readability features a quality classifier consumes alongside
    the Gopher-style ratios (``text_quality``):

        ease  = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)
        grade = 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59

    Syllables use the standard vowel-group heuristic (runs of [aeiouy],
    minimum 1 per word) and sentences count terminal-punctuation runs
    (minimum 1) — both pure regex, mirrored verbatim in the oracle.

    Scale shape: one doc_id aggregation over the shared ``word_rows``
    contract plus a narrow per-doc regex projection — a single linear
    shuffle, all codegen.  Scores are integer-scaled ×1e3 (the
    ``surprisal_p6`` determinism contract)."""
    from event_stream_spark.datapipe.text import word_rows

    d = t(spark, sf, "documents")
    syl = F.greatest(
        F.size(F.expr("regexp_extract_all(w, '[aeiouy]+', 0)")), F.lit(1)
    )
    per = (
        word_rows(d)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(syl).alias("n_syllables"),
        )
    )
    sent = d.select(
        "doc_id",
        F.greatest(
            F.size(F.expr(r"regexp_extract_all(text, '[.!?]+', 0)")), F.lit(1)
        ).alias("n_sentences"),
    )
    wps = F.col("n_words") / F.col("n_sentences")
    spw = F.col("n_syllables") / F.col("n_words")
    ease = F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    grade = F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
    return (
        per.join(sent, "doc_id")
        .select(
            "doc_id", "n_words", "n_sentences", "n_syllables",
            F.round(ease * 1e3).cast("long").alias("ease_p3"),
            F.round(grade * 1e3).cast("long").alias("grade_p3"),
        )
        .orderBy("doc_id")
    )


TEXT_READABILITY_SQL = """
    WITH w AS (
        SELECT doc_id, x.w
        FROM (SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '\\s+'),
                                 t -> t <> '') AS ws
              FROM documents) d,
             unnest(d.ws) AS x(w)),
    per AS (
        SELECT doc_id, count(*) AS n_words,
               sum(greatest(len(regexp_extract_all(w, '[aeiouy]+')), 1))
                   AS n_syllables
        FROM w GROUP BY doc_id),
    sent AS (
        SELECT doc_id,
               greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                   AS n_sentences
        FROM documents)
    SELECT doc_id, n_words, n_sentences, n_syllables::BIGINT AS n_syllables,
           CAST(round((206.835 - 1.015 * (n_words / n_sentences)
                       - 84.6 * (n_syllables / n_words)) * 1e3) AS BIGINT)
               AS ease_p3,
           CAST(round((0.39 * (n_words / n_sentences)
                       + 11.8 * (n_syllables / n_words) - 15.59) * 1e3)
               AS BIGINT) AS grade_p3
    FROM per JOIN sent USING (doc_id)
    ORDER BY doc_id
"""


def char_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Shannon character entropy per document, H = −Σ p(c)·ln p(c) — the
    compressibility proxy quality filters use to catch gibberish at both
    ends (repeated-character spam scores near 0; uniform random bytes
    score near ln(alphabet); natural language sits in a narrow band).

    Scale shape: one (doc_id, char) partial-agg shuffle; the per-doc
    totals (n, alphabet) are unordered whole-partition window aggregates
    over that same exchange — doc_id hash-partitioning satisfies both the
    window and the final rollup, so neither adds an exchange (the old
    groupBy-totals + join-back form re-aggregated and joined the freq
    relation).  The per-doc character alphabet is bounded (≤ a few
    hundred distinct), so window and rollup state are tiny.
    Integer-scaled output (the ``surprisal_p6`` contract) absorbs
    cross-engine summation-order ulp drift."""
    from pyspark.sql import Window

    d = t(spark, sf, "documents")
    ch = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("text")),
                lambda i: F.col("text").substr(i, F.lit(1)),
            )
        ).alias("ch"),
    )
    freq = ch.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    wd = Window.partitionBy("doc_id")
    freq = freq.select(
        "doc_id",
        "c",
        F.sum("c").over(wd).alias("n"),
        F.count("*").over(wd).alias("alphabet"),
    )
    p = F.col("c") / F.col("n")
    return (
        freq.groupBy("doc_id")
        .agg(
            F.max("n").alias("n_chars_counted"),
            F.max("alphabet").alias("alphabet"),
            F.round(-F.sum(p * F.log(p)) * 1e6).cast("long").alias("entropy_p6"),
        )
        .orderBy("doc_id")
    )


CHAR_ENTROPY_SQL = """
    WITH ch AS (
        SELECT doc_id, substring(text, i, 1) AS ch
        FROM documents,
             LATERAL (SELECT unnest(range(1, length(text) + 1)) AS i)),
    f AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY doc_id, ch),
    n AS (SELECT doc_id, sum(c) AS n, count(*) AS alphabet
          FROM f GROUP BY doc_id)
    SELECT f.doc_id,
           max(n.n)::BIGINT AS n_chars_counted,
           max(n.alphabet) AS alphabet,
           CAST(round(-sum((f.c / CAST(n.n AS DOUBLE))
                           * ln(f.c / CAST(n.n AS DOUBLE))) * 1e6) AS BIGINT)
               AS entropy_p6
    FROM f JOIN n ON n.doc_id = f.doc_id
    GROUP BY f.doc_id
    ORDER BY f.doc_id
"""


def langid_confusion(spark: SparkSession, sf: str) -> DataFrame:
    """Language-ID confusion matrix: labeled language × predicted language
    with counts and the within-label fraction — the data-card diagnostic
    that shows WHERE the lang-id heuristic loses documents (and, dually,
    how much of each labeled slice is mislabeled upstream).

    Scale shape: the prediction is ``text_langid``'s scan-local codegen
    projection; one doc_id equi-join recovers the label and one
    (lang, lang_pred) partial aggregate — a |langs|² result.  The
    fraction uses the pure-BIGINT HALF-UP identity."""
    from event_stream_spark.queries import t

    pred = text_langid(spark, sf)
    lab = t(spark, sf, "documents").select("doc_id", "lang")
    # referenced twice (per-label totals + the final fraction select);
    # unpersisted, each reference re-executes the corpus scan + langid
    # projection + join.  |langs|²-sized — persist is free; recomputed
    # from parquet every execution.
    pairs = (
        lab.join(pred, "doc_id")
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").alias("n"))
        .persist()
    )
    tot = pairs.groupBy("lang").agg(F.sum("n").alias("n_lang"))
    return (
        pairs.join(F.broadcast(tot), "lang")
        .select(
            "lang", "lang_pred",
            F.col("n").cast("long").alias("n"),
            F.expr("(n * 2000000 + n_lang) div (2 * n_lang)")
            .cast("long")
            .alias("frac_p6"),
        )
        .orderBy("lang", "lang_pred")
    )


LANGID_CONFUSION_SQL = f"""
    WITH pred AS (SELECT doc_id, lang_pred FROM ({TEXT_LANGID_SQL})),
    pairs AS (
        SELECT d.lang, p.lang_pred, count(*) AS n
        FROM documents d JOIN pred p USING (doc_id)
        GROUP BY d.lang, p.lang_pred),
    tot AS (SELECT lang, sum(n) AS n_lang FROM pairs GROUP BY lang)
    SELECT pairs.lang, lang_pred,
           CAST(n AS BIGINT) AS n,
           CAST((n * 2000000 + n_lang) // (2 * n_lang) AS BIGINT) AS frac_p6
    FROM pairs JOIN tot ON tot.lang = pairs.lang
    ORDER BY pairs.lang, lang_pred
"""


def text_novelty(spark: SparkSession, sf: str) -> DataFrame:
    """First-occurrence novelty per document: the fraction of its distinct
    word 3-grams whose corpus-wide FIRST occurrence (min doc_id) is this
    document — the novelty curve that diagnoses corpus ordering (a
    well-shuffled corpus decays smoothly; a crawl sorted by domain shows
    cliffs where template families begin).

    Scale shape: reuses the shared shingle mat-view; min(doc_id) per gram
    is one map-side-combinable shuffle riding (hash, long) pairs, joined
    back co-keyed.  The fraction is the pure-BIGINT HALF-UP identity;
    shingle-less docs default to fully novel."""
    from event_stream_spark.datapipe.text import doc_shingles
    from event_stream_spark.queries import t

    sh = doc_shingles(spark, sf, 3)
    first = sh.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    per = (
        sh.join(first, "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
    )
    d = t(spark, sf, "documents").select("doc_id")
    return (
        d.join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
            F.coalesce(
                F.expr("(n_novel * 2000000 + n_shingles) div (2 * n_shingles)"),
                F.lit(1000000),
            )
            .cast("long")
            .alias("novelty_p6"),
        )
        .orderBy("doc_id")
    )


TEXT_NOVELTY_SQL = """
    WITH w AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ws
        FROM documents),
    sh AS (
        SELECT doc_id, unnest(
                 list_distinct(list_transform(range(1, len(ws) - 1),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS s
        FROM w WHERE len(ws) >= 3),
    first AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY s),
    per AS (
        SELECT sh.doc_id, count(*) AS n,
               sum(CASE WHEN first.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS nov
        FROM sh JOIN first USING (s) GROUP BY sh.doc_id)
    SELECT d.doc_id,
           CAST(coalesce(per.n, 0) AS BIGINT) AS n_shingles,
           CAST(coalesce(per.nov, 0) AS BIGINT) AS n_novel,
           CAST(coalesce((per.nov * 2000000 + per.n) // (2 * per.n),
                         1000000) AS BIGINT) AS novelty_p6
    FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
    ORDER BY d.doc_id
"""


# Gopher's own stop-word rule list (Rae et al. 2021, app. A1) — distinct
# from the language-ID STOPWORDS table above, which serves other operators.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def quality_gopher(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher rule-based quality report (Rae et al. 2021, app. A1,
    re-expressed relationally; the reference's filter-operator family is
    es-core/.../Filters.kt).  Five rules at the paper's thresholds, each
    a pure integer predicate: word count in [50, 100,000], mean word
    length in [3, 10], symbol-to-word ratio ("#" or "..." ) <= 0.1,
    >= 80% of words containing at least one letter (Unicode letter class
    ``\\p{L}`` in both dialects, so accented/non-Latin words count), and
    at least 2 DISTINCT words from the paper's 8-word stop list
    (``GOPHER_STOPWORDS``) present.

    Cross-engine hash-exact contract: every ratio is integer-scaled
    (floor((x * 1e6) / words) on BIGINTs in both dialects) and the pass
    flag compares those integers — no float ever crosses the comparison
    boundary.  Scale shape: narrow projection over the text scan, zero
    shuffles; the per-word lambdas run once per word (O(doc length));
    the distinct-stop probe iterates the constant 8-word list, not the
    document.
    """
    d = t(spark, sf, "documents")
    ws = words(F.col("text"))
    stop_arr = "array(" + ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS) + ")"
    e = (
        d.select("doc_id", "text", ws.alias("ws"))
        .select(
            "doc_id",
            F.size("ws").alias("n_words"),
            F.aggregate(
                "ws", F.lit(0).cast("long"), lambda a, w: a + F.length(w)
            ).alias("sum_wl"),
            (
                F.length("text")
                - F.length(F.regexp_replace("text", r"[#]", ""))
                + (F.size(F.split("text", r"\.\.\.", -1)) - 1)
            ).cast("long").alias("n_sym"),
            F.size(F.expr(r"filter(ws, w -> w rlike '\\p{L}')"))
            .cast("long")
            .alias("n_alpha"),
            F.size(F.expr(f"filter({stop_arr}, s -> array_contains(ws, s))"))
            .cast("long")
            .alias("stop_distinct"),
        )
    )
    mean_wl_c = F.expr("(sum_wl * 100) DIV greatest(n_words, 1)")
    sym_ppm = F.expr("(n_sym * 1000000) DIV greatest(n_words, 1)")
    alpha_ppm = F.expr("(n_alpha * 1000000) DIV greatest(n_words, 1)")
    return e.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        mean_wl_c.alias("mean_wl_c"),
        sym_ppm.alias("sym_ppm"),
        alpha_ppm.alias("alpha_ppm"),
        "stop_distinct",
        (
            F.col("n_words").between(50, 100_000)
            & mean_wl_c.between(300, 1000)
            & (sym_ppm <= 100_000)
            & (alpha_ppm >= 800_000)
            & (F.col("stop_distinct") >= 2)
        ).alias("gopher_pass"),
    ).orderBy("doc_id")


_GOPHER_STOP_LIST = "[" + ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS) + "]"
QUALITY_GOPHER_SQL = f"""
    WITH w AS (
        SELECT doc_id, text,
               list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ws
        FROM documents),
    e AS (
        SELECT doc_id,
               len(ws)::BIGINT AS n_words,
               coalesce(list_sum(list_transform(ws, x -> length(x))), 0)::BIGINT AS sum_wl,
               (length(text) - length(regexp_replace(text, '[#]', '', 'g'))
                + len(string_split(text, '...')) - 1)::BIGINT AS n_sym,
               len(list_filter(ws, x -> regexp_matches(x, '\\p{{L}}')))::BIGINT AS n_alpha,
               len(list_filter({_GOPHER_STOP_LIST},
                               s -> list_contains(ws, s)))::BIGINT AS stop_distinct
        FROM w)
    SELECT doc_id, n_words,
           (sum_wl * 100) // greatest(n_words, 1) AS mean_wl_c,
           (n_sym * 1000000) // greatest(n_words, 1) AS sym_ppm,
           (n_alpha * 1000000) // greatest(n_words, 1) AS alpha_ppm,
           stop_distinct,
           (n_words BETWEEN 50 AND 100000
            AND (sum_wl * 100) // greatest(n_words, 1) BETWEEN 300 AND 1000
            AND (n_sym * 1000000) // greatest(n_words, 1) <= 100000
            AND (n_alpha * 1000000) // greatest(n_words, 1) >= 800000
            AND stop_distinct >= 2) AS gopher_pass
    FROM e ORDER BY doc_id
"""


def text_diversity(spark: SparkSession, sf: str) -> DataFrame:
    """Lexical diversity: type-token ratio and hapax-legomenon fraction per
    document (the classic repetition-complement signal — a doc whose words
    are mostly hapaxes is diverse; one whose TTR collapses is template spam).

    Row-based, not HOF: per-doc word counts come from one
    (doc_id, w)-keyed aggregation over the shared ``word_rows`` contract
    (O(corpus tokens), linear shuffle), then a doc_id rollup — never an
    O(types x length) per-row lambda, so a 1M-word document costs the same
    per token as a 50-word one.  Ratios integer-scaled (ppm) for the
    cross-engine hash contract.
    """
    from event_stream_spark.datapipe.text import word_rows

    d = t(spark, sf, "documents")
    per = (
        word_rows(d)
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_words"),
            F.count("*").alias("n_types"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("n_hapax"),
        )
    )
    return (
        d.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("n_types", F.lit(0)).cast("long").alias("n_types"),
            F.coalesce("n_hapax", F.lit(0)).cast("long").alias("n_hapax"),
            F.coalesce(
                F.expr("(n_types * 1000000) DIV n_words"), F.lit(0)
            ).alias("ttr_ppm"),
            F.coalesce(
                F.expr("(n_hapax * 1000000) DIV n_words"), F.lit(0)
            ).alias("hapax_ppm"),
        )
        .orderBy("doc_id")
    )


TEXT_DIVERSITY_SQL = """
    WITH tok AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  x -> x <> '')) AS w
        FROM documents),
    wc AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w),
    per AS (
        SELECT doc_id, sum(c)::BIGINT AS n_words, count(*)::BIGINT AS n_types,
               sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax
        FROM wc GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(p.n_words, 0) AS n_words,
           coalesce(p.n_types, 0) AS n_types,
           coalesce(p.n_hapax, 0) AS n_hapax,
           coalesce((p.n_types * 1000000) // p.n_words, 0) AS ttr_ppm,
           coalesce((p.n_hapax * 1000000) // p.n_words, 0) AS hapax_ppm
    FROM documents d LEFT JOIN per p USING (doc_id)
    ORDER BY d.doc_id
"""
