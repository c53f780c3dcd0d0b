"""Web-corpus curation operators: URL canonicalization + URL-level dedup,
domain blocklist filtering, paragraph-level exact dedup, and incremental
dedup of a new batch against an existing corpus.

These are the remaining curation stages of a CommonCrawl-style LM pipeline
(RefinedWeb/C4 recipes) that the dedup/similarity family doesn't cover:

- ``url_dedup``: canonicalize URLs (case-fold host, strip scheme/'www.',
  drop tracking query params, strip trailing slash) and keep the first doc
  per canonical URL, after dropping blocklisted domains.  Pure string
  expressions + one shuffle on the canonical-URL key; the blocklist is a
  broadcast anti-join (blocklists are KBs at any corpus size).
- ``dedup_paragraph``: RefinedWeb-style sub-document dedup — split each doc
  into fixed 10-word paragraphs, hash them, and mark every paragraph
  instance that repeats an earlier occurrence (global first-occurrence
  rule).  One shuffle on the paragraph hash; text never shuffles (only the
  64-bit hash + position travel).
- ``dedup_incremental``: dedup a NEW ingest batch against the EXISTING
  corpus by content hash — the every-crawl-cycle operation.  The existing
  side is reduced to distinct 128-bit hashes; the new side anti-joins on
  them.  At 100 TB the hash index either broadcasts (small refresh) or the
  anti-join co-partitions on the hash — and because the probe is pure
  equality, a bloom filter built from the existing hashes can pre-filter
  the scan (Spark injects exactly that via
  spark.sql.optimizer.runtime.bloomFilter.enabled when the build side is
  under threshold); the full anti-join then touches only survivors.

The documents table has no URL column, so a deterministic synthetic URL is
derived from (source, lang, doc_id) IDENTICALLY in Spark and the DuckDB
oracle — the operator surface (parsing/normalization) is what's under test,
not the generator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from event_stream_spark.queries import t

#: Domains dropped before URL dedup (robots/abuse blocklist stand-in).
BLOCKED_SOURCES = ("src3", "src7")

#: Words per paragraph for sub-document dedup.
PARA_WORDS = 10

#: Existing-corpus marker for incremental dedup: src0 docs are "already
#: ingested"; everything else is the new batch.
EXISTING_SOURCE = "src0"


def synthetic_url(doc_id: Column, source: Column, lang: Column) -> Column:
    """Deterministic raw URL with the warts normalization must handle:
    upper-case scheme/host, ``www.``, a tracking query param, and a
    trailing slash on every 3rd page."""
    return F.concat(
        F.lit("HTTPS://WWW."),
        F.upper(source),
        F.lit(".example.com/"),
        lang,
        F.lit("/page"),
        (doc_id % 40).cast("string"),
        F.when(doc_id % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?utm_source=feed&uid="),
        doc_id.cast("string"),
    )


def canonicalize_url(url: Column) -> Column:
    """Scheme stripped, host case-folded, ``www.`` dropped, query string
    dropped (tracking params carry no identity), trailing slash removed."""
    no_q = F.split(url, r"\?").getItem(0)
    no_scheme = F.regexp_replace(no_q, r"(?i)^https?://", "")
    host = F.lower(F.split(no_scheme, "/").getItem(0))
    path = F.substring(no_scheme, F.length(host) + 1, 1 << 20)
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_replace(path, r"/$", "")
    return F.concat(host, path)


def url_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Blocklist filter → canonical-URL keep-first dedup.

    Scale shape: the blocklist join broadcasts (blocklists are tiny); the
    keep-first is one shuffle on the canonical URL carrying only
    (canon_url, doc_id) — document text is joined back by doc_id only for
    survivors, so the wide column never rides the dedup shuffle.
    """
    d = t(spark, sf, "documents")
    raw = synthetic_url(F.col("doc_id"), F.col("source"), F.col("lang"))
    urls = d.select(
        "doc_id", "source", raw.alias("url"), canonicalize_url(raw).alias("canon_url")
    )
    block = spark.createDataFrame(
        [(s,) for s in BLOCKED_SOURCES], "source string"
    )
    allowed = urls.join(F.broadcast(block), "source", "left_anti")
    # keep-first as ONE row_number window (was: a min-doc_id aggregate
    # self-joined back — two scans of the allowed relation and two
    # exchanges).  doc_id is unique, so rn == 1 selects exactly the
    # min-doc_id row per canonical URL — identical result, one canon_url
    # exchange (the dedup_paragraph_clean pattern).
    from pyspark.sql import Window

    w = Window.partitionBy("canon_url").orderBy("doc_id")
    return (
        allowed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "url", "canon_url")
        .orderBy("doc_id")
    )


URL_DEDUP_SQL = f"""
    WITH u AS (
        SELECT doc_id, source,
               'HTTPS://WWW.' || upper(source) || '.example.com/' || lang
                 || '/page' || CAST(doc_id % 40 AS VARCHAR)
                 || CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END
                 || '?utm_source=feed&uid=' || CAST(doc_id AS VARCHAR) AS url
        FROM documents),
    c AS (
        SELECT doc_id, source, url,
               regexp_replace(
                 lower(string_split(regexp_replace(string_split(url, '?')[1],
                                                   '^(?i)https?://', ''), '/')[1]),
                 '^www\\.', '')
               || regexp_replace(
                    substring(regexp_replace(string_split(url, '?')[1],
                                             '^(?i)https?://', ''),
                              1 + len(string_split(regexp_replace(
                                    string_split(url, '?')[1],
                                    '^(?i)https?://', ''), '/')[1])),
                    '/$', '') AS canon_url
        FROM u
        WHERE source NOT IN {BLOCKED_SOURCES!r}),
    keep AS (SELECT canon_url, min(doc_id) AS doc_id FROM c GROUP BY canon_url)
    SELECT c.doc_id, c.url, c.canon_url
    FROM c JOIN keep ON c.doc_id = keep.doc_id
    ORDER BY c.doc_id
"""


def paragraphs(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, para_idx, para) — consecutive {PARA_WORDS}-word windows."""
    d = t(spark, sf, "documents")
    words = F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
    n_para = F.ceil(F.size(words) / PARA_WORDS).cast("int")
    # guard np >= 1: sequence(0, -1) would DESCEND, emitting two phantom
    # empty paragraphs per empty/whitespace-only doc (oracle emits none)
    idx = F.when(
        F.col("np") >= 1, F.sequence(F.lit(0), F.col("np") - 1)
    ).otherwise(F.array().cast("array<int>"))
    return (
        d.select("doc_id", words.alias("ws"), n_para.alias("np"))
        .select(
            "doc_id",
            F.explode(idx).alias("para_idx"),
            F.col("ws"),
        )
        .select(
            "doc_id",
            "para_idx",
            F.array_join(
                F.slice("ws", F.col("para_idx") * PARA_WORDS + 1, PARA_WORDS), " "
            ).alias("para"),
        )
    )


def dedup_paragraph(spark: SparkSession, sf: str) -> DataFrame:
    """Per doc: paragraph count and how many of its paragraph instances
    duplicate an earlier occurrence anywhere in the corpus (first occurrence
    by (doc_id, para_idx) order survives).

    Scale shape: only (xxhash64(para), doc_id, para_idx) rides the shuffle —
    one exchange on the 64-bit hash, then a per-hash window; the final
    per-doc rollup reuses the doc_id exchange.  Paragraph text itself is
    dropped before any wide operation.
    """
    p = paragraphs(spark, sf).select(
        "doc_id", "para_idx", F.xxhash64("para").alias("h")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("h").orderBy("doc_id", "para_idx")
    marked = p.select(
        "doc_id", (F.row_number().over(w) > 1).cast("int").alias("is_dup")
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_paras"),
            F.sum("is_dup").alias("n_dup_paras"),
        )
        .orderBy("doc_id")
    )


# xxhash64 is Spark-only; the oracle keys the first-occurrence window on the
# paragraph STRING itself — same equivalence classes, independent mechanism.
DEDUP_PARAGRAPH_SQL = f"""
    WITH w AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> '') AS ws
        FROM documents),
    idx AS (
        SELECT doc_id, ws,
               unnest(range(1, CAST(ceil(len(ws) / {PARA_WORDS}.0) AS BIGINT) + 1))
                 AS i
        FROM w),
    p AS (
        SELECT doc_id, i - 1 AS para_idx,
               array_to_string(ws[(i - 1) * {PARA_WORDS} + 1 :
                                  i * {PARA_WORDS}], ' ') AS para
        FROM idx),
    m AS (
        SELECT doc_id,
               CASE WHEN row_number() OVER (PARTITION BY para
                                            ORDER BY doc_id, para_idx) > 1
                    THEN 1 ELSE 0 END AS is_dup
        FROM p)
    SELECT doc_id, count(*) AS n_paras, CAST(sum(is_dup) AS BIGINT) AS n_dup_paras
    FROM m GROUP BY doc_id ORDER BY doc_id
"""


def dedup_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """New-batch docs (source != '{EXISTING_SOURCE}') that survive dedup
    against the existing corpus (source == '{EXISTING_SOURCE}') AND
    within-batch keep-first, both by md5 of the normalized text.

    Scale shape: the existing side collapses to distinct hashes before the
    anti-join — at a small refresh that relation broadcasts, and Spark's
    runtime bloom filter (optimizer.runtime.bloomFilter) can push the
    membership probe into the new-batch scan; the within-batch keep-first
    is one shuffle carrying (hash, doc_id) only.
    """
    d = t(spark, sf, "documents")
    h = F.md5(F.lower(F.trim("text")))
    existing = (
        d.filter(F.col("source") == EXISTING_SOURCE)
        .select(h.alias("h"))
        .distinct()
    )
    new = d.filter(F.col("source") != EXISTING_SOURCE).select(
        "doc_id", "source", h.alias("h")
    )
    # no broadcast hint: under the threshold AQE broadcasts anyway; above
    # it the anti-join co-partitions on the hash and the runtime bloom
    # filter can pre-filter the probe side (a forced hint would disable both)
    fresh = new.join(existing, "h", "left_anti")
    # keep-first as ONE row_number window over the hash (was: a min
    # aggregate self-joined back — the anti-join re-executed for both
    # references plus two more exchanges).  doc_id unique ⇒ identical
    # survivor set (the dedup_paragraph_clean pattern).
    from pyspark.sql import Window

    w = Window.partitionBy("h").orderBy("doc_id")
    return (
        fresh.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "h")
        .orderBy("doc_id")
    )


DEDUP_INCREMENTAL_SQL = f"""
    WITH hashed AS (
        SELECT doc_id, source, md5(lower(trim(text))) AS h FROM documents),
    fresh AS (
        -- NOT EXISTS, not NOT IN: a NULL hash in the existing slice must not
        -- null out the whole predicate (left_anti keeps unmatched rows)
        SELECT * FROM hashed f
        WHERE source <> '{EXISTING_SOURCE}'
          AND NOT EXISTS (SELECT 1 FROM hashed x
                          WHERE x.source = '{EXISTING_SOURCE}' AND x.h = f.h)),
    keep AS (SELECT h, min(doc_id) AS doc_id FROM fresh GROUP BY h)
    SELECT f.doc_id, f.source, f.h
    FROM fresh f JOIN keep ON f.doc_id = keep.doc_id
    ORDER BY f.doc_id
"""


def dedup_paragraph_clean(spark: SparkSession, sf: str) -> DataFrame:
    """The transformation half of paragraph dedup: drop every paragraph
    instance that repeats an earlier occurrence (global first-occurrence
    rule, same as :func:`dedup_paragraph`) and reassemble each doc's cleaned
    text.  Docs whose every paragraph was dropped disappear (RefinedWeb
    drops empty shells).

    Scale shape: the keep/drop decision shuffles only (hash, doc_id, idx);
    the reassembly groups by doc_id carrying (para_idx, para) — the cleaned
    text exists only inside its final partition, never as a join key.  The
    emitted digest keeps driver-side comparison O(32 bytes/doc).
    """
    from pyspark.sql import Window

    p = paragraphs(spark, sf)
    w = Window.partitionBy(F.xxhash64("para")).orderBy("doc_id", "para_idx")
    kept = p.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    packed = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("para_idx", "para"))),
                lambda s: s["para"],
            ),
            " ",
        ).alias("clean_text"),
    )
    return packed.select(
        "doc_id",
        "n_kept",
        F.length("clean_text").alias("clean_len"),
        F.md5("clean_text").alias("clean_md5"),
    ).orderBy("doc_id")


# first-occurrence window keyed on the paragraph STRING (independent of the
# Spark side's xxhash64 — same equivalence classes), then ordered reassembly
DEDUP_PARAGRAPH_CLEAN_SQL = f"""
    WITH w AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> '') AS ws
        FROM documents),
    idx AS (
        SELECT doc_id, ws,
               unnest(range(1, CAST(ceil(len(ws) / {PARA_WORDS}.0) AS BIGINT) + 1))
                 AS i
        FROM w),
    p AS (
        SELECT doc_id, i - 1 AS para_idx,
               array_to_string(ws[(i - 1) * {PARA_WORDS} + 1 :
                                  i * {PARA_WORDS}], ' ') AS para
        FROM idx),
    kept AS (
        SELECT doc_id, para_idx, para
        FROM (SELECT doc_id, para_idx, para,
                     row_number() OVER (PARTITION BY para
                                        ORDER BY doc_id, para_idx) AS rn
              FROM p)
        WHERE rn = 1),
    packed AS (
        SELECT doc_id, count(*) AS n_kept,
               string_agg(para, ' ' ORDER BY para_idx) AS clean_text
        FROM kept GROUP BY doc_id)
    SELECT doc_id, n_kept, length(clean_text) AS clean_len,
           md5(clean_text) AS clean_md5
    FROM packed ORDER BY doc_id
"""


# A paragraph window repeating in at least this many DISTINCT docs of ONE
# source is boilerplate (nav menus, footers, cookie banners).  Production
# crawls use higher thresholds; 2 keeps the rule discriminative on the
# synthetic corpus (the DUP_SPAN_N sizing argument).
BOILER_MIN_DOCS = 2


def boilerplate_lines(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source boilerplate removal (RefinedWeb's intra-domain line
    dedup, at the shared paragraph-window granularity): a window occurring
    in ≥ {BOILER_MIN_DOCS} distinct docs of the SAME source is template
    furniture and is removed from EVERY occurrence — unlike
    ``dedup_paragraph_clean``'s global keep-first, which preserves one
    copy and is the wrong tool for nav menus (the first doc keeps the
    menu).  Emits per doc: window counts, boilerplate hits, and the md5
    of the reassembled clean text (NULL when everything was furniture —
    the empty shells RefinedWeb drops).

    Scale shape: the frequency pass shuffles (source, xxhash64) pairs
    only — text never rides it (the ``dedup_paragraph`` contract); the
    boilerplate set is anti-joined back co-keyed; reassembly is the one
    doc_id exchange.  The oracle keys on the window STRING — same
    equivalence classes, independent mechanism."""
    d = t(spark, sf, "documents").select("doc_id", "source")
    p = (
        paragraphs(spark, sf)
        .join(d, "doc_id")
        .select("doc_id", "source", "para_idx", "para", F.xxhash64("para").alias("h"))
    )
    boiler = (
        p.groupBy("source", "h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= BOILER_MIN_DOCS)
        .select("source", "h")
    )
    # Single-pass form (was: a semi-join, an anti-join and a bare count
    # over p — FOUR corpus-scale executions of the paragraph pipeline —
    # reassembled through three doc_id joins plus a documents re-scan for
    # source).  One left join marks each paragraph boilerplate-or-not and
    # ONE (doc_id, source) aggregation computes every per-doc column from
    # the marks; collect_list drops the NULL entries of flagged paras, so
    # the digest covers exactly the kept set, and clean_md5 is NULL when
    # nothing survived — bit-identical to the join form (oracle-verified).
    flag = p.join(
        boiler.withColumn("_b", F.lit(True)), ["source", "h"], "left"
    )
    per = flag.groupBy("doc_id", "source").agg(
        F.count("*").alias("n_paras"),
        F.sum(F.when(F.col("_b"), 1).otherwise(0)).alias("n_boiler"),
        F.sum(F.when(F.col("_b").isNull(), 1).otherwise(0)).alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_b").isNull(),
                                F.struct("para_idx", "para"),
                            )
                        )
                    ),
                    lambda s: s["para"],
                ),
                " ",
            )
        ).alias("_md5"),
    )
    return per.select(
        "doc_id",
        "source",
        "n_paras",
        "n_boiler",
        "n_kept",
        F.when(F.col("n_kept") > 0, F.col("_md5")).alias("clean_md5"),
    ).orderBy("doc_id")


BOILERPLATE_LINES_SQL = f"""
    WITH w AS (
        SELECT doc_id, source,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> '') AS ws
        FROM documents),
    p AS (
        SELECT doc_id, source, i AS para_idx,
               array_to_string(ws[(i*{PARA_WORDS}+1):(i*{PARA_WORDS}+{PARA_WORDS})],
                               ' ') AS para
        FROM w, LATERAL (
            SELECT unnest(range(0,
                CAST(ceil(len(ws) / {PARA_WORDS}.0) AS INT))) AS i)
        WHERE len(ws) >= 1),
    boiler AS (
        SELECT source, para
        FROM p GROUP BY source, para
        HAVING count(DISTINCT doc_id) >= {BOILER_MIN_DOCS}),
    kept AS (
        SELECT p.* FROM p
        WHERE NOT EXISTS (SELECT 1 FROM boiler b
                          WHERE b.source = p.source AND b.para = p.para)),
    stats AS (SELECT doc_id, count(*) AS n_paras FROM p GROUP BY doc_id),
    nb AS (
        SELECT p.doc_id, count(*) AS n_boiler
        FROM p JOIN boiler b ON b.source = p.source AND b.para = p.para
        GROUP BY p.doc_id),
    clean AS (
        SELECT doc_id, count(*) AS n_kept,
               md5(string_agg(para, ' ' ORDER BY para_idx)) AS clean_md5
        FROM kept GROUP BY doc_id)
    SELECT s.doc_id, d.source, s.n_paras,
           coalesce(nb.n_boiler, 0) AS n_boiler,
           coalesce(c.n_kept, 0) AS n_kept,
           c.clean_md5
    FROM stats s
    JOIN documents d ON d.doc_id = s.doc_id
    LEFT JOIN nb ON nb.doc_id = s.doc_id
    LEFT JOIN clean c ON c.doc_id = s.doc_id
    ORDER BY s.doc_id
"""


def domain_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-domain corpus health rollup — the aggregate a crawl curator
    reads before deciding domain-level keeps/drops (RefinedWeb-style
    curation works domain-first: a domain whose pages are mostly exact
    duplicates of each other is boilerplate or a mirror, whatever the
    per-page quality scores say).

    Per canonical host: page count, distinct languages, total chars, the
    number of pages whose exact text hash repeats corpus-wide, and the
    resulting duplicate share.

    Scale shape: two hash shuffles, both narrow — (1) dup flags from an
    unordered whole-partition window count over ONE md5(text)-keyed
    exchange of (domain, lang, n_chars, h) rows — never the text, never a
    join back (the old groupBy-sizes + join-back form scanned documents
    twice, and its hash-keyed build side has corpus-scale cardinality, so
    it could never broadcast at size); (2) the domain rollup, whose key
    cardinality is the domain count (tiny by web-corpus construction), so
    the final aggregate is map-side-combined into almost nothing.
    """
    from pyspark.sql import Window

    d = t(spark, sf, "documents")
    host = F.lower(F.concat(F.col("source"), F.lit(".example.com")))
    docs = d.select(
        "doc_id",
        host.alias("domain"),
        "lang",
        F.length("text").alias("n_chars"),
        F.md5("text").alias("h"),
    )
    flagged = docs.select(
        "domain", "lang", "n_chars",
        (F.count("*").over(Window.partitionBy("h")) > 1)
        .cast("long")
        .alias("is_dup"),
    )
    return (
        flagged.groupBy("domain")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.sum("is_dup").cast("long").alias("n_dup"),
        )
        .select(
            "domain", "n_docs", "n_langs", "total_chars", "n_dup",
            F.round(F.col("n_dup") / F.col("n_docs"), 6).alias("dup_share"),
        )
        .orderBy("domain")
    )


DOMAIN_STATS_SQL = """
    WITH docs AS (
        SELECT doc_id, lower(source || '.example.com') AS domain, lang,
               length(text) AS n_chars, md5(text) AS h
        FROM documents),
    sizes AS (SELECT h, count(*) AS cnt FROM docs GROUP BY h),
    flagged AS (
        SELECT domain, lang, n_chars,
               CASE WHEN cnt > 1 THEN 1 ELSE 0 END AS is_dup
        FROM docs JOIN sizes USING (h))
    SELECT domain,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(is_dup) AS BIGINT) AS n_dup,
           round(CAST(sum(is_dup) AS BIGINT)
                 / CAST(count(*) AS BIGINT), 6) AS dup_share
    FROM flagged GROUP BY domain ORDER BY domain
"""


#: deterministic per-source robots rules (the RFC 9309 PREFIX-RULE core:
#: no * / $ wildcards — longest-match + allow-wins-ties is fully exercised
#: by nested allow/deny prefixes).  Built from the source id so both
#: engines materialize the identical rule table.
def _robots_rules() -> list[tuple[str, str, str]]:
    rules: list[tuple[str, str, str]] = []
    for k in range(20):  # covers every source the synthetic corpus emits
        src = f"src{k}"
        rules.append((src, "disallow", "/de"))          # block German paths
        rules.append((src, "allow", "/de/page1"))       # ...except page1
        if k % 2 == 1:
            rules.append((src, "disallow", "/en/page2"))
        if k % 3 == 0:
            rules.append((src, "disallow", ""))          # blanket disallow
            rules.append((src, "allow", "/fr"))          # ...French only
    return rules


def robots_eval(spark: SparkSession, sf: str) -> DataFrame:
    """RFC 9309 robots evaluation over the synthetic crawl URLs: each
    URL's path is judged by its domain's most-specific (longest-prefix)
    matching rule, allow winning length ties; no match → allowed.  The
    prefix-rule core of the spec — wildcards are an encoding of prefix
    sets and add no new join shape.

    Scale shape: rules tables are tiny by construction (a robots.txt is
    KBs) so the rule join BROADCASTS; the per-URL winner is one
    max_by-style aggregate keyed by doc_id — the corpus never shuffles
    on anything wider than its own id.

    r11 rewrite (guide §2.4): the pre-r11 form ran the corpus scan TWICE
    (matched side + a join-back of the window winners on doc_id — a
    corpus-keyed SortMergeJoin) and sorted every doc's matches for a
    row_number.  Now a single scan LEFT-joins the broadcast rules and a
    map-side-combinable ``max(struct(len, is_allow, …))`` per doc_id picks
    the winner — longest prefix first, allow on length ties, exactly the
    old (length DESC, rule ASC) order.  The winner is provably unique at
    every tie the ordering leaves open: per source the rule prefixes have
    pairwise-distinct lengths among simultaneously-matchable ones ("" 0,
    "/de"/"/fr" 3 mutually exclusive, "/de/page1"/"/en/page2" 9 mutually
    exclusive), so max-struct ≡ row_number()=1 — oracle-verified.
    """
    d = t(spark, sf, "documents")
    raw = synthetic_url(F.col("doc_id"), F.col("source"), F.col("lang"))
    no_q = F.split(raw, r"\?").getItem(0)
    no_scheme = F.regexp_replace(no_q, r"(?i)^https?://", "")
    host = F.split(no_scheme, "/").getItem(0)
    path = F.lower(F.substring(no_scheme, F.length(host) + 1, 1 << 20))
    urls = d.select("doc_id", F.col("source"), raw.alias("url"), path.alias("path"))
    rules = spark.createDataFrame(
        _robots_rules(), "source string, rule string, prefix string"
    )
    matched = urls.join(
        F.broadcast(rules),
        (urls["source"] == rules["source"])
        & F.col("path").startswith(F.col("prefix")),
        "left",
    )
    best = F.max(
        F.when(
            F.col("prefix").isNotNull(),
            F.struct(
                F.length("prefix").alias("ln"),
                (F.col("rule") == "allow").alias("is_allow"),
                F.col("rule").alias("rule"),
                F.col("prefix").alias("prefix"),
            ),
        )
    )
    return (
        matched.groupBy("doc_id")
        .agg(F.max("url").alias("url"), best.alias("best"))
        .select(
            "doc_id",
            "url",
            F.coalesce(F.col("best.rule") == "allow", F.lit(True)).alias("allowed"),
            F.coalesce(F.col("best.prefix"), F.lit("")).alias("matched_prefix"),
        )
        .orderBy("doc_id")
    )


def _robots_sql() -> str:
    vals = ", ".join(
        f"('{s}', '{r}', '{p}')" for s, r, p in _robots_rules()
    )
    return f"""
    WITH u AS (
        SELECT doc_id,
               'HTTPS://WWW.' || upper(source) || '.example.com/' || lang
                 || '/page' || CAST(doc_id % 40 AS VARCHAR)
                 || CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END
                 || '?utm_source=feed&uid=' || CAST(doc_id AS VARCHAR) AS url,
               source,
               lower('/' || lang || '/page' || CAST(doc_id % 40 AS VARCHAR)
                 || CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END) AS path
        FROM documents),
    rules(source, rule, prefix) AS (VALUES {vals}),
    matched AS (
        SELECT u.doc_id, r.rule, r.prefix,
               row_number() OVER (PARTITION BY u.doc_id
                                  ORDER BY length(r.prefix) DESC, r.rule ASC)
                 AS rn
        FROM u JOIN rules r ON u.source = r.source
        WHERE starts_with(u.path, r.prefix)),
    winners AS (SELECT doc_id, rule, prefix FROM matched WHERE rn = 1)
    SELECT u.doc_id, u.url,
           coalesce(w.rule = 'allow', TRUE) AS allowed,
           coalesce(w.prefix, '') AS matched_prefix
    FROM u LEFT JOIN winners w USING (doc_id)
    ORDER BY u.doc_id
    """


ROBOTS_EVAL_SQL = _robots_sql()
