"""Driver-witnessable compressed-dump ingestion proof.

``ingest_jsonl_zst`` writes the sf documents table as ``.jsonl.zst``
shards (store-mode zstd frames — the layout web-scale corpora ship in),
reads them back through the distributed reader
(:func:`event_stream_spark.sources.dumps.read_jsonl_zst` — binaryFile
scan + in-executor RFC 8878 decode + fixed-schema JSONL parse), and
projects an md5 of every round-tripped text.  The DuckDB oracle reads
the ORIGINAL parquet — a hash match proves byte-exact fidelity through
compress → shard → distributed decode → JSON round-trip.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_stream_spark.queries import t

_BUILD_TAG = "v1"
_SHARDS = 4


def _dump_dir(sf: str) -> str:
    from event_stream_spark.datapipe.fixutil import fixture_key

    key = fixture_key(sf)
    return os.path.join("/tmp", f"es_jsonlzst_{_BUILD_TAG}_{key}")


def _build(spark: SparkSession, sf: str) -> str:
    # FIXTURE builder (collect is bounded by the oracle/bench SFs and
    # marker-gated to one run): production dumps arrive FROM outside —
    # the operator under test is the distributed READER, not this writer.
    from event_stream_spark.sources.dumps import write_jsonl_zst

    path = _dump_dir(sf)
    marker = os.path.join(path, "_built")
    if os.path.exists(marker):
        return path
    shutil.rmtree(path, ignore_errors=True)
    rows = [
        r.asDict()
        for r in t(spark, sf, "documents")
        .select("doc_id", "text", "lang", "n_chars")
        .orderBy("doc_id")
        .collect()
    ]
    write_jsonl_zst(rows, path, shards=_SHARDS)
    with open(marker, "w") as fh:
        fh.write(_BUILD_TAG)
    return path


def ingest_jsonl_zst(spark: SparkSession, sf: str) -> DataFrame:
    from event_stream_spark.sources.dumps import read_jsonl_zst

    path = _build(spark, sf)
    df = read_jsonl_zst(
        spark,
        os.path.join(path, "*.jsonl.zst"),
        "doc_id long, text string, lang string, n_chars long",
    )
    return (
        df.select(
            "doc_id",
            "lang",
            "n_chars",
            F.md5("text").alias("content_md5"),
        )
        .orderBy("doc_id")
    )


INGEST_JSONL_ZST_SQL = """
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
           md5(text) AS content_md5
    FROM documents ORDER BY doc_id
"""


def _zstc_dir(sf: str) -> str:
    from event_stream_spark.datapipe.fixutil import fixture_key

    key = fixture_key(sf)
    return os.path.join("/tmp", f"es_zstc_{_BUILD_TAG}_{key}")


def _build_compressed(spark: SparkSession, sf: str) -> str:
    # same fixture stance as _build, but through the REAL compressor
    # (zstdenc.zstd_compress: LZ77 + FSE sequences + Huffman literals)
    # on a 1-in-5 doc subset to bound the pure-Python compress cost
    from event_stream_spark.sources.dumps import write_jsonl_zst

    path = _zstc_dir(sf)
    marker = os.path.join(path, "_built")
    if os.path.exists(marker):
        return path
    shutil.rmtree(path, ignore_errors=True)
    rows = [
        r.asDict()
        for r in t(spark, sf, "documents")
        .where(F.col("doc_id") % 5 == 0)
        .select("doc_id", "text", "lang", "n_chars")
        .orderBy("doc_id")
        .collect()
    ]
    write_jsonl_zst(rows, path, shards=_SHARDS, compress="pure")
    with open(marker, "w") as fh:
        fh.write(_BUILD_TAG)
    return path


def ingest_zst_codec(spark: SparkSession, sf: str) -> DataFrame:
    """Driver-witnessed proof of the REAL zstd compressor: a 1-in-5
    documents subset is written as entropy-coded RFC 8878 frames by
    ``zstdenc.zstd_compress`` (LZ77 + predefined-FSE sequences + Huffman
    literals), read back through the distributed reader, and md5-matched
    against the original parquet — any corruption anywhere in the
    compress → frame → distributed-decode → JSON loop reds the hash.

    Provenance: the reference produces compressed Kafka topics through a
    native client (es-kafka KafkaBlockSink.kt:16-38); this witnesses our
    from-scratch compress direction at the same fidelity bar."""
    from event_stream_spark.sources.dumps import read_jsonl_zst

    path = _build_compressed(spark, sf)
    df = read_jsonl_zst(
        spark,
        os.path.join(path, "*.jsonl.zst"),
        "doc_id long, text string, lang string, n_chars long",
    )
    return (
        df.select(
            "doc_id",
            "lang",
            F.md5("text").alias("content_md5"),
        )
        .orderBy("doc_id")
    )


INGEST_ZST_CODEC_SQL = """
    SELECT doc_id, lang, md5(text) AS content_md5
    FROM documents WHERE doc_id % 5 = 0 ORDER BY doc_id
"""


_WARC_SHARDS = 3


def _warc_dir(sf: str) -> str:
    from event_stream_spark.datapipe.fixutil import fixture_key

    key = fixture_key(sf)
    return os.path.join("/tmp", f"es_warc_{_BUILD_TAG}_{key}")


def _build_warc(spark: SparkSession, sf: str) -> str:
    from event_stream_spark.datapipe.webops import synthetic_url
    from event_stream_spark.sources.dumps import write_warc_gz

    path = _warc_dir(sf)
    marker = os.path.join(path, "_built")
    if os.path.exists(marker):
        return path
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    rows = (
        t(spark, sf, "documents")
        .select(
            synthetic_url(F.col("doc_id"), F.col("source"), F.col("lang"))
            .alias("url"),
            "text",
            "doc_id",
        )
        .orderBy("doc_id")
        .collect()
    )
    for s in range(_WARC_SHARDS):
        write_warc_gz(
            [
                {"url": r["url"], "body": r["text"], "content_type": "text/plain"}
                for r in rows[s::_WARC_SHARDS]
            ],
            os.path.join(path, f"crawl-{s:05d}.warc.gz"),
        )
    with open(marker, "w") as fh:
        fh.write(_BUILD_TAG)
    return path


def ingest_warc(spark: SparkSession, sf: str) -> DataFrame:
    """WARC crawl-archive ingestion, driver-witnessed: the documents table
    written as per-record-gzipped ISO 28500 response records (synthetic
    target URIs), read back by the distributed reader, and projected to
    (url, status, content_md5) — hash parity against the original parquet
    proves byte-exact capture→parse fidelity."""
    from event_stream_spark.sources.dumps import read_warc

    path = _build_warc(spark, sf)
    df = read_warc(spark, os.path.join(path, "*.warc.gz"))
    return (
        df.select(
            "url",
            F.col("status").cast("long").alias("status"),
            F.md5(F.col("body").cast("string")).alias("content_md5"),
        )
        .orderBy("url")
    )


INGEST_WARC_SQL = """
    SELECT 'HTTPS://WWW.' || upper(source) || '.example.com/' || lang
             || '/page' || CAST(doc_id % 40 AS VARCHAR)
             || CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END
             || '?utm_source=feed&uid=' || CAST(doc_id AS VARCHAR) AS url,
           CAST(200 AS BIGINT) AS status,
           md5(text) AS content_md5
    FROM documents ORDER BY url
"""


def _wds_dir(sf: str) -> str:
    from event_stream_spark.datapipe.fixutil import fixture_key

    key = fixture_key(sf)
    return os.path.join("/tmp", f"es_wds_{_BUILD_TAG}_{key}")


def _build_wds(spark: SparkSession, sf: str) -> str:
    import json

    from event_stream_spark.sources.dumps import write_webdataset

    path = _wds_dir(sf)
    marker = os.path.join(path, "_built")
    if os.path.exists(marker):
        return path
    shutil.rmtree(path, ignore_errors=True)
    rows = (
        t(spark, sf, "documents")
        .select("doc_id", "text", "lang")
        .orderBy("doc_id")
        .collect()
    )
    write_webdataset(
        [
            {
                "__key__": f"{r['doc_id']:09d}",
                "txt": r["text"],
                "json": json.dumps(
                    {"doc_id": r["doc_id"], "lang": r["lang"]},
                    separators=(",", ":"),
                ),
            }
            for r in rows
        ],
        path,
        shards=4,
    )
    with open(marker, "w") as fh:
        fh.write(_BUILD_TAG)
    return path


def ingest_webdataset(spark: SparkSession, sf: str) -> DataFrame:
    """WebDataset round-trip, driver-witnessed: the documents table as
    tar shards of {key}.txt/{key}.json members, read back distributed and
    projected via the json sidecar + md5 of the txt member — hash parity
    against the original parquet proves grouping AND byte fidelity."""
    from event_stream_spark.sources.dumps import read_webdataset

    path = _build_wds(spark, sf)
    df = read_webdataset(spark, os.path.join(path, "*.tar"))
    meta = F.from_json(
        F.col("files").getItem("json").cast("string"),
        "doc_id long, lang string",
    )
    return (
        df.select(
            meta.getField("doc_id").alias("doc_id"),
            meta.getField("lang").alias("lang"),
            F.md5(F.col("files").getItem("txt").cast("string")).alias(
                "content_md5"
            ),
        )
        .orderBy("doc_id")
    )


INGEST_WEBDATASET_SQL = """
    SELECT doc_id, lang, md5(text) AS content_md5
    FROM documents ORDER BY doc_id
"""
