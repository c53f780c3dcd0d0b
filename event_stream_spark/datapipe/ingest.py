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
    key = hashlib.md5(os.path.abspath(sf).encode()).hexdigest()[:10]
    return os.path.join("/tmp", f"es_jsonlzst_{_BUILD_TAG}_{key}")


def _build(spark: SparkSession, sf: str) -> str:
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
