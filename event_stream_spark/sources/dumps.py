"""Compressed corpus-dump ingestion: ``.jsonl.zst`` shards.

Web-scale training corpora ship as zstd-compressed JSON-lines shards
(Common Crawl derivatives, RedPajama, Dolma all publish this layout).
Spark's own text reader can only decode zstd through Hadoop's native
libzstd binding, which a Python-only cluster image often lacks — this
module ingests the format anyway: binaryFile scan → per-shard pure-spec
zstd decode (``sources/zstdcodec.py``) → JSONL parse against a FIXED
schema (no inference — the house schema stance), all inside
``mapInPandas`` so each executor decodes its own shards in parallel.

Scale shape: one narrow scan of shard files, zero shuffles — decode and
parse are per-file map work, and shard count (not shard size) sets the
parallelism, exactly like any other splittable-by-file ingest.  Writer
side (``write_jsonl_zst``) emits store-mode frames the reference CLI
accepts — used for fixtures and round-trip proofs; production dumps
arrive entropy-coded and decode through the same reader (tested against
CLI-compressed shards).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_jsonl_zst(
    rows: list[dict], path: str, *, shards: int = 4
) -> list[str]:
    """Write ``rows`` as ``shards`` ``.jsonl.zst`` files (store-mode zstd
    frames; round-robin by position for determinism).  Fixture/round-trip
    helper — a distributed writer would map partitions the same way."""
    from event_stream_spark.sources.zstdcodec import zstd_store_frame

    os.makedirs(path, exist_ok=True)
    out = []
    for s in range(shards):
        part = rows[s::shards]
        payload = "".join(
            json.dumps(r, separators=(",", ":"), sort_keys=True) + "\n"
            for r in part
        ).encode()
        p = os.path.join(path, f"shard-{s:05d}.jsonl.zst")
        with open(p, "wb") as fh:
            fh.write(zstd_store_frame(payload))
        out.append(p)
    return out


def read_jsonl_zst(
    spark: SparkSession, path_glob: str, schema: StructType | str
) -> DataFrame:
    """Distributed ``.jsonl.zst`` reader: every shard decodes + parses in
    the executor that scanned it; rows surface with the given schema
    (missing keys → NULL, extra keys ignored — the tolerant-reader
    contract a third-party dump needs)."""
    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    names = [f.name for f in schema.fields]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from event_stream_spark.sources.zstdcodec import zstd_decompress

        for pdf in batches:
            for blob in pdf["content"]:
                text = zstd_decompress(bytes(blob)).decode("utf-8")
                recs = [json.loads(l) for l in text.splitlines() if l]
                yield pd.DataFrame(
                    {n: [r.get(n) for r in recs] for n in names}
                )

    files = spark.read.format("binaryFile").load(path_glob)
    return files.select("content").mapInPandas(decode, schema=schema)
