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
    rows: list[dict], path: str, *, shards: int = 4, compress: str = "auto"
) -> list[str]:
    """Write ``rows`` as ``shards`` ``.jsonl.zst`` files (round-robin by
    position for determinism).  Fixture/round-trip helper — a distributed
    writer would map partitions the same way.

    ``compress``: ``"auto"`` uses the fast backend (zstandard / CLI) when
    one is present and falls back to store-mode frames (bulk fixture
    writes must stay cheap without libzstd); ``"pure"`` forces this
    package's real compressor (``zstdenc.zstd_compress``); ``"store"``
    forces store-mode frames."""
    from event_stream_spark.sources.zstdcodec import (
        _fast_backend, zstd_store_frame,
    )
    from event_stream_spark.sources.zstdenc import zstd_compress_fast

    if compress == "pure":
        from event_stream_spark.sources.zstdenc import zstd_compress as _enc
    elif compress == "store" or _fast_backend()[0] == "pure":
        _enc = zstd_store_frame
    else:
        _enc = zstd_compress_fast

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
            fh.write(_enc(payload))
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
        # fast path: C-accelerated decode when a binding/CLI is present
        # in the executor image; pure-Python (the verification oracle)
        # otherwise — parity pinned by tests/test_zstdcodec.py
        from event_stream_spark.sources.zstdcodec import zstd_decompress_fast

        for pdf in batches:
            for blob in pdf["content"]:
                text = zstd_decompress_fast(bytes(blob)).decode("utf-8")
                recs = [json.loads(l) for l in text.splitlines() if l]
                yield pd.DataFrame(
                    {n: [r.get(n) for r in recs] for n in names}
                )

    files = spark.read.format("binaryFile").load(path_glob)
    return files.select("content").mapInPandas(decode, schema=schema)


# --------------------------------------------------------------------------
# WARC (ISO 28500) — the Common Crawl raw-capture format
# --------------------------------------------------------------------------


def write_warc_gz(records: list[dict], path: str) -> int:
    """Write ``records`` (url, date, body bytes/str, content_type) as one
    ``.warc.gz`` file — each record its OWN gzip member, the layout crawl
    tooling requires so readers can seek to records independently."""
    import gzip

    with open(path, "wb") as fh:
        for i, r in enumerate(records):
            body = r["body"] if isinstance(r["body"], bytes) else r["body"].encode()
            http = (
                b"HTTP/1.1 200 OK\r\n"
                + b"Content-Type: " + r.get("content_type", "text/html").encode()
                + b"\r\nContent-Length: " + str(len(body)).encode()
                + b"\r\n\r\n" + body
            )
            warc = (
                b"WARC/1.0\r\n"
                b"WARC-Type: response\r\n"
                + b"WARC-Record-ID: <urn:uuid:" + f"{i:032x}".encode() + b">\r\n"
                + b"WARC-Date: " + r.get("date", "2024-01-01T00:00:00Z").encode()
                + b"\r\nWARC-Target-URI: " + r["url"].encode()
                + b"\r\nContent-Type: application/http;msgtype=response\r\n"
                + b"Content-Length: " + str(len(http)).encode()
                + b"\r\n\r\n" + http + b"\r\n\r\n"
            )
            fh.write(gzip.compress(warc, mtime=0))
    return len(records)


def _parse_warc(blob: bytes) -> list[dict]:
    """Parse a decompressed WARC stream into response-record dicts."""
    out = []
    pos = 0
    n = len(blob)
    while pos < n:
        if blob[pos : pos + 5] != b"WARC/":
            break
        hdr_end = blob.index(b"\r\n\r\n", pos)
        headers = {}
        for line in blob[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode()] = v.strip().decode()
        clen = int(headers["content-length"])
        block = blob[hdr_end + 4 : hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen + 4  # trailing \r\n\r\n
        if headers.get("warc-type") != "response":
            continue
        http_end = block.index(b"\r\n\r\n")
        status = int(block[:http_end].split(b"\r\n")[0].split()[1])
        ctype = ""
        for line in block[:http_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if k.strip().lower() == b"content-type":
                ctype = v.strip().decode()
        out.append(
            {
                "url": headers.get("warc-target-uri"),
                "warc_date": headers.get("warc-date"),
                "status": status,
                "content_type": ctype,
                "body": block[http_end + 4 :],
            }
        )
    return out


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed ``.warc.gz`` reader: each archive decompresses (all
    concatenated gzip members) and parses in its executor; response
    records surface as (url, warc_date, status, content_type, body).

    Scale shape: like ``read_jsonl_zst`` — a binaryFile scan with
    per-file map work and zero shuffles; archive count sets parallelism
    (Common Crawl ships ~1 GB archives by the tens of thousands, so a
    file-granular scan saturates any cluster)."""
    import zlib

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["content"]:
                raw = bytes(blob)
                if raw[:2] == b"\x1f\x8b":  # gzip members, concatenated
                    parts = []
                    while raw:
                        d = zlib.decompressobj(wbits=31)
                        parts.append(d.decompress(raw))
                        raw = d.unused_data
                    raw = b"".join(parts)
                recs = _parse_warc(raw)
                yield pd.DataFrame(
                    {
                        "url": [r["url"] for r in recs],
                        "warc_date": [r["warc_date"] for r in recs],
                        "status": [r["status"] for r in recs],
                        "content_type": [r["content_type"] for r in recs],
                        "body": [r["body"] for r in recs],
                    }
                )

    files = spark.read.format("binaryFile").load(path_glob)
    return files.select("content").mapInPandas(
        decode,
        schema="url string, warc_date string, status int, "
               "content_type string, body binary",
    )


# --------------------------------------------------------------------------
# WebDataset — tar shards of {key}.{ext} member files, the layout
# large-scale multimodal training loaders stream
# --------------------------------------------------------------------------


def write_webdataset(
    samples: list[dict], path: str, *, shards: int = 4
) -> list[str]:
    """``samples`` = [{"__key__": str, ext: bytes|str, ...}] → ``shards``
    tar files of ``{key}.{ext}`` members (POSIX order: a sample's members
    are consecutive, keys ascending — the contract streaming loaders rely
    on to cut sample boundaries without an index)."""
    import io
    import tarfile

    os.makedirs(path, exist_ok=True)
    out = []
    for s in range(shards):
        p = os.path.join(path, f"shard-{s:05d}.tar")
        with tarfile.open(p, "w") as tar:
            for sample in samples[s::shards]:
                key = sample["__key__"]
                for ext in sorted(k for k in sample if k != "__key__"):
                    data = sample[ext]
                    blob = data if isinstance(data, bytes) else data.encode()
                    info = tarfile.TarInfo(name=f"{key}.{ext}")
                    info.size = len(blob)
                    info.mtime = 0
                    tar.addfile(info, io.BytesIO(blob))
        out.append(p)
    return out


def read_webdataset(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed WebDataset reader: each tar shard parses in its
    executor; one row per sample key with a ``files`` map of
    extension → bytes (decode/typing is the consumer's business — the
    loader contract is member grouping, not schema).

    Scale shape: binaryFile scan + per-shard map work, zero shuffles;
    member grouping needs only the POSIX member order within one shard,
    never cross-shard state."""
    import io
    import tarfile

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["content"]:
                keys: list[str] = []
                files: list[dict] = []
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tar:
                    for m in tar:
                        if not m.isfile():
                            continue
                        key, _, ext = m.name.rpartition(".")
                        data = tar.extractfile(m).read()
                        if keys and keys[-1] == key:
                            files[-1][ext] = data
                        else:
                            keys.append(key)
                            files.append({ext: data})
                yield pd.DataFrame({"key": keys, "files": files})

    df = spark.read.format("binaryFile").load(path_glob)
    return df.select("content").mapInPandas(
        decode, schema="key string, files map<string,binary>"
    )
