"""Training-ready binary token shards — the OUTPUT side of the pipeline.

GPT-style trainers (nanoGPT, Megatron data loaders) consume flat binary
arrays of token ids, one file per shard, memory-mapped at step time.
``export_token_shards`` writes that layout straight from executors: one
``applyInPandas`` group per (lang, shard) packing stratum tokenizes its
documents in doc_id order (the ``seq_pack`` order contract), maps words
to 16-bit ids, and writes a standard ``.npy`` (uint16) file — the writer
returns only the manifest row, so nothing corpus-sized ever reaches the
driver.

Token ids are the md5-hash vocabulary (`('0x'||md5(word)[:4])::id`,
16-bit) — deterministic, tokenizer-free, and expressible in BOTH engines,
which is what makes the export DRIVER-WITNESSABLE: the registry entry
reads the shard files back with binaryFile, recomputes a position-weighted
checksum from the BYTES ON DISK, and hash-compares against a DuckDB
replay of the logical token stream — disk bytes ≡ oracle, not just
"writer agrees with itself".  (A real deployment swaps the hash vocab for
its BPE vocab — ``bpe_tokenize`` exists — without touching the layout.)

Scale shape: one shuffle on the stratum key; each stratum's tokenize +
write is sequential within its group but strata run in parallel (raise
``packing.SHARDS`` so a stratum fits an executor — the documented
packing knob); the read-back verify is per-file map work.
"""

from __future__ import annotations

import hashlib
import os
import shutil
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_stream_spark.datapipe.packing import SHARDS
from event_stream_spark.queries import t

_BUILD_TAG = "v1"
#: position-weighted checksum modulus (fits BIGINT sums at any shard size)
_CK_MOD = (1 << 61) - 1


def _shard_dir(sf: str) -> str:
    from event_stream_spark.datapipe.fixutil import fixture_key

    key = fixture_key(sf)
    return os.path.join("/tmp", f"es_tokshards_{_BUILD_TAG}_{key}")


def export_token_shards(
    spark: SparkSession, sf: str, out_dir: str, *,
    chaos_flag: str | None = None,
) -> None:
    """Write one ``{lang}-{shard}.npy`` uint16 file per packing stratum.

    ``chaos_flag`` is the task-retry fault-injection seam
    (:mod:`event_stream_spark.chaos`): exactly one stratum task raises
    once, proving a re-attempted write leaves no torn or duplicate
    output (see ``scripts/chaos_sinks.py``)."""
    os.makedirs(out_dir, exist_ok=True)
    d = t(spark, sf, "documents").select(
        "doc_id",
        "lang",
        (F.col("doc_id") % SHARDS).alias("shard"),
        "text",
    )

    def write(pdf: pd.DataFrame) -> pd.DataFrame:
        import uuid

        import numpy as np

        from event_stream_spark.chaos import claim_once

        pdf = pdf.sort_values("doc_id")
        ids: list[int] = []
        for text in pdf["text"]:
            for w in str(text).lower().split():
                h = hashlib.md5(w.encode()).hexdigest()[:4]
                ids.append(int(h, 16))
        arr = np.asarray(ids, dtype=np.uint16)
        lang, shard = pdf["lang"].iloc[0], int(pdf["shard"].iloc[0])
        # write-then-atomic-rename with a per-attempt tmp name: a task
        # killed mid-write never leaves a torn file at the final path,
        # and a zombie attempt racing its retry publishes identical
        # bytes (stratum content is deterministic) whoever wins
        path = os.path.join(out_dir, f"{lang}-{shard}.npy")
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as fh:  # file handle: np.save can't rename it
            np.save(fh, arr)
        os.replace(tmp, path)
        # chaos fires AFTER the shard published: the retry re-derives the
        # identical bytes and republishes atomically — no dup, no tear
        claim_once(chaos_flag)
        return pd.DataFrame(
            {"lang": [lang], "shard": [shard], "n_tokens": [len(arr)]}
        )

    (
        d.groupBy("lang", "shard")
        .applyInPandas(write, "lang string, shard int, n_tokens long")
        .collect()  # manifest rows only — one per stratum
    )


def _build(spark: SparkSession, sf: str) -> str:
    path = _shard_dir(sf)
    marker = os.path.join(path, "_built")
    if os.path.exists(marker):
        return path
    shutil.rmtree(path, ignore_errors=True)
    export_token_shards(spark, sf, path)
    with open(marker, "w") as fh:
        fh.write(_BUILD_TAG)
    return path


def shard_checksum(arr) -> int:
    """Position-weighted checksum ``sum((i+1) * (id+1)) % _CK_MOD``,
    computed EXACTLY at any shard size: a straight uint64 ``.sum()``
    silently wraps mod 2^64 past ~24M tokens/shard while the DuckDB
    oracle sums in HUGEINT.  Chunked hi/lo split keeps every numpy
    partial sum < 2^59 (exact) and folds into a Python int mod
    ``_CK_MOD`` per chunk — exact for any shard under 2^47 tokens
    (a 256 TB file; far past any real shard)."""
    import numpy as np

    ck = 0
    chunk = 1 << 24
    for s in range(0, len(arr), chunk):
        seg = arr[s : s + chunk].astype(np.uint64) + 1
        pos = np.arange(s + 1, s + 1 + len(seg), dtype=np.uint64)
        terms = pos * seg  # < 2^64 elementwise (n < 2^47, ids < 2^16)
        ck = (
            ck
            + (int((terms >> np.uint64(32)).sum()) << 32)
            + int((terms & np.uint64(0xFFFFFFFF)).sum())
        ) % _CK_MOD
    return ck


def export_token_shards_bpe(
    spark: SparkSession,
    sf: str,
    out_dir: str,
    *,
    rounds: int | None = None,
    chaos_flag: str | None = None,
) -> dict[str, int]:
    """The LEARNED-VOCAB twin of :func:`export_token_shards`: the same
    ``{lang}-{shard}.npy`` trainer layout, but token ids come from the
    corpus-trained BPE merge table (``bpe.bpe_merges``) instead of the
    md5 hash vocab — uint32, with the symbol→id table persisted next to
    the shards as ``vocab.json``.  Returns the vocab.

    The hash-vocab export stays the driver-witnessed oracle twin (its
    ids are SQL-expressible); this one reconciles against the engine's
    own BPE lane instead: per-stratum manifest token counts equal
    ``bpe_tokenize``'s per-doc counts and ``bpe_fertility``'s per-lang
    totals, and shards round-trip through the merge table back to the
    exact word stream (tested).

    Scale shape: identical to the hash export — one shuffle on the
    stratum key, merges ride the closure as literals, vocab is distinct
    final symbols (Heaps'-law-small: one collect of the vocab relation,
    then broadcast in the closure)."""
    import json

    from event_stream_spark.datapipe.bpe import (
        BPE_EOW,
        BPE_ROUNDS,
        BPE_SEP,
        bpe_merges,
    )
    from event_stream_spark.datapipe.text import word_rows

    rounds = BPE_ROUNDS if rounds is None else rounds
    merges = [(l, r) for _rnd, l, r, _cnt in bpe_merges(spark, sf, rounds)]

    # vocab = distinct final symbols across the corpus, ids by sort order
    w = word_rows(t(spark, sf, "documents"))
    s = F.array_join(
        F.concat(F.split("w", ""), F.array(F.lit(BPE_EOW))), BPE_SEP
    )
    for left, right in merges:
        s = F.replace(s, F.lit(left + BPE_SEP + right), F.lit(left + right))
    sym_rows = (
        w.select(F.explode(F.split(s, r"\|")).alias("sym"))
        .distinct()
        .collect()  # vocab-sized (Heaps'-law), not corpus-sized
    )
    vocab = {r.sym: i for i, r in enumerate(sorted(sym_rows, key=lambda r: r.sym))}
    if len(vocab) >= 1 << 32:
        raise ValueError("vocab exceeds uint32")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "vocab.json"), "w") as fh:
        json.dump(vocab, fh)

    d = t(spark, sf, "documents").select(
        "doc_id", "lang", (F.col("doc_id") % SHARDS).alias("shard"), "text"
    )

    def write(pdf: pd.DataFrame) -> pd.DataFrame:
        import re
        import uuid

        import numpy as np

        from event_stream_spark.chaos import claim_once

        ws = re.compile(r"\s+", re.ASCII)  # the word_rows contract
        pdf = pdf.sort_values("doc_id")
        ids: list[int] = []
        for text in pdf["text"]:
            for wd in (x for x in ws.split((text or "").lower()) if x):
                sym = BPE_SEP.join(list(wd) + [BPE_EOW])
                for left, right in merges:
                    # str.replace is the same greedy non-overlapping
                    # left-to-right scan as F.replace / DuckDB replace
                    sym = sym.replace(left + BPE_SEP + right, left + right)
                ids.extend(vocab[p] for p in sym.split(BPE_SEP))
        arr = np.asarray(ids, dtype=np.uint32)
        lang, shard = pdf["lang"].iloc[0], int(pdf["shard"].iloc[0])
        path = os.path.join(out_dir, f"{lang}-{shard}.npy")
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as fh:
            np.save(fh, arr)
        os.replace(tmp, path)
        claim_once(chaos_flag)
        return pd.DataFrame(
            {"lang": [lang], "shard": [shard], "n_tokens": [len(arr)]}
        )

    (
        d.groupBy("lang", "shard")
        .applyInPandas(write, "lang string, shard int, n_tokens long")
        .collect()  # manifest rows only — one per stratum
    )
    return vocab


def token_shards(spark: SparkSession, sf: str) -> DataFrame:
    """Manifest of the exported shards recomputed FROM THE FILES: each
    ``.npy`` parses in its executor and reports token count plus the
    position-weighted checksum of its ids."""
    path = _build(spark, sf)

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import numpy as np

        for pdf in batches:
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                arr = np.load(io.BytesIO(bytes(blob)))
                name = os.path.basename(fpath).rsplit(".", 1)[0]
                lang, shard = name.rsplit("-", 1)
                ck = shard_checksum(arr)
                yield pd.DataFrame(
                    {
                        "lang": [lang],
                        "shard": [int(shard)],
                        "n_tokens": [len(arr)],
                        "checksum": [ck],
                    }
                )

    files = spark.read.format("binaryFile").load(os.path.join(path, "*.npy"))
    return (
        files.select("path", "content")
        .mapInPandas(
            verify, "lang string, shard int, n_tokens long, checksum long"
        )
        .orderBy("lang", "shard")
    )


TOKEN_SHARDS_SQL = f"""
    WITH toks AS (
        SELECT lang, doc_id % {SHARDS} AS shard, doc_id, w.i AS pos_in_doc,
               ('0x' || substring(md5(w.word), 1, 4))::BIGINT AS id
        FROM documents,
             LATERAL (
                SELECT unnest(list_filter(string_split_regex(lower(text),
                                                             '\\s+'),
                              x -> x <> '')) AS word,
                       generate_subscripts(list_filter(
                           string_split_regex(lower(text), '\\s+'),
                           x -> x <> ''), 1) AS i
             ) w),
    stream AS (
        SELECT lang, shard, id,
               row_number() OVER (PARTITION BY lang, shard
                                  ORDER BY doc_id, pos_in_doc) AS pos
        FROM toks)
    SELECT lang, CAST(shard AS INT) AS shard,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(pos * (id + 1)) % {_CK_MOD} AS BIGINT) AS checksum
    FROM stream GROUP BY lang, shard ORDER BY lang, shard
"""
