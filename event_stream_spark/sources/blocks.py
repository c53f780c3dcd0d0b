"""Historical block range scans over an ingested block lake (S5–S7).

The reference fetches ranges from a node RPC in pages of 20 with bounded
concurrency (HistoricalBlockFlow.kt:26-41, MetadataStream.kt:26-54).  At rest
on a cluster the equivalent is a parquet lake written once by the ingest
stream and scanned with partition pruning:

- partitioned by ``height_bucket = floor(height / bucket_size)`` so a
  ``BETWEEN from AND to`` range scan prunes to the touched buckets only
  (100 TB of chain history → a range query reads only its slice).  NOTE:
  directory partitioning prunes SCANS; it does not by itself co-locate a
  join's hash distribution;
- for a shuffle-free J1, ``write_block_warehouse`` writes both tables as
  HASH-BUCKETED tables (``bucketBy(height) + sortBy``): Spark's bucketed
  scan reports the matching output partitioning, so ``blocks ⋈
  block_results ON height`` plans with NO exchange on either side
  (plan-gated in tests/test_plans.py);
- metadata scans (S6/S7) are column-pruned header-only projections — Spark's
  nested-schema pruning means the parquet reader never materializes txs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: 10k heights per partition directory ≈ 1 file per ~17h of chain at 6s/block.
DEFAULT_BUCKET = 10_000

META_COLS = ["height", "chain_id", "block_ts", "data_hash", "proposer_address", "num_txs"]


def write_block_lake(
    blocks: DataFrame,
    block_results: DataFrame,
    path: str,
    *,
    bucket_size: int = DEFAULT_BUCKET,
) -> None:
    """Ingest-side writer: height-bucket partitioned parquet for both tables."""
    withb = lambda df: df.withColumn(
        "height_bucket", (F.col("height") / bucket_size).cast("long")
    )
    withb(blocks).write.mode("overwrite").partitionBy("height_bucket").parquet(
        f"{path}/blocks"
    )
    withb(block_results).write.mode("overwrite").partitionBy("height_bucket").parquet(
        f"{path}/block_results"
    )


def write_block_warehouse(
    blocks: DataFrame,
    block_results: DataFrame,
    path: str,
    *,
    table_prefix: str,
    buckets: int = 16,
) -> None:
    """Hash-bucketed warehouse tables for the shuffle-free J1 join.

    Both tables are ``bucketBy(buckets, "height").sortBy("height")`` —
    Spark's bucketed parquet scan then exposes ``hashpartitioning(height,
    buckets)`` as its output partitioning, so the enrichment equi-join
    plans with NO exchange on either side: at 100 TB the J1 join moves
    zero bytes over the network, the analog of the reference fetching
    /block and /block_results for the same height in one call
    (TendermintBlockFetcher.kt:36-46).  A per-task local sort remains in
    the SMJ — Spark does not consume sortBy metadata for sort elimination
    (SPARK-19256); that residual is CPU-local and disk-spillable, not a
    shuffle.  External tables (explicit ``path``) so the data lives with
    the lake, not the metastore."""
    for name, df in (("blocks", blocks), ("block_results", block_results)):
        (
            # one writer task per bucket → one FILE per bucket, which is
            # what lets the bucketed scan trust the sortBy order and drop
            # the join-side sorts too (multi-file buckets force a re-sort)
            df.repartition(buckets, "height")
            .write.mode("overwrite")
            .format("parquet")
            .option("path", f"{path}/{name}")
            .bucketBy(buckets, "height")
            .sortBy("height")
            .saveAsTable(f"{table_prefix}_{name}")
        )


def read_block_warehouse(
    spark: SparkSession, table_prefix: str
) -> tuple[DataFrame, DataFrame]:
    return (
        spark.table(f"{table_prefix}_blocks"),
        spark.table(f"{table_prefix}_block_results"),
    )


def _range_scan(
    spark: SparkSession,
    path: str,
    table: str,
    lo: int | None,
    hi: int | None,
    bucket_size: int,
) -> DataFrame:
    df = spark.read.parquet(f"{path}/{table}")
    if lo is not None:
        # Redundant bucket predicate = partition pruning; height predicate =
        # row-group pushdown within the touched buckets.
        df = df.filter(
            (F.col("height_bucket") >= lo // bucket_size) & (F.col("height") >= lo)
        )
    if hi is not None:
        df = df.filter(
            (F.col("height_bucket") <= hi // bucket_size) & (F.col("height") <= hi)
        )
    return df.drop("height_bucket")


def historical_block_data(
    spark: SparkSession,
    path: str,
    lo: int | None = None,
    hi: int | None = None,
    *,
    bucket_size: int = DEFAULT_BUCKET,
    decode_tx_meta: bool = True,
) -> DataFrame:
    """S5: full enriched StreamBlock rows for [lo, hi] (both optional).

    Validates ``from <= to`` like historicalBlockDataFlow (HistoricalBlockFlow.kt:30).
    """
    if lo is not None and hi is not None and lo > hi:
        raise ValueError(f"from ({lo}) must be <= to ({hi})")
    from event_stream_spark.operators.flatten import enrich_stream_blocks

    blocks = _range_scan(spark, path, "blocks", lo, hi, bucket_size)
    results = _range_scan(spark, path, "block_results", lo, hi, bucket_size)
    return enrich_stream_blocks(
        blocks, results, historical=True, decode_tx_meta=decode_tx_meta
    )


def historical_block_meta(
    spark: SparkSession,
    path: str,
    lo: int | None = None,
    hi: int | None = None,
    *,
    bucket_size: int = DEFAULT_BUCKET,
) -> DataFrame:
    """S6/S7: header-only metadata scan — column pruning reaches the parquet
    reader, so this never deserializes tx payloads (the reference needs a
    separate cheap RPC endpoint for the same effect)."""
    df = _range_scan(spark, path, "blocks", lo, hi, bucket_size)
    return df.select(
        "height",
        "chain_id",
        "block_ts",
        "data_hash",
        "proposer_address",
        F.size(F.coalesce(F.col("txs"), F.array())).alias("num_txs"),
    )
