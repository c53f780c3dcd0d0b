"""Config-driven pipeline entry point — the es-cli analog (SURVEY.md §3.3;
es-cli/src/main/kotlin/Main.kt:65-125, config schema Config.kt:9-63).

The reference wires config → engine → `.observe(console).observe(fileOutput)`
→ collect; here: args → source DataFrame → shared transforms → sinks, either
batch (bounded range, finishes) or streaming (`awaitTermination` under the
retry/backoff restart loop).

    python -m event_stream_spark.cli --from-height 1 --to-height 40 \
        --backend synthetic --batch --splay-dir ./out --console-nth 10
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="event-stream-spark",
        description="Stream/scan blocks to console, splayed JSON, or Kafka.",
    )
    # source (Config.kt: node/from/to)
    p.add_argument("--from-height", type=int, default=1)
    p.add_argument("--to-height", type=int, default=None)
    p.add_argument("--backend", default="synthetic", help="synthetic | fixtures")
    p.add_argument("--templates-dir", default=None, help="fixtures backend root")
    p.add_argument("--batch", action="store_true", help="bounded batch run (no stream)")
    # options (BlockStreamOptions.kt)
    p.add_argument("--skip-empty-blocks", action="store_true")
    p.add_argument("--tx-event", action="append", default=[], help="keep-filter, repeatable")
    p.add_argument("--block-event", action="append", default=[], help="keep-filter, repeatable")
    p.add_argument("--ordered", action="store_true", help="global height order (batch)")
    p.add_argument("--no-tx-meta", action="store_true", help="skip protobuf tx decode")
    # sinks (Main.kt:103-114 observer chain)
    p.add_argument("--console-nth", type=int, default=None, help="console sink, every nth")
    p.add_argument("--verbose", action="store_true", help="console: decode attributes")
    p.add_argument("--splay-dir", default=None, help="splayed JSON file sink dir")
    p.add_argument("--checkpoint", default=None, help="checkpointLocation (streaming)")
    p.add_argument("--max-retries", type=int, default=5)
    return p


def build_pipeline(spark, args) -> DataFrame:
    """Source + shared transforms (identical batch/streaming)."""
    from event_stream_spark.operators.filters import filter_by_events, skip_empty_blocks
    from event_stream_spark.operators.ordering import sort_by_height
    from event_stream_spark.streaming.combined import historical_stream

    options = {"backend": args.backend}
    if args.templates_dir:
        options["fixtures_dir"] = args.templates_dir
    to = args.to_height
    if to is None and args.batch:
        raise SystemExit("--batch needs --to-height (bounded scan)")
    df = historical_stream(
        spark,
        args.from_height,
        to,
        streaming=not args.batch,
        decode_tx_meta=not args.no_tx_meta,
        **options,
    )
    if args.skip_empty_blocks:
        df = skip_empty_blocks(df)
    if args.tx_event or args.block_event:
        df = filter_by_events(df, args.tx_event, args.block_event)
    if args.ordered and args.batch:
        df = sort_by_height(df)
    return df


def run(argv: list[str] | None = None) -> None:
    args = build_parser().parse_args(argv)

    from event_stream_spark.session import get_spark

    spark = get_spark("event-stream-cli")
    spark.sparkContext.setLogLevel("WARN")
    df = build_pipeline(spark, args)

    if args.batch:
        if args.splay_dir:
            from event_stream_spark.sinks.splay import write_splayed_json_batch

            write_splayed_json_batch(df, args.splay_dir)
        if args.console_nth:
            from event_stream_spark.operators.filters import sample_nth

            sample_nth(df, args.console_nth).show(20, truncate=True)
        if not args.splay_dir and not args.console_nth:
            print(f"rows: {df.count()}")
        return

    # streaming: sinks under the checkpointed restart loop (§2.9)
    if not args.checkpoint:
        raise SystemExit("streaming mode needs --checkpoint")
    from event_stream_spark.streaming.retry import run_with_restarts

    def start():
        if args.splay_dir:
            from event_stream_spark.sinks.splay import splayed_json_sink

            return splayed_json_sink(df, args.splay_dir, args.checkpoint).start()
        from event_stream_spark.sinks.console import console_observer

        return (
            console_observer(df, nth=args.console_nth or 100, verbose=args.verbose)
            .option("checkpointLocation", args.checkpoint)
            .start()
        )

    run_with_restarts(start, max_retries=args.max_retries)


if __name__ == "__main__":
    run()
