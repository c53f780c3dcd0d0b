from event_stream_spark.streaming.combined import (  # noqa: F401
    parse_source_rows,
    parse_header_rows,
    resolve_heights,
    live_stream,
    historical_stream,
    combined_block_stream,
    live_header_stream,
    historical_header_stream,
    combined_header_stream,
    dedup_heights_stream,
)
from event_stream_spark.streaming.control import (  # noqa: F401
    PanicAbort,
    panic_guard,
    guarded_foreach_batch,
)
from event_stream_spark.streaming.checkpoint import (  # noqa: F401
    last_checkpoint,
    last_committed_batch,
)
from event_stream_spark.streaming.dedupstream import (  # noqa: F401
    corpus_ingest_sink,
    ingest_batch,
)
from event_stream_spark.streaming.gapdetect import detect_gaps  # noqa: F401
from event_stream_spark.streaming.retry import (  # noqa: F401
    backoff_millis,
    is_retryable,
    run_with_restarts,
)
from event_stream_spark.streaming.windows import windowed_event_counts  # noqa: F401
from event_stream_spark.streaming.snapsink import (  # noqa: F401
    snap_append_writer,
    stream_into_snaptable,
)
