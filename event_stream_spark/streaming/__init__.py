from event_stream_spark.streaming.combined import (  # noqa: F401
    parse_source_rows,
    live_stream,
    historical_stream,
    combined_block_stream,
    dedup_heights_stream,
)
from event_stream_spark.streaming.control import (  # noqa: F401
    PanicAbort,
    panic_guard,
    guarded_foreach_batch,
)
