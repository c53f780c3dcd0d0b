from event_stream_spark.operators.flatten import (  # noqa: F401
    blocks_from_rpc,
    block_results_from_rpc,
    enrich_stream_blocks,
    explode_block_events,
    explode_tx_events,
    explode_tx_errors,
)
from event_stream_spark.operators.filters import (  # noqa: F401
    skip_empty_blocks,
    filter_by_events,
    tri_state_predicate,
    dedup_heights,
    distinct_until_changed,
    sample_nth,
)
from event_stream_spark.operators.merge import (  # noqa: F401
    join_block_results,
    missing_heights,
    gap_fill,
    combine_historical_live,
)
from event_stream_spark.operators.ordering import (  # noqa: F401
    sort_by_height,
    height_range,
    count_windows,
    sliding_window,
)
