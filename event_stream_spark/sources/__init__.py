from event_stream_spark.sources.fixtures import (  # noqa: F401
    read_json_dir,
    read_block_fixtures,
    read_block_results_fixtures,
    read_live_fixtures,
    read_rpc_response_fixtures,
)
from event_stream_spark.sources.blocks import (  # noqa: F401
    historical_block_data,
    historical_block_meta,
    write_block_lake,
)
from event_stream_spark.sources.wsfeed import (  # noqa: F401
    SUBSCRIPTION_NEW_BLOCK,
    SUBSCRIPTION_NEW_BLOCK_HEADER,
    append_messages,
    live_message_stream,
)
