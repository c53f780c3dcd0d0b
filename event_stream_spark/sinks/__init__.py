from event_stream_spark.sinks.console import console_observer  # noqa: F401
from event_stream_spark.sinks.splay import (  # noqa: F401
    splay_frame,
    write_splayed_json_batch,
    splayed_json_sink,
)
from event_stream_spark.sinks.kafka import kafka_frame, kafka_sink  # noqa: F401
