from gus_spark.streaming.subscriptions import (  # noqa: F401
    dedup_stream,
    run_to_memory,
    session_aggregates,
    stream_events,
    windowed_rollup,
)
