from .windows import (  # noqa: F401
    events_schema,
    stream_from_directory,
    tumbling_agg,
    sliding_agg,
    session_agg,
    streaming_funnel,
    trailing_distinct_users,
    dedup_within_watermark,
    run_to_memory,
    stream_stream_interval_join,
    stream_stream_interval_join_outer,
)
from .sinks import (  # noqa: F401
    foreach_batch_dual,
    foreach_batch_epoch_jdbc,
    foreach_batch_epoch_parquet,
    foreach_batch_jdbc,
    foreach_batch_parquet,
    foreach_batch_continuous_aggregate,
    foreach_batch_expectations,
    foreach_batch_merge_versioned,
    foreach_batch_versioned,
)
