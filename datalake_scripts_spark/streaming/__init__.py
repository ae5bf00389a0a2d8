from .windows import (  # noqa: F401
    events_schema,
    stream_from_directory,
    tumbling_agg,
    sliding_agg,
    session_agg,
    dedup_within_watermark,
    run_to_memory,
)
from .sinks import foreach_batch_parquet, foreach_batch_jdbc  # noqa: F401
