from cuvs_spark.streaming.bloom_stream import (  # noqa: F401
    bloom_dedup_batch_against_state,
    start_streaming_bloom_dedup,
)
from cuvs_spark.streaming.dedup_stream import (  # noqa: F401
    dedup_batch_against_state,
    start_streaming_dedup,
)
from cuvs_spark.streaming.dynamic_batching import (  # noqa: F401
    dispatch_assignments,
    start_dynamic_batching,
)
from cuvs_spark.streaming.rate_monitor import (  # noqa: F401
    burst_batch_against_state,
    start_streaming_rate_monitor,
)
from cuvs_spark.streaming.tiered_stream import (  # noqa: F401
    start_tiered_ingest,
    windowed_event_counts,
)
