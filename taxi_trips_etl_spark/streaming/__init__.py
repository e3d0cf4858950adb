from taxi_trips_etl_spark.streaming.dq_monitor import (
    monitor_batch,
    run_streaming_dq_monitor,
)
from taxi_trips_etl_spark.streaming.ingest_dedup import (
    dedup_batch_against_index,
    run_streaming_ingest_dedup,
)
from taxi_trips_etl_spark.streaming.rollup import (
    run_streaming_daypart_rollup,
    streaming_daypart_rollup,
)

__all__ = [
    "monitor_batch",
    "run_streaming_dq_monitor",
    "dedup_batch_against_index",
    "run_streaming_ingest_dedup",
    "run_streaming_daypart_rollup",
    "streaming_daypart_rollup",
]
