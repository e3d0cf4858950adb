from taxi_trips_etl_spark.streaming.rollup import (
    run_streaming_daypart_rollup,
    streaming_daypart_rollup,
)

__all__ = ["run_streaming_daypart_rollup", "streaming_daypart_rollup"]
