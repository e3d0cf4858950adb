"""Stream-stream join: click→purchase attribution with watermarks.

The remaining Structured Streaming join primitive beyond windowed
aggregation (rollup.py) and arbitrary state (sessionize.py): joining
two live streams requires watermarks on BOTH sides plus a time-range
condition so Spark can bound the join state — each side buffers only
rows younger than (watermark + range). Here: every click joins the
same user's purchases from the preceding 2 hours.

State at scale: keyed by (user_id), sized by event-rate × (watermark +
2h) window — independent of total history. The equi-key keeps it a
streaming hash join, never a cross-stream scan.

Over a static directory with AvailableNow, the inner join's output
equals the batch join — the test and the DuckDB oracle assert exactly
that.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _event_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    from taxi_trips_etl_spark.sources.readers import (
        normalize_event_ts,
        require_nanos_as_long,
        require_utc_session,
    )

    require_nanos_as_long(spark)
    require_utc_session(spark)
    static = spark.read.parquet(events_dir)
    if os.path.isfile(events_dir):
        parent, fname = os.path.split(events_dir)
        stream = (
            spark.readStream.schema(static.schema)
            .option("pathGlobFilter", fname)
            .parquet(parent)
        )
    else:
        stream = spark.readStream.schema(static.schema).parquet(events_dir)
    return normalize_event_ts(stream)


def streaming_click_attribution(
    spark: SparkSession, events_dir: str, window_hours: int = 2
) -> DataFrame:
    """Streaming DF: (user_id, click_id, click_ts, purchase_id, purchase_ts)."""
    clicks = (
        _event_stream(spark, events_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        _event_stream(spark, events_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    return clicks.join(
        purchases,
        F.expr(
            f"""c_user = p_user
                AND click_ts >= purchase_ts
                AND click_ts <= purchase_ts + INTERVAL {window_hours} HOURS"""
        ),
        "inner",
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
    )


def run_streaming_click_attribution(
    spark: SparkSession,
    events_dir: str,
    sink_table: str = "click_attr",
    state_partitions: int = 8,
) -> DataFrame:
    """Run to completion over a static dir (AvailableNow) — output
    equals the batch join.

    ``state_partitions`` sizes the join's state stores — a
    stream-stream join keeps FOUR per shuffle partition (key-to-count +
    key-with-index per side); see streaming/state.py for the sizing
    rule (8 vs the batch 32 measures ~2× faster here, same output).
    """
    from taxi_trips_etl_spark.streaming.state import (
        state_partitions as _pin,
    )

    with _pin(spark, state_partitions):
        q = (
            streaming_click_attribution(spark, events_dir)
            .writeStream.format("memory")
            .queryName(sink_table)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink_table)
