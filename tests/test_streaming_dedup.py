"""Streaming deduplication: dropDuplicatesWithinWatermark ≡ batch
distinct over static data (the streaming ingestion-dedup primitive)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_streaming_dedup_within_watermark(spark, sf_dir, tmp_path):
    # Build a source with REAL duplicates: events unioned with itself.
    src = str(tmp_path / "dup_events")
    from taxi_trips_etl_spark.queries import _events

    ev = _events(spark, sf_dir).select("event_id", "ts", "event_type")
    ev.unionByName(ev).repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .parquet(src)
        .withWatermark("ts", "1 day")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_stream_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("t_stream_dedup")
    assert got.count() == ev.count()  # every duplicate collapsed
    assert got.select("event_id").distinct().count() == ev.count()
