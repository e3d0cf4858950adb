"""applyInPandasWithState sessionizer ≡ batch window sessionization."""

from __future__ import annotations

from pyspark.sql import functions as F

from taxi_trips_etl_spark.streaming.sessionize import run_streaming_sessionize


def test_stateful_sessionize_equals_batch(spark, sf_dir):
    got_df = run_streaming_sessionize(
        spark, f"{sf_dir}/events.parquet", sink_table="t_sessions_eq"
    )
    got = {
        (r.user_id, r.session_idx, r.n_events,
         r.session_start.strftime("%Y-%m-%d %H:%M:%S"),
         r.session_end.strftime("%Y-%m-%d %H:%M:%S"))
        for r in got_df.collect()
    }
    from taxi_trips_etl_spark.queries import all_queries

    batch = all_queries()["sessionize_events"](spark, sf_dir)
    want = {
        (r.user_id, r.session_idx, r.n_events, r.session_start, r.session_end)
        for r in batch.collect()
    }
    assert got == want
    assert len(got) > 0


def test_streaming_session_window_equals_batch(spark, sf_dir):
    """Native streaming session windows == batch F.session_window over
    the same static directory (AvailableNow, complete mode)."""
    from pyspark.sql import functions as F

    from taxi_trips_etl_spark.queries import _events
    from taxi_trips_etl_spark.streaming.session_window import (
        run_streaming_session_window,
    )

    got = {
        tuple(r)
        for r in run_streaming_session_window(
            spark, f"{sf_dir}/events.parquet", sink_table="sw_test"
        ).collect()
    }
    ev = _events(spark, sf_dir)
    want = {
        tuple(r)
        for r in ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            "n_events",
        )
        .collect()
    }
    assert got == want and len(got) > 0
