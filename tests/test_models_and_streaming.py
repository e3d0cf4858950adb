"""Model registry (dbt parity) + streaming rollup + sources/writers."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from taxi_trips_etl_spark.functions.scalar import daypart, timestamp_diff_minutes
from taxi_trips_etl_spark.plans.models import ModelRegistry, taxi_models
from taxi_trips_etl_spark.sources.writers import write_partitioned_by_run_date
from taxi_trips_etl_spark.streaming.rollup import run_streaming_daypart_rollup


def _enriched_like(spark):
    rows = [
        (dt.datetime(2026, 1, 1, 8), dt.datetime(2026, 1, 1, 8, 30), 1, 2, 10.0),
        (dt.datetime(2026, 1, 1, 9), dt.datetime(2026, 1, 1, 9, 45), 2, 3, 20.0),
        (dt.datetime(2026, 1, 2, 13), dt.datetime(2026, 1, 2, 13, 10), 3, 4, 30.0),
    ]
    df = spark.createDataFrame(
        rows,
        "pickup_datetime timestamp, dropoff_datetime timestamp, "
        "pickup_location_id long, dropoff_location_id long, total_amount double",
    )
    return df.withColumn("daypart", daypart(F.col("pickup_datetime")))


def test_model_dag_ref_source_and_materialization(spark, tmp_path):
    reg = taxi_models(spark, _enriched_like(spark), out_dir=str(tmp_path))
    built = reg.run()
    assert set(built) == {
        "stg_taxi_trips__tripss",
        "tripss",
        "daily_trip_metrics",
        "trips_view",
    }
    # table materialization persisted parquet; view registered in catalog
    assert (tmp_path / "daily_trip_metrics").exists()
    assert spark.catalog.tableExists("trips_view")
    assert built["trips_view"].collect()[0].trip_count == 3

    daily = {str(r.pickup_date): r for r in built["daily_trip_metrics"].collect()}
    d1 = daily["2026-01-01"]
    assert d1.n_trips == 2
    assert d1.avg_drive_time == 37.5  # (30 + 45) / 2 minutes
    assert d1.total_drive_time == 75
    assert d1.total_amount_cents == 3000
    assert d1.avg_amount == 15.0


def test_model_memoization_builds_once(spark):
    reg = ModelRegistry(spark)
    reg.add_source("src", spark.range(5).toDF("n"))
    calls = []

    @reg.model("m1", materialized="none")
    def m1(r):
        calls.append(1)
        return r.source("src")

    @reg.model("m2", materialized="none")
    def m2(r):
        return r.ref("m1").withColumn("x", F.col("n") * 2)

    reg.run()
    assert len(calls) == 1  # ref() memoizes across the DAG


def test_timestamp_diff_truncates_to_minute(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2026, 1, 1, 10, 0, 0), dt.datetime(2026, 1, 1, 10, 1, 59))],
        "a timestamp, b timestamp",
    )
    out = df.select(timestamp_diff_minutes(F.col("b"), F.col("a")).alias("m")).collect()
    assert out[0].m == 1  # 119 s → 1 min (truncation, not rounding)


def test_streaming_rollup_equals_batch(spark, sf_dir):
    result = run_streaming_daypart_rollup(
        spark, f"{sf_dir}/events.parquet", sink_table="t_stream_test"
    )
    got = {
        (r.day, r.daypart, r.event_type): r.event_count for r in result.collect()
    }
    from taxi_trips_etl_spark.queries import _events

    batch = (
        _events(spark, sf_dir)
        .groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            daypart(F.col("ts")).alias("daypart"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("event_count"))
    )
    want = {(r.day, r.daypart, r.event_type): r.event_count for r in batch.collect()}
    assert got == want


def test_partitioned_writer_dynamic_overwrite(spark, tmp_path):
    out = str(tmp_path / "tbl")
    df = spark.range(10).toDF("n")
    write_partitioned_by_run_date(df, out, "2026-01-01")
    write_partitioned_by_run_date(df, out, "2026-01-02")
    # rewriting one day must not clobber the other
    write_partitioned_by_run_date(spark.range(3).toDF("n"), out, "2026-01-02")
    back = spark.read.parquet(out)
    counts = {
        str(r.run_date): r.n for r in
        back.groupBy("run_date").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {"2026-01-01": 10, "2026-01-02": 3}
