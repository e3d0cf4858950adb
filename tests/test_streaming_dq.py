"""Streaming DQ monitor: per-batch violation counts land in the log."""

from __future__ import annotations


def test_streaming_dq_monitor_logs_per_batch(spark, tmp_path):
    from taxi_trips_etl_spark.streaming.dq_monitor import (
        run_streaming_dq_monitor,
    )

    src = str(tmp_path / "src")
    good = spark.createDataFrame(
        [(1, 5.0), (2, 10.0)], "k long, qty double"
    )
    bad = spark.createDataFrame(
        [(3, 99.0), (None, 5.0)], "k long, qty double"
    )
    good.coalesce(1).write.mode("append").parquet(src)
    bad.coalesce(1).write.mode("append").parquet(src)

    log = str(tmp_path / "log")
    run_streaming_dq_monitor(
        spark, src, good.schema, log, str(tmp_path / "ckpt"),
        not_null=["k"], ranges={"qty": (1.0, 50.0)},
    )
    rows = spark.read.parquet(log).collect()
    # 2 batches × 2 rules
    assert len(rows) == 4
    assert {r["batch_id"] for r in rows} == {0, 1}
    by = {(r["batch_id"], r["rule"]): r["violations"] for r in rows}
    total_null_k = sum(v for (b, r), v in by.items() if r.startswith("not_null"))
    total_range = sum(v for (b, r), v in by.items() if r.startswith("range"))
    assert total_null_k == 1 and total_range == 1
