"""Streaming ingestion with incremental near-dedup: cross-batch dups
are caught against the accumulated band index; per-batch work never
re-pairs the corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

DUP = "the quick brown fox jumps over the lazy dog again and again today"
ALT = "completely different prose describing spark shuffles joins and aggregations"


def test_streaming_ingest_dedup_cross_batch(spark, tmp_path):
    from taxi_trips_etl_spark.streaming.ingest_dedup import (
        run_streaming_ingest_dedup,
    )

    src = str(tmp_path / "src")
    docs1 = spark.createDataFrame([(1, DUP), (2, ALT)], "doc_id long, text string")
    docs2 = spark.createDataFrame([(10, DUP), (11, ALT + " with extra words appended here")],
                                  "doc_id long, text string")
    # two files → two micro-batches (maxFilesPerTrigger=1)
    docs1.coalesce(1).write.mode("append").parquet(src)
    docs2.coalesce(1).write.mode("append").parquet(src)

    index = str(tmp_path / "index")
    clean = str(tmp_path / "clean")
    ckpt = str(tmp_path / "ckpt")
    run_streaming_ingest_dedup(
        spark, src, docs1.schema, index, clean, ckpt
    )

    kept = {r["doc_id"] for r in spark.read.parquet(clean).collect()}
    # Doc 10 duplicates doc 1 across batches → dropped; 11 is a near
    # (not exact) variant of 2 — whether it survives depends on band
    # collisions, but 1 and 2 (first occurrences) must both survive.
    assert 1 in kept and 2 in kept
    assert 10 not in kept
    # Index accumulated bands for every ingested doc.
    idx_docs = {r["doc_id"] for r in
                spark.read.parquet(index).select("doc_id").distinct().collect()}
    assert idx_docs == {1, 2, 10, 11}


def test_dedup_batch_callable_is_restart_safe(spark, tmp_path):
    from taxi_trips_etl_spark.streaming.ingest_dedup import (
        dedup_batch_against_index,
    )

    index = str(tmp_path / "idx")
    clean = str(tmp_path / "cln")
    b1 = spark.createDataFrame([(1, DUP)], "doc_id long, text string")
    b2 = spark.createDataFrame([(2, DUP)], "doc_id long, text string")
    dedup_batch_against_index(spark, b1, index, clean)
    dedup_batch_against_index(spark, b2, index, clean)
    kept = {r["doc_id"] for r in spark.read.parquet(clean).collect()}
    assert kept == {1}  # second batch's dup caught via the stored index
