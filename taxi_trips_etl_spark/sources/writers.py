"""Sinks and write dispositions (SURVEY.md §2.1, S4-S9).

Reference semantics being re-expressed:

- WRITE_TRUNCATE / WRITE_APPEND dispositions
  (``/root/reference/taxi_trips_etl.py:36-40``) → Spark save modes.
- Query-result → destination table (``taxi_trips_etl.py:100-109``) →
  ``df.write`` to a parquet table path.
- Per-day table names ``trips_YYYYMMDD`` (``taxi_trips_etl.py:124``)
  → ONE table partitioned by ``run_date``. At 100 TB this is the load-
  bearing difference: a date-partitioned parquet table gives native
  partition pruning (a query for one day scans one directory), schema
  evolution across days, and no table-name string mangling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_overwrite(df: DataFrame, path: str) -> None:
    """S4/S6: WRITE_TRUNCATE → destination (creates if needed, S5)."""
    df.write.mode("overwrite").parquet(path)


def write_append(df: DataFrame, path: str) -> None:
    """S4: WRITE_APPEND."""
    df.write.mode("append").parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Bucketed (hash-clustered) table: the co-located-join primitive.

    Two tables bucketed on the same key with the same bucket count join
    WITHOUT a shuffle — at 100 TB that turns every recurring fact↔fact
    join on the bucket key into a local zipper (add sortBy to skip the
    sort too). Requires ``saveAsTable`` (bucket metadata lives in the
    catalog, not the parquet files).
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def write_partitioned_by_run_date(df: DataFrame, path: str, ds: str) -> None:
    """S9: replaces the reference's ``trips_{yyyymmdd}`` name mangling.

    Dynamic partition overwrite so re-running a day (Airflow retry /
    backfill, reference ``retries=1``) replaces only that day's
    partition — idempotent daily runs at any scale.
    """
    (
        df.withColumn("run_date", F.lit(ds))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("run_date")
        .parquet(path)
    )


def compact_to_target_bytes(
    spark, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """In-place small-files compaction: rewrite a parquet table into
    ceil(bytes/target) files. Returns the output file count.
    (Byte-targeted sibling of :func:`compact_small_files`, which is
    row-targeted and writes to a separate out_path.)

    The 100 TB hygiene op: streaming ingests and per-day appends leave
    thousands of KB-sized files; every downstream scan then pays one
    task + one open per file, and the NameNode/listing cost grows
    unbounded. Repartition to the byte-derived count (never
    ``coalesce(1)`` — that serializes the write through one task) and
    atomically swap via a temp-dir rename.
    """
    import math
    import os
    import shutil

    size = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(size / target_file_bytes))
    tmp = path.rstrip("/") + "__compact_tmp"
    spark.read.parquet(path).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_files


def write_sorted_for_skipping(
    df: DataFrame, path: str, sort_cols: list[str], files: int | None = None
) -> None:
    """Write parquet laid out for row-group min/max skipping: range-
    partition by ``sort_cols`` then sort within partitions, so each
    file/row-group covers a narrow, non-overlapping value range.

    A filter like ``ts BETWEEN x AND y`` then prunes at THREE levels —
    partition files (via their stats), row groups, and pages — instead
    of scanning everything. At 100 TB this is the difference between
    reading 100 TB and reading the 2 GB the predicate touches.
    ``repartitionByRange`` samples the keys, so skew (a hot day) maps
    to more files rather than one fat file.
    """
    cols = [F.col(c) for c in sort_cols]
    part = (
        df.repartitionByRange(files, *cols)
        if files
        else df.repartitionByRange(*cols)
    )
    part.sortWithinPartitions(*cols).write.mode("overwrite").parquet(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink (overwrite) — matching read_orc; columnar with the
    same min/max-stat data skipping story as parquet."""
    df.write.mode("overwrite").orc(path)


def erase_keys_partitioned(
    spark,
    path: str,
    keys_df: DataFrame,
    key_col: str,
    partition_col: str,
) -> int:
    """Targeted right-to-erasure delete on a partitioned parquet table:
    rewrite ONLY the partitions that contain the keys, via dynamic
    partition overwrite — every other partition's files are untouched
    (no full-table rewrite, no tombstone format needed).

    At 100 TB this is the difference between rewriting terabytes and
    rewriting the handful of partitions a user's rows live in:

      1. one partition-pruned probe finds the affected partition
         values (an aggregate over just the key + partition columns —
         column-pruned to the scan);
      2. only those partitions are re-read (partition filter →
         PartitionFilters in the scan), anti-joined against the key
         set (broadcast — an erasure batch is small by nature);
      3. dynamic partition overwrite replaces exactly those
         partitions.

    Returns the number of partitions rewritten. Caller owns making
    ``keys_df`` the complete erasure batch; rerunning is idempotent.
    """
    table = spark.read.parquet(path)
    keys = keys_df.select(F.col(key_col)).distinct()
    affected = [
        r[partition_col]
        for r in table.join(F.broadcast(keys), key_col)
        .select(partition_col)
        .distinct()
        .collect()
    ]
    if not affected:
        return 0
    scoped = table.filter(F.col(partition_col).isin(affected))
    cleaned = scoped.join(F.broadcast(keys), key_col, "left_anti")
    (
        cleaned.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
    return len(affected)


def compact_small_files(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    rows_per_file: int,
) -> DataFrame:
    """Small-file compaction — the table-maintenance pass every
    long-lived ingest needs: streaming sinks and per-day appends leave
    thousands of KB-sized parquet files whose per-file open/footer
    cost dominates scans at 100 TB (and whose task count explodes the
    scheduler). Rewrites ``in_path`` into ceil(n_rows / rows_per_file)
    files via repartition.

    The file target is derived from ROW count, not byte size, so the
    plan is deterministic and engine-checkable; production would set
    rows_per_file from target_bytes / avg_row_bytes. Returns a 1-row
    audit frame (n_rows, n_files_before, n_files_after_planned) —
    n_files_after_planned is also the exact written file count for a
    non-empty input (repartition(n) emits n non-empty parts when
    n <= rows).
    """
    import math

    df = spark.read.parquet(in_path)
    n_rows = df.count()
    n_before = df.select(F.input_file_name()).distinct().count()
    n_after = max(1, math.ceil(n_rows / rows_per_file))
    df.repartition(n_after).write.mode("overwrite").parquet(out_path)
    from taxi_trips_etl_spark.sources.localrel import local_rows

    return local_rows(
        spark,
        [(int(n_rows), int(n_before), int(n_after))],
        "n_rows long, n_files_before long, n_files_after long",
    )
