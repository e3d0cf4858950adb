"""Physical-layout planners — the two decisions that dominate 100 TB
shuffle health: WHERE to cut range partitions, and HOW MUCH to salt a
skewed join key.

Both emit PLANS (small audit tables an orchestrator feeds back into
`repartitionByRange` / the salted-join builder), not repartitioned
data — planning is cheap and inspectable, repartitioning is the
expensive action the plan justifies.

Exactness: every number here is integer arithmetic over exact counts
(bucket index = (rn-1)·k div n, salt = ceil division), so DuckDB
replays both planners bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_partition_plan(
    df: DataFrame,
    key: str,
    n_partitions: int = 16,
    tiebreak: str | None = None,
) -> DataFrame:
    """Exact equi-depth split points for ``repartitionByRange(key)``:
    rank every row by (key, tiebreak), assign bucket
    (rn−1)·k div n, and emit per-bucket (lo, hi, n_rows) — the
    boundary table a writer pins so reruns/backfills produce stable
    file ranges (Spark's own RangePartitioner re-SAMPLES per run:
    non-deterministic boundaries, files that never line up across
    days).

    At 100 TB the exact global rank is replaced by the same
    arithmetic over a deterministic sample (this exact version IS the
    audit for that sampler); the plan table itself is k rows.

    → (bucket, lo, hi, n_rows), bucket ∈ [0, k).
    """
    total = df.select(F.count(F.lit(1)).cast("long").alias("n"))
    sel = df.select(
        F.col(key).alias("k"),
        *([F.col(tiebreak).alias("tb")] if tiebreak else []),
    )
    w = Window.orderBy(
        F.col("k"), *([F.col("tb")] if tiebreak else [])
    )
    ranked = (
        sel
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .crossJoin(F.broadcast(total))
        .withColumn(
            "bucket",
            F.expr(f"(rn - 1) * {n_partitions} div n").cast("long"),
        )
    )
    return (
        ranked.groupBy("bucket")
        .agg(
            F.min("k").cast("long").alias("lo"),
            F.max("k").cast("long").alias("hi"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        .orderBy("bucket")
    )


def adaptive_salt_plan(
    df: DataFrame,
    key: str,
    target_rows_per_task: int = 2000,
    max_salt: int = 32,
) -> DataFrame:
    """Per-key salt factors for a skewed shuffle join: keys whose row
    count exceeds ``target_rows_per_task`` get
    salt = min(max_salt, ceil(count / target)) — the replication
    factor the salted-join builder (operators/skew.py pattern) uses to
    split that key's rows across salt sub-partitions while the build
    side replicates salt ways. Keys at salt = 1 ride the normal path,
    so the plan table is only the heavy tail (broadcastable by
    construction: heavy keys are few, that is what skew means).

    → (key, n_rows, salt_factor), salted keys only, heaviest first.
    """
    t = int(target_rows_per_task)
    return (
        df.groupBy(F.col(key))
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .withColumn(
            "salt_factor",
            F.least(
                F.lit(max_salt).cast("long"),
                F.expr(f"(n_rows + {t - 1}) div {t}"),
            ).cast("long"),
        )
        .filter(F.col("salt_factor") > 1)
        .orderBy(F.col("n_rows").desc(), F.col(key))
    )
