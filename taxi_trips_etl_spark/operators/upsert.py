"""Keyed upsert (MERGE-INTO semantics) on plain parquet tables.

OSS Spark has no ``MERGE INTO`` without a table format (Delta/Iceberg);
the portable formulation is a full-outer join: updates win per key,
unmatched target rows survive, unmatched source rows insert. Combined
with ``write_partitioned_by_run_date``'s dynamic partition overwrite,
this gives idempotent daily upserts on raw parquet.

At scale: one shuffle on the merge key (or zero if both sides are
bucketed on it — see ``sources.writers.write_bucketed``); the rewrite
cost is bounded to the partitions actually touched when the caller
partition-prunes the target first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(target: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """Rows from ``updates`` replace same-key rows in ``target``; new
    keys append; other target rows pass through unchanged.

    ``updates`` must be unique per key (enforce upstream or dedupe) —
    duplicate update keys would multiply through the join.
    """
    value_cols = [c for c in target.columns if c not in keys]
    u = updates.select(
        *[F.col(k).alias(f"__u_{k}") for k in keys],
        *[F.col(c).alias(f"__u_{c}") for c in value_cols],
        F.lit(True).alias("__has_update"),
    )
    cond = [target[k] == F.col(f"__u_{k}") for k in keys]
    joined = target.join(u, cond, "full_outer")
    picked = [
        F.coalesce(target[k], F.col(f"__u_{k}")).alias(k) for k in keys
    ] + [
        F.when(F.col("__has_update").isNotNull(), F.col(f"__u_{c}"))
        .otherwise(target[c])
        .alias(c)
        for c in value_cols
    ]
    return joined.select(*picked)
