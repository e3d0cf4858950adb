"""Deterministic sampling & splits for training-data pipelines.

``df.sample()`` is seed-and-partitioning dependent — rerun the job with
different parallelism and you get a different sample. At 100 TB that
breaks reproducibility and incremental reruns. These operators derive
membership from a *content hash* of the row key instead: the same row
lands in the same sample/split on any cluster, any partitioning, any
engine (md5-based, so the DuckDB oracle reproduces it bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_SPACE = 1 << 32


def _key_bucket(key: Column, salt: str) -> Column:
    """Uniform 32-bit bucket from md5 of (salt, key) — engine-portable."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def deterministic_sample(
    df: DataFrame, rate: float, key: str, salt: str = "sample"
) -> DataFrame:
    """Keep ~rate of rows, chosen by key hash — idempotent & rerun-stable."""
    return df.filter(_key_bucket(F.col(key), salt) < int(rate * _HASH_SPACE))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    key: str,
    strata_col: str,
    default_rate: float = 0.0,
    salt: str = "strata",
) -> DataFrame:
    """Per-stratum hash sampling (deterministic ``sampleBy``): each
    stratum keeps its own rate — rebalancing skewed classes (languages,
    sources, quality tiers) without RNG or partitioning dependence."""
    bucket = _key_bucket(F.col(key), salt)
    threshold = F.lit(int(default_rate * _HASH_SPACE))
    for stratum, rate in rates.items():
        threshold = (
            F.when(F.col(strata_col) == stratum, F.lit(int(rate * _HASH_SPACE)))
            .otherwise(threshold)
        )
    return df.filter(bucket < threshold)


def train_test_split(
    df: DataFrame, key: str, test_rate: float = 0.2, salt: str = "split"
) -> DataFrame:
    """Adds a ``split`` column ('train' | 'test') keyed by content hash.

    Same key → same split forever: new data appends without reshuffling
    membership, and dedup-then-split pipelines can't leak a near-dup
    pair across the boundary if they split on the canonical doc key.
    """
    bucket = _key_bucket(F.col(key), salt)
    return df.withColumn(
        "split",
        F.when(bucket < int(test_rate * _HASH_SPACE), "test").otherwise("train"),
    )
