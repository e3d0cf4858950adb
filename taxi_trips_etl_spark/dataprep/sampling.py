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
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"sample rate must be in [0, 1], got {rate}")
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
    # Validate rates and default_rate SEPARATELY: merging them into one
    # dict keyed by stratum name would let a stratum literally named
    # '__default__' be overwritten by default_rate, silently skipping
    # its range check while the threshold CASE below still applies it.
    for _s, _r in rates.items():
        if not 0.0 <= _r <= 1.0:
            raise ValueError(f"stratum rate must be in [0, 1], got {_s}={_r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(
            f"default_rate must be in [0, 1], got {default_rate}"
        )
    bucket = _key_bucket(F.col(key), salt)
    threshold = F.lit(int(default_rate * _HASH_SPACE))
    for stratum, rate in rates.items():
        threshold = (
            F.when(F.col(strata_col) == stratum, F.lit(int(rate * _HASH_SPACE)))
            .otherwise(threshold)
        )
    return df.filter(bucket < threshold)


def split_expr(
    key: Column, test_rate: float = 0.2, salt: str = "split"
) -> Column:
    """The train/test label as a pure expression of ``key`` — split
    membership is content-hash only (see :func:`train_test_split`), so
    consumers that already hold the key column (pair tables, audit
    joins) can derive the label inline instead of joining the
    corpus-side assignment back in (r13: split_leakage_audit dropped
    two corpus-sized join passes this way)."""
    if not 0.0 <= test_rate <= 1.0:
        raise ValueError(f"test_rate must be in [0, 1], got {test_rate}")
    bucket = _key_bucket(key, salt)
    return F.when(
        bucket < int(test_rate * _HASH_SPACE), "test"
    ).otherwise("train")


def train_test_split(
    df: DataFrame, key: str, test_rate: float = 0.2, salt: str = "split"
) -> DataFrame:
    """Adds a ``split`` column ('train' | 'test') keyed by content hash.

    Same key → same split forever: new data appends without reshuffling
    membership, and dedup-then-split pipelines can't leak a near-dup
    pair across the boundary if they split on the canonical doc key.
    """
    return df.withColumn("split", split_expr(F.col(key), test_rate, salt))


def domain_mixture_sample(
    df: DataFrame,
    key: str,
    domain_col: str,
    alpha: float = 0.5,
    target_frac: float = 0.5,
    salt: str = "mix",
) -> DataFrame:
    """Temperature-weighted domain rebalancing (the multilingual /
    multi-source mixing rule: sample domain d with probability
    ∝ n_d^alpha, alpha<1 upweights the tail).

    Per-domain keep rate = min(1, target_total · w_d / n_d) where
    w_d = n_d^alpha / Σ n_d^alpha; membership is content-hash based
    (see module docstring) so the mixture is rerun- and
    partition-stable.

    Shape: one partial-agg shuffle for domain counts (result: #domains
    rows), a broadcast of the rates back onto the fact table, and a
    hash filter — no RNG, no global sort, no second scan. alpha=0.5
    uses sqrt (IEEE correctly-rounded, so the oracle reproduces the
    rates bit-for-bit; libm pow is not so guaranteed).
    """
    from taxi_trips_etl_spark.dataprep.materialize import materialize

    n = F.col("n_domain")
    weight = F.sqrt(n) if alpha == 0.5 else F.pow(n, F.lit(alpha))
    # counts (#domains rows) feeds the totals aggregate AND the rates
    # projection — without a checkpoint the corpus scan + groupBy
    # re-ran per consumer (r13: docs scans 3 → 2, the count-then-filter
    # two-pass floor).
    counts = materialize(
        df.groupBy(domain_col).agg(
            F.count(F.lit(1)).cast("double").alias("n_domain")
        ),
        eager=False,
    )
    totals = counts.agg(
        F.sum("n_domain").alias("n_total"), F.sum(weight).alias("w_total")
    )
    rate = F.least(
        F.lit(1.0),
        F.lit(target_frac) * F.col("n_total") * weight / F.col("w_total") / n,
    )
    rates = counts.crossJoin(F.broadcast(totals)).select(
        domain_col,
        F.floor(rate * _HASH_SPACE).cast("long").alias("_threshold"),
    )
    return (
        df.join(F.broadcast(rates), domain_col)
        .filter(_key_bucket(F.col(key), salt) < F.col("_threshold"))
        .drop("_threshold")
    )


def kfold_assign(
    df: DataFrame, key: str, k: int = 5, salt: str = "fold"
) -> DataFrame:
    """Adds a ``fold`` column in [0, k): hash-keyed cross-validation
    folds. Same key → same fold forever (append-stable, like
    :func:`train_test_split`); fold i's holdout is ``fold == i`` and
    training is everything else — no RNG, no state to persist."""
    if k < 1:
        # Spark pmod(x, 0) is NULL: k = 0 silently nulls every fold.
        raise ValueError(f"kfold_assign needs k >= 1, got {k}")
    return df.withColumn(
        "fold", (_key_bucket(F.col(key), salt) % k).cast("long")
    )


def weighted_priority_sample(
    df: DataFrame,
    key: str,
    weight_cents: Column,
    k: int,
    salt: str = "wps",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (priority
    sampling, Duffield-Lund-Thorup): each row draws a content-hash
    uniform u ∈ [0, 2^32) and gets priority key ``u / w``; the k rows
    with the SMALLEST keys form the sample, so inclusion odds scale
    with weight while membership stays engine- and rerun-stable.

    → (key, weight_cents, priority_key) — up to ``k`` rows (fewer when
    fewer than k rows carry positive weight; zero-weight rows are
    excluded before any arithmetic touches their weight).

    Portability: the key is ONE IEEE double division of two exact
    integers (hash bucket / integer-cent weight), bit-identical on any
    engine — no transcendental (-ln u / w) whose libm could differ in
    the last ulp and flip the order near the k-th boundary. Ties are
    impossible short of md5 collisions but the sort breaks them by key
    anyway. Scale shape: a global top-k is TakeOrderedAndProject —
    per-partition heaps of k rows, no full sort, no shuffle of the
    input."""
    w = weight_cents.cast("long")
    u = _key_bucket(F.col(key), salt)
    return (
        df.select(F.col(key), w.alias("weight_cents"))
        .filter(F.col("weight_cents") > 0)
        .withColumn(
            "priority_key",
            u.cast("double") / F.col("weight_cents").cast("double"),
        )
        .orderBy("priority_key", key)
        .limit(k)
    )


def temperature_mixture_weights(
    docs, source_col: str = "source", text_col: str = "text",
    alpha: float = 0.7, budget_docs: int = 10000,
):
    """Temperature-based source mixing (the multilingual-LM standard,
    e.g. mBERT/XLM-R exponentiated sampling): sampling weight per
    source ∝ (token share)^alpha, alpha<1 flattening the head so
    low-resource sources are up-sampled relative to their raw share.

    → (source, n_docs, n_tokens, raw_share, weight, expected_docs):
    ``weight`` sums to 1, ``expected_docs`` = weight × budget_docs.

    One token-count aggregate (map-side combinable) + a broadcast
    1-row total — the n_sources-row result is driver-sized at any
    corpus scale. pow/ln run on identical operands in the DuckDB
    replay; outputs round to 4/6 per the registry portability rules.
    """
    from pyspark.sql import functions as F

    per = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(
            F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
        ).cast("long").alias("n_tokens"),
    )
    # pow() results are quantized to integer micro-units BEFORE the
    # cross-source sum: a float sum's value depends on addition order
    # (partition race), while integer sums are exact and
    # order-independent — the same reason the registry sums money as
    # cents. The 1e-6 quantization is part of the operator's spec.
    pw = F.round(
        F.pow(F.col("n_tokens").cast("double"), F.lit(alpha)) * 1e6
    ).cast("long")
    per = per.withColumn("pw", pw)
    tot = per.agg(
        F.sum("n_tokens").cast("double").alias("tot_tokens"),
        F.sum("pw").cast("double").alias("tot_pw"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(
                F.col("n_tokens").cast("double") / F.col("tot_tokens"), 6
            ).alias("raw_share"),
            F.round(
                F.col("pw").cast("double") / F.col("tot_pw"), 6
            ).alias("weight"),
            F.round(
                F.col("pw").cast("double") / F.col("tot_pw") * budget_docs,
                4,
            ).alias("expected_docs"),
        )
    )
