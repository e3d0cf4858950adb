"""Privacy auditing primitives: k-anonymity and noisy-count release.

Training corpora assembled from user data carry re-identification risk
before any text ever reaches a model; these are the two table-level
checks a pipeline runs alongside the row-level PII scrub
(text.py:pii_scrub) and key erasure (sources/writers.py).

Both are single hash-aggregate jobs — the 100 TB cost is one shuffle on
the quasi-identifier/group key, map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from taxi_trips_etl_spark.dataprep.kmv import _hash60


def k_anonymity_audit(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Equivalence classes of the quasi-identifier tuple smaller than k.

    → one row per violating class: the quasi values, ``class_size``,
    and ``deficit`` (= k − size, how many indistinguishable rows are
    missing). Empty result ⇔ the projection is k-anonymous. NULL quasi
    values form their own class (groupBy semantics), which is the
    conservative reading — an attacker can select on NULL too.
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).cast("long").alias("class_size"))
        .filter(F.col("class_size") < k)
        .withColumn(
            "deficit", (F.lit(k) - F.col("class_size")).cast("long")
        )
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float = 1.0,
    salt: str = "dp",
) -> DataFrame:
    """Per-group counts + Laplace(1/epsilon) noise, derived
    DETERMINISTICALLY from a salted hash of the group key.

    Noise via inverse-CDF on a hash-uniform u ∈ (0,1):
    ``noise = -(1/ε)·sign(u−½)·ln(1−2|u−½|)`` — the exact Laplace
    mechanism shape for count queries (sensitivity 1).

    Honest caveat, stated once and loudly: REAL differential privacy
    requires fresh, secret randomness per release; a hash-seeded draw is
    pseudo-random in the salt, so this variant's guarantee is only as
    strong as the salt's secrecy. The seeded form exists because it
    makes the mechanism TESTABLE — the noise distribution, scale, and
    pipeline plumbing are pinned bit-exactly by the DuckDB oracle and
    pytest, and a deployment swaps ``salt`` for a per-release secret
    (or the expression for ``rand()``) without touching the plan.

    → (group_cols…, true-count-free output): ``noisy_count`` rounded to
    4 decimals. The true count is intentionally NOT returned.
    """
    key = F.concat_ws(
        "", F.lit(salt), *[F.col(c).cast("string") for c in group_cols]
    )
    u = (_hash60(key).cast("double") + F.lit(0.5)) / F.lit(float(2**60))
    centered = u - F.lit(0.5)
    noise = (
        F.lit(-1.0 / epsilon)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )
    return (
        df.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).cast("double").alias("__c"))
        .select(
            *group_cols,
            F.round(F.col("__c") + noise, 4).alias("noisy_count"),
        )
    )
