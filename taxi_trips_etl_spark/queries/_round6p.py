# Round-6 batch 19: nonparametric two-sample tests with EXACT integer
# statistics — Kolmogorov-Smirnov via the cross-multiplied CDF gap
# (max |cum1·n2 − cum2·n1|, never a float CDF) and Mann-Whitney U via
# doubled tie-averaged ranks (a tie group spanning ranks [a..b] has
# doubled average rank a+b — an integer). The drift-detection pair
# every data-quality suite wants between two cohorts or time periods.
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from taxi_trips_etl_spark.queries._registry import _events, register

__all__ = [
    "q_ks_drift_test",
    "q_mannwhitney_u_test",
]

# Per distinct value: counts per arm (user parity), then cumulative
# counts up the value axis. Both tests share this spine.
_ARM_COUNTS_SQL = """
    SELECT CAST(round(value * 100) AS BIGINT) AS v,
           CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS c1,
           CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS c2
    FROM events GROUP BY 1
"""

KS_ORACLE = f"""
WITH counts AS ({_ARM_COUNTS_SQL}),
cum AS (
    SELECT v,
           CAST(sum(c1) OVER w AS BIGINT) AS cum1,
           CAST(sum(c2) OVER w AS BIGINT) AS cum2,
           CAST(sum(c1) OVER () AS BIGINT) AS n1,
           CAST(sum(c2) OVER () AS BIGINT) AS n2
    FROM counts
    WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)
),
gaps AS (
    SELECT v, n1, n2, abs(cum1 * n2 - cum2 * n1) AS gap
    FROM cum
),
best AS (
    SELECT v, n1, n2, gap,
           row_number() OVER (ORDER BY gap DESC, v) AS r
    FROM gaps
)
SELECT n1, n2, CAST(gap AS BIGINT) AS d_num, v AS at_cents,
       CAST(floor(1000.0 * CAST(gap AS DOUBLE)
                  / (CAST(n1 AS DOUBLE) * n2) + 0.5) AS BIGINT)
           AS ks_milli
FROM best WHERE r = 1
"""


@register("ks_drift_test", KS_ORACLE)
def q_ks_drift_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test between the parity
    cohorts' value distributions. The statistic is located in PURE
    INTEGERS: D's numerator is max |cum1·n2 − cum2·n1| over the value
    axis (cross-multiplication instead of float CDFs), with the
    tie-broken argmax value reported; only the final normalization
    divides. The standard two-sample distribution-drift screen next
    to chi-square (categoricals) and the z-test (proportions).

    Scale shape: one partial+final count per distinct value; the
    cumulative windows run over the value DOMAIN (≤ distinct cents),
    not the event count — swap in assign_prefix_sums if the domain
    itself is huge."""
    ev = _events(spark, sf_dir)
    counts = ev.groupBy(
        F.round(F.col("value") * 100).cast("long").alias("v")
    ).agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    cum = counts.select(
        "v",
        F.sum("c1").over(w).cast("long").alias("cum1"),
        F.sum("c2").over(w).cast("long").alias("cum2"),
        F.sum("c1").over(wall).cast("long").alias("n1"),
        F.sum("c2").over(wall).cast("long").alias("n2"),
    )
    gaps = cum.selectExpr(
        "v", "n1", "n2", "abs(cum1 * n2 - cum2 * n1) AS gap"
    )
    best = gaps.withColumn(
        "r",
        F.row_number().over(Window.orderBy(F.col("gap").desc(), "v")),
    ).where(F.col("r") == 1)
    return best.selectExpr(
        "n1",
        "n2",
        "CAST(gap AS BIGINT) AS d_num",
        "v AS at_cents",
        "CAST(floor(1000.0 * CAST(gap AS DOUBLE)"
        " / (CAST(n1 AS DOUBLE) * n2) + 0.5) AS BIGINT) AS ks_milli",
    )


# Mann-Whitney via doubled ranks: a tie group occupying merged ranks
# [start..end] contributes doubled average rank (start + end) to each
# member — integer, so R1 (doubled) is exact. 2·U1 = 2·n1·n2 +
# n1·(n1+1) − R1_doubled. The z uses the tie-corrected variance:
# var = n1·n2/12 · ((n+1) − Σ(t³−t)/(n·(n−1))).
_MW_Z = (
    "((CAST(u1_doubled AS DOUBLE) / 2.0"
    " - CAST(n1 AS DOUBLE) * n2 / 2.0)"
    " / sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0"
    "   * ((CAST(n1 AS DOUBLE) + n2 + 1.0)"
    "      - CAST(tie3 AS DOUBLE)"
    "        / ((CAST(n1 AS DOUBLE) + n2)"
    "           * (CAST(n1 AS DOUBLE) + n2 - 1.0)))))"
)

MW_ORACLE = f"""
WITH counts AS ({_ARM_COUNTS_SQL}),
spine AS (
    SELECT v, c1, c2, c1 + c2 AS t,
           CAST(coalesce(sum(c1 + c2) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS before
    FROM counts
),
agg AS (
    SELECT CAST(sum(c1) AS BIGINT) AS n1,
           CAST(sum(c2) AS BIGINT) AS n2,
           CAST(sum(c1 * (2 * before + t + 1)) AS BIGINT) AS r1_doubled,
           CAST(sum(t * t * t - t) AS BIGINT) AS tie3
    FROM spine
),
u AS (
    SELECT n1, n2, tie3,
           2 * n1 * n2 + n1 * (n1 + 1) - r1_doubled AS u1_doubled
    FROM agg
)
SELECT n1, n2, CAST(u1_doubled AS BIGINT) AS u1_doubled,
       CAST(2 * n1 * n2 - u1_doubled AS BIGINT) AS u2_doubled,
       CAST(floor(1000.0 * {_MW_Z} + 0.5) AS BIGINT) AS z_milli
FROM u
"""


@register("mannwhitney_u_test", MW_ORACLE)
def q_mannwhitney_u_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) between the parity cohorts'
    value distributions — the rank-based location test that, unlike
    the t-test, needs no normality. The rank sum is EXACT: a tie
    group spanning merged ranks [start..end] carries integer DOUBLED
    average rank start+end, so U1 (doubled) is an integer identity;
    the tie-corrected normal z is the only float, shared-text with
    sqrt only.

    Scale shape: the rank spine is the distinct-value domain with one
    running count (before), never per-row ranks over the raw events;
    everything else is one aggregate."""
    ev = _events(spark, sf_dir)
    counts = ev.groupBy(
        F.round(F.col("value") * 100).cast("long").alias("v")
    ).agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    w_before = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    spine = counts.select(
        "c1",
        "c2",
        (F.col("c1") + F.col("c2")).alias("t"),
        F.coalesce(
            F.sum(F.col("c1") + F.col("c2")).over(w_before), F.lit(0)
        )
        .cast("long")
        .alias("before"),
    )
    agg = spine.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
        F.sum(F.expr("c1 * (2 * before + t + 1)"))
        .cast("long")
        .alias("r1_doubled"),
        F.sum(F.expr("t * t * t - t")).cast("long").alias("tie3"),
    )
    u = agg.selectExpr(
        "n1",
        "n2",
        "tie3",
        "2 * n1 * n2 + n1 * (n1 + 1) - r1_doubled AS u1_doubled",
    )
    return u.selectExpr(
        "n1",
        "n2",
        "CAST(u1_doubled AS BIGINT) AS u1_doubled",
        "CAST(2 * n1 * n2 - u1_doubled AS BIGINT) AS u2_doubled",
        f"CAST(floor(1000.0 * {_MW_Z} + 0.5) AS BIGINT) AS z_milli",
    )
