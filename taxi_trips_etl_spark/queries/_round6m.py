# Round-6 batch 16: grouped Pearson correlation from exact integer
# sums (the corr() builtin's float partials are merge-order-dependent;
# this is not), cohort LTV curves (cumulative revenue by cohort age),
# and inter-arrival burstiness (Fano factor as ONE integer-ratio
# division). Shared-text epilogues; sqrt only.
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from taxi_trips_etl_spark.queries._registry import _events, _t, register

__all__ = [
    "q_discount_quantity_corr_by_brand",
    "q_cohort_ltv_curve",
    "q_interarrival_burstiness",
]

# ---------------------------------------------------------------- #
# discount_quantity_corr_by_brand                                   #
# ---------------------------------------------------------------- #
_CORR = (
    "(CASE WHEN (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) = 0.0"
    " OR (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) = 0.0"
    " THEN 0.0 ELSE"
    " (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
    " / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
    "    * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))"
    " END)"
)

CORR_BRAND_ORACLE = f"""
WITH obs AS (
    SELECT p.p_brand,
           CAST(round(l.l_discount * 100) AS BIGINT) AS x,
           CAST(l.l_quantity AS BIGINT) AS y
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
sums AS (
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x*x) AS BIGINT) AS sxx,
           CAST(sum(y*y) AS BIGINT) AS syy,
           CAST(sum(x*y) AS BIGINT) AS sxy
    FROM obs GROUP BY 1
)
SELECT p_brand, n,
       CAST(floor(1000000.0 * {_CORR} + 0.5) AS BIGINT) AS corr_micro
FROM sums
"""


@register("discount_quantity_corr_by_brand", CORR_BRAND_ORACLE)
def q_discount_quantity_corr_by_brand(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-brand Pearson correlation between discount and quantity —
    the grouped-correlation screen behind pricing analytics — from
    EXACT integer sufficient statistics (n, Σx, Σy, Σx², Σy², Σxy),
    unlike corr(), whose float partials depend on partition merge
    order. One map-side-combinable aggregate per brand + a 25-row
    double epilogue (shared text; sqrt only; zero-variance guard).

    Scale shape: broadcast dim join + one partial+final hash agg;
    int64 sums stay exact past 10^12 rows/brand (x ≤ 10, y ≤ 50)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    obs = li.join(
        F.broadcast(part), li["l_partkey"] == part["p_partkey"]
    ).select(
        "p_brand",
        F.round(F.col("l_discount") * 100).cast("long").alias("x"),
        F.col("l_quantity").cast("long").alias("y"),
    )
    sums = obs.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.expr("x*x")).cast("long").alias("sxx"),
        F.sum(F.expr("y*y")).cast("long").alias("syy"),
        F.sum(F.expr("x*y")).cast("long").alias("sxy"),
    )
    return sums.selectExpr(
        "p_brand",
        "n",
        f"CAST(floor(1000000.0 * {_CORR} + 0.5) AS BIGINT) AS corr_micro",
    )


# ---------------------------------------------------------------- #
# cohort_ltv_curve                                                  #
# ---------------------------------------------------------------- #
COHORT_LTV_ORACLE = """
WITH orders_m AS (
    SELECT o_custkey,
           (CAST(strftime(o_orderdate, '%Y') AS BIGINT) - 1970) * 12
               + CAST(strftime(o_orderdate, '%m') AS BIGINT) - 1 AS m,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
),
cohorts AS (
    SELECT o_custkey, min(m) AS cohort_m FROM orders_m GROUP BY 1
),
aged AS (
    SELECT c.cohort_m, o.m - c.cohort_m AS age_months,
           CAST(sum(o.cents) AS BIGINT) AS rev_cents
    FROM orders_m o JOIN cohorts c ON o.o_custkey = c.o_custkey
    GROUP BY 1, 2
)
SELECT CAST(cohort_m AS BIGINT) AS cohort_m,
       CAST(age_months AS BIGINT) AS age_months, rev_cents,
       CAST(sum(rev_cents) OVER (PARTITION BY cohort_m ORDER BY age_months
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_rev_cents
FROM aged
"""


@register("cohort_ltv_curve", COHORT_LTV_ORACLE)
def q_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers grouped by first-order
    month, revenue accumulated by cohort age — the growth-analytics
    rollup under every LTV/payback model (the revenue sibling of the
    retention_cohorts counts entry). Month index is pure integer
    arithmetic ((year−1970)·12 + month−1), no locale or epoch-unit
    ambiguity.

    Scale shape: the cohort map is one min-aggregate keyed on
    customer, joined back on the same key (one shuffle reused); the
    running sum windows over (cohort × age) aggregate rows only."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        (
            (F.year("o_orderdate") - 1970) * 12 + F.month("o_orderdate") - 1
        )
        .cast("long")
        .alias("m"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    cohorts = o.groupBy("o_custkey").agg(F.min("m").alias("cohort_m"))
    aged = (
        o.join(cohorts, "o_custkey")
        .groupBy(
            "cohort_m", (F.col("m") - F.col("cohort_m")).alias("age_months")
        )
        .agg(F.sum("cents").cast("long").alias("rev_cents"))
    )
    w = (
        Window.partitionBy("cohort_m")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return aged.select(
        F.col("cohort_m").cast("long"),
        F.col("age_months").cast("long"),
        "rev_cents",
        F.sum("rev_cents").over(w).cast("long").alias("cum_rev_cents"),
    )


# ---------------------------------------------------------------- #
# interarrival_burstiness                                           #
# ---------------------------------------------------------------- #
# Fano factor var/mean collapses to ONE ratio of integer-derived
# doubles: (n·Σg² − (Σg)²) / (n·Σg).
_FANO = (
    "((CAST(n AS DOUBLE) * sgg - CAST(sg AS DOUBLE) * sg)"
    " / (CAST(n AS DOUBLE) * sg))"
)

BURSTINESS_ORACLE = f"""
WITH seq AS (
    SELECT event_type,
           epoch_us(ts) // 1000000
               - lag(epoch_us(ts) // 1000000) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id) AS gap_s
    FROM events
),
sums AS (
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(gap_s) AS BIGINT) AS sg,
           CAST(sum(gap_s * gap_s) AS BIGINT) AS sgg
    FROM seq WHERE gap_s IS NOT NULL GROUP BY 1
)
SELECT event_type, n,
       CAST(sg // n AS BIGINT) AS mean_gap_s,
       CAST(floor(1000.0 * {_FANO} + 0.5) AS BIGINT) AS fano_milli
FROM sums
"""


@register("interarrival_burstiness", BURSTINESS_ORACLE)
def q_interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival burstiness per event type: the Fano factor
    (variance/mean) of the gaps between a user's consecutive
    same-type events — ≈mean ⇒ Poisson-like arrivals, ≫mean ⇒
    bursty sessions, the standard traffic-shape diagnostic. The
    whole statistic reduces to ONE division of integer-derived
    doubles, (n·Σg² − (Σg)²)/(n·Σg), after exact int64 sums over
    second-granularity gaps.

    Scale shape: the lag window partitions by (user, type) — bounded
    per-user state, no global sort — and the sums are one
    partial+final aggregate. Seconds (not µs) keep Σg² inside int64
    far past 10^9 gaps."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    sec = F.expr("unix_micros(ts) DIV 1000000")
    seq = ev.select(
        "event_type", (sec - F.lag(sec).over(w)).alias("gap_s")
    ).where(F.col("gap_s").isNotNull())
    sums = seq.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("gap_s").cast("long").alias("sg"),
        F.sum(F.expr("gap_s * gap_s")).cast("long").alias("sgg"),
    )
    return sums.selectExpr(
        "event_type",
        "n",
        "CAST(sg DIV n AS BIGINT) AS mean_gap_s",
        f"CAST(floor(1000.0 * {_FANO} + 0.5) AS BIGINT) AS fano_milli",
    )
