# Round-6 batch 13: time-series robustness — Holt double-exponential
# smoothing (the inherently-sequential recursion, run post-aggregation
# in one Arrow group and replayed by a recursive CTE), the Theil-Sen
# robust slope (median of pairwise slopes with a deterministic median
# rule), and longest-increase streaks (gaps-and-islands on monotone
# runs). All recursions/medians operate on the POST-AGGREGATION daily
# series, never the fact table.
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from taxi_trips_etl_spark.queries._registry import _events, register

__all__ = [
    "q_holt_linear_smoothing",
    "q_theil_sen_slope",
    "q_longest_increase_streaks",
]

_DAILY_SQL = """
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS daily_cents
    FROM events GROUP BY 1
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("daily_cents")
    )


# ---------------------------------------------------------------- #
# holt_linear_smoothing                                             #
# ---------------------------------------------------------------- #
# α = 0.5, β = 0.25: dyadic constants, so the per-step multiplications
# are exact halvings/quarterings — the doubles stay bit-identical
# between the Python recursion and the SQL recursion as long as the
# expression order matches (it is written identically in both).
HOLT_ORACLE = f"""
WITH RECURSIVE daily AS ({_DAILY_SQL}),
idx AS (
    SELECT day, CAST(daily_cents AS DOUBLE) AS x,
           row_number() OVER (ORDER BY day) AS i,
           count(*) OVER () AS n
    FROM daily
),
holt AS (
    SELECT i, day, x,
           x AS l,
           (SELECT x FROM idx WHERE i = 2) - x AS b
    FROM idx WHERE i = 1
    UNION ALL
    SELECT idx.i, idx.day, idx.x,
           0.5 * idx.x + 0.5 * (holt.l + holt.b) AS l,
           0.25 * (0.5 * idx.x + 0.5 * (holt.l + holt.b) - holt.l)
               + 0.75 * holt.b AS b
    FROM holt JOIN idx ON idx.i = holt.i + 1
)
SELECT day,
       CAST(floor(1000000.0 * l + 0.5) AS BIGINT) AS level_micro,
       CAST(floor(1000000.0 * b + 0.5) AS BIGINT) AS trend_micro,
       CAST(floor(1000000.0 * (l + 7.0 * b) + 0.5) AS BIGINT)
           AS forecast7_micro
FROM holt
"""


@register("holt_linear_smoothing", HOLT_ORACLE)
def q_holt_linear_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing of daily revenue (level +
    trend, α=0.5, β=0.25, 7-step-ahead forecast per day) — the
    classic short-horizon forecaster. The recursion is inherently
    sequential, so it runs where sequential work belongs: over the
    POST-AGGREGATION daily series (365 rows/year at any data volume)
    inside one Arrow-batched applyInPandas group, while the oracle
    replays the identical recursion as a recursive CTE. Dyadic
    smoothing constants keep the per-step arithmetic bit-identical
    across engines.

    Scale shape: the only data-sized stage is the day groupBy; at
    multi-entity grain the same kernel runs per key (one group per
    entity, bounded series each)."""
    import math

    import pandas as pd

    daily = _daily(spark, sf_dir)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        xs = [float(v) for v in pdf["daily_cents"]]
        if len(xs) < 2:
            return pd.DataFrame(
                columns=["day", "level_micro", "trend_micro",
                         "forecast7_micro"]
            )
        l, b = xs[0], xs[1] - xs[0]
        out = []
        for i, x in enumerate(xs):
            if i > 0:
                l_new = 0.5 * x + 0.5 * (l + b)
                b = 0.25 * (0.5 * x + 0.5 * (l + b) - l) + 0.75 * b
                l = l_new
            out.append(
                (
                    pdf["day"][i],
                    int(math.floor(1e6 * l + 0.5)),
                    int(math.floor(1e6 * b + 0.5)),
                    int(math.floor(1e6 * (l + 7.0 * b) + 0.5)),
                )
            )
        return pd.DataFrame(
            out,
            columns=["day", "level_micro", "trend_micro",
                     "forecast7_micro"],
        )

    return (
        daily.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(
            kernel,
            "day string, level_micro long, trend_micro long,"
            " forecast7_micro long",
        )
    )


# ---------------------------------------------------------------- #
# theil_sen_slope                                                   #
# ---------------------------------------------------------------- #
# Median rule: element at row ceil(k/2) under (slope, i, j) ordering —
# the lower median, no averaging, so no new float op enters.
THEIL_SEN_ORACLE = f"""
WITH daily AS ({_DAILY_SQL}),
idx AS (
    SELECT CAST(daily_cents AS DOUBLE) AS x,
           row_number() OVER (ORDER BY day) AS i
    FROM daily
),
slopes AS (
    SELECT a.i AS ia, b.i AS ib,
           (b.x - a.x) / (b.i - a.i) AS slope
    FROM idx a JOIN idx b ON b.i > a.i
),
ranked AS (
    SELECT slope, row_number() OVER (ORDER BY slope, ia, ib) AS r,
           count(*) OVER () AS k
    FROM slopes
)
SELECT CAST(k AS BIGINT) AS n_pairs,
       CAST(floor(1000000.0 * slope + 0.5) AS BIGINT)
           AS slope_micro_per_day
FROM ranked WHERE r = CAST(ceil(k / 2.0) AS BIGINT)
"""


@register("theil_sen_slope", THEIL_SEN_ORACLE)
def q_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily revenue: the median of all
    pairwise slopes — breakdown point 29%, immune to the outlier days
    that wreck least-squares trend. Median = the lower-median element
    under a fully-tied-down ordering (slope, i, j), so no averaging
    float op and no rank ambiguity.

    Scale shape: the pair join runs on the post-aggregation daily
    series — days²/2 pairs (66k/year), constant in data volume; the
    fact table only feeds the one day groupBy. For multi-year spans,
    sample pairs or use the per-group OLS slope entry instead."""
    daily = _daily(spark, sf_dir)
    idx = daily.select(
        F.col("daily_cents").cast("double").alias("x"),
        F.row_number().over(Window.orderBy("day")).alias("i"),
    )
    a = idx.selectExpr("x AS xa", "i AS ia")
    b = idx.selectExpr("x AS xb", "i AS ib")
    slopes = a.join(b, F.col("ib") > F.col("ia")).selectExpr(
        "ia", "ib", "(xb - xa) / (ib - ia) AS slope"
    )
    ranked = slopes.select(
        "slope",
        F.row_number()
        .over(Window.orderBy("slope", "ia", "ib"))
        .alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("k"),
    )
    return ranked.filter(
        F.col("r") == F.expr("CAST(ceil(k / 2.0) AS BIGINT)")
    ).selectExpr(
        "CAST(k AS BIGINT) AS n_pairs",
        "CAST(floor(1000000.0 * slope + 0.5) AS BIGINT)"
        " AS slope_micro_per_day",
    )


# ---------------------------------------------------------------- #
# longest_increase_streaks                                          #
# ---------------------------------------------------------------- #
STREAKS_ORACLE = f"""
WITH daily AS ({_DAILY_SQL}),
flagged AS (
    SELECT day, daily_cents,
           row_number() OVER (ORDER BY day) AS rn,
           CASE WHEN daily_cents > lag(daily_cents) OVER (ORDER BY day)
                THEN 1 ELSE 0 END AS up
    FROM daily
),
grouped AS (
    SELECT day, rn, up,
           rn - CAST(sum(up) OVER (ORDER BY rn
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS grp
    FROM flagged
),
streaks AS (
    SELECT grp, CAST(count(*) AS BIGINT) AS len_days,
           min(day) AS start_day, max(day) AS end_day
    FROM grouped WHERE up = 1 GROUP BY 1
)
SELECT start_day, end_day, len_days
FROM streaks ORDER BY len_days DESC, start_day LIMIT 3
"""


@register("longest_increase_streaks", STREAKS_ORACLE)
def q_longest_increase_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 longest runs of strictly-increasing daily revenue — the
    gaps-and-islands idiom on monotone runs (rn − running-count-of-up
    is constant exactly within a streak). Streak *length* counts the
    up-days (a 3-day rise has length 2).

    Scale shape: every window runs on the post-aggregation daily
    frame; integers only."""
    daily = _daily(spark, sf_dir)
    w = Window.orderBy("day")
    flagged = daily.select(
        "day",
        "daily_cents",
        F.row_number().over(w).alias("rn"),
        F.when(
            F.col("daily_cents") > F.lag("daily_cents").over(w), 1
        )
        .otherwise(0)
        .alias("up"),
    )
    wcum = Window.orderBy("rn").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    grouped = flagged.withColumn(
        "grp", F.col("rn") - F.sum("up").over(wcum).cast("long")
    )
    streaks = (
        grouped.filter(F.col("up") == 1)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("len_days"),
            F.min("day").alias("start_day"),
            F.max("day").alias("end_day"),
        )
    )
    return (
        streaks.orderBy(F.col("len_days").desc(), "start_day")
        .limit(3)
        .select("start_day", "end_day", "len_days")
    )
