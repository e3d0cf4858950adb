# Round-6 batch 15: model-selection change-point detection (two-
# segment OLS, best split by residual sum of squares), Lorenz-curve
# points (the distributional view behind the Gini entry), and a
# Simpson's-paradox audit (per-group trend sign vs pooled). All built
# on exact integer sums with shared-text double epilogues.
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from taxi_trips_etl_spark.queries._registry import _events, _t, register

__all__ = [
    "q_changepoint_segmented_ols",
    "q_lorenz_curve_points",
    "q_simpson_paradox_audit",
]

_DAILY_SQL = """
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS y
    FROM events GROUP BY 1
"""

# RSS of a simple OLS fit y = a + b·x from the segment's exact sums,
# guarding the degenerate 1-point segment (RSS 0). Shared text.
_RSS = """(CASE WHEN {n} <= 1 THEN 0.0 ELSE
    CAST({syy} AS DOUBLE)
    - ((CAST({sy} AS DOUBLE)
        - (({n} * CAST({sxy} AS DOUBLE) - CAST({sx} AS DOUBLE) * {sy})
           / ({n} * CAST({sxx} AS DOUBLE) - CAST({sx} AS DOUBLE) * {sx}))
          * {sx}) / {n}) * {sy}
    - (({n} * CAST({sxy} AS DOUBLE) - CAST({sx} AS DOUBLE) * {sy})
       / ({n} * CAST({sxx} AS DOUBLE) - CAST({sx} AS DOUBLE) * {sx}))
      * CAST({sxy} AS DOUBLE)
END)"""


def _seg_rss(prefix: str) -> str:
    return _RSS.format(
        n=f"{prefix}n", sx=f"{prefix}sx", sxx=f"{prefix}sxx",
        sy=f"{prefix}sy", sxy=f"{prefix}sxy", syy=f"{prefix}syy",
    )


_CHANGEPOINT_CORE = f"""
idx AS (
    SELECT y, row_number() OVER (ORDER BY day) AS i,
           day
    FROM daily
),
pref AS (
    SELECT day, i, y,
           CAST(sum(i) OVER w AS BIGINT) AS l_sx,
           CAST(sum(i*i) OVER w AS BIGINT) AS l_sxx,
           CAST(sum(y) OVER w AS BIGINT) AS l_sy,
           CAST(sum(i*y) OVER w AS BIGINT) AS l_sxy,
           CAST(sum(y*y) OVER w AS BIGINT) AS l_syy,
           CAST(i AS BIGINT) AS l_n,
           CAST(count(*) OVER () AS BIGINT) AS t_n,
           CAST(sum(i) OVER () AS BIGINT) AS t_sx,
           CAST(sum(i*i) OVER () AS BIGINT) AS t_sxx,
           CAST(sum(y) OVER () AS BIGINT) AS t_sy,
           CAST(sum(i*y) OVER () AS BIGINT) AS t_sxy,
           CAST(sum(y*y) OVER () AS BIGINT) AS t_syy
    FROM idx
    WINDOW w AS (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)
),
splits AS (
    SELECT day, i,
           l_n, l_sx, l_sxx, l_sy, l_sxy, l_syy,
           t_n - l_n AS r_n,
           t_sx - l_sx AS r_sx,
           t_sxx - l_sxx AS r_sxx,
           t_sy - l_sy AS r_sy,
           t_sxy - l_sxy AS r_sxy,
           t_syy - l_syy AS r_syy
    FROM pref
    WHERE i >= 2 AND t_n - i >= 2
),
scored AS (
    SELECT day AS split_day, i AS split_i,
           CAST(floor(({_seg_rss('l_')} + {_seg_rss('r_')}) / 1000000.0
                      + 0.5) AS BIGINT) AS rss_total_kcents2
    FROM splits
)
"""

CHANGEPOINT_ORACLE = f"""
WITH daily AS ({_DAILY_SQL}),
{_CHANGEPOINT_CORE}
SELECT split_day, CAST(split_i AS BIGINT) AS split_i, rss_total_kcents2
FROM scored
ORDER BY rss_total_kcents2, split_day LIMIT 3
"""


@register("changepoint_segmented_ols", CHANGEPOINT_ORACLE)
def q_changepoint_segmented_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-point detection by model selection: fit TWO independent
    OLS trend segments around every candidate split day and rank
    splits by total residual sum of squares — the structural-break
    complement to the CUSUM entry (which detects mean shifts; this
    detects slope changes too). Every candidate's segment statistics
    come from ONE pass of running prefix sums (right segment = total
    − prefix), so scoring all n−3 splits costs the same one window
    as scoring one.

    All sums exact int64 (Σy² ≈ 2×10¹⁵ for a year of cents-scale
    days — inside both int64 and double-exact range; beyond that,
    rescale y to decicents); the RSS algebra is shared text; output
    rounds to kilo-cents² so last-ulp noise in the division chain
    cannot flip the hash."""
    daily = _events(spark, sf_dir).groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("y")
    )
    idx = daily.select(
        "day", "y", F.row_number().over(Window.orderBy("day")).alias("i")
    )
    w = Window.orderBy("i").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    pref = idx.select(
        "day",
        "i",
        F.sum("i").over(w).cast("long").alias("l_sx"),
        F.sum(F.expr("i*i")).over(w).cast("long").alias("l_sxx"),
        F.sum("y").over(w).cast("long").alias("l_sy"),
        F.sum(F.expr("i*y")).over(w).cast("long").alias("l_sxy"),
        F.sum(F.expr("y*y")).over(w).cast("long").alias("l_syy"),
        F.col("i").cast("long").alias("l_n"),
        F.count(F.lit(1)).over(wall).cast("long").alias("t_n"),
        F.sum("i").over(wall).cast("long").alias("t_sx"),
        F.sum(F.expr("i*i")).over(wall).cast("long").alias("t_sxx"),
        F.sum("y").over(wall).cast("long").alias("t_sy"),
        F.sum(F.expr("i*y")).over(wall).cast("long").alias("t_sxy"),
        F.sum(F.expr("y*y")).over(wall).cast("long").alias("t_syy"),
    )
    splits = pref.where(
        (F.col("i") >= 2) & (F.col("t_n") - F.col("i") >= 2)
    ).selectExpr(
        "day",
        "i",
        "l_n", "l_sx", "l_sxx", "l_sy", "l_sxy", "l_syy",
        "t_n - l_n AS r_n",
        "t_sx - l_sx AS r_sx",
        "t_sxx - l_sxx AS r_sxx",
        "t_sy - l_sy AS r_sy",
        "t_sxy - l_sxy AS r_sxy",
        "t_syy - l_syy AS r_syy",
    )
    scored = splits.selectExpr(
        "day AS split_day",
        "CAST(i AS BIGINT) AS split_i",
        f"CAST(floor(({_seg_rss('l_')} + {_seg_rss('r_')}) / 1000000.0"
        " + 0.5) AS BIGINT) AS rss_total_kcents2",
    )
    return scored.orderBy("rss_total_kcents2", "split_day").limit(3)


# ---------------------------------------------------------------- #
# lorenz_curve_points                                               #
# ---------------------------------------------------------------- #
LORENZ_ORACLE = """
WITH rev AS (
    SELECT o_custkey,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS x
    FROM orders GROUP BY 1
),
ranked AS (
    SELECT x, row_number() OVER (ORDER BY x, o_custkey) AS i,
           count(*) OVER () AS n,
           CAST(sum(x) OVER () AS BIGINT) AS t,
           CAST(sum(x) OVER (ORDER BY x, o_custkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum
    FROM rev
),
deciles AS (
    SELECT CAST((i * 10) // n AS BIGINT) AS pop_decile,
           max(cum) AS cum_at, max(t) AS t
    FROM ranked
    WHERE (i * 10) % n = 0 OR i = n
    GROUP BY 1
)
SELECT pop_decile,
       CAST(floor(1000.0 * CAST(cum_at AS DOUBLE) / t + 0.5) AS BIGINT)
           AS cum_share_milli
FROM deciles WHERE pop_decile BETWEEN 1 AND 10
"""


@register("lorenz_curve_points", LORENZ_ORACLE)
def q_lorenz_curve_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of customer revenue at the decile grid: the
    cumulative revenue share held by the poorest 10%..100% of
    customers — the distribution behind the revenue_gini scalar
    (gini = 1 − 2·area under this curve). Points are taken where the
    population rank hits an exact decile boundary (i·10 ≡ 0 mod n),
    so no interpolation float enters.

    Scale shape: ranks and the running revenue sum ride the same
    ascending (x, custkey) ordering — at scale both come from the
    two-pass range-partition scheme (one parallel sort); cents and
    ranks exact."""
    from taxi_trips_etl_spark.operators.ids import assign_global_ids

    rev = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("x")
        )
    )
    ranked = assign_global_ids(rev, ["x", "o_custkey"], id_col="i")
    w = Window.orderBy("x", "o_custkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    r2 = ranked.select(
        "x",
        "i",
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("x").over(wall).cast("long").alias("t"),
        F.sum("x").over(w).cast("long").alias("cum"),
    )
    deciles = (
        r2.where(
            ((F.col("i") * 10) % F.col("n") == 0)
            | (F.col("i") == F.col("n"))
        )
        .groupBy(
            F.expr("CAST((i * 10) DIV n AS BIGINT)").alias("pop_decile")
        )
        .agg(F.max("cum").alias("cum_at"), F.max("t").alias("t"))
    )
    return deciles.where(
        F.col("pop_decile").between(1, 10)
    ).selectExpr(
        "pop_decile",
        "CAST(floor(1000.0 * CAST(cum_at AS DOUBLE) / t + 0.5) AS BIGINT)"
        " AS cum_share_milli",
    )


# ---------------------------------------------------------------- #
# simpson_paradox_audit                                             #
# ---------------------------------------------------------------- #
# OLS slope SIGN from exact integer sums: sign(nΣxy − ΣxΣy) —
# the denominator is positive, so the numerator's integer sign IS the
# slope sign. No floats at all.
_SLOPE_NUM = "(n * sxy - sx * sy)"

SIMPSON_ORACLE = f"""
WITH daily AS (
    SELECT event_type,
           CAST(date_diff('day', DATE '1970-01-01',
                CAST(strftime(ts, '%Y-%m-%d') AS DATE)) AS BIGINT) AS d,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
),
per_group AS (
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(d) AS BIGINT) AS sx,
           CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(d*y) AS BIGINT) AS sxy
    FROM daily GROUP BY 1
),
pooled AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(d) AS BIGINT) AS sx,
           CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(d*y) AS BIGINT) AS sxy
    FROM (SELECT d, CAST(sum(y) AS BIGINT) AS y FROM daily GROUP BY 1)
)
SELECT g.event_type,
       CAST(sign(g.n * g.sxy - g.sx * g.sy) AS BIGINT) AS group_trend,
       CAST(sign(p.n * p.sxy - p.sx * p.sy) AS BIGINT) AS pooled_trend,
       CAST(CASE WHEN sign(g.n * g.sxy - g.sx * g.sy)
                 * sign(p.n * p.sxy - p.sx * p.sy) < 0
            THEN 1 ELSE 0 END AS BIGINT) AS sign_flip
FROM per_group g CROSS JOIN pooled p
"""


@register("simpson_paradox_audit", SIMPSON_ORACLE)
def q_simpson_paradox_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox screen: per-event-type daily-revenue trend
    sign vs the pooled trend sign, flagging groups whose direction
    REVERSES under aggregation — the audit that catches dashboards
    reporting 'revenue up' while every segment is down. The OLS
    slope sign is sign(nΣxy − ΣxΣy): a pure integer expression
    (the denominator is always positive), so no float exists
    anywhere in this entry.

    Scale shape: one (type, day) aggregate, then group- and
    pooled-level integer sums over the daily frame."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.to_date(F.date_format("ts", "yyyy-MM-dd")),
            F.to_date(F.lit("1970-01-01")),
        )
        .cast("long")
        .alias("d"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("y")
    )
    per_group = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("d").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.expr("d*y")).cast("long").alias("sxy"),
    )
    pooled = (
        daily.groupBy("d")
        .agg(F.sum("y").cast("long").alias("y"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("pn"),
            F.sum("d").cast("long").alias("psx"),
            F.sum("y").cast("long").alias("psy"),
            F.sum(F.expr("d*y")).cast("long").alias("psxy"),
        )
    )
    return per_group.crossJoin(F.broadcast(pooled)).selectExpr(
        "event_type",
        "CAST(sign(n * sxy - sx * sy) AS BIGINT) AS group_trend",
        "CAST(sign(pn * psxy - psx * psy) AS BIGINT) AS pooled_trend",
        "CAST(CASE WHEN sign(n * sxy - sx * sy)"
        " * sign(pn * psxy - psx * psy) < 0 THEN 1 ELSE 0 END AS BIGINT)"
        " AS sign_flip",
    )
