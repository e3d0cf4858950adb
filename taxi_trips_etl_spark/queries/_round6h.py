# Round-6 batch 11: higher statistics as exact-integer aggregation —
# skewness/kurtosis from raw power sums, a two-proportion A/B z-test,
# hierarchical revenue shares (nation→region→total), and funnel
# conversion latency. Shared-text float algebra; sqrt only (IEEE
# correctly-rounded), never pow/exp/log in the deterministic path.
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taxi_trips_etl_spark.queries._registry import _events, _t, register

__all__ = [
    "q_moments_skew_kurtosis",
    "q_ab_test_proportions",
    "q_region_share_rollup",
    "q_funnel_latency_stats",
]


# ---------------------------------------------------------------- #
# moments_skew_kurtosis                                             #
# ---------------------------------------------------------------- #
# Central-moment algebra over the exact integer power sums, written
# once. c2^1.5 is c2*sqrt(c2) — pow() is NOT correctly-rounded in
# every libm, sqrt is.
_MOM_PRELUDE = (
    "CAST(m1 AS DOUBLE) / n AS mean, CAST(m2 AS DOUBLE) / n AS r2,"
    " CAST(m3 AS DOUBLE) / n AS r3, CAST(m4 AS DOUBLE) / n AS r4"
)
_MOM_C2 = "(r2 - mean * mean)"
_MOM_C3 = "(r3 - 3.0 * mean * r2 + 2.0 * mean * mean * mean)"
_MOM_C4 = (
    "(r4 - 4.0 * mean * r3 + 6.0 * mean * mean * r2"
    " - 3.0 * mean * mean * mean * mean)"
)
_MOM_OUT = (
    "CAST(floor(1000000.0 * mean + 0.5) AS BIGINT) AS mean_micro, "
    f"CAST(floor(1000000.0 * ({_MOM_C3} / ({_MOM_C2} * sqrt({_MOM_C2})))"
    " + 0.5) AS BIGINT) AS skew_micro, "
    f"CAST(floor(1000000.0 * ({_MOM_C4} / ({_MOM_C2} * {_MOM_C2}) - 3.0)"
    " + 0.5) AS BIGINT) AS kurtosis_micro"
)

MOMENTS_ORACLE = f"""
WITH sums AS (
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(q) AS BIGINT) AS m1,
           CAST(sum(q*q) AS BIGINT) AS m2,
           CAST(sum(q*q*q) AS BIGINT) AS m3,
           CAST(sum(q*q*q*q) AS BIGINT) AS m4
    FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q
          FROM lineitem)
    GROUP BY 1
),
d AS (SELECT l_returnflag, n, {_MOM_PRELUDE} FROM sums)
SELECT l_returnflag, n, {_MOM_OUT} FROM d
"""


@register("moments_skew_kurtosis", MOMENTS_ORACLE)
def q_moments_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness and excess kurtosis per return flag from EXACT integer
    power sums Σq..Σq⁴ — unlike the built-in skewness()/kurtosis()
    aggregates, whose float partials depend on partition merge order,
    this is one map-side-combinable integer aggregate plus a one-row
    double epilogue with the algebra text shared with the oracle.

    int64 headroom: Σq⁴ ≤ rows·50⁴ — safe past 10^9 rows/group.
    Distribution-shape drift (skew/kurtosis shifts) is the standard
    data-quality screen these feed."""
    sums = (
        _t(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag", F.col("l_quantity").cast("long").alias("q")
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("q").cast("long").alias("m1"),
            F.sum(F.expr("q*q")).cast("long").alias("m2"),
            F.sum(F.expr("q*q*q")).cast("long").alias("m3"),
            F.sum(F.expr("q*q*q*q")).cast("long").alias("m4"),
        )
    )
    d = sums.selectExpr("l_returnflag", "n", *_MOM_PRELUDE.split(", "))
    return d.selectExpr(
        "l_returnflag", "n", *[e.strip() for e in _MOM_OUT.split(", ")]
    )


# ---------------------------------------------------------------- #
# ab_test_proportions                                               #
# ---------------------------------------------------------------- #
_AB_P = "((CAST(c1 AS DOUBLE) + c2) / (CAST(n1 AS DOUBLE) + n2))"
_AB_Z_RAW = (
    "((CAST(c1 AS DOUBLE) / n1 - CAST(c2 AS DOUBLE) / n2)"
    f" / sqrt({_AB_P} * (1.0 - {_AB_P})"
    " * (1.0 / n1 + 1.0 / n2)))"
)
# p in {0, 1} makes the pooled variance 0 — define z = 0 there (no
# evidence either way). CASE is lazy in both engines, so the division
# never evaluates in the degenerate branch (ANSI-safe).
_AB_Z = (
    "(CASE WHEN (c1 + c2) = 0 OR (c1 + c2) = (n1 + n2) THEN 0.0"
    f" ELSE {_AB_Z_RAW} END)"
)
_AB_OUT = (
    "n1, c1, n2, c2, "
    f"CAST(floor(1000.0 * {_AB_Z} + 0.5) AS BIGINT) AS z_milli, "
    f"CAST(CASE WHEN abs(CAST(floor(1000.0 * {_AB_Z} + 0.5) AS BIGINT))"
    " > 1960 THEN 1 ELSE 0 END AS BIGINT) AS significant"
)

AB_TEST_ORACLE = f"""
WITH users AS (
    SELECT user_id, CAST(user_id % 2 AS BIGINT) AS arm,
           max(CASE WHEN event_type = 'purchase' AND value >= 300.0
                    THEN 1 ELSE 0 END) AS converted
    FROM events GROUP BY 1, 2
),
arms AS (
    SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END)
                AS BIGINT) AS c1,
           CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
           CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END)
                AS BIGINT) AS c2
    FROM users
)
SELECT {_AB_OUT} FROM arms
"""


@register("ab_test_proportions", AB_TEST_ORACLE)
def q_ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test between experiment arms (user_id parity
    as the deterministic assignment): per-user conversion (a purchase
    of value ≥ 300) collapses in one aggregate, the four arm counts in a second, and the pooled
    z-statistic is a one-row double epilogue (shared text; sqrt
    only). |z| > 1.96 flags significance at α=0.05.

    Scale shape: two partial+final aggregates — the per-user rollup
    shuffles user-count rows, the arm rollup 4 numbers. Nothing else
    grows. The standard online-experimentation readout."""
    ev = _events(spark, sf_dir)
    users = ev.groupBy(
        "user_id", (F.col("user_id") % 2).cast("long").alias("arm")
    ).agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") >= 300.0),
                1,
            ).otherwise(0)
        ).alias("converted")
    )
    arms = users.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n2"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    return arms.selectExpr(*[e.strip() for e in _AB_OUT.split(", ")])


# ---------------------------------------------------------------- #
# region_share_rollup                                               #
# ---------------------------------------------------------------- #
_SHARE = "CAST(floor(1000.0 * CAST({num} AS DOUBLE) / {den} + 0.5) AS BIGINT)"

REGION_SHARE_ORACLE = f"""
WITH rev AS (
    SELECT r.r_name AS region, n.n_name AS nation,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS rev_cents
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
),
tot AS (
    SELECT region, nation, rev_cents,
           CAST(sum(rev_cents) OVER (PARTITION BY region) AS BIGINT)
               AS region_cents,
           CAST(sum(rev_cents) OVER () AS BIGINT) AS total_cents
    FROM rev
)
SELECT region, nation, rev_cents,
       {_SHARE.format(num='rev_cents', den='region_cents')}
           AS share_of_region_milli,
       {_SHARE.format(num='region_cents', den='total_cents')}
           AS region_share_milli
FROM tot
"""


@register("region_share_rollup", REGION_SHARE_ORACLE)
def q_region_share_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical contribution analysis: nation revenue with its
    share of the region and the region's share of the total — the
    drill-down rollup every revenue dashboard leads with.

    Scale shape: orders→customer is the only fact-sized join (hash
    join on the customer key; at 100 TB both sides shuffle once —
    or zero times if both are bucketed on the key, see
    bucketed_colocated_join); nation/region are broadcasts. The
    share windows run over the 25-row aggregate. Cents exact; the
    two share divisions are shared text."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("rev_cents")
        )
    )
    from pyspark.sql import Window

    tot = rev.select(
        "region",
        "nation",
        "rev_cents",
        F.sum("rev_cents")
        .over(Window.partitionBy("region"))
        .cast("long")
        .alias("region_cents"),
        F.sum("rev_cents")
        .over(Window.partitionBy())
        .cast("long")
        .alias("total_cents"),
    )
    return tot.selectExpr(
        "region",
        "nation",
        "rev_cents",
        _SHARE.format(num="rev_cents", den="region_cents")
        + " AS share_of_region_milli",
        _SHARE.format(num="region_cents", den="total_cents")
        + " AS region_share_milli",
    )


# ---------------------------------------------------------------- #
# funnel_latency_stats                                              #
# ---------------------------------------------------------------- #
FUNNEL_LATENCY_ORACLE = """
WITH v AS (
    SELECT user_id, min(epoch_us(ts)) AS m1 FROM events
    WHERE event_type = 'view' GROUP BY 1
),
c AS (
    SELECT e.user_id, min(epoch_us(e.ts)) AS m2
    FROM events e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.m1
    GROUP BY 1
),
p AS (
    SELECT e.user_id, min(epoch_us(e.ts)) AS m3
    FROM events e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.m2
    GROUP BY 1
),
complete AS (
    SELECT v.user_id, c.m2 - v.m1 AS d12, p.m3 - c.m2 AS d23
    FROM v JOIN c ON c.user_id = v.user_id
    JOIN p ON p.user_id = v.user_id
)
SELECT * FROM (
    SELECT 'view>click' AS leg, CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(d12) AS BIGINT) // count(*) AS avg_us,
           CAST(min(d12) AS BIGINT) AS min_us,
           CAST(max(d12) AS BIGINT) AS max_us
    FROM complete
    UNION ALL
    SELECT 'click>purchase', CAST(count(*) AS BIGINT),
           CAST(sum(d23) AS BIGINT) // count(*),
           CAST(min(d23) AS BIGINT), CAST(max(d23) AS BIGINT)
    FROM complete
)
"""


@register("funnel_latency_stats", FUNNEL_LATENCY_ORACLE)
def q_funnel_latency_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion latency along the strict funnel: for users
    completing view→click→purchase (greedy earliest-match chaining,
    same semantics as sequence_pattern_funnel), the per-leg dwell
    time in integer microseconds — n, mean (integer DIV), min, max.

    Scale shape (r13): the same three chained min-aggregates on
    user_id, but each stage table (user-grain, small next to events)
    is materialized — the lazy plan otherwise re-derived v under c,
    c under p, and the whole chain TWICE more under the two leg
    epilogues, for 12 filtered events scans; now each event_type
    filter scans events exactly once (PushedFilters per stage, 3
    scans — the per-stage-filter floor). Both legs' stats come out of
    ONE aggregate pass over the completed funnel, ``stack``-ed to the
    2-row report (guide §1.2: fewest fundamental passes)."""
    from taxi_trips_etl_spark.dataprep.materialize import materialize

    ev = _events(spark, sf_dir).withColumn("us", F.unix_micros("ts"))
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("m1"))
        .transform(materialize, eager=False)
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("us") > F.col("m1"))
        .groupBy("user_id")
        .agg(F.min("us").alias("m2"))
        .transform(materialize, eager=False)
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("us") > F.col("m2"))
        .groupBy("user_id")
        .agg(F.min("us").alias("m3"))
    )
    complete = (
        v.join(c, "user_id")
        .join(p, "user_id")
        .select(
            (F.col("m2") - F.col("m1")).alias("d12"),
            (F.col("m3") - F.col("m2")).alias("d23"),
        )
    )
    return complete.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.expr("CAST(sum(d12) AS BIGINT) DIV count(*)").alias("avg12"),
        F.min("d12").cast("long").alias("min12"),
        F.max("d12").cast("long").alias("max12"),
        F.expr("CAST(sum(d23) AS BIGINT) DIV count(*)").alias("avg23"),
        F.min("d23").cast("long").alias("min23"),
        F.max("d23").cast("long").alias("max23"),
    ).selectExpr(
        "stack(2, "
        "'view>click', n_users, avg12, min12, max12, "
        "'click>purchase', n_users, avg23, min23, max23"
        ") AS (leg, n_users, avg_us, min_us, max_us)"
    )
