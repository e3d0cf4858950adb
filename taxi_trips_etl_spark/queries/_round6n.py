# Round-6 batch 17: market-concentration and physical-layout
# diagnostics — Herfindahl-Hirschman index per nation over brand
# revenue shares, and partition-skew statistics for a prospective
# hash layout (bucket counts + coefficient of variation) using the
# engine's portable md5 bucketing. Integer sums, shared-text ratios.
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from taxi_trips_etl_spark.queries._registry import _t, register

__all__ = [
    "q_hhi_market_concentration",
    "q_partition_skew_stats",
]

# ---------------------------------------------------------------- #
# hhi_market_concentration                                          #
# ---------------------------------------------------------------- #
# HHI from integer MILLI-SHARES: share_milli = round-half-up of
# 1000·rev/total, then HHI_bp = round(Σ share_milli² / 100). The
# squared terms are bounded by 10⁶ REGARDLESS of data scale (shares
# sum to ~1000 by construction), so no unit rescaling is ever needed
# — the overflow-proof formulation the raw-revenue square is not
# (rev_d² blew int64 on the 10× sweep).
_SHARE_MILLI = (
    "CAST(floor(1000.0 * CAST(rev_cents AS DOUBLE) / total_cents + 0.5)"
    " AS BIGINT)"
)

HHI_ORACLE = f"""
WITH rev AS (
    SELECT s.s_nationkey AS nation_key, p.p_brand,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS rev_cents
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1, 2
),
shared AS (
    SELECT nation_key, rev_cents,
           CAST(sum(rev_cents) OVER (PARTITION BY nation_key) AS BIGINT)
               AS total_cents
    FROM rev
),
milli AS (
    SELECT nation_key, total_cents, {_SHARE_MILLI} AS share_milli
    FROM shared
)
SELECT nation_key,
       CAST(count(*) AS BIGINT) AS n_brands,
       CAST(max(total_cents) AS BIGINT) AS total_cents,
       CAST(floor(CAST(sum(share_milli * share_milli) AS BIGINT) / 100.0
                  + 0.5) AS BIGINT) AS hhi_bp
FROM milli GROUP BY 1
"""


@register("hhi_market_concentration", HHI_ORACLE)
def q_hhi_market_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman market concentration per nation: Σ of
    squared brand revenue shares, in basis points (10000 = monopoly,
    10000/n = perfect competition) — the standard concentration
    scalar for assortment/vendor-dependence monitoring. Squares are
    taken over integer MILLI-SHARES (round-half-up of 1000·rev/total)
    rather than raw revenue: Σ share_milli² ≤ 10⁶ by construction, so
    the formulation cannot overflow at ANY data scale — the raw
    rev² variant blew int64 on the 10× sweep and was replaced
    (precision cost ≤ ~10 bp, identical in both engines).

    Scale shape: broadcast dims + one (nation, brand) partial+final
    aggregate; shares and the epilogue run on dims² rows."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(F.col("s_nationkey").alias("nation_key"), "p_brand")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("rev_cents")
        )
    )
    shared = rev.select(
        "nation_key",
        "rev_cents",
        F.sum("rev_cents")
        .over(Window.partitionBy("nation_key"))
        .cast("long")
        .alias("total_cents"),
    )
    milli = shared.selectExpr(
        "nation_key", "total_cents", f"{_SHARE_MILLI} AS share_milli"
    )
    return milli.groupBy("nation_key").agg(
        F.count(F.lit(1)).cast("long").alias("n_brands"),
        F.max("total_cents").cast("long").alias("total_cents"),
        F.expr(
            "CAST(floor(CAST(sum(share_milli * share_milli) AS BIGINT)"
            " / 100.0 + 0.5) AS BIGINT)"
        ).alias("hhi_bp"),
    ).select("nation_key", "n_brands", "total_cents", "hhi_bp")


# ---------------------------------------------------------------- #
# partition_skew_stats                                              #
# ---------------------------------------------------------------- #
_N_BUCKETS = 32
# CV = stddev/mean from integer bucket counts: one division of
# integer-derived doubles (sqrt correctly rounded).
_CV = (
    "CAST(floor(1000.0 * sqrt((CAST(k AS DOUBLE) * css"
    " - CAST(cs AS DOUBLE) * cs)) / CAST(cs AS DOUBLE) + 0.5) AS BIGINT)"
)

PARTITION_SKEW_ORACLE = f"""
WITH bucketed AS (
    SELECT CAST(CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))
                AS BIGINT) % {_N_BUCKETS} AS BIGINT) AS bucket
    FROM orders
),
counts AS (
    SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows
    FROM bucketed GROUP BY 1
),
stats AS (
    SELECT CAST(count(*) AS BIGINT) AS k,
           CAST(sum(n_rows) AS BIGINT) AS cs,
           CAST(sum(n_rows * n_rows) AS BIGINT) AS css,
           CAST(max(n_rows) AS BIGINT) AS max_rows,
           CAST(min(n_rows) AS BIGINT) AS min_rows
    FROM counts
)
SELECT k AS n_buckets, cs AS total_rows, min_rows, max_rows,
       CAST(cs // k AS BIGINT) AS mean_rows,
       {_CV} AS cv_milli
FROM stats
"""


@register("partition_skew_stats", PARTITION_SKEW_ORACLE)
def q_partition_skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Physical-layout pre-flight: hash the prospective partition key
    into {_N_BUCKETS} buckets (portable md5 bucketing — NOT engine
    hash(), which differs between Spark's Murmur3 and any other
    system) and report the bucket-count distribution: min/max/mean
    and the coefficient of variation. High CV ⇒ the key needs
    salting or a different layout BEFORE the repartition/bucketed
    write is paid; pairs with join_multiplicity_hotspots (per-key
    fanout) and adaptive_salt_plan (the remedy).

    Scale shape: one partial+final count per bucket; the stats
    epilogue runs on {_N_BUCKETS} rows. √ of integer-derived doubles
    only."""
    o = _t(spark, sf_dir, "orders").selectExpr(
        "CAST(CAST(conv(substr(md5(CAST(o_custkey AS STRING)), 1, 8),"
        f" 16, 10) AS BIGINT) % {_N_BUCKETS} AS BIGINT) AS bucket"
    )
    counts = o.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    stats = counts.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_rows").cast("long").alias("cs"),
        F.sum(F.expr("n_rows * n_rows")).cast("long").alias("css"),
        F.max("n_rows").cast("long").alias("max_rows"),
        F.min("n_rows").cast("long").alias("min_rows"),
    )
    return stats.selectExpr(
        "k AS n_buckets",
        "cs AS total_rows",
        "min_rows",
        "max_rows",
        "CAST(cs DIV k AS BIGINT) AS mean_rows",
        f"{_CV} AS cv_milli",
    )
