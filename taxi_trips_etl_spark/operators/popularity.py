"""Stage 4 — most-popular routes / hexagons (SURVEY.md §2.3 J4, §2.4
A1/A2, §2.5 W2, §2.6 T1, §2.8 F8).

The reference final-result query (/root/reference/taxi_trips_etl.py:164-176)
builds three subqueries over enriched trips —

- routes:   GROUP BY (h3_pickup, h3_dropoff) → count, RANK() OVER
            (ORDER BY count DESC) AS popularity, top 100  (:166-169)
- dropoff:  GROUP BY h3_dropoff → count, rank, top 100     (:171-172)
- pickup:   GROUP BY h3_pickup  → count, rank, top 100     (:174-175)

— then chains ``INNER JOIN … USING(popularity)`` (:173,175), relying on
rank-tie semantics: equal-popularity rows multiply, ranks missing from
any list drop out. That is *intentional* reference behavior
(README.md:51) and is preserved here — do not "fix" it.

Determinism note: the reference's ``ORDER BY count DESC LIMIT 100``
selects an arbitrary subset when ties straddle position 100. We instead
keep every row with ``popularity <= limit`` — identical semantics except
at that ambiguous boundary, and fully deterministic (required for the
DuckDB-oracle hash check).

Scale notes: each groupBy is a partial-agg hash aggregate; the global
RANK window runs on *post-aggregation* cardinality (≤ distinct cells,
thousands — a single-partition window there is safe at any fact-table
scale). The three-way popularity join touches ≤ 3×limit rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from taxi_trips_etl_spark.functions.scalar import route_struct


def ranked_counts(df: DataFrame, keys: list[str], cnt_alias: str, limit: int) -> DataFrame:
    """GROUP BY keys → count(*) → global RANK desc → popularity ≤ limit."""
    w = Window.orderBy(F.col(cnt_alias).desc())
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(cnt_alias))
        .withColumn("popularity", F.rank().over(w))
        .filter(F.col("popularity") <= limit)
    )


def most_populars(enriched: DataFrame, limit: int = 100) -> DataFrame:
    """The flagship result: routes × dropoff-hexes × pickup-hexes by rank.

    Output mirrors taxi_trips_etl.py:165-176: ``route`` STRUCT (F8),
    per-list counts, and the shared ``popularity`` rank.
    """
    routes = ranked_counts(
        enriched, ["h3_pickup", "h3_dropoff"], "route_count", limit
    ).select(
        route_struct(F.col("h3_pickup"), F.col("h3_dropoff")),
        "route_count",
        "popularity",
    )
    dropoffs = ranked_counts(enriched, ["h3_dropoff"], "dropoff_count", limit).select(
        F.col("h3_dropoff").alias("dropoff_hexagon"), "dropoff_count", "popularity"
    )
    pickups = ranked_counts(enriched, ["h3_pickup"], "pickup_count", limit).select(
        F.col("h3_pickup").alias("pickup_hexagon"), "pickup_count", "popularity"
    )
    # J4: INNER JOIN … USING(popularity) ×2 — tiny inputs (≤3×limit rows
    # + tie fanout); Spark picks broadcast joins under AQE.
    return routes.join(dropoffs, "popularity").join(pickups, "popularity")
