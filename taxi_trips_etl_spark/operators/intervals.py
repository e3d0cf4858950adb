"""Gaps-and-islands: merge overlapping per-key intervals.

The canonical sessionless interval union (calendar busy-time, sensor
uptime, trip coverage): each event opens an interval [t, t+duration);
overlapping or touching intervals per key merge into islands.

Plan shape: ONE shuffle on the key serves both windows (the running
max-end and the island-id cumsum share partitioning and ordering, so
Spark plans a single Window operator stack over one Exchange) plus
the final groupBy, which reuses the same partitioning. All arithmetic
is exact integer microseconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_overlapping_intervals(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    order_tiebreak: str = "event_id",
    duration_us: int = 300_000_000,
) -> DataFrame:
    """Merge per-``key`` intervals [ts, ts+duration) into islands.

    An event starts a new island iff its start strictly exceeds the
    max end of ALL earlier intervals (running max — a later-starting
    but shorter interval must not end an island a longer earlier one
    still covers). Touching intervals (start == previous end) merge,
    matching half-open semantics.

    Returns (key, island_id, start_us, end_us, n_events).
    """
    w = Window.partitionBy(key).orderBy("t", order_tiebreak)
    e = events.select(
        key,
        order_tiebreak,
        F.unix_micros(F.col(ts)).alias("t"),
        (F.unix_micros(F.col(ts)) + duration_us).alias("e_end"),
    )
    flagged = e.withColumn(
        "prev_end",
        F.max("e_end").over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
    ).withColumn(
        "is_new",
        F.when(
            F.col("prev_end").isNull()
            | (F.col("t") > F.col("prev_end")),
            1,
        ).otherwise(0),
    )
    islands = flagged.withColumn(
        "island_id",
        F.sum("is_new")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )
    return islands.groupBy(key, "island_id").agg(
        F.min("t").cast("long").alias("start_us"),
        F.max("e_end").cast("long").alias("end_us"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
