"""Incremental aggregate maintenance (materialized-rollup upkeep).

The production pattern for daily metrics at 100 TB: never recompute
the full history — combine yesterday's materialized rollup with the
new day's PARTIAL aggregate. Works for any algebraic aggregate
(count/sum/min/max, and avg carried as sum+count); the merge is a
groupBy over (previous_state ∪ delta_partial), which touches only
|state| + |delta| rows — the full fact history is never re-read.

Equivalence contract (pytest-pinned): fold(state, delta) produces
byte-identical rows to aggregating the concatenated input from
scratch. That property is what makes backfills and replays safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _metrics():
    # built lazily: Column construction needs an active SparkSession
    return (
        ("n_rows", F.count(F.lit(1)), F.sum),
        ("sum_value", F.sum("value"), F.sum),
        ("min_value", F.min("value"), F.min),
        ("max_value", F.max("value"), F.max),
    )


def partial_rollup(events: DataFrame, keys: list[str]) -> DataFrame:
    """Partial (mergeable) aggregate of one ingest batch."""
    return events.groupBy(*keys).agg(
        *[agg.alias(name) for name, agg, _ in _metrics()]
    )


def merge_rollup(state: DataFrame, delta_partial: DataFrame, keys: list[str]) -> DataFrame:
    """Fold a new partial into the existing rollup state."""
    return (
        state.unionByName(delta_partial)
        .groupBy(*keys)
        .agg(*[m(name).alias(name) for name, _, m in _metrics()])
    )
