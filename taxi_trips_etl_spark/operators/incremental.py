"""Incremental view maintenance for algebraic aggregates.

The production rollup loop at 100 TB: a materialized daily aggregate
must absorb a late-arriving partition WITHOUT re-scanning the fact
history. For algebraic aggregates (count/sum — and avg, stddev,
etc. derived from them at read time) the stored table holds the
MERGEABLE PARTIALS, and maintenance is:

    new_state = re-aggregate( old_state ∪ aggregate(delta) )

The fact table is touched only for the delta; the merge shuffles
state rows (bounded by GROUP COUNT, not fact rows) plus one
delta-sized aggregate. Associativity + commutativity of the partials
make the result independent of how history was split into deltas —
which is exactly what the oracle asserts by computing the one-shot
aggregate over everything.

Non-algebraic aggregates (exact distinct, medians) don't merge this
way — that is what the HLL rollup (mergeable sketch) and the exact
two-pass percentile operators are for; this module is the exact-case
counterpart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_partials(
    events: DataFrame, keys: list[str], value_cents: F.Column
) -> DataFrame:
    """→ (keys…, n_events, value_cents): the mergeable partial shape."""
    return events.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(value_cents).cast("long").alias("value_cents"),
    )


def merge_partials(
    state: DataFrame, delta_partials: DataFrame, keys: list[str]
) -> DataFrame:
    """Fold a delta's partials into the stored state: union + re-sum.

    Groups untouched by the delta pass through with their partials
    summed against nothing; new groups appear; overlapping groups add.
    """
    return (
        state.unionByName(delta_partials)
        .groupBy(*keys)
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("value_cents").cast("long").alias("value_cents"),
        )
    )
