"""Round-5d batch: KMV set-overlap sketches.

Registered AFTER _round5c (registration order is the rotation
tie-breaker — see queries/__init__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (parity with sibling batches)

from taxi_trips_etl_spark.queries._registry import (
    _events,
    register,
)

__all__ = [
    "q_kmv_user_overlap",
]


def _kmv_oracle() -> str:
    from taxi_trips_etl_spark.dataprep.kmv import kmv_oracle_sql

    return kmv_oracle_sql(
        "SELECT event_type, user_id FROM events",
        set_col="event_type",
        value_col="user_id",
        k=256,
    )


@register("kmv_user_overlap", _kmv_oracle())
def q_kmv_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user overlap between every pair of event types via KMV
    (k-minimum-values) sketches — the mergeable-intersection complement
    to ``hll_distinct_rollup`` (HLL unions well but intersects badly).
    One uniform-key distinct + two bounded top-k windows build all
    sketches; the pairwise stage touches only n_sets·k sketch rows, so
    the estimate cost is data-volume-independent past the single scan.
    See dataprep/kmv.py for the estimator and the exactness argument
    DuckDB replays."""
    from taxi_trips_etl_spark.dataprep.kmv import kmv_pairwise_overlap

    ev = _events(spark, sf_dir)
    return kmv_pairwise_overlap(
        ev, set_col="event_type", value_col="user_id", k=256
    )
