"""Round-5d batch: KMV set-overlap sketches.

Registered AFTER _round5c (registration order is the rotation
tie-breaker — see queries/__init__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (parity with sibling batches)

from taxi_trips_etl_spark.queries._registry import (
    _events,
    _t,
    register,
)

__all__ = [
    "q_kmv_user_overlap",
    "q_global_ids_orders",
    "q_k_anonymity_audit",
    "q_dp_noisy_counts",
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


@register(
    "global_ids_orders",
    """
    SELECT o_orderkey,
           CAST(row_number() OVER (ORDER BY o_orderdate, o_orderkey)
                AS BIGINT) AS global_id
    FROM orders
    """,
)
def q_global_ids_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense 1-based ids by (o_orderdate, o_orderkey) via the two-pass
    range-partition rank (operators/ids.py) — the oracle IS the
    single-reducer row_number the operator refuses to run; hash equality
    proves the scalable plan computes the identical function."""
    from taxi_trips_etl_spark.operators.ids import assign_global_ids

    orders = _t(spark, sf_dir, "orders")
    return assign_global_ids(
        orders, ["o_orderdate", "o_orderkey"]
    ).select("o_orderkey", "global_id")


@register(
    "k_anonymity_audit",
    """
    SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment,
           class_size, 8 - class_size AS deficit
    FROM (SELECT c_nationkey, c_mktsegment,
                 CAST(count(*) AS BIGINT) AS class_size
          FROM customer GROUP BY 1, 2)
    WHERE class_size < 8
    """,
)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quasi-identifier equivalence classes below k=8 on
    (nation, market segment) — the table-level re-identification audit
    (dataprep/privacy.py) complementing the row-level PII scrub."""
    from taxi_trips_etl_spark.dataprep.privacy import k_anonymity_audit

    cust = _t(spark, sf_dir, "customer").withColumn(
        "c_nationkey", F.col("c_nationkey").cast("long")
    )
    return k_anonymity_audit(cust, ["c_nationkey", "c_mktsegment"], k=8)


@register(
    "dp_noisy_counts",
    """
    WITH g AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS c
               FROM events GROUP BY 1),
    u AS (SELECT event_type, c,
                 -- CAST to DOUBLE *before* the +0.5: DuckDB's 0.5 literal
                 -- is DECIMAL, and BIGINT+DECIMAL adds exactly where
                 -- Spark's double add rounds — a one-ulp divergence the
                 -- hash compare catches (it did).
                 (CAST(CAST(concat('0x', substr(md5('dp' || event_type),
                                                1, 15)) AS BIGINT)
                       AS DOUBLE) + 0.5)
                     / 1152921504606846976.0 - 0.5 AS ctr
          FROM g)
    SELECT event_type,
           round(c + (-1.0) * sign(ctr) * ln(1.0 - 2.0 * abs(ctr)), 4)
               AS noisy_count
    FROM u
    """,
)
def q_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace(1/ε)-noised per-type event counts, ε=1, noise drawn by
    salted-hash inverse CDF so the full mechanism is oracle-replayable —
    see dataprep/privacy.py:dp_noisy_counts for the honest caveat on
    seeded vs secret randomness."""
    from taxi_trips_etl_spark.dataprep.privacy import dp_noisy_counts

    ev = _events(spark, sf_dir)
    return dp_noisy_counts(ev, ["event_type"], epsilon=1.0, salt="dp")
