"""Incremental rollup maintenance: folding per-batch partials must
equal the from-scratch aggregate — the replay/backfill safety
contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from taxi_trips_etl_spark.plans.incremental import merge_rollup, partial_rollup
from taxi_trips_etl_spark.queries import _events

KEYS = ["event_type"]


def test_incremental_fold_equals_full_recompute(spark, sf_dir):
    ev = _events(spark, sf_dir).select("event_type", "value", "ts")
    cut = ev.agg(F.expr("timestamp_micros(CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY unix_micros(ts)) AS BIGINT))")).collect()[0][0]
    day1 = ev.filter(F.col("ts") <= cut)
    day2 = ev.filter(F.col("ts") > cut)

    state = partial_rollup(day1, KEYS)
    folded = merge_rollup(state, partial_rollup(day2, KEYS), KEYS)
    full = partial_rollup(ev, KEYS)

    f = {tuple(r[k] for k in KEYS): r.asDict() for r in folded.collect()}
    g = {tuple(r[k] for k in KEYS): r.asDict() for r in full.collect()}
    assert set(f) == set(g)
    for k in f:
        assert f[k]["n_rows"] == g[k]["n_rows"]
        assert f[k]["min_value"] == g[k]["min_value"]
        assert f[k]["max_value"] == g[k]["max_value"]
        # float sum: fold order differs → allow ulp-scale tolerance
        assert abs(f[k]["sum_value"] - g[k]["sum_value"]) < 1e-6 * max(
            1.0, abs(g[k]["sum_value"])
        )


def test_incremental_is_idempotent_per_key(spark, sf_dir):
    ev = _events(spark, sf_dir).select("event_type", "value").limit(1000)
    state = partial_rollup(ev, KEYS)
    empty = partial_rollup(ev.filter(F.lit(False)), KEYS)
    again = merge_rollup(state, empty, KEYS)
    a = sorted(map(tuple, state.collect()))
    b = sorted(map(tuple, again.collect()))
    assert a == b
