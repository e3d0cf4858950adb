"""Shape tests for the lag-lead / histogram / outlier batch
(queries.py additions; values are oracle-verified — these pin the
structural guarantees the value hash can't see)."""

from __future__ import annotations

from pyspark.sql import functions as F

from taxi_trips_etl_spark import queries


def test_lag_lead_gaps_edges_and_symmetry(spark, sf_dir):
    out = queries.all_queries()["lag_lead_order_gaps"](spark, sf_dir)
    orders = queries._t(spark, sf_dir, "orders")
    n_customers = orders.select("o_custkey").distinct().count()
    stats = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("days_since_prev").isNull().cast("long")).alias("null_prev"),
        F.sum(F.col("days_until_next").isNull().cast("long")).alias("null_next"),
        F.sum("days_since_prev").alias("sum_prev"),
        F.sum("days_until_next").alias("sum_next"),
    ).collect()[0]
    assert stats["n"] == orders.count()
    # exactly one edge NULL per customer on each side
    assert stats["null_prev"] == n_customers
    assert stats["null_next"] == n_customers
    # every gap is counted once as since-prev and once as until-next
    assert stats["sum_prev"] == stats["sum_next"]


def test_lag_lead_single_window_exchange(spark, sf_dir):
    """lag and lead share one partitionBy(o_custkey) sort — the plan
    must contain exactly one shuffle exchange."""
    out = queries.all_queries()["lag_lead_order_gaps"](spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_numeric_histogram_partitions_total(spark, sf_dir):
    out = queries.all_queries()["numeric_histogram"](spark, sf_dir).collect()
    orders = queries._t(spark, sf_dir, "orders")
    assert sum(r["n"] for r in out) == orders.count()
    for r in out:
        assert r["bin_lo"] == r["bin_id"] * 25000.0
        assert r["n"] > 0  # empty bins are absent, not zero rows


def test_funnel_stages_monotone_nonincreasing(spark, sf_dir):
    out = queries.all_queries()["funnel_conversion"](spark, sf_dir)
    by_stage = {r["funnel_stage"]: r["n_users"] for r in out.collect()}
    assert set(by_stage) == {"view", "view_click", "view_click_purchase"}
    assert by_stage["view"] >= by_stage["view_click"] >= by_stage["view_click_purchase"]
    assert by_stage["view"] > 0


def test_activity_streaks_consistency(spark, sf_dir):
    out = queries.all_queries()["activity_streaks"](spark, sf_dir)
    ev = queries._events(spark, sf_dir)
    active = (
        ev.select("user_id", F.to_date("ts").alias("d"))
        .distinct()
        .groupBy("user_id")
        .count()
        .collect()
    )
    expect_days = {r["user_id"]: r["count"] for r in active}
    rows = out.collect()
    assert {r["user_id"] for r in rows} == set(expect_days)
    for r in rows:
        # streaks partition the active days; longest is one of them
        assert r["n_active_days"] == expect_days[r["user_id"]]
        assert 1 <= r["longest_streak"] <= r["n_active_days"]
        assert r["n_streaks"] >= 1


def test_iqr_outliers_bounds_and_broadcast(spark, sf_dir):
    df = queries.all_queries()["iqr_outliers"](spark, sf_dir)
    rows = df.collect()
    orders = queries._t(spark, sf_dir, "orders")
    assert sum(r["n"] for r in rows) == orders.count()
    for r in rows:
        assert 0 <= r["n_outliers"] <= r["n"]
        assert r["q1"] <= r["q3"]
    # the tiny quartile table must be broadcast, not shuffled
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
