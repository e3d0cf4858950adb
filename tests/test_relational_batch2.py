"""Semantics tests for the per-group-top-k / time-window / latest-by-key
/ calendar batch (queries.py additions; oracle-verified for values,
these pin the *shape* guarantees the oracles can't see)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from taxi_trips_etl_spark import queries


def test_topk_per_group_at_most_3_per_nation(spark, sf_dir):
    out = queries.all_queries()["topk_per_group"](spark, sf_dir)
    per_group = out.groupBy("nation_key").count().collect()
    assert per_group and all(r["count"] <= 3 for r in per_group)
    # ranks are dense 1..n within each group
    ranks = {
        (r["nation_key"], r["part_rank"]) for r in out.collect()
    }
    for nation, _ in ranks:
        group = sorted(rk for n, rk in ranks if n == nation)
        assert group == list(range(1, len(group) + 1))


def test_hopping_each_event_in_exactly_two_windows(spark, sf_dir):
    ev = queries._events(spark, sf_dir)
    n_events = ev.count()
    win = F.window("ts", "1 hour", "30 minutes")
    exploded = ev.select(win.alias("w")).count()
    assert exploded == 2 * n_events


def test_latest_by_key_equals_window_idiom(spark, sf_dir):
    out = queries.all_queries()["latest_by_key"](spark, sf_dir)
    ev = queries._events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    expect = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        )
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, expect.collect())
    )


def test_latest_by_key_is_single_aggregate_no_sort(spark, sf_dir):
    """The max_by form must plan as hash-aggregate — no window Sort over
    the full event set (that is the whole point at 100 TB)."""
    out = queries.all_queries()["latest_by_key"](spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "max_by" in plan
    assert "Window" not in plan


def test_grouping_sets_covers_all_four_sets(spark, sf_dir):
    out = queries.all_queries()["grouping_sets_agg"](spark, sf_dir)
    rows = out.collect()
    gids = {r["gid"] for r in rows}
    assert gids == {0, 1, 2, 3}
    grand = [r for r in rows if r["gid"] == 3]
    assert len(grand) == 1 and grand[0]["priority"] == "ALL"
    assert grand[0]["n_orders"] == sum(
        r["n_orders"] for r in rows if r["gid"] == 0
    )


def test_correlated_subquery_decorrelates_to_join(spark, sf_dir):
    """Catalyst must rewrite the correlated scalar subquery into an
    aggregate + join — a per-row re-scan would never survive scale."""
    out = queries.all_queries()["correlated_scalar_subquery"](spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" in plan
    assert "ScalarSubquery" not in plan


def test_recursive_spine_is_12_consecutive_months(spark, sf_dir):
    rows = queries.all_queries()["recursive_cte_date_spine"](spark, sf_dir)
    months = sorted(r["month_start"] for r in rows.collect())
    assert len(months) == 12
    assert all(m.endswith("-01") for m in months)
    ys, ms = int(months[0][:4]), int(months[0][5:7])
    expect = [
        f"{ys + (ms - 1 + i) // 12:04d}-{(ms - 1 + i) % 12 + 1:02d}-01"
        for i in range(12)
    ]
    assert months == expect


def test_udtf_splits_multi_sentence_text(spark, sf_dir):
    """The shared table is single-sentence; pin the actual row-expanding
    behavior (split on .!? , strip, drop empties, 0-based index) on a
    fixture."""
    # registering the UDTF happens inside the query builder
    queries.all_queries()["udtf_split_sentences"](spark, sf_dir)
    fixture = spark.createDataFrame(
        [(1, "One. Two!  Three? "), (2, "..."), (3, None), (4, "solo")],
        "doc_id long, text string",
    )
    fixture.createOrReplaceTempView("v_udtf_fixture")
    rows = spark.sql(
        "SELECT doc_id, s.sent_idx, s.sentence "
        "FROM v_udtf_fixture, LATERAL split_sentences(text) s"
    ).collect()
    got = sorted((r.doc_id, r.sent_idx, r.sentence) for r in rows)
    assert got == [
        (1, 0, "One"),
        (1, 1, "Two"),
        (1, 2, "Three"),
        (4, 0, "solo"),
    ]


def test_array_functions_shape(spark, sf_dir):
    rows = queries.all_queries()["array_functions"](spark, sf_dir).collect()
    assert rows
    for r in rows[:50]:
        assert 0 <= r["n_pos"] <= 64
        assert 1 <= r["argmax_pos"] <= 64
        assert r["max_elem"] >= r["elem_sum"] / 64


def test_date_functions_month_edges(spark, sf_dir):
    rows = queries.all_queries()["date_functions"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["month_start"].endswith("-01")
        assert r["month_end"] >= r["month_start"]
        assert r["next_month_start"] > r["month_end"]
        assert 1 <= r["qtr"] <= 4
        assert 1 <= r["n_weekdays"] <= 7
