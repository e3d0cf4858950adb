"""Round-6 batch 13 invariants: Holt recursion recomputed in Python,
Theil-Sen vs numpy median-of-slopes, and streak recomputation from
the raw daily series."""

from __future__ import annotations

import math

import duckdb

SF_DIR = "/root/testdata/sf0.001"


def _rows(spark, name):
    import __spark_entry__ as entry

    return entry.queries()[name](spark, SF_DIR).collect()


def _daily():
    return duckdb.sql(
        f"""SELECT strftime(ts, '%Y-%m-%d') AS day,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
            FROM '{SF_DIR}/events.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()


def test_holt_matches_sequential_python(spark):
    rows = sorted(_rows(spark, "holt_linear_smoothing"),
                  key=lambda r: r.day)
    daily = _daily()
    xs = [float(v) for _, v in daily]
    assert len(rows) == len(xs) >= 2
    l, b = xs[0], xs[1] - xs[0]
    for i, (r, (day, _)) in enumerate(zip(rows, daily)):
        if i > 0:
            x = xs[i]
            l_new = 0.5 * x + 0.5 * (l + b)
            b = 0.25 * (0.5 * x + 0.5 * (l + b) - l) + 0.75 * b
            l = l_new
        assert r.day == day
        assert r.level_micro == math.floor(1e6 * l + 0.5)
        assert r.trend_micro == math.floor(1e6 * b + 0.5)
        assert r.forecast7_micro == math.floor(1e6 * (l + 7.0 * b) + 0.5)


def test_theil_sen_is_lower_median_of_slopes(spark):
    (r,) = _rows(spark, "theil_sen_slope")
    xs = [float(v) for _, v in _daily()]
    n = len(xs)
    slopes = sorted(
        ((xs[j] - xs[i]) / (j - i), i, j)
        for i in range(n)
        for j in range(i + 1, n)
    )
    assert r.n_pairs == len(slopes)
    want = slopes[math.ceil(len(slopes) / 2) - 1][0]
    assert r.slope_micro_per_day == math.floor(1e6 * want + 0.5)


def test_streaks_match_python_scan(spark):
    rows = _rows(spark, "longest_increase_streaks")
    daily = _daily()
    xs = [v for _, v in daily]
    days = [d for d, _ in daily]
    streaks = []
    start = None
    run = 0
    for i in range(1, len(xs)):
        if xs[i] > xs[i - 1]:
            if run == 0:
                start = days[i]
            run += 1
        else:
            if run:
                streaks.append((start, days[i - 1], run))
            run = 0
    if run:
        streaks.append((start, days[-1], run))
    want = sorted(streaks, key=lambda s: (-s[2], s[0]))[:3]
    got = [(r.start_day, r.end_day, r.len_days) for r in rows]
    assert got == want
