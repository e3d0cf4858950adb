"""Round-6 batch 15 invariants: segmented-OLS RSS recomputed via
numpy per candidate split, Lorenz monotonicity/convexity + Gini
consistency, and Simpson sign recomputation."""

from __future__ import annotations

import math

import duckdb
import numpy as np

SF_DIR = "/root/testdata/sf0.001"


def _rows(spark, name):
    import __spark_entry__ as entry

    return entry.queries()[name](spark, SF_DIR).collect()


def _daily():
    return duckdb.sql(
        f"""SELECT strftime(ts, '%Y-%m-%d'),
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
            FROM '{SF_DIR}/events.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()


def test_changepoint_best_splits_match_numpy(spark):
    rows = _rows(spark, "changepoint_segmented_ols")
    ys = np.array([float(v) for _, v in _daily()])
    days = [d for d, _ in _daily()]
    n = len(ys)
    xs = np.arange(1, n + 1, dtype=np.float64)

    def rss(x, y):
        if len(x) <= 1:
            return 0.0
        A = np.column_stack([np.ones_like(x), x])
        beta, *_ = np.linalg.lstsq(A, y, rcond=None)
        r = y - A @ beta
        return float(r @ r)

    scored = sorted(
        (
            round((rss(xs[:i], ys[:i]) + rss(xs[i:], ys[i:])) / 1e6),
            days[i - 1],
        )
        for i in range(2, n - 1)
    )[:3]
    got = [(r.rss_total_kcents2, r.split_day) for r in rows]
    for (g_r, g_d), (w_r, w_d) in zip(got, scored):
        assert g_d == w_d
        assert abs(g_r - w_r) <= 2  # numpy lstsq vs exact-sum algebra


def test_lorenz_monotone_convex_and_ends_at_1(spark):
    rows = sorted(_rows(spark, "lorenz_curve_points"),
                  key=lambda r: r.pop_decile)
    shares = [r.cum_share_milli for r in rows]
    assert rows[-1].pop_decile == 10 and shares[-1] == 1000
    assert all(a <= b for a, b in zip(shares, shares[1:]))
    # convexity: increments non-decreasing (allow 1 milli rounding)
    incs = [b - a for a, b in zip([0] + shares, shares)]
    assert all(b >= a - 1 for a, b in zip(incs, incs[1:]))
    # consistency with the Gini entry: G ≈ 1 - 2 * AUC(trapezoid)
    import __spark_entry__ as entry

    (g,) = entry.queries()["revenue_gini"](spark, SF_DIR).collect()
    xs = [i / 10 for i in range(11)]
    ys = [0.0] + [s / 1000 for s in shares]
    auc = sum(
        (xs[i + 1] - xs[i]) * (ys[i] + ys[i + 1]) / 2 for i in range(10)
    )
    assert abs(g.gini_micro / 1e6 - (1 - 2 * auc)) < 0.05


def test_simpson_signs_match_python(spark):
    rows = _rows(spark, "simpson_paradox_audit")
    daily = duckdb.sql(
        f"""SELECT event_type,
                   date_diff('day', DATE '1970-01-01',
                       CAST(strftime(ts, '%Y-%m-%d') AS DATE)),
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
            FROM '{SF_DIR}/events.parquet' GROUP BY 1, 2"""
    ).fetchall()

    def slope_sign(pts):
        n = len(pts)
        sx = sum(d for d, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(d * y for d, y in pts)
        v = n * sxy - sx * sy
        return (v > 0) - (v < 0)

    per: dict = {}
    pooled: dict = {}
    for t, d, y in daily:
        per.setdefault(t, []).append((d, y))
        pooled[d] = pooled.get(d, 0) + y
    want_pooled = slope_sign(list(pooled.items()))
    for r in rows:
        want_g = slope_sign(per[r.event_type])
        assert r.group_trend == want_g
        assert r.pooled_trend == want_pooled
        assert r.sign_flip == (1 if want_g * want_pooled < 0 else 0)
