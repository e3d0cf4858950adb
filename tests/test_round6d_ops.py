"""Round-6 batch 7 invariants: RRF formula identity, chi-square
marginal consistency, seasonal-factor mass balance, OTHER-rollup
revenue conservation, and silhouette's argmin-implied nonnegativity."""

from __future__ import annotations

import math

import duckdb

SF_DIR = "/root/testdata/sf0.001"


def _rows(spark, name):
    import __spark_entry__ as entry

    return entry.queries()[name](spark, SF_DIR).collect()


def test_rrf_formula_and_shape(spark):
    rows = _rows(spark, "hybrid_rrf_search")
    assert len(rows) == 20
    scores = []
    for r in rows:
        want = math.floor(
            (1e6 / (60 + r.r_sem) if r.r_sem is not None else 0.0)
            + (1e6 / (60 + r.r_lex) if r.r_lex is not None else 0.0)
            + 0.5
        )
        assert r.rrf_micro == want
        assert r.r_sem is None or 1 <= r.r_sem <= 50
        assert r.r_lex is None or 1 <= r.r_lex <= 50
        assert r.id != 0  # the query doc never retrieves itself
        scores.append((r.rrf_micro, -r.id))
    assert scores == sorted(scores, reverse=True)


def test_chisq_marginals_consistent(spark):
    rows = _rows(spark, "chisq_independence")
    (n,) = duckdb.sql(
        f"SELECT count(*) FROM '{SF_DIR}/events.parquet'"
    ).fetchone()
    assert sum(r.obs for r in rows) == n
    # recompute expected/chi2 from the cells themselves
    row_tot: dict = {}
    col_tot: dict = {}
    for r in rows:
        row_tot[r.event_type] = row_tot.get(r.event_type, 0) + r.obs
        col_tot[r.daypart] = col_tot.get(r.daypart, 0) + r.obs
    for r in rows:
        exp = row_tot[r.event_type] * col_tot[r.daypart] / n
        assert r.expected_milli == math.floor(1000.0 * exp + 0.5)
        assert r.chi2_milli == math.floor(
            1000.0 * (r.obs - exp) ** 2 / exp + 0.5
        )


def test_seasonal_adjustment_balances(spark):
    rows = _rows(spark, "seasonal_dow_adjustment")
    tot = sum(r.daily_cents for r in rows)
    n = len(rows)
    by_dow: dict = {}
    for r in rows:
        by_dow.setdefault(r.dow, []).append(r)
    for dow, rs in by_dow.items():
        dow_sum = sum(r.daily_cents for r in rs)
        want = math.floor(
            1e6 * (dow_sum * n) / (len(rs) * tot) + 0.5
        )
        assert rs[0].factor_micro == want
        for r in rs:
            assert r.adjusted_cents == math.floor(
                r.daily_cents * 1e6 / r.factor_micro + 0.5
            )
    # factors are a weighted mean of 1: sum(dow_days*factor) ~ n * 1e6
    approx = sum(len(rs) * rs[0].factor_micro for rs in by_dow.values())
    assert abs(approx - n * 1_000_000) <= n  # rounding slack


def test_topn_other_conserves_revenue(spark):
    rows = _rows(spark, "topn_with_other_rollup")
    (want_total,) = duckdb.sql(
        f"""SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            FROM '{SF_DIR}/lineitem.parquet'"""
    ).fetchone()
    assert sum(r.revenue_cp for r in rows) == want_total
    per_nation: dict = {}
    for r in rows:
        per_nation.setdefault(r.nation_key, []).append(r)
    for nk, rs in per_nation.items():
        named = [r for r in rs if r.brand_label != "OTHER"]
        other = [r for r in rs if r.brand_label == "OTHER"]
        assert len(named) <= 3
        assert all(r.n_brands == 1 for r in named)
        if other:
            assert len(other) == 1
            # every named brand beats (or ties) the OTHER bucket's best,
            # which we can't see directly — but named revenues must be
            # the top ranks: each named >= other_bucket_avg is too weak;
            # assert named are sorted above the per-brand OTHER mean.
            other_avg = other[0].revenue_cp / other[0].n_brands
            assert min(r.revenue_cp for r in named) >= other_avg


def test_silhouette_nonnegative_and_bounded(spark):
    rows = _rows(spark, "kmeans_silhouette")
    assert len(rows) == 500
    for r in rows:
        # assignment is argmin over centroids => a <= b => s >= 0
        assert 0 <= r.silhouette_milli <= 1000, r
    mean = sum(r.silhouette_milli for r in rows) / len(rows)
    assert mean > 0  # argmin assignment keeps the centroid-based
    # silhouette nonnegative; the testdata embeddings overlap heavily
    # (mean ≈ 0.04), so no separation is assumed beyond positivity
