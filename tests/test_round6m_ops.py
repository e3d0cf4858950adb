"""Round-6 batch 16 invariants: numpy corr agreement, LTV cumulative
consistency + total conservation, Fano recomputation."""

from __future__ import annotations

import math

import duckdb
import numpy as np

SF_DIR = "/root/testdata/sf0.001"


def _rows(spark, name):
    import __spark_entry__ as entry

    return entry.queries()[name](spark, SF_DIR).collect()


def test_corr_by_brand_matches_numpy(spark):
    rows = _rows(spark, "discount_quantity_corr_by_brand")
    data = duckdb.sql(
        f"""SELECT p.p_brand, CAST(round(l.l_discount*100) AS BIGINT),
                   CAST(l.l_quantity AS BIGINT)
            FROM '{SF_DIR}/lineitem.parquet' l
            JOIN '{SF_DIR}/part.parquet' p ON l.l_partkey = p.p_partkey"""
    ).fetchall()
    per: dict = {}
    for b, x, y in data:
        per.setdefault(b, []).append((x, y))
    assert len(rows) == len(per)
    for r in rows:
        xs, ys = zip(*per[r.p_brand])
        assert r.n == len(xs)
        want = float(np.corrcoef(xs, ys)[0, 1])
        assert abs(r.corr_micro / 1e6 - want) < 1e-4, r.p_brand


def test_cohort_ltv_cumulative_and_total(spark):
    rows = _rows(spark, "cohort_ltv_curve")
    per: dict = {}
    for r in rows:
        per.setdefault(r.cohort_m, []).append(r)
    for cohort, rs in per.items():
        rs.sort(key=lambda r: r.age_months)
        assert rs[0].age_months == 0  # cohort month is the first order
        cum = 0
        for r in rs:
            cum += r.rev_cents
            assert r.cum_rev_cents == cum
    (want_total,) = duckdb.sql(
        f"""SELECT sum(CAST(round(o_totalprice*100) AS BIGINT))
            FROM '{SF_DIR}/orders.parquet'"""
    ).fetchone()
    assert sum(r.rev_cents for r in rows) == want_total


def test_burstiness_matches_python(spark):
    rows = _rows(spark, "interarrival_burstiness")
    ev = duckdb.sql(
        f"""SELECT user_id, event_type, epoch_us(ts) // 1000000, event_id
            FROM '{SF_DIR}/events.parquet'
            ORDER BY user_id, event_type, 3, event_id"""
    ).fetchall()
    gaps: dict = {}
    prev: dict = {}
    for u, t, s, _ in ev:
        key = (u, t)
        if key in prev:
            gaps.setdefault(t, []).append(s - prev[key])
        prev[key] = s
    for r in rows:
        gs = gaps[r.event_type]
        n, sg = len(gs), sum(gs)
        sgg = sum(g * g for g in gs)
        assert r.n == n
        assert r.mean_gap_s == sg // n
        want = math.floor(1000.0 * ((n * sgg - sg * sg) / (n * sg)) + 0.5)
        assert abs(r.fano_milli - want) <= 1
        assert r.fano_milli > 0


def test_hhi_bounds_and_recomputation(spark):
    import __spark_entry__ as entry

    rows = entry.queries()["hhi_market_concentration"](
        spark, SF_DIR
    ).collect()
    rev = duckdb.sql(
        f"""SELECT s.s_nationkey, p.p_brand,
                   CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT))
                        AS BIGINT)
            FROM '{SF_DIR}/lineitem.parquet' l
            JOIN '{SF_DIR}/supplier.parquet' s ON l.l_suppkey = s.s_suppkey
            JOIN '{SF_DIR}/part.parquet' p ON l.l_partkey = p.p_partkey
            GROUP BY 1, 2"""
    ).fetchall()
    per: dict = {}
    for nk, _, c in rev:
        per.setdefault(nk, []).append(c)
    for r in rows:
        cs = per[r.nation_key]
        total = sum(cs)
        assert r.total_cents == total
        millis = [math.floor(1000.0 * c / total + 0.5) for c in cs]
        want = math.floor(sum(m * m for m in millis) / 100.0 + 0.5)
        assert r.hhi_bp == want
        # bounds: ~10000/n (equal shares) <= HHI <= 10000 (+milli slack)
        assert 10000 // r.n_brands - 10 <= r.hhi_bp <= 10010


def test_partition_skew_stats_consistent(spark):
    import __spark_entry__ as entry

    (r,) = entry.queries()["partition_skew_stats"](spark, SF_DIR).collect()
    (n_orders,) = duckdb.sql(
        f"SELECT count(*) FROM '{SF_DIR}/orders.parquet'"
    ).fetchone()
    assert r.total_rows == n_orders
    assert r.min_rows <= r.mean_rows <= r.max_rows
    assert 1 <= r.n_buckets <= 32
    # md5 spreads a sequential key well: CV under 50% at any sf
    assert 0 <= r.cv_milli < 500


def test_rapid_reorder_matches_python(spark):
    import __spark_entry__ as entry

    rows = entry.queries()["rapid_reorder_audit"](spark, SF_DIR).collect()
    orders = duckdb.sql(
        f"""SELECT o_custkey, o_orderkey,
                   CAST(o_orderdate AS DATE) FROM '{SF_DIR}/orders.parquet'"""
    ).fetchall()
    per: dict = {}
    for ck, ok, d in orders:
        per.setdefault(ck, []).append(d.toordinal())
    want: dict = {}
    for ck, ds in per.items():
        gaps = [
            abs(a - b)
            for i, a in enumerate(ds)
            for b in ds[i + 1:]
            if abs(a - b) <= 7
        ]
        if gaps:
            want[ck] = (len(gaps), min(gaps))
    got = {r.custkey: (r.n_rapid_pairs, r.min_gap_days) for r in rows}
    assert got == want
    assert want


def test_abc_classes_partition_and_order(spark):
    import __spark_entry__ as entry

    rows = {r.abc_class: r for r in entry.queries()[
        "inventory_abc_classification"](spark, SF_DIR).collect()}
    assert set(rows) == {"A", "B", "C"}
    (n_parts, total) = duckdb.sql(
        f"""SELECT count(DISTINCT l_partkey),
                   sum(CAST(round(l_extendedprice*100) AS BIGINT))
            FROM '{SF_DIR}/lineitem.parquet'"""
    ).fetchone()
    assert sum(r.n_parts for r in rows.values()) == n_parts
    assert sum(r.rev_cents for r in rows.values()) == total
    # A ends at the 80% cumulative-share boundary (within 1 part's mass)
    assert rows["A"].rev_cents >= 0.75 * total
    assert rows["A"].rev_cents <= 0.801 * total + rows["A"].rev_cents / max(
        rows["A"].n_parts, 1
    )
    # classes hold descending revenue ranks => averages decrease
    # (this synthetic corpus is near-uniform, so A holds ~80% of the
    # PARTS too — no Pareto-shape assumption belongs here)
    avg = {k: r.rev_cents / r.n_parts for k, r in rows.items()}
    assert avg["A"] > avg["B"] > avg["C"]
