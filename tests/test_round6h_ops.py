"""Round-6 batch 11 invariants: scipy-free recomputation of
skew/kurtosis and the z-test, share-rollup mass balance, and funnel
latency consistency with the stage counts."""

from __future__ import annotations

import math

import duckdb

SF_DIR = "/root/testdata/sf0.001"


def _rows(spark, name):
    import __spark_entry__ as entry

    return entry.queries()[name](spark, SF_DIR).collect()


def test_moments_match_python(spark):
    rows = _rows(spark, "moments_skew_kurtosis")
    data: dict = {}
    for flag, q in duckdb.sql(
        f"""SELECT l_returnflag, CAST(l_quantity AS BIGINT)
            FROM '{SF_DIR}/lineitem.parquet'"""
    ).fetchall():
        data.setdefault(flag, []).append(q)
    for r in rows:
        qs = data[r.l_returnflag]
        n = len(qs)
        mean = sum(qs) / n
        c2 = sum(q * q for q in qs) / n - mean * mean
        c3 = (sum(q**3 for q in qs) / n - 3 * mean * sum(q * q for q in qs) / n
              + 2 * mean**3)
        c4 = (sum(q**4 for q in qs) / n - 4 * mean * sum(q**3 for q in qs) / n
              + 6 * mean * mean * sum(q * q for q in qs) / n - 3 * mean**4)
        assert r.n == n
        assert abs(r.mean_micro - math.floor(1e6 * mean + 0.5)) <= 1
        assert abs(r.skew_micro / 1e6 - c3 / c2**1.5) < 1e-4
        assert abs(r.kurtosis_micro / 1e6 - (c4 / c2**2 - 3)) < 1e-4


def test_ab_test_z_matches_python(spark):
    (r,) = _rows(spark, "ab_test_proportions")
    assert r.n1 > 0 and r.n2 > 0
    if 0 < r.c1 + r.c2 < r.n1 + r.n2:
        p1, p2 = r.c1 / r.n1, r.c2 / r.n2
        p = (r.c1 + r.c2) / (r.n1 + r.n2)
        z = (p1 - p2) / math.sqrt(p * (1 - p) * (1 / r.n1 + 1 / r.n2))
    else:
        z = 0.0
    assert abs(r.z_milli - math.floor(1000 * z + 0.5)) <= 1
    assert r.significant == (1 if abs(r.z_milli) > 1960 else 0)


def test_region_shares_balance(spark):
    rows = _rows(spark, "region_share_rollup")
    total = sum(r.rev_cents for r in rows)
    by_region: dict = {}
    for r in rows:
        by_region.setdefault(r.region, []).append(r)
    for region, rs in by_region.items():
        rc = sum(r.rev_cents for r in rs)
        # nation shares of a region sum to ~1000 (rounding slack ≤ |rs|)
        assert abs(sum(r.share_of_region_milli for r in rs) - 1000) <= len(rs)
        for r in rs:
            assert r.share_of_region_milli == math.floor(
                1000 * r.rev_cents / rc + 0.5
            )
            assert r.region_share_milli == math.floor(1000 * rc / total + 0.5)


def test_funnel_latency_consistent_with_counts(spark):
    legs = {r.leg: r for r in _rows(spark, "funnel_latency_stats")}
    assert set(legs) == {"view>click", "click>purchase"}
    import __spark_entry__ as entry

    counts = {
        r.stage: r.n_users
        for r in entry.queries()["sequence_pattern_funnel"](
            spark, SF_DIR
        ).collect()
    }
    # latency rows cover exactly the fully-converting users
    for leg in legs.values():
        assert leg.n_users == counts["view>click>purchase"]
        assert 0 < leg.min_us <= leg.avg_us <= leg.max_us


def test_referential_integrity_zero_orphans_on_clean_data(spark):
    import __spark_entry__ as entry

    rows = entry.queries()["referential_integrity_audit"](
        spark, SF_DIR
    ).collect()
    assert len(rows) == 5
    (n_li,) = duckdb.sql(
        f"SELECT count(*) FROM '{SF_DIR}/lineitem.parquet'"
    ).fetchone()
    for r in rows:
        assert r.n_orphans == 0, r.fk  # generated star schema is closed
        if r.fk.startswith("lineitem."):
            assert r.n_child == n_li


def test_join_hotspots_are_true_top_fanouts(spark):
    import __spark_entry__ as entry

    rows = entry.queries()["join_multiplicity_hotspots"](
        spark, SF_DIR
    ).collect()
    assert len(rows) == 10
    counts = dict(duckdb.sql(
        f"""SELECT l_partkey, count(*) FROM '{SF_DIR}/lineitem.parquet'
            GROUP BY 1"""
    ).fetchall())
    rcounts = dict(duckdb.sql(
        f"""SELECT l_partkey, count(*) FROM '{SF_DIR}/lineitem.parquet'
            WHERE l_returnflag = 'R' GROUP BY 1"""
    ).fetchall())
    fanouts = sorted(
        ((counts[k] * n, -k) for k, n in rcounts.items()), reverse=True
    )[:10]
    got = [(r.fanout, -r.join_key) for r in rows]
    assert got == fanouts
    for r in rows:
        assert r.fanout == r.n_l * r.n_r
