"""Round-6 batch 19 invariants: KS and Mann-Whitney recomputed from
raw samples in plain Python (and, for MW, against the closed-form
rank identities)."""

from __future__ import annotations

import math

import duckdb

SF_DIR = "/root/testdata/sf0.001"


def _samples():
    rows = duckdb.sql(
        f"""SELECT user_id % 2, CAST(round(value * 100) AS BIGINT)
            FROM '{SF_DIR}/events.parquet'"""
    ).fetchall()
    s1 = sorted(v for a, v in rows if a == 0)
    s2 = sorted(v for a, v in rows if a == 1)
    return s1, s2


def test_ks_matches_python(spark):
    import __spark_entry__ as entry

    (r,) = entry.queries()["ks_drift_test"](spark, SF_DIR).collect()
    s1, s2 = _samples()
    n1, n2 = len(s1), len(s2)
    assert (r.n1, r.n2) == (n1, n2)
    values = sorted(set(s1) | set(s2))
    import bisect

    best = (-1, None)
    for v in values:
        c1 = bisect.bisect_right(s1, v)
        c2 = bisect.bisect_right(s2, v)
        gap = abs(c1 * n2 - c2 * n1)
        if gap > best[0]:
            best = (gap, v)
    assert r.d_num == best[0]
    assert r.at_cents == best[1]
    assert r.ks_milli == math.floor(
        1000.0 * best[0] / (float(n1) * n2) + 0.5
    )


def test_mannwhitney_matches_python(spark):
    import __spark_entry__ as entry

    (r,) = entry.queries()["mannwhitney_u_test"](spark, SF_DIR).collect()
    s1, s2 = _samples()
    n1, n2 = len(s1), len(s2)
    merged = sorted((v, 0) for v in s1) + sorted((v, 1) for v in s2)
    merged.sort(key=lambda t: t[0])
    # doubled tie-averaged ranks
    r1_doubled = 0
    tie3 = 0
    i = 0
    while i < len(merged):
        j = i
        while j < len(merged) and merged[j][0] == merged[i][0]:
            j += 1
        t = j - i
        doubled = (i + 1) + j  # start + end, 1-based
        r1_doubled += doubled * sum(1 for k in range(i, j)
                                    if merged[k][1] == 0)
        tie3 += t**3 - t
        i = j
    u1_doubled = 2 * n1 * n2 + n1 * (n1 + 1) - r1_doubled
    assert r.u1_doubled == u1_doubled
    assert r.u2_doubled == 2 * n1 * n2 - u1_doubled
    n = n1 + n2
    var = n1 * n2 / 12.0 * ((n + 1.0) - tie3 / (float(n) * (n - 1.0)))
    z = (u1_doubled / 2.0 - n1 * n2 / 2.0) / math.sqrt(var)
    assert abs(r.z_milli - math.floor(1000.0 * z + 0.5)) <= 1
    # identity: U1 + U2 = n1*n2 (doubled: sums to 2*n1*n2)
    assert r.u1_doubled + r.u2_doubled == 2 * n1 * n2
