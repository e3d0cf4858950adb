"""Round-6 batch 8 invariants: MMR greedy optimality recomputed from
raw cosines, multi-touch credit conservation, funnel monotonicity and
strictness, and Gini recomputation + bounds."""

from __future__ import annotations

import math

import duckdb
import numpy as np

SF_DIR = "/root/testdata/sf0.001"


def _rows(spark, name):
    import __spark_entry__ as entry

    return entry.queries()[name](spark, SF_DIR).collect()


def _embs():
    rows = duckdb.sql(
        f"""SELECT vec_id, CAST(embedding AS DOUBLE[])
            FROM '{SF_DIR}/embeddings.parquet'"""
    ).fetchall()
    return {vid: np.asarray(v) for vid, v in rows}


def test_mmr_matches_numpy_greedy(spark):
    rows = sorted(_rows(spark, "mmr_diversify_rerank"),
                  key=lambda r: r.sel_rank)
    assert [r.sel_rank for r in rows] == [1, 2, 3, 4]
    E = _embs()

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    q = E[0]
    rel = {i: cos(q, v) for i, v in E.items() if i != 0}
    short = sorted(rel, key=lambda i: (-rel[i], i))[:8]
    sel: list[int] = []
    for r in rows:
        if not sel:
            best = min(short, key=lambda i: (-rel[i], i))
            score = 0.7 * rel[best]
        else:
            def sc(i):
                ms = max(cos(E[i], E[j]) for j in sel)
                return 0.7 * rel[i] - 0.3 * ms

            remaining = [i for i in short if i not in sel]
            best = min(remaining, key=lambda i: (-sc(i), i))
            score = sc(best)
        assert r.id == best
        assert abs(r.score_milli - math.floor(1000 * score + 0.5)) <= 1
        sel.append(best)
    assert len(set(sel)) == 4


def test_multitouch_credit_conservation(spark):
    rows = _rows(spark, "multitouch_attribution")
    # every attributed purchase hands out exactly n*(1e6 DIV n) micro
    pairs = duckdb.sql(
        f"""WITH c AS (SELECT event_id cid, user_id, epoch_us(ts) cu
                       FROM '{SF_DIR}/events.parquet'
                       WHERE event_type='click'),
                 p AS (SELECT event_id pid, user_id, epoch_us(ts) pu
                       FROM '{SF_DIR}/events.parquet'
                       WHERE event_type='purchase')
            SELECT pid, count(*) FROM c JOIN p USING (user_id)
            WHERE pu > cu AND pu - cu <= 86400000000 GROUP BY 1"""
    ).fetchall()
    want_total = sum(n * (1_000_000 // n) for _, n in pairs)
    assert sum(r.credit_micro_total for r in rows) == want_total
    want_pairs = sum(n for _, n in pairs)
    assert sum(r.n_purchases for r in rows) == want_pairs
    for r in rows:
        assert 0 < r.credit_micro_total <= r.n_purchases * 1_000_000


def test_funnel_strictly_ordered_and_monotone(spark):
    rows = {r.stage: r.n_users for r in _rows(spark, "sequence_pattern_funnel")}
    assert set(rows) == {"view", "view>click", "view>click>purchase"}
    assert rows["view"] >= rows["view>click"] >= rows["view>click>purchase"]
    # strictness: greedy chain recomputed per user must agree
    ev = duckdb.sql(
        f"""SELECT user_id, event_type, epoch_us(ts)
            FROM '{SF_DIR}/events.parquet'
            WHERE event_type IN ('view','click','purchase')"""
    ).fetchall()
    per_user: dict = {}
    for u, t, us in ev:
        per_user.setdefault(u, []).append((t, us))
    n1 = n2 = n3 = 0
    for evs in per_user.values():
        views = [us for t, us in evs if t == "view"]
        if not views:
            continue
        n1 += 1
        m1 = min(views)
        clicks = [us for t, us in evs if t == "click" and us > m1]
        if not clicks:
            continue
        n2 += 1
        m2 = min(clicks)
        if any(t == "purchase" and us > m2 for t, us in evs):
            n3 += 1
    assert (rows["view"], rows["view>click"],
            rows["view>click>purchase"]) == (n1, n2, n3)


def test_gini_recomputation_and_bounds(spark):
    (row,) = _rows(spark, "revenue_gini")
    xs = sorted(
        v
        for (v,) in duckdb.sql(
            f"""SELECT sum(CAST(round(o_totalprice*100) AS BIGINT))
                FROM '{SF_DIR}/orders.parquet' GROUP BY o_custkey"""
        ).fetchall()
    )
    n, t = len(xs), sum(xs)
    w = sum((i + 1) * x for i, x in enumerate(xs))
    want = math.floor(1e6 * (2.0 * w - (n + 1.0) * t) / (n * float(t)) + 0.5)
    assert row.n_customers == n
    assert row.total_cents == t
    assert row.gini_micro == want
    assert 0 <= row.gini_micro < 1_000_000
