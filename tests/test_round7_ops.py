"""Round-7 batch invariants: every mirrored Spark/DuckDB formula
recomputed INDEPENDENTLY from the raw parquet in plain Python
(hashlib, math, dict loops — no SQL on either engine), per the
registry's shared-expression-text review checklist."""

from __future__ import annotations

import hashlib
import math
import re

import duckdb

SF_DIR = "/root/testdata/sf0.001"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.strip().lower()) if t != ""]


def _docs(sf_dir: str = SF_DIR):
    return duckdb.sql(
        f"SELECT doc_id, text, source, n_chars FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()


def _ntile(sorted_keys: list, n: int) -> dict:
    """key -> 1-based ntile bucket, SQL semantics (first n%k buckets
    one larger)."""
    total = len(sorted_keys)
    base, extra = divmod(total, n)
    out, i = {}, 0
    for b in range(1, n + 1):
        size = base + (1 if b <= extra else 0)
        for k in sorted_keys[i : i + size]:
            out[k] = b
        i += size
    return out


def xy2d(n: int, x: int, y: int) -> int:
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_python(spark):
    import __spark_entry__ as entry

    rows = entry.queries()["hilbert_layout_audit"](spark, SF_DIR).collect()
    li = duckdb.sql(
        f"SELECT l_partkey % 256, l_suppkey % 256 FROM '{SF_DIR}/lineitem.parquet'"
    ).fetchall()
    agg: dict[int, list] = {}
    for x, y in li:
        d = xy2d(256, x, y)
        b = d // 4096
        cur = agg.setdefault(b, [0, d, d, x, x, y, y])
        cur[0] += 1
        cur[1] = min(cur[1], d); cur[2] = max(cur[2], d)
        cur[3] = min(cur[3], x); cur[4] = max(cur[4], x)
        cur[5] = min(cur[5], y); cur[6] = max(cur[6], y)
    assert {r.bucket for r in rows} == set(agg)
    for r in rows:
        n, dlo, dhi, xlo, xhi, ylo, yhi = agg[r.bucket]
        assert (r.n_rows, r.d_lo, r.d_hi) == (n, dlo, dhi)
        assert (r.x_lo, r.x_hi, r.y_lo, r.y_hi) == (xlo, xhi, ylo, yhi)
        # the locality property the layout key exists for: an aligned
        # 1/16 curve range covers one 64x64 tile
        assert r.x_hi - r.x_lo <= 63 and r.y_hi - r.y_lo <= 63


def test_rendezvous_matches_python(spark):
    import __spark_entry__ as entry

    rows = entry.queries()["rendezvous_shard_assignment"](spark, SF_DIR).collect()
    docs = _docs()
    loads: dict[int, list] = {}
    for doc_id, _text, _src, n_chars in docs:
        best = max(range(8), key=lambda s: (_md5(f"{doc_id}#{s}"), -s))
        cur = loads.setdefault(best, [0, 0])
        cur[0] += 1
        cur[1] += n_chars
    assert {(r.shard_id, r.n_docs, r.total_chars) for r in rows} == {
        (s, v[0], v[1]) for s, v in loads.items()
    }
    # every shard gets work on this corpus, and HRW is roughly balanced
    assert len(rows) == 8


def test_cross_shard_dedup_matches_python(spark):
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.01"  # sf0.001 has no prefix-dup groups
    rows = entry.queries()["cross_shard_dedup_audit"](spark, sf).collect()
    groups: dict[str, list] = {}
    for doc_id, text, _src, _n in _docs(sf):
        sig = _md5(" ".join(_toks(text)[:12]))
        shard = int(_md5(str(doc_id))[:8], 16) % 8
        groups.setdefault(sig, []).append(shard)
    hist: dict[int, list] = {}
    for shards in groups.values():
        if len(shards) > 1:
            cur = hist.setdefault(len(set(shards)), [0, 0])
            cur[0] += 1
            cur[1] += len(shards)
    assert {(r.n_shards_touched, r.n_groups, r.n_dup_docs) for r in rows} == {
        (k, v[0], v[1]) for k, v in hist.items()
    }
    assert rows, "corpus must actually contain prefix-dup groups"


def test_heaps_matches_python(spark):
    import __spark_entry__ as entry

    rows = entry.queries()["heaps_vocab_growth"](spark, SF_DIR).collect()
    docs = _docs()
    bucket = _ntile([d[0] for d in docs], 10)
    first: dict[str, int] = {}
    occ: dict[int, int] = {}
    for doc_id, text, _s, _n in docs:
        for t in _toks(text):
            occ[bucket[doc_id]] = occ.get(bucket[doc_id], 0) + 1
            if t not in first or doc_id < first[t]:
                first[t] = min(first.get(t, doc_id), doc_id)
    newv: dict[int, int] = {}
    for t, fd in first.items():
        newv[bucket[fd]] = newv.get(bucket[fd], 0) + 1
    cum_t = cum_v = 0
    expect = []
    for b in sorted(occ):
        cum_t += occ[b]
        cum_v += newv.get(b, 0)
        expect.append((b, cum_t, cum_v))
    assert [(r.bucket, r.cum_tokens, r.cum_vocab) for r in rows] == expect
    # Heaps: vocabulary grows sublinearly — final vocab < final tokens
    assert rows[-1].cum_vocab < rows[-1].cum_tokens


def test_novelty_matches_python(spark):
    import __spark_entry__ as entry

    rows = entry.queries()["ngram_novelty_decay"](spark, SF_DIR).collect()
    docs = _docs()
    bucket = _ntile([d[0] for d in docs], 20)
    per: dict[int, int] = {}
    firsts: dict[str, int] = {}
    doc_grams: dict[int, set] = {}
    for doc_id, text, _s, _n in docs:
        toks = _toks(text)
        grams = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        } if len(toks) >= 3 else set()
        doc_grams[doc_id] = grams
        per[doc_id] = len(grams)
        for g in grams:
            firsts[g] = min(firsts.get(g, doc_id), doc_id)
    n_new: dict[int, int] = {}
    for g, fd in firsts.items():
        n_new[fd] = n_new.get(fd, 0) + 1
    agg: dict[int, list] = {}
    for doc_id in per:
        b = bucket[doc_id]
        cur = agg.setdefault(b, [0, 0])
        cur[0] += per[doc_id]
        cur[1] += n_new.get(doc_id, 0)
    expect = []
    for b in sorted(agg):
        tot, new = agg[b]
        if tot > 0:
            expect.append((b, tot, new, (2000 * new + tot) // (2 * tot)))
    got = [(r.bucket, r.n_grams, r.n_new, r.novelty_milli) for r in rows]
    assert got == expect
    # novelty decays: the last vigintile is less novel than the first
    assert rows[-1].novelty_milli < rows[0].novelty_milli


def test_charclass_matches_python(spark):
    import __spark_entry__ as entry

    rows = entry.queries()["charclass_profile_by_source"](spark, SF_DIR).collect()
    agg: dict[str, list] = {}
    for _id, text, src, _n in _docs():
        cur = agg.setdefault(src, [0, 0, 0, 0])
        for c in text:
            cur[0] += 1
            if "a" <= c <= "z" or "A" <= c <= "Z":
                cur[1] += 1
            elif "0" <= c <= "9":
                cur[2] += 1
            elif c == " ":
                cur[3] += 1
    for r in rows:
        n, a, dg, sp = agg[r.source]
        assert (r.n_chars, r.n_alpha, r.n_digit, r.n_space) == (n, a, dg, sp)
        assert r.n_other == n - a - dg - sp


def test_target_encode_loo_matches_python(spark):
    import __spark_entry__ as entry

    rows = entry.queries()["target_encode_loo"](spark, SF_DIR).collect()
    nat = dict(
        duckdb.sql(
            f"SELECT c_custkey, c_nationkey FROM '{SF_DIR}/customer.parquet'"
        ).fetchall()
    )
    orders = duckdb.sql(
        f"SELECT o_orderkey, o_custkey, o_orderpriority FROM '{SF_DIR}/orders.parquet'"
    ).fetchall()
    s: dict[int, int] = {}
    n: dict[int, int] = {}
    t_by_order = {}
    for ok, ck, pri in orders:
        nk = nat[ck]
        t = 1 if pri == "1-URGENT" else 0
        t_by_order[ok] = (nk, t)
        s[nk] = s.get(nk, 0) + t
        n[nk] = n.get(nk, 0) + 1
    assert rows, "sample predicate must select some orders"
    for r in rows:
        nk, t = t_by_order[r.o_orderkey]
        assert r.o_orderkey % 101 == 0
        assert (r.nation_key, r.target) == (nk, t)
        loo = (2000 * (s[nk] - t) + (n[nk] - 1)) // (2 * (n[nk] - 1))
        assert r.loo_rate_milli == loo


def test_winsorize_matches_python(spark):
    import __spark_entry__ as entry

    rows = entry.queries()["winsorize_by_group"](spark, SF_DIR).collect()
    nat = dict(
        duckdb.sql(
            f"SELECT c_custkey, c_nationkey FROM '{SF_DIR}/customer.parquet'"
        ).fetchall()
    )
    orders = duckdb.sql(
        f"SELECT o_orderkey, o_custkey, CAST(round(o_totalprice*100) AS BIGINT)"
        f" FROM '{SF_DIR}/orders.parquet'"
    ).fetchall()
    by_nk: dict[int, list] = {}
    for ok, ck, cents in orders:
        by_nk.setdefault(nat[ck], []).append((cents, ok))
    for r in rows:
        vals = sorted(by_nk[r.nation_key])
        nn = len(vals)
        lo = vals[(nn * 5 + 99) // 100 - 1][0]
        hi = vals[(nn * 95 + 99) // 100 - 1][0]
        assert (r.n_orders, r.lo_cents, r.hi_cents) == (nn, lo, hi)
        assert r.raw_sum_cents == sum(v for v, _ in vals)
        assert r.wins_sum_cents == sum(min(max(v, lo), hi) for v, _ in vals)


def test_quantile_bins_match_python(spark):
    import __spark_entry__ as entry

    rows = entry.queries()["quantile_bin_features"](spark, SF_DIR).collect()
    li = duckdb.sql(
        f"SELECT CAST(round(l_extendedprice*100) AS BIGINT), l_orderkey,"
        f" l_linenumber FROM '{SF_DIR}/lineitem.parquet'"
    ).fetchall()
    ordered = sorted(li)
    buckets = _ntile(list(range(len(ordered))), 10)
    agg: dict[int, list] = {}
    for i, (cents, _ok, _ln) in enumerate(ordered):
        b = buckets[i]
        cur = agg.setdefault(b, [0, cents, cents, 0])
        cur[0] += 1
        cur[1] = min(cur[1], cents); cur[2] = max(cur[2], cents)
        cur[3] += cents
    assert [(r.bin, r.n, r.lo_cents, r.hi_cents, r.sum_cents) for r in rows] == [
        (b, *agg[b]) for b in sorted(agg)
    ]


def _transition_edges():
    nat_rows = duckdb.sql(
        f"""SELECT o.o_custkey, o.o_orderkey, o.o_orderdate,
                   min(l.l_suppkey)
            FROM '{SF_DIR}/orders.parquet' o
            JOIN '{SF_DIR}/lineitem.parquet' l
              ON l.l_orderkey = o.o_orderkey
            GROUP BY 1, 2, 3"""
    ).fetchall()
    by_cust: dict[int, list] = {}
    for ck, ok, od, rep in nat_rows:
        by_cust.setdefault(ck, []).append((od, ok, rep))
    canon = set()
    for seq in by_cust.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            if a != b:
                canon.add((min(a, b), max(a, b)))
    return canon


def test_assortativity_matches_python(spark):
    import __spark_entry__ as entry

    (r,) = entry.queries()["graph_degree_assortativity"](spark, SF_DIR).collect()
    canon = _transition_edges()
    e0 = list(canon) + [(b, a) for a, b in canon]
    deg: dict[int, int] = {}
    for a, _b in e0:
        deg[a] = deg.get(a, 0) + 1
    xs = [deg[a] for a, b in e0]
    ys = [deg[b] for a, b in e0]
    m = len(e0)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    assert (r.m_directed_edges, r.sum_deg, r.sum_deg_prod) == (m, sx, sxy)
    rho = (m * sxy - sx * sy) / math.sqrt(
        (m * sxx - sx * sx) * (m * syy - sy * sy)
    )
    assert abs(r.assortativity - rho) < 1e-6
    assert -1.0 <= r.assortativity <= 1.0


def test_zipf_matches_python(spark):
    import __spark_entry__ as entry

    (r,) = entry.queries()["zipf_rank_frequency_fit"](spark, SF_DIR).collect()
    cnt: dict[str, int] = {}
    for _id, text, _s, _n in _docs():
        for t in _toks(text):
            cnt[t] = cnt.get(t, 0) + 1
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
    xs = [math.log(i + 1) for i in range(len(top))]
    ys = [math.log(c) for _t, c in top]
    n = len(top)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    inter = (sy - slope * sx) / n
    assert r.n_ranks == n
    assert abs(r.zipf_slope - slope) < 1e-5
    assert abs(r.zipf_intercept - inter) < 1e-5
    assert r.zipf_slope < 0  # frequencies decay with rank


def test_subsample_ci_matches_python(spark):
    import __spark_entry__ as entry

    (r,) = entry.queries()["subsample_ci_revenue"](spark, SF_DIR).collect()
    days = duckdb.sql(
        f"""SELECT CAST(o_orderdate AS VARCHAR),
                   CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
            FROM '{SF_DIR}/orders.parquet' GROUP BY 1"""
    ).fetchall()
    assert r.n_days == len(days)
    tot = sum(v for _d, v in days)
    assert r.mean_all_milli == (2000 * tot + len(days)) // (2 * len(days))
    means = []
    for b in range(64):
        sel = [v for d, v in days if _md5(f"{d}#{b}")[0] < "8"]
        means.append((2000 * sum(sel) + len(sel)) // (2 * len(sel)))
    means.sort()
    assert r.lo_milli == means[(64 * 5 + 99) // 100 - 1]
    assert r.hi_milli == means[(64 * 95 + 99) // 100 - 1]
    assert r.lo_milli <= r.mean_all_milli <= r.hi_milli
