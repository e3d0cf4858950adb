"""Round-6 batch 14 invariants: containment semantics recomputed from
raw text, and a-priori pruning losslessness (engine's pruned plan ==
naive triple enumeration)."""

from __future__ import annotations

import math

import duckdb

SF_DIR = "/root/testdata/sf0.001"


def _rows(spark, name):
    import __spark_entry__ as entry

    return entry.queries()[name](spark, SF_DIR).collect()


def test_containment_pairs_match_python(spark):
    rows = _rows(spark, "prefix_containment_pairs")
    docs = dict(
        duckdb.sql(
            f"SELECT doc_id, trim(lower(text)) FROM"
            f" '{SF_DIR}/documents.parquet'"
        ).fetchall()
    )
    want = set()
    ids = sorted(docs)
    by_prefix: dict = {}
    for i in ids:
        by_prefix.setdefault(docs[i][:40], []).append(i)
    for group in by_prefix.values():
        for x in range(len(group)):
            for y in range(x + 1, len(group)):
                a, b = group[x], group[y]
                ta, tb = docs[a], docs[b]
                if ta.startswith(tb) or tb.startswith(ta):
                    rel = "exact" if ta == tb else "truncation"
                    want.add((a, b, len(ta), len(tb), rel))
    got = {
        (r.doc_a, r.doc_b, r.len_a, r.len_b, r.relation) for r in rows
    }
    assert got == want
    assert want, "corpus must contain planted containment dups"
    assert any(r.relation == "truncation" for r in rows)


def test_triples_apriori_pruning_is_lossless(spark):
    rows = _rows(spark, "market_basket_triples")
    naive = duckdb.sql(
        f"""WITH b AS (
              SELECT DISTINCT l.l_orderkey bk, p.p_brand br
              FROM '{SF_DIR}/lineitem.parquet' l
              JOIN '{SF_DIR}/part.parquet' p ON l.l_partkey = p.p_partkey),
            nb AS (SELECT count(DISTINCT bk) n FROM b)
            SELECT x.br, y.br, z.br, count(*) c
            FROM b x JOIN b y ON x.bk = y.bk AND x.br < y.br
            JOIN b z ON x.bk = z.bk AND y.br < z.br
            GROUP BY 1, 2, 3"""
    ).fetchall()
    (n_baskets,) = duckdb.sql(
        f"""SELECT count(DISTINCT l_orderkey)
            FROM '{SF_DIR}/lineitem.parquet'"""
    ).fetchone()
    want = {
        (a, b, c, cnt)
        for a, b, c, cnt in naive
        if math.floor(1000 * cnt / n_baskets + 0.5) >= 3
    }
    got = {(r.brand_a, r.brand_b, r.brand_c, r.triple_cnt) for r in rows}
    assert got == want
    assert want
    for r in rows:
        assert r.brand_a < r.brand_b < r.brand_c
        assert r.support_milli == math.floor(
            1000 * r.triple_cnt / n_baskets + 0.5
        )
