"""Round-6 batch 9 invariants: phrase-hit recomputation from raw
text, table-diff bucket detection completeness, autocomplete
consistency with raw counts."""

from __future__ import annotations

import re

import duckdb

SF_DIR = "/root/testdata/sf0.001"


def _rows(spark, name):
    import __spark_entry__ as entry

    return entry.queries()[name](spark, SF_DIR).collect()


def test_phrase_hits_match_python_scan(spark):
    rows = {r.doc_id: (r.n_matches, r.first_pos)
            for r in _rows(spark, "phrase_search_positional")}
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    want = {}
    for doc_id, text in docs:
        toks = re.split(r"\s+", text.strip().lower())
        hits = [i + 1 for i in range(len(toks) - 1)
                if toks[i] == "the" and toks[i + 1] == "table"]
        if hits:
            want[doc_id] = (len(hits), hits[0])
    assert rows == want
    assert want, "phrase must occur in the corpus for a meaningful test"


def test_table_diff_flags_exactly_touched_buckets(spark):
    rows = {r.bucket: r for r in _rows(spark, "table_diff_checksums")}
    keys = [k for (k,) in duckdb.sql(
        f"SELECT o_orderkey FROM '{SF_DIR}/orders.parquet'"
    ).fetchall()]
    touched = {k % 64 for k in keys if k % 1000 in (7, 13)}
    for bucket, r in rows.items():
        assert r.differs == (1 if bucket in touched else 0), bucket
        deleted = sum(1 for k in keys if k % 64 == bucket and k % 1000 == 13)
        assert r.n_a - r.n_b == deleted
    # an update with unchanged count must still be caught (hash, not n)
    update_only = {k % 64 for k in keys if k % 1000 == 7} - {
        k % 64 for k in keys if k % 1000 == 13
    }
    for b in update_only:
        assert rows[b].n_a == rows[b].n_b and rows[b].differs == 1


def test_autocomplete_agrees_with_raw_counts(spark):
    rows = _rows(spark, "autocomplete_prefixes")
    counts: dict = {}
    for (tok, cnt) in duckdb.sql(
        f"""SELECT tok, count(*) FROM (
              SELECT unnest(string_split_regex(trim(lower(text)), '\\s+'))
                  AS tok FROM '{SF_DIR}/documents.parquet')
            WHERE len(tok) >= 3 GROUP BY 1"""
    ).fetchall():
        counts[tok] = cnt
    seen = set()
    for r in rows:
        assert len(r.prefix) == r.prefix_len
        assert r.top_token.startswith(r.prefix)
        assert counts[r.top_token] == r.token_count
        group = {t: c for t, c in counts.items()
                 if len(t) >= r.prefix_len
                 and t[: r.prefix_len] == r.prefix}
        best = min(group, key=lambda t: (-group[t], t))
        assert r.top_token == best
        assert r.prefix_total == sum(group.values())
        seen.add((r.prefix_len, r.prefix))
    # every realizable prefix appears exactly once
    want = {(p, t[:p]) for t in counts for p in (3, 4) if len(t) >= p}
    assert seen == want


def test_arrow_token_stats_pure_arrow_kernel(spark):
    """The mapInArrow kernel must agree with the JVM expression twin
    and carry the declared schema."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    df = entry.queries()["arrow_token_stats"](spark, SF_DIR)
    assert dict(df.dtypes) == {
        "doc_id": "bigint", "n_tokens": "bigint", "n_bytes": "bigint",
    }
    got = {r.doc_id: (r.n_tokens, r.n_bytes) for r in df.collect()}
    from taxi_trips_etl_spark.queries._registry import _t

    jvm = (
        _t(spark, SF_DIR, "documents")
        .where(F.trim("text") != "")
        .select(
            "doc_id",
            F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("t"),
            F.octet_length(F.trim("text")).cast("long").alias("b"),
        )
    )
    want = {r.doc_id: (r.t, r.b) for r in jvm.collect()}
    assert got == want
