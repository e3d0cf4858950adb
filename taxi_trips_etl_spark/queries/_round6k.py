# Round-6 batch 14: truncation-duplicate detection (prefix-blocked
# containment — the dup class exact-hash and shingle methods both
# miss when one doc is a cut-off copy of another), and level-3
# a-priori market-basket mining (the engine prunes candidates through
# frequent pairs; the oracle states the naive spec — pruning is
# lossless above threshold, so they agree exactly).
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taxi_trips_etl_spark.queries._registry import _t, register

__all__ = [
    "q_prefix_containment_pairs",
    "q_market_basket_triples",
]

# ---------------------------------------------------------------- #
# prefix_containment_pairs                                          #
# ---------------------------------------------------------------- #
_PREFIX_BLOCK = 40

CONTAINMENT_ORACLE = f"""
WITH t AS (
    SELECT doc_id, trim(lower(text)) AS tx FROM documents
),
pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(strlen(a.tx) AS BIGINT) AS len_a,
           CAST(strlen(b.tx) AS BIGINT) AS len_b,
           a.tx = b.tx AS is_exact
    FROM t a JOIN t b
      ON a.doc_id < b.doc_id
     AND substr(a.tx, 1, {_PREFIX_BLOCK}) = substr(b.tx, 1, {_PREFIX_BLOCK})
     AND (starts_with(a.tx, b.tx) OR starts_with(b.tx, a.tx))
)
SELECT doc_a, doc_b, len_a, len_b,
       CASE WHEN is_exact THEN 'exact' ELSE 'truncation' END AS relation
FROM pairs
"""


@register("prefix_containment_pairs", CONTAINMENT_ORACLE)
def q_prefix_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncation-duplicate detection: doc pairs where one text is a
    PREFIX of the other — the duplicate class that both exact hashing
    (hashes differ) and shingle Jaccard (similarity scales with the
    length ratio) under-detect, yet crawls produce constantly
    (cut-off re-fetches, pagination truncation).

    Scale shape: candidates are blocked on the first {_PREFIX_BLOCK}
    normalized characters — an equi-join, Σ block² — and only
    candidates pay the full-text startswith verify (JVM built-in).
    A containment pair MUST share the block prefix (the shorter text
    is a prefix of the longer, and both are ≥ the block width in this
    corpus), so blocking loses nothing; sub-block-length docs would
    need one extra short-doc pass. For corpora with massive exact
    duplication, collapse exact-dup groups first (record-linkage
    entry's signature-weighting trick) so verify runs on distinct
    texts only."""
    t = _t(spark, sf_dir, "documents").select(
        "doc_id", F.trim(F.lower("text")).alias("tx")
    )
    a = t.selectExpr("doc_id AS doc_a", "tx AS ta")
    b = t.selectExpr("doc_id AS doc_b", "tx AS tb")
    pairs = a.join(
        b,
        (F.col("doc_a") < F.col("doc_b"))
        & (
            F.substring("ta", 1, _PREFIX_BLOCK)
            == F.substring("tb", 1, _PREFIX_BLOCK)
        )
        & (
            F.expr("startswith(ta, tb)") | F.expr("startswith(tb, ta)")
        ),
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        F.octet_length("ta").cast("long").alias("len_a"),
        F.octet_length("tb").cast("long").alias("len_b"),
        F.when(F.col("ta") == F.col("tb"), "exact")
        .otherwise("truncation")
        .alias("relation"),
    )


# ---------------------------------------------------------------- #
# market_basket_triples                                             #
# ---------------------------------------------------------------- #
_TRIPLE_MIN_MILLI = 3

TRIPLES_ORACLE = f"""
WITH baskets AS (
    SELECT DISTINCT l.l_orderkey AS basket, p.p_brand AS brand
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
nb AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets
       FROM baskets),
triples AS (
    SELECT x.brand AS brand_a, y.brand AS brand_b, z.brand AS brand_c,
           CAST(count(*) AS BIGINT) AS triple_cnt
    FROM baskets x
    JOIN baskets y ON x.basket = y.basket AND x.brand < y.brand
    JOIN baskets z ON x.basket = z.basket AND y.brand < z.brand
    GROUP BY 1, 2, 3
)
SELECT brand_a, brand_b, brand_c, triple_cnt,
       CAST(floor(1000.0 * triple_cnt / n_baskets + 0.5) AS BIGINT)
           AS support_milli
FROM triples CROSS JOIN nb
WHERE CAST(floor(1000.0 * triple_cnt / n_baskets + 0.5) AS BIGINT)
      >= {_TRIPLE_MIN_MILLI}
"""


@register("market_basket_triples", TRIPLES_ORACLE)
def q_market_basket_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-3 a-priori: frequent brand TRIPLES at min-support 0.3%.
    The engine runs the textbook levelwise plan — frequent pairs
    first, candidate triples only where (a,b) is frequent and the
    closing pairs (a,c), (b,c) are frequent too, then one counting
    pass — while the ORACLE states the naive all-triples spec.
    A-priori pruning is lossless above threshold (every sub-pair of
    a frequent triple is at least as frequent), so the two agree
    row-for-row; the pruning exists purely to kill candidate volume.

    Scale shape: with an open-vocabulary item domain the candidate
    semi-joins are what keep level 3 feasible — candidates never
    exceed frequent-pair fanout; all joins key on the basket
    (co-partitioned) or on brand pairs (broadcast-size here)."""
    from taxi_trips_etl_spark.dataprep.materialize import materialize

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .select(
            F.col("l_orderkey").alias("basket"),
            F.col("p_brand").alias("brand"),
        )
        .distinct()
        # five self-join sides below (a, b, c plus the freq_pairs pass)
        # — without lineage truncation each side re-runs the broadcast
        # join + distinct (no ReusedExchange across self-joins).
        .transform(materialize, eager=False)
    )
    n_baskets_df = baskets.select(
        F.countDistinct("basket").cast("long").alias("n_baskets")
    )
    # support threshold rides as a 1-row broadcast (dedup.py
    # chunk-dedup pattern) instead of a driver collect — one fewer
    # job, and the plan stays fully declarative.
    min_cnt_expr = (
        "CAST(floor(1000.0 * cnt / n_baskets + 0.5) AS BIGINT)"
        f" >= {_TRIPLE_MIN_MILLI}"
    )
    a = baskets.alias("a")
    b = baskets.alias("b")
    # ONE execution of the basket-pair self-join (r13: the lazy plan
    # used to rebuild a⋈b FOUR times — once under cand and once under
    # each of the three freq_pairs broadcast builds below; guide §2.4).
    # pair_rows is the same volume the groupBy shuffle already carries,
    # so the checkpoint stores nothing the shuffle would not.
    pair_rows = (
        a.join(
            b,
            (F.col("a.basket") == F.col("b.basket"))
            & (F.col("a.brand") < F.col("b.brand")),
        )
        .select(
            F.col("a.basket").alias("basket"),
            F.col("a.brand").alias("ba"),
            F.col("b.brand").alias("bb"),
        )
        .transform(materialize, eager=False)
    )
    # freq_pairs is consumed three times (candidate join + two closing
    # semi-joins), each as a broadcast build side — materialize the
    # tiny post-threshold pair list so each build reads the checkpoint
    # instead of re-running the pair aggregation.
    freq_pairs = (
        pair_rows.groupBy(
            F.col("ba").alias("pa"), F.col("bb").alias("pb")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .crossJoin(F.broadcast(n_baskets_df))
        .where(F.expr(min_cnt_expr))
        .select("pa", "pb")
        .transform(materialize, eager=False)
    )
    c = baskets.alias("c")
    # candidates: extend each frequent (pa, pb) with a third brand
    # from the same basket, then close the triangle through the two
    # remaining frequent-pair semi-joins (classic a-priori level 3)
    cand = (
        pair_rows.alias("p")
        .join(
            F.broadcast(freq_pairs),
            (F.col("ba") == F.col("pa")) & (F.col("bb") == F.col("pb")),
        )
        .join(
            c,
            (F.col("p.basket") == F.col("c.basket"))
            & (F.col("bb") < F.col("c.brand")),
        )
        .select(
            F.col("p.basket").alias("basket"),
            F.col("ba").alias("brand_a"),
            F.col("bb").alias("brand_b"),
            F.col("c.brand").alias("brand_c"),
        )
    )
    fp_bc = freq_pairs.selectExpr("pa AS fb", "pb AS fc")
    fp_ac = freq_pairs.selectExpr("pa AS fa2", "pb AS fc2")
    pruned = cand.join(
        F.broadcast(fp_bc),
        (F.col("brand_b") == F.col("fb")) & (F.col("brand_c") == F.col("fc")),
        "left_semi",
    ).join(
        F.broadcast(fp_ac),
        (F.col("brand_a") == F.col("fa2"))
        & (F.col("brand_c") == F.col("fc2")),
        "left_semi",
    )
    counted = pruned.groupBy("brand_a", "brand_b", "brand_c").agg(
        F.count(F.lit(1)).cast("long").alias("triple_cnt")
    )
    return (
        counted.crossJoin(F.broadcast(n_baskets_df))
        .selectExpr(
            "brand_a",
            "brand_b",
            "brand_c",
            "triple_cnt",
            "CAST(floor(1000.0 * triple_cnt / n_baskets + 0.5) AS BIGINT)"
            " AS support_milli",
        )
        .where(F.col("support_milli") >= _TRIPLE_MIN_MILLI)
    )
