# Round-6 batch 5: SemDeDup semantic pruning, DPO preference-pair
# mining, bucketed co-located join (the zero-shuffle fact-fact join as
# an oracle-checked registry entry, not just a pytest). Every entry
# oracle-bearing from birth.
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from taxi_trips_etl_spark.queries._registry import TOKS_SQL, _t, register
from taxi_trips_etl_spark.queries._mm_streaming import _km_assign, _km_update

_EN_STOP_SQL = "('the', 'a', 'of', 'and', 'is', 'to')"

# Within-cluster cosine on the kmeans-final assignment, replaying the
# SAME deterministic 3-iteration Lloyd trajectory as KMEANS_ORACLE_SQL
# (queries/_mm_streaming.py). MATERIALIZED on every stage: DuckDB
# inlines CTEs per reference, and this chain is consumed twice by the
# pair join — without it the recursive re-evaluation is exponential.
SEMDEDUP_ORACLE_SQL = f"""
WITH vecs AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
c0 AS MATERIALIZED (
  SELECT (row_number() OVER (ORDER BY vec_id)) - 1 AS cluster_id, v AS c
  FROM (SELECT vec_id, v FROM vecs ORDER BY vec_id LIMIT 8)
),
a1 AS MATERIALIZED ({_km_assign('c0')}),
c1 AS MATERIALIZED ({_km_update('a1', 'c0')}),
a2 AS MATERIALIZED ({_km_assign('c1')}),
c2 AS MATERIALIZED ({_km_update('a2', 'c1')}),
a3 AS MATERIALIZED ({_km_assign('c2')}),
c3 AS MATERIALIZED ({_km_update('a3', 'c2')}),
afinal AS MATERIALIZED ({_km_assign('c3')}),
assigned AS MATERIALIZED (
  SELECT a.vec_id, a.cluster_id, vecs.v
  FROM afinal a JOIN vecs USING (vec_id)
),
pairs AS (
  SELECT b.vec_id, b.cluster_id, a.vec_id AS keeper_id,
         CAST(floor(
             1000.0 * list_sum(list_transform(
                 generate_series(1, len(a.v)), i -> a.v[i] * b.v[i]))
             / (sqrt(list_sum(list_transform(
                    generate_series(1, len(a.v)), i -> a.v[i] * a.v[i])))
                * sqrt(list_sum(list_transform(
                    generate_series(1, len(b.v)), i -> b.v[i] * b.v[i]))))
             + 0.5) AS BIGINT) AS cos_milli
  FROM assigned a JOIN assigned b
    ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
)
SELECT vec_id, CAST(cluster_id AS BIGINT) AS cluster_id, keeper_id,
       cos_milli
FROM (SELECT vec_id, cluster_id, keeper_id, cos_milli,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY keeper_id) AS rn
      FROM pairs WHERE cos_milli >= 350)
WHERE rn = 1
"""


@register("semdedup_prune", SEMDEDUP_ORACLE_SQL)
def q_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means shards the corpus, and
    only cluster-mates are cosine-compared — a vector with a lower-id
    mate at or over threshold is pruned, keeping the smallest such
    mate as its representative. The paper's production threshold is
    ~0.95; the registered entry runs 0.350 because the synthetic
    embeddings table's MAX pairwise cosine is ~0.51 (no true near-dups
    by construction) and a 0-row pin would be vacuous. The oracle
    replays the identical deterministic Lloyd trajectory (shared with
    embedding_kmeans) and the within-cluster pair scan in SQL; the
    integer cos_milli threshold keeps both engines on the same in/out
    decision."""
    from taxi_trips_etl_spark.dataprep.similarity import semdedup_prune

    return semdedup_prune(
        _t(spark, sf_dir, "embeddings"), k=8, iterations=3,
        threshold_milli=350,
    )


@register(
    "dpo_preference_pairs",
    f"""
    WITH q AS (
        SELECT d.doc_id, d.source, d.lang,
               round(least(1.0, len({TOKS_SQL}) / 50.0) * 0.4
                     + round(CAST(length(regexp_replace(text, '[^a-zA-Z]',
                                                        '', 'g')) AS DOUBLE)
                             / length(text), 4) * 0.4
                     + least(1.0,
                             round(CAST(len(list_filter({TOKS_SQL},
                                           w -> w IN {_EN_STOP_SQL}))
                                        AS DOUBLE) / len({TOKS_SQL}), 4)
                             * 5) * 0.2, 4) AS q
        FROM documents d
    ),
    ranked AS (
        SELECT source, lang, doc_id, q,
               row_number() OVER (PARTITION BY source, lang
                                  ORDER BY q DESC, doc_id) AS rk_best,
               row_number() OVER (PARTITION BY source, lang
                                  ORDER BY q ASC, doc_id) AS rk_worst,
               count(*) OVER (PARTITION BY source, lang) AS n_group
        FROM q
    )
    SELECT b.source, b.lang,
           b.doc_id AS chosen_id, w.doc_id AS rejected_id,
           round(b.q - w.q, 4) AS margin,
           CAST(b.n_group AS BIGINT) AS n_group
    FROM (SELECT * FROM ranked WHERE rk_best = 1) b
    JOIN (SELECT * FROM ranked WHERE rk_worst = 1) w
      USING (source, lang)
    WHERE b.doc_id != w.doc_id AND round(b.q - w.q, 4) >= 0.05
    """,
)
def q_dpo_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO/RLHF preference-pair mining: within each (source, lang)
    prompt group, the highest-quality document is `chosen` and the
    lowest `rejected` (quality = the oracle-replayable composite from
    text.quality_scores; ties break to the lower doc_id on both
    ends), kept only when the quality margin clears 0.05 — degenerate
    pairs teach a preference model nothing. One narrow projection for
    scoring + two windows over the same partitioning (one shuffle);
    margins subtract two round-4 doubles and re-round, so both
    engines land on identical values."""
    from taxi_trips_etl_spark.dataprep.text import quality_scores

    docs = _t(spark, sf_dir, "documents")
    q = quality_scores(docs).select("doc_id", "quality_score").join(
        docs.select("doc_id", "source", "lang"), "doc_id"
    )
    grp = Window.partitionBy("source", "lang")
    ranked = q.select(
        "source", "lang", "doc_id", F.col("quality_score").alias("q"),
        F.row_number().over(
            grp.orderBy(F.col("quality_score").desc(), "doc_id")
        ).alias("rk_best"),
        F.row_number().over(
            grp.orderBy(F.col("quality_score").asc(), "doc_id")
        ).alias("rk_worst"),
        F.count(F.lit(1)).over(grp).alias("n_group"),
    )
    best = ranked.filter(F.col("rk_best") == 1).select(
        "source", "lang", F.col("doc_id").alias("chosen_id"),
        F.col("q").alias("q_best"), "n_group",
    )
    worst = ranked.filter(F.col("rk_worst") == 1).select(
        "source", "lang", F.col("doc_id").alias("rejected_id"),
        F.col("q").alias("q_worst"),
    )
    margin = F.round(F.col("q_best") - F.col("q_worst"), 4)
    return (
        best.join(worst, ["source", "lang"])
        .filter(
            (F.col("chosen_id") != F.col("rejected_id"))
            & (margin >= 0.05)
        )
        .select(
            "source", "lang", "chosen_id", "rejected_id",
            margin.alias("margin"),
            F.col("n_group").cast("long").alias("n_group"),
        )
    )


@register(
    "bucketed_colocated_join",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS revenue_cents
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def q_bucketed_colocated_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The zero-shuffle fact-fact join: orders and lineitem are
    written as bucketed tables (sources/writers.py:write_bucketed,
    hash-clustered on the order key with equal bucket counts), so the
    join's Exchange disappears from the physical plan — at 100 TB
    that converts every recurring join on the bucket key from a
    full-corpus shuffle into per-bucket local zippers. The pytest
    twin (tests/test_bucketing.py) asserts the no-Exchange plan;
    this entry pins the RESULT equivalence against the plain-join
    oracle, so the bucketed read path is correctness-checked too."""
    import shutil
    from urllib.parse import urlparse

    from taxi_trips_etl_spark.sources.catalog import drop_table
    from taxi_trips_etl_spark.sources.writers import write_bucketed

    # A fresh session's in-memory catalog forgets managed tables a
    # previous session wrote, but their warehouse directories survive —
    # saveAsTable then refuses the name (LOCATION_ALREADY_EXISTS). Drop
    # via the catalog AND clear any orphaned location.
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in ("r6b_orders_bucketed", "r6b_lineitem_bucketed"):
        drop_table(spark, t)
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    write_bucketed(
        orders, "r6b_orders_bucketed", ["o_orderkey"], buckets=8,
        sort_cols=["o_orderkey"],
    )
    write_bucketed(
        li, "r6b_lineitem_bucketed", ["l_orderkey"], buckets=8,
        sort_cols=["l_orderkey"],
    )
    o = spark.table("r6b_orders_bucketed")
    l = spark.table("r6b_lineitem_bucketed")
    return (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
            ).cast("long").alias("revenue_cents"),
        )
    )
