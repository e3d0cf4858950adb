# Round-6 batch 7: reciprocal-rank-fusion hybrid retrieval, chi-square
# independence testing, day-of-week seasonal adjustment, top-N-with-
# OTHER reporting rollup, and simplified k-means silhouette. Float
# expressions shared textually with the oracles (same IEEE op
# sequence); ranks, counts, and cents stay exact integers.
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from taxi_trips_etl_spark.queries._registry import TOKS_SQL, _events, _t, register
from taxi_trips_etl_spark.queries._mm_streaming import (
    _KM_DIST,
    _km_assign,
    _km_update,
)

# ---------------------------------------------------------------- #
# hybrid_rrf_search                                                 #
# ---------------------------------------------------------------- #
_RRF_K = 60
_RRF_TOPL = 50  # per-retriever shortlist
_RRF_OUT = 20
_RRF_SCORE = (
    "CAST(floor(coalesce(1000000.0 / (60 + r_sem), 0.0)"
    " + coalesce(1000000.0 / (60 + r_lex), 0.0) + 0.5) AS BIGINT)"
)

_COS_Q_SQL = """
    list_sum(list_transform(generate_series(1, len(q.emb)),
                            i -> q.emb[i] * e.emb[i]))
    / (sqrt(list_sum(list_transform(generate_series(1, len(q.emb)),
                                    i -> q.emb[i] * q.emb[i])))
       * sqrt(list_sum(list_transform(generate_series(1, len(e.emb)),
                                      i -> e.emb[i] * e.emb[i]))))
"""

RRF_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
           FROM embeddings),
q AS (SELECT emb FROM e WHERE vec_id = 0),
sem AS (
    SELECT e.vec_id AS id, row_number() OVER (
               ORDER BY {_COS_Q_SQL} DESC, e.vec_id) AS r_sem
    FROM e CROSS JOIN q WHERE e.vec_id != 0
    ORDER BY r_sem LIMIT {_RRF_TOPL}
),
qtok AS (
    SELECT DISTINCT unnest({TOKS_SQL}) AS tok FROM documents
    WHERE doc_id = 0
),
dtok AS (
    SELECT DISTINCT doc_id, unnest({TOKS_SQL}) AS tok FROM documents
    WHERE doc_id != 0
),
dsize AS (SELECT doc_id, count(*) AS n_tok FROM dtok GROUP BY 1),
qsize AS (SELECT count(*) AS q_tok FROM qtok),
inter AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_int
    FROM dtok JOIN qtok USING (tok) GROUP BY 1
),
lex AS (
    SELECT doc_id AS id, row_number() OVER (
               ORDER BY CAST(n_int AS DOUBLE)
                        / (n_tok + q_tok - n_int) DESC, doc_id) AS r_lex
    FROM inter JOIN dsize USING (doc_id) CROSS JOIN qsize
    ORDER BY r_lex LIMIT {_RRF_TOPL}
)
SELECT id, CAST(r_sem AS BIGINT) AS r_sem, CAST(r_lex AS BIGINT) AS r_lex,
       {_RRF_SCORE} AS rrf_micro
FROM sem FULL OUTER JOIN lex USING (id)
ORDER BY rrf_micro DESC, id LIMIT {_RRF_OUT}
"""


@register("hybrid_rrf_search", RRF_ORACLE)
def q_hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion: a semantic
    shortlist (embedding cosine to the query vector) and a lexical
    shortlist (token-set Jaccard to the query document) each produce
    a top-50 ranking; RRF fuses them as Σ 1/(60+rank), robust to the
    two retrievers' incomparable score scales — the standard fusion
    in production hybrid search.

    Scale shape: each retriever ends in a TakeOrdered top-50, so the
    fusion join touches ≤ 2·50 rows no matter the corpus; the lexical
    leg is a posting-list equi-join against the DISTINCT query-token
    set (never an array-vs-array UDF), and the semantic leg scans the
    corpus once with the query broadcast. Ranks are integers; the RRF
    arithmetic is shared textually with the oracle."""
    from taxi_trips_etl_spark.dataprep.similarity import cosine

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").alias("emb")
    )
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("emb").alias("q_emb")
    )
    sem = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("id"),
            cosine(F.col("q_emb"), F.col("emb")).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), "id")
        .limit(_RRF_TOPL)
        .withColumn(
            "r_sem",
            F.row_number().over(
                Window.orderBy(F.col("cos").desc(), "id")
            ),
        )
        .select("id", "r_sem")
    )
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.split(F.trim(F.lower("text")), r"\s+").alias("toks"),
    )
    # r13 fan-out fix: the old shape derived qtok, dsize and inter as
    # three separate consumers of the tokenize+distinct spine — three
    # corpus-scale explode passes plus a dsize⋈inter shuffle join.
    # Now the query-token set comes from a pushed doc_id=0 scan
    # (materialized: it is |query| rows) and ONE pass over the corpus
    # postings computes n_tok and n_int together via a left broadcast
    # join — the n_int>0 filter reproduces the old inner-join drop of
    # zero-intersection docs exactly.
    from taxi_trips_etl_spark.dataprep.materialize import materialize

    qtok = materialize(
        docs.filter(F.col("doc_id") == 0)
        .select(F.explode("toks").alias("tok"))
        .distinct(),
        eager=False,
    )
    dtok = (
        docs.filter(F.col("doc_id") != 0)
        .select("doc_id", F.explode("toks").alias("tok"))
        .distinct()
    )
    q_tok = qtok.agg(F.count(F.lit(1)).alias("q_tok"))
    stats = (
        dtok.join(
            F.broadcast(qtok.withColumn("__q", F.lit(1))), "tok", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.count("__q").cast("long").alias("n_int"),
        )
    )
    jac = (
        stats.filter(F.col("n_int") > 0)
        .crossJoin(F.broadcast(q_tok))
        .selectExpr(
            "doc_id AS id",
            "CAST(n_int AS DOUBLE) / (n_tok + q_tok - n_int) AS jac",
        )
    )
    lex = (
        jac.orderBy(F.col("jac").desc(), "id")
        .limit(_RRF_TOPL)
        .withColumn(
            "r_lex",
            F.row_number().over(
                Window.orderBy(F.col("jac").desc(), "id")
            ),
        )
        .select("id", "r_lex")
    )
    fused = sem.join(lex, "id", "full_outer").selectExpr(
        "id",
        "CAST(r_sem AS BIGINT) AS r_sem",
        "CAST(r_lex AS BIGINT) AS r_lex",
        f"{_RRF_SCORE} AS rrf_micro",
    )
    return fused.orderBy(F.col("rrf_micro").desc(), "id").limit(_RRF_OUT)


# ---------------------------------------------------------------- #
# chisq_independence                                                #
# ---------------------------------------------------------------- #
_CHI_EXP = "((CAST(row_tot AS DOUBLE) * col_tot) / n_total)"
_CHI_CELL = (
    f"CAST(floor(1000.0 * ((obs - {_CHI_EXP}) * (obs - {_CHI_EXP}))"
    f" / {_CHI_EXP} + 0.5) AS BIGINT)"
)

CHISQ_ORACLE = f"""
WITH cells AS (
    SELECT event_type,
           CAST(CAST(strftime(ts, '%H') AS BIGINT) // 6 AS BIGINT)
               AS daypart,
           CAST(count(*) AS BIGINT) AS obs
    FROM events GROUP BY 1, 2
),
tot AS (
    SELECT event_type, daypart, obs,
           CAST(sum(obs) OVER (PARTITION BY event_type) AS BIGINT)
               AS row_tot,
           CAST(sum(obs) OVER (PARTITION BY daypart) AS BIGINT)
               AS col_tot,
           CAST(sum(obs) OVER () AS BIGINT) AS n_total
    FROM cells
)
SELECT event_type, daypart, obs,
       CAST(floor(1000.0 * {_CHI_EXP} + 0.5) AS BIGINT)
           AS expected_milli,
       {_CHI_CELL} AS chi2_milli
FROM tot
"""


@register("chisq_independence", CHISQ_ORACLE)
def q_chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event type and
    daypart — the categorical-association screen for feature
    selection and drift monitoring. Emits each contingency cell with
    its expected count and chi² contribution (milli-units; sum the
    column for the statistic, df = (R−1)(C−1)).

    Scale shape: one partial+final hash aggregate builds the R×C
    contingency table; every window below it runs on that ≤ R·C-row
    frame. Expected/chi² arithmetic is shared text over exact
    integer marginals."""
    ev = _events(spark, sf_dir)
    cells = ev.groupBy(
        "event_type",
        (F.hour("ts").cast("long") / 6).cast("long").alias("daypart"),
    ).agg(F.count(F.lit(1)).cast("long").alias("obs"))
    tot = cells.select(
        "event_type",
        "daypart",
        "obs",
        F.sum("obs")
        .over(Window.partitionBy("event_type"))
        .cast("long")
        .alias("row_tot"),
        F.sum("obs")
        .over(Window.partitionBy("daypart"))
        .cast("long")
        .alias("col_tot"),
        F.sum("obs")
        .over(Window.partitionBy())
        .cast("long")
        .alias("n_total"),
    )
    return tot.selectExpr(
        "event_type",
        "daypart",
        "obs",
        f"CAST(floor(1000.0 * {_CHI_EXP} + 0.5) AS BIGINT)"
        " AS expected_milli",
        f"{_CHI_CELL} AS chi2_milli",
    )


# ---------------------------------------------------------------- #
# seasonal_dow_adjustment                                           #
# ---------------------------------------------------------------- #
_DOW_FACTOR = (
    "CAST(floor(1000000.0 * (CAST(dow_sum AS DOUBLE) * n_days)"
    " / (CAST(dow_days AS DOUBLE) * tot_sum) + 0.5) AS BIGINT)"
)

SEASONAL_ORACLE = f"""
WITH daily AS (
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS daily_cents
    FROM events GROUP BY 1
),
keyed AS (
    SELECT day, daily_cents,
           CAST(date_diff('day', DATE '1970-01-01', CAST(day AS DATE)) % 7
                AS BIGINT) AS dow
    FROM daily
),
dstat AS (
    SELECT dow, CAST(sum(daily_cents) AS BIGINT) AS dow_sum,
           CAST(count(*) AS BIGINT) AS dow_days
    FROM keyed GROUP BY 1
),
gstat AS (
    SELECT CAST(sum(daily_cents) AS BIGINT) AS tot_sum,
           CAST(count(*) AS BIGINT) AS n_days
    FROM keyed
),
factored AS (
    SELECT dow, {_DOW_FACTOR} AS factor_micro
    FROM dstat CROSS JOIN gstat
)
SELECT k.day, k.daily_cents, k.dow, f.factor_micro,
       CAST(floor(CAST(k.daily_cents AS DOUBLE) * 1000000.0
                  / f.factor_micro + 0.5) AS BIGINT) AS adjusted_cents
FROM keyed k JOIN factored f ON k.dow = f.dow
"""


@register("seasonal_dow_adjustment", SEASONAL_ORACLE)
def q_seasonal_dow_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal adjustment of daily revenue: the
    multiplicative factor per weekday (dow mean ÷ global mean, in
    integer micro-units) and the deseasonalized series — the
    decomposition step under anomaly detection and forecasting.
    Weekday comes from epoch-day arithmetic ((days since 1970-01-01)
    % 7), NOT locale-dependent dayofweek()/strftime('%w') whose
    week-start conventions differ across engines.

    Scale shape: everything after the one data-sized day-groupBy runs
    on the daily frame (365 rows/year) and a 7-row factor dim
    (broadcast join back)."""
    from taxi_trips_etl_spark.dataprep.materialize import materialize

    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("daily_cents")
    )
    # keyed (one row per day) feeds the dow stats, the global stats
    # AND the final join — without a checkpoint the events scan +
    # day-groupBy re-ran per consumer (r13: events scans 3 → 1; the
    # frame is 365 rows/year).
    keyed = materialize(
        daily.withColumn(
            "dow",
            (
                F.datediff(F.to_date("day"), F.to_date(F.lit("1970-01-01")))
                % 7
            ).cast("long"),
        ),
        eager=False,
    )
    dstat = keyed.groupBy("dow").agg(
        F.sum("daily_cents").cast("long").alias("dow_sum"),
        F.count(F.lit(1)).cast("long").alias("dow_days"),
    )
    gstat = keyed.agg(
        F.sum("daily_cents").cast("long").alias("tot_sum"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    factored = dstat.crossJoin(F.broadcast(gstat)).selectExpr(
        "dow", f"{_DOW_FACTOR} AS factor_micro"
    )
    return keyed.join(F.broadcast(factored), "dow").selectExpr(
        "day",
        "daily_cents",
        "dow",
        "factor_micro",
        "CAST(floor(CAST(daily_cents AS DOUBLE) * 1000000.0"
        " / factor_micro + 0.5) AS BIGINT) AS adjusted_cents",
    )


# ---------------------------------------------------------------- #
# topn_with_other_rollup                                            #
# ---------------------------------------------------------------- #
TOPN_OTHER_ORACLE = """
WITH agg AS (
    SELECT s_nationkey AS nation_key, p_brand,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                AS BIGINT) AS revenue_cp
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN part ON l_partkey = p_partkey
    GROUP BY 1, 2
),
ranked AS (
    SELECT nation_key, p_brand, revenue_cp,
           row_number() OVER (PARTITION BY nation_key
                              ORDER BY revenue_cp DESC, p_brand) AS rk
    FROM agg
)
SELECT nation_key,
       CASE WHEN rk <= 3 THEN p_brand ELSE 'OTHER' END AS brand_label,
       CAST(sum(revenue_cp) AS BIGINT) AS revenue_cp,
       CAST(count(*) AS BIGINT) AS n_brands
FROM ranked GROUP BY 1, 2
"""


@register("topn_with_other_rollup", TOPN_OTHER_ORACLE)
def q_topn_with_other_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reporting staple: top-3 brands per nation by discounted
    revenue shown by name, the long tail collapsed into one OTHER
    row per nation (revenue + how many brands it swallows).

    Scale shape: the only data-sized stage is the partial+final hash
    aggregate to (nation, brand) — both dims broadcast; the rank
    window and the relabel re-aggregate run on ≤ nations×brands rows.
    Revenue in exact integer cent·percent units."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
    )
    agg = (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(F.col("s_nationkey").alias("nation_key"), "p_brand")
        .agg(F.sum(rev).cast("long").alias("revenue_cp"))
    )
    w = Window.partitionBy("nation_key").orderBy(
        F.col("revenue_cp").desc(), "p_brand"
    )
    return (
        agg.withColumn("rk", F.row_number().over(w))
        .withColumn(
            "brand_label",
            F.when(F.col("rk") <= 3, F.col("p_brand")).otherwise(
                F.lit("OTHER")
            ),
        )
        .groupBy("nation_key", "brand_label")
        .agg(
            F.sum("revenue_cp").cast("long").alias("revenue_cp"),
            F.count(F.lit(1)).cast("long").alias("n_brands"),
        )
    )


# ---------------------------------------------------------------- #
# kmeans_silhouette                                                 #
# ---------------------------------------------------------------- #
_SIL_EXPR = (
    "CAST(floor(1000.0 * (sqrt(b_sq) - sqrt(a_sq))"
    " / greatest(sqrt(a_sq), sqrt(b_sq)) + 0.5) AS BIGINT)"
)

SILHOUETTE_ORACLE = f"""
WITH vecs AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
c0 AS (
  SELECT (row_number() OVER (ORDER BY vec_id)) - 1 AS cluster_id, v AS c
  FROM (SELECT vec_id, v FROM vecs ORDER BY vec_id LIMIT 8)
),
a1 AS ({_km_assign('c0')}),
c1 AS ({_km_update('a1', 'c0')}),
a2 AS ({_km_assign('c1')}),
c2 AS ({_km_update('a2', 'c1')}),
a3 AS ({_km_assign('c2')}),
c3 AS ({_km_update('a3', 'c2')}),
afinal AS ({_km_assign('c3')}),
alld AS (
  SELECT vecs.vec_id, c3.cluster_id, {_KM_DIST} AS d
  FROM vecs CROSS JOIN c3
),
paired AS (
  SELECT a.vec_id, a.cluster_id, a.d AS a_sq,
         min(o.d) AS b_sq
  FROM afinal a JOIN alld o
    ON o.vec_id = a.vec_id AND o.cluster_id != a.cluster_id
  GROUP BY a.vec_id, a.cluster_id, a.d
)
SELECT vec_id, CAST(cluster_id AS BIGINT) AS cluster_id,
       {_SIL_EXPR} AS silhouette_milli
FROM paired
"""


@register("kmeans_silhouette", SILHOUETTE_ORACLE)
def q_kmeans_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based) silhouette for the k-means
    clustering: per vector, a = distance to own centroid, b = nearest
    other centroid, s = (b−a)/max(a,b) — the O(n·k) clustering-
    quality metric that replaces the O(n²) exact silhouette at scale
    (it's what large-scale libraries report). Rides the SAME
    deterministic Lloyd trajectory as embedding_kmeans/semdedup, so
    the oracle replays it.

    Scale shape: assignment already computes all k distances in one
    narrow projection (centroids are literals — no join, no
    shuffle), so silhouette is a per-row expression over that
    projection: single scan, zero extra shuffles. Per-vec rows only —
    no cross-row float sums anywhere."""
    from taxi_trips_etl_spark.dataprep.clustering import kmeans_assign

    assigned = kmeans_assign(
        _t(spark, sf_dir, "embeddings"), k=8, iterations=3, with_dists=True
    )
    return assigned.selectExpr(
        "vec_id",
        "cluster_id",
        "element_at(sq_dists, CAST(cluster_id + 1 AS INT)) AS a_sq",
        "array_min(transform(sq_dists,"
        " (x, i) -> CASE WHEN i = CAST(cluster_id AS INT) THEN"
        " CAST('Infinity' AS DOUBLE) ELSE x END)) AS b_sq",
    ).selectExpr(
        "vec_id",
        "cluster_id",
        f"{_SIL_EXPR} AS silhouette_milli",
    )
