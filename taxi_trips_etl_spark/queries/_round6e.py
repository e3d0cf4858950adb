# Round-6 batch 8: MMR diversified reranking (unrolled greedy argmax),
# multi-touch click attribution with integer-micro credits, a strict-
# order sequential funnel (MATCH_RECOGNIZE-style view→click→purchase),
# and the Gini coefficient on the scalable two-pass rank. All float
# arithmetic shared textually with the oracles; credits/counts/cents
# stay exact integers.
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from taxi_trips_etl_spark.queries._registry import _events, _t, register

__all__ = [
    "q_mmr_diversify_rerank",
    "q_multitouch_attribution",
    "q_sequence_pattern_funnel",
    "q_revenue_gini",
]


# ---------------------------------------------------------------- #
# mmr_diversify_rerank                                              #
# ---------------------------------------------------------------- #
_MMR_SHORTLIST = 8
_MMR_K = 4

_COS_Q = """
    list_sum(list_transform(generate_series(1, len(q.emb)),
                            i -> q.emb[i] * e.emb[i]))
    / (sqrt(list_sum(list_transform(generate_series(1, len(q.emb)),
                                    i -> q.emb[i] * q.emb[i])))
       * sqrt(list_sum(list_transform(generate_series(1, len(e.emb)),
                                      i -> e.emb[i] * e.emb[i]))))
"""
_COS_AB = """
    list_sum(list_transform(generate_series(1, len(a.emb)),
                            i -> a.emb[i] * b.emb[i]))
    / (sqrt(list_sum(list_transform(generate_series(1, len(a.emb)),
                                    i -> a.emb[i] * a.emb[i])))
       * sqrt(list_sum(list_transform(generate_series(1, len(b.emb)),
                                      i -> b.emb[i] * b.emb[i]))))
"""


def _mmr_step(n: int) -> str:
    """DuckDB CTE pair for greedy step n ≥ 2: rescore the remaining
    shortlist as 0.7·rel − 0.3·max(sim to already-selected), take the
    argmax (lower id on ties). max() over ≤3 doubles is order-
    independent, so the iterate is engine-stable."""
    prior = " UNION ALL ".join(f"SELECT id FROM s{i}" for i in range(1, n))
    return f"""
c{n} AS (
    SELECT r.id, 0.7 * r.rel - 0.3 * max(sim.s) AS score
    FROM rel r JOIN sim ON sim.ia = r.id
    WHERE sim.ib IN ({prior}) AND r.id NOT IN ({prior})
    GROUP BY r.id, r.rel
),
s{n} AS (SELECT id, score FROM c{n} ORDER BY score DESC, id LIMIT 1)"""


MMR_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
           FROM embeddings),
q AS (SELECT emb FROM e WHERE vec_id = 0),
rel AS (
    SELECT e.vec_id AS id, {_COS_Q} AS rel
    FROM e CROSS JOIN q WHERE e.vec_id != 0
    ORDER BY rel DESC, id LIMIT {_MMR_SHORTLIST}
),
emb8 AS (SELECT e.vec_id AS id, e.emb FROM e JOIN rel ON e.vec_id = rel.id),
sim AS (
    SELECT a.id AS ia, b.id AS ib, {_COS_AB} AS s
    FROM emb8 a JOIN emb8 b ON a.id != b.id
),
s1 AS (SELECT id, 0.7 * rel AS score FROM rel
       ORDER BY rel DESC, id LIMIT 1),
{_mmr_step(2)},
{_mmr_step(3)},
{_mmr_step(4)}
SELECT * FROM (
    SELECT CAST(1 AS BIGINT) AS sel_rank, id,
           CAST(floor(1000.0 * score + 0.5) AS BIGINT) AS score_milli
    FROM s1
    UNION ALL SELECT 2, id, CAST(floor(1000.0 * score + 0.5) AS BIGINT)
    FROM s2
    UNION ALL SELECT 3, id, CAST(floor(1000.0 * score + 0.5) AS BIGINT)
    FROM s3
    UNION ALL SELECT 4, id, CAST(floor(1000.0 * score + 0.5) AS BIGINT)
    FROM s4
)
"""


@register("mmr_diversify_rerank", MMR_ORACLE)
def q_mmr_diversify_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance reranking (Carbonell & Goldstein
    1998): from the cosine top-8 shortlist, greedily pick 4 results
    maximizing 0.7·relevance − 0.3·max-similarity-to-picked — the
    standard diversity pass between retrieval and an LLM context
    window. Greedy argmax is inherently sequential AND the state it
    iterates on is the fixed-size shortlist — so the shortlist and its
    pairwise cosine matrix (computed distributed, by the same Spark
    expression the oracle replays) collect ONCE and the K selection
    steps run on the driver; the oracle unrolls the identical four
    steps as CTEs.

    Scale shape: corpus-sized work is only the top-8 TakeOrdered
    shortlist scan with the query broadcast; everything after runs on
    8 + 56 collected rows (bounded by the shortlist constant, never
    the corpus). score_milli is the same IEEE floor-milli arithmetic
    on the same collected doubles the old per-step Spark jobs
    computed, hash-pinned vs the oracle's identical expression."""
    from taxi_trips_etl_spark.dataprep.similarity import cosine
    from taxi_trips_etl_spark.sources.localrel import local_rows

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").alias("emb")
    )
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("emb").alias("q_emb"))
    rel = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("id"),
            cosine(F.col("q_emb"), F.col("emb")).alias("rel"),
        )
        .orderBy(F.col("rel").desc(), "id")
        .limit(_MMR_SHORTLIST)
        .cache()
    )
    # r13 (guide §5 — the driver should do almost no data work, and
    # the corollary: don't run a JOB per greedy step either): the old
    # loop ran K orderBy-limit-collect jobs over the 8-row shortlist
    # (≈10 driver round-trips of scheduling latency for microseconds
    # of argmax). Collect the shortlist (8 rows) and its pairwise
    # cosine matrix (56 rows, still computed by the SAME Spark
    # `cosine` expression so every double is bit-identical) ONCE, and
    # run the greedy argmax in plain Python — strictly less driver
    # data than the per-step collects, and the selection rule
    # (IEEE-double 0.7·rel − 0.3·max-sim, floor-milli, id tiebreak)
    # is the identical arithmetic on the identical doubles.
    rel_rows = rel.collect()
    ids = [r.id for r in rel_rows]
    emb8 = emb.filter(F.col("vec_id").isin(ids))
    a = emb8.selectExpr("vec_id AS ia", "emb AS ea")
    b = emb8.selectExpr("vec_id AS ib", "emb AS eb")
    sim_rows = (
        a.join(b, F.col("ia") != F.col("ib"))
        .select("ia", "ib", cosine(F.col("ea"), F.col("eb")).alias("s"))
        .collect()
    )
    rel.unpersist()
    import math

    rel_of = {r.id: r.rel for r in rel_rows}
    sim_of: dict[tuple[int, int], float] = {
        (r.ia, r.ib): r.s for r in sim_rows
    }
    picked: list[tuple[int, int, int]] = []  # (rank, id, score_milli)
    sel_ids: list[int] = []
    for step in range(1, _MMR_K + 1):
        best = None
        for cid in ids:
            if cid in sel_ids:
                continue
            if sel_ids:
                ms = max(sim_of[(cid, s)] for s in sel_ids)
                score = 0.7 * rel_of[cid] - 0.3 * ms
            else:
                score = 0.7 * rel_of[cid]
            if best is None or (-score, cid) < (-best[0], best[1]):
                best = (score, cid)
        score, cid = best
        picked.append((step, cid, int(math.floor(1000.0 * score + 0.5))))
        sel_ids.append(cid)
    return local_rows(
        spark, picked, "sel_rank long, id long, score_milli long"
    )


# ---------------------------------------------------------------- #
# multitouch_attribution                                            #
# ---------------------------------------------------------------- #
_ATTR_WINDOW_US = 24 * 3600 * 1_000_000

MULTITOUCH_ORACLE = f"""
WITH clicks AS (
    SELECT event_id AS click_id, user_id, epoch_us(ts) AS c_us
    FROM events WHERE event_type = 'click'
),
purch AS (
    SELECT event_id AS purch_id, user_id, epoch_us(ts) AS p_us
    FROM events WHERE event_type = 'purchase'
),
pairs AS (
    SELECT c.click_id, c.user_id, p.purch_id
    FROM clicks c JOIN purch p
      ON c.user_id = p.user_id
     AND p.p_us > c.c_us AND p.p_us - c.c_us <= {_ATTR_WINDOW_US}
),
per_purchase AS (
    SELECT purch_id, CAST(count(*) AS BIGINT) AS n_clicks
    FROM pairs GROUP BY 1
),
credited AS (
    SELECT pairs.click_id, pairs.user_id,
           CAST(1000000 // n_clicks AS BIGINT) AS credit_micro
    FROM pairs JOIN per_purchase USING (purch_id)
)
SELECT click_id, user_id,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(credit_micro) AS BIGINT) AS credit_micro_total
FROM credited GROUP BY 1, 2
"""


@register("multitouch_attribution", MULTITOUCH_ORACLE)
def q_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every purchase splits one unit
    of credit equally across the user's clicks in the preceding 24 h;
    a click's total is the sum over purchases it assisted. Credit is
    1000000 DIV n_clicks — an exact integer, so per-click sums are
    order-independent (the float 1/n version would depend on
    summation order across purchases).

    Scale shape: the click×purchase join is an equi-join on user_id
    (one shuffle, co-partitioned) with the 24 h range as a residual
    filter — per-user event counts bound the pair fanout; both
    aggregations are partial+final on the pair relation. Timestamps
    compare as epoch microseconds (integer) in both engines."""
    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.unix_micros("ts").alias("c_us"),
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purch_id"),
        F.col("user_id").alias("p_user"),
        F.unix_micros("ts").alias("p_us"),
    )
    pairs = clicks.join(
        purch,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_us") > F.col("c_us"))
        & (F.col("p_us") - F.col("c_us") <= _ATTR_WINDOW_US),
    ).select("click_id", "user_id", "purch_id")
    # Per-purchase click count as a count window over the pair
    # relation, not groupBy + join-back: the join consumed `pairs`
    # twice with no ReusedExchange, so the click×purchase join spine
    # (and both events scans under it) re-ran per consumer (r13:
    # events scans 4 → 2, one pair shuffle on purch_id replaces the
    # aggregate shuffle + join).
    credited = pairs.withColumn(
        "n_clicks",
        F.count(F.lit(1)).over(Window.partitionBy("purch_id")),
    ).selectExpr(
        "click_id",
        "user_id",
        "CAST(1000000 DIV n_clicks AS BIGINT) AS credit_micro",
    )
    return credited.groupBy("click_id", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        F.sum("credit_micro").cast("long").alias("credit_micro_total"),
    )


# ---------------------------------------------------------------- #
# sequence_pattern_funnel                                           #
# ---------------------------------------------------------------- #
FUNNEL_SEQ_ORACLE = """
WITH v AS (
    SELECT user_id, min(ts) AS m1 FROM events
    WHERE event_type = 'view' GROUP BY 1
),
c AS (
    SELECT e.user_id, min(e.ts) AS m2
    FROM events e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click' AND e.ts > v.m1
    GROUP BY 1
),
p AS (
    SELECT e.user_id, min(e.ts) AS m3
    FROM events e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND e.ts > c.m2
    GROUP BY 1
)
SELECT * FROM (
    SELECT 'view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
    UNION ALL
    SELECT 'view>click', CAST(count(*) AS BIGINT) FROM c
    UNION ALL
    SELECT 'view>click>purchase', CAST(count(*) AS BIGINT) FROM p
)
"""


@register("sequence_pattern_funnel", FUNNEL_SEQ_ORACLE)
def q_sequence_pattern_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order sequential funnel (the MATCH_RECOGNIZE pattern
    `view … click … purchase` with each step strictly AFTER the
    previous): existence of the subsequence is decided by greedy
    earliest-match chaining — min(view), then min(click) after it,
    then min(purchase) after that — which is exact for subsequence
    existence (matching earlier can never hurt later steps).

    Scale shape (r13): three partial+final min-aggregates keyed on
    user_id, chained by equi-joins on the same key; no windows, no
    per-user sort. Each stage table (user-grain, small next to raw
    events) is materialized — the lazy plan otherwise re-derived v
    under c and its own count, and c under p and its own count, for
    6 filtered events scans; now each event_type filter scans events
    exactly once (the per-stage-filter floor, 3 scans). Unlike
    funnel_conversion (unordered min-timestamps), this pins the
    strict inter-step ordering."""
    from taxi_trips_etl_spark.dataprep.materialize import materialize

    ev = _events(spark, sf_dir)
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("m1"))
        .transform(materialize, eager=False)
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("m1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("m2"))
        .transform(materialize, eager=False)
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("m2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("m3"))
    )
    return (
        v.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .select(F.lit("view").alias("stage"), "n_users")
        .unionAll(
            c.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
                F.lit("view>click").alias("stage"), "n_users"
            )
        )
        .unionAll(
            p.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
                F.lit("view>click>purchase").alias("stage"), "n_users"
            )
        )
    )


# ---------------------------------------------------------------- #
# revenue_gini                                                      #
# ---------------------------------------------------------------- #
_GINI_EXPR = (
    "CAST(floor(1000000.0 * (2.0 * CAST(w AS DOUBLE)"
    " - (CAST(n AS DOUBLE) + 1.0) * CAST(t AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * CAST(t AS DOUBLE)) + 0.5) AS BIGINT)"
)

GINI_ORACLE = f"""
WITH rev AS (
    SELECT o_custkey,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_cents
    FROM orders GROUP BY 1
),
ranked AS (
    SELECT rev_cents,
           row_number() OVER (ORDER BY rev_cents, o_custkey) AS i
    FROM rev
),
sums AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(rev_cents) AS BIGINT) AS t,
           CAST(sum(i * rev_cents) AS BIGINT) AS w
    FROM ranked
)
SELECT n AS n_customers, t AS total_cents, {_GINI_EXPR} AS gini_micro
FROM sums
"""


@register("revenue_gini", GINI_ORACLE)
def q_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration via the
    rank formula G = (2·Σi·x_i − (n+1)·Σx) / (n·Σx) over ascending
    revenue — the inequality metric for spend/traffic/token-budget
    concentration. Σi·x_i and Σx are exact int64 (ties don't affect
    Σi·x_i — equal x under permuted ranks contribute identically),
    and the single final division is shared text.

    Scale shape: ranks come from the two-pass range-partition scheme
    (operators/ids.py), not a SinglePartition sort; the rest is one
    partial+final aggregate. int64 headroom: n·T ≈ 3×10^16 at sf0.1,
    overflowing only past ~sf3000 — widen to decimal partials there."""
    from taxi_trips_etl_spark.operators.ids import assign_global_ids

    rev = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("rev_cents")
        )
    )
    ranked = assign_global_ids(rev, ["rev_cents", "o_custkey"], id_col="i")
    sums = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rev_cents").cast("long").alias("t"),
        F.sum(F.col("i") * F.col("rev_cents")).cast("long").alias("w"),
    )
    return sums.selectExpr(
        "n AS n_customers", "t AS total_cents", f"{_GINI_EXPR} AS gini_micro"
    )
