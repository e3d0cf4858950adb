# Round-6 batch 6: association-rule mining (market basket), blocked
# record linkage, Benford first-digit audit, CUSUM change detection via
# the prefix-min closed form, integer-exact multivariate OLS, an
# all-integer Markov stationary distribution, and scalable decile
# profiling (two-pass rank, no single-partition window). Every entry
# oracle-bearing from birth; every float expression shared textually
# between the Spark plan and the DuckDB oracle so IEEE evaluation is
# structurally identical.
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from taxi_trips_etl_spark.queries._registry import _events, _t, register

__all__ = [
    "q_market_basket_brand_rules",
    "q_record_linkage_blocked",
    "q_benford_first_digit",
    "q_cusum_change_days",
    "q_ols_normal_equations",
    "q_markov_stationary_micro",
    "q_acctbal_decile_profile",
]


# ---------------------------------------------------------------- #
# market_basket_brand_rules                                         #
# ---------------------------------------------------------------- #
# Shared milli-rounding: floor(1000*a/b + 0.5) over exact integer
# counts — the division is one IEEE op on identical operands, so both
# engines produce the same double and the same rounded integer.
_MB_SUPPORT = "CAST(floor(1000.0 * pair_cnt / n_baskets + 0.5) AS BIGINT)"
_MB_CONF_AB = "CAST(floor(1000.0 * pair_cnt / cnt_a + 0.5) AS BIGINT)"
_MB_CONF_BA = "CAST(floor(1000.0 * pair_cnt / cnt_b + 0.5) AS BIGINT)"
_MB_LIFT = (
    "CAST(floor(1000.0 * (CAST(pair_cnt AS DOUBLE) * n_baskets)"
    " / (CAST(cnt_a AS DOUBLE) * cnt_b) + 0.5) AS BIGINT)"
)

MARKET_BASKET_ORACLE = f"""
WITH baskets AS (
    SELECT DISTINCT l.l_orderkey AS basket, p.p_brand AS brand
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
item_cnt AS (
    SELECT brand, CAST(count(*) AS BIGINT) AS cnt FROM baskets GROUP BY 1
),
nb AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets
       FROM baskets),
pairs AS (
    SELECT a.brand AS brand_a, b.brand AS brand_b,
           CAST(count(*) AS BIGINT) AS pair_cnt
    FROM baskets a JOIN baskets b
      ON a.basket = b.basket AND a.brand < b.brand
    GROUP BY 1, 2
),
enriched AS (
    SELECT pairs.brand_a, pairs.brand_b, pairs.pair_cnt,
           ia.cnt AS cnt_a, ib.cnt AS cnt_b, nb.n_baskets
    FROM pairs
    JOIN item_cnt ia ON ia.brand = pairs.brand_a
    JOIN item_cnt ib ON ib.brand = pairs.brand_b
    CROSS JOIN nb
)
SELECT brand_a, brand_b, pair_cnt,
       {_MB_SUPPORT} AS support_milli,
       {_MB_CONF_AB} AS conf_ab_milli,
       {_MB_CONF_BA} AS conf_ba_milli,
       {_MB_LIFT} AS lift_milli
FROM enriched
WHERE {_MB_SUPPORT} >= 1
"""


@register("market_basket_brand_rules", MARKET_BASKET_ORACLE)
def q_market_basket_brand_rules(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Association-rule mining (a-priori pair stage) over order
    baskets: brands co-purchased in the same order, with support,
    both-direction confidence, and lift, at min-support 0.1%.

    Scale shape: the brand dim (25 rows) is a broadcast; DISTINCT
    (order, brand) bounds every basket at |brands| items, so the
    self-join fanout per basket is at most C(25,2) regardless of
    basket line count; the self-join shuffles ONCE on the basket key
    and pair cardinality is capped at brands² — constant in data
    size. At 100 TB the only growing cost is the two basket scans,
    both linear. Counts are exact integers; the ratio expressions are
    shared textually with the oracle."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    from taxi_trips_etl_spark.dataprep.materialize import materialize

    # r13: five consumers (pair join ×2, item_cnt broadcast ×2,
    # n_baskets) each re-ran the scan→broadcast-join→distinct spine in
    # the lazy plan — materialize it once (guide §2.4; the same fix
    # market_basket_triples already carried).
    baskets = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .select(
            F.col("l_orderkey").alias("basket"),
            F.col("p_brand").alias("brand"),
        )
        .distinct()
        .transform(materialize, eager=False)
    )
    # consumed twice as a broadcast build side; brand-grain (tiny).
    item_cnt = (
        baskets.groupBy("brand")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .transform(materialize, eager=False)
    )
    n_baskets = baskets.select(
        F.countDistinct("basket").cast("long").alias("n_baskets")
    )
    a = baskets.alias("a")
    b = baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.basket") == F.col("b.basket"))
            & (F.col("a.brand") < F.col("b.brand")),
        )
        .groupBy(
            F.col("a.brand").alias("brand_a"),
            F.col("b.brand").alias("brand_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("pair_cnt"))
    )
    enriched = (
        pairs.join(
            F.broadcast(item_cnt.withColumnRenamed("cnt", "cnt_a")),
            F.col("brand_a") == F.col("brand"),
        )
        .drop("brand")
        .join(
            F.broadcast(item_cnt.withColumnRenamed("cnt", "cnt_b")),
            F.col("brand_b") == F.col("brand"),
        )
        .drop("brand")
        .crossJoin(F.broadcast(n_baskets))
    )
    return enriched.selectExpr(
        "brand_a",
        "brand_b",
        "pair_cnt",
        f"{_MB_SUPPORT} AS support_milli",
        f"{_MB_CONF_AB} AS conf_ab_milli",
        f"{_MB_CONF_BA} AS conf_ba_milli",
        f"{_MB_LIFT} AS lift_milli",
    ).where(F.col("support_milli") >= 1)


# ---------------------------------------------------------------- #
# record_linkage_blocked                                            #
# ---------------------------------------------------------------- #
RECORD_LINKAGE_ORACLE = """
WITH blocked AS (
    SELECT c_custkey, c_name, substr(c_name, 1, 16) AS block_key
    FROM customer
),
pairs AS (
    SELECT a.block_key,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS lev
    FROM blocked a JOIN blocked b
      ON a.block_key = b.block_key AND a.c_custkey < b.c_custkey
)
SELECT p.block_key, pop.n_names, p.n_pairs, p.n_matched
FROM (
    SELECT block_key,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN lev <= 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_matched
    FROM pairs GROUP BY 1
) p
JOIN (
    SELECT block_key, CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_names
    FROM blocked GROUP BY 1
) pop ON pop.block_key = p.block_key
"""


@register("record_linkage_blocked", RECORD_LINKAGE_ORACLE)
def q_record_linkage_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution with blocking: candidate pairs only WITHIN a
    cheap deterministic block key (here the name prefix), verified by
    Levenshtein distance ≤ 1 — the classic two-stage record-linkage
    shape. Reported per block: population, candidate pairs, matches.

    Scale shape — two independent collapses stack here:
    (1) exact duplicates are grouped FIRST, so Levenshtein runs over
    DISTINCT names only and record multiplicity re-enters as pure
    integer algebra — m_a·m_b candidate pairs per name pair,
    C(m,2) within a repeated name (distance 0, always matched) —
    the standard signature-weighting trick, which makes the pair
    stage immune to duplicate inflation (a 10× corpus of re-ingested
    copies costs ~10×, not 100×); (2) the surviving distinct-name
    comparison is blocked, Σ block² replacing n², with the self-join
    key = the block key so one shuffle co-partitions both sides.
    levenshtein() is a JVM built-in — no Python in the pair loop.
    The oracle states the naive spec (all record pairs in block);
    this plan reproduces its numbers exactly by the expansion
    identity C(Σm,2) = ΣC(m,2) + Σ_{a<b} m_a·m_b."""
    from taxi_trips_etl_spark.dataprep.materialize import materialize

    grp = (
        _t(spark, sf_dir, "customer")
        .groupBy("c_name")
        .agg(F.count(F.lit(1)).cast("long").alias("mult"))
        .withColumn("block_key", F.substring("c_name", 1, 16))
        # three consumers (both self-join sides + the within rollup)
        # would each re-run the scan + groupBy (no ReusedExchange)
        .transform(materialize, eager=False)
    )
    a = grp.alias("a")
    b = grp.alias("b")
    cross = (
        a.join(
            b,
            (F.col("a.block_key") == F.col("b.block_key"))
            & (F.col("a.c_name") < F.col("b.c_name")),
        )
        .select(
            F.col("a.block_key").alias("block_key"),
            (F.col("a.mult") * F.col("b.mult")).alias("cand"),
            # Banded verify (r14): levenshtein(threshold=1) computes the
            # O(len) DP band and returns −1 past the threshold, so
            # `thr ≥ 0` ⟺ `full ≤ 1` — identical predicate, ~len× less
            # per-pair work (same rewrite as dedup.fastss_pairs).
            F.when(
                F.levenshtein(
                    F.col("a.c_name"), F.col("b.c_name"), 1
                ) >= 0,
                F.col("a.mult") * F.col("b.mult"),
            )
            .otherwise(0)
            .alias("hit"),
        )
        .groupBy("block_key")
        .agg(
            F.sum("cand").cast("long").alias("cross_cand"),
            F.sum("hit").cast("long").alias("cross_hit"),
        )
    )
    within = grp.groupBy("block_key").agg(
        F.sum("mult").cast("long").alias("n_names"),
        F.sum(F.expr("mult * (mult - 1) DIV 2")).cast("long").alias(
            "within_pairs"
        ),
    )
    return (
        within.join(cross, "block_key", "left")
        .na.fill(0, ["cross_cand", "cross_hit"])
        .filter(F.col("n_names") >= 2)
        .select(
            "block_key",
            "n_names",
            (
                F.expr("n_names * (n_names - 1) DIV 2")
            ).cast("long").alias("n_pairs"),
            (F.col("within_pairs") + F.col("cross_hit"))
            .cast("long")
            .alias("n_matched"),
        )
    )


# ---------------------------------------------------------------- #
# benford_first_digit                                               #
# ---------------------------------------------------------------- #
# round(log10(1 + 1/d) * 1000) pre-computed as literals so neither
# engine's libm log10 enters the comparison.
_BENFORD_MILLI = {1: 301, 2: 176, 3: 125, 4: 97, 5: 79, 6: 67, 7: 58,
                  8: 51, 9: 46}
_BENFORD_SQL_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN {m}" for d, m in _BENFORD_MILLI.items()
) + " END"

BENFORD_ORACLE = f"""
WITH digits AS (
    SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                            AS VARCHAR), 1, 1) AS BIGINT) AS digit
    FROM lineitem
),
counts AS (
    SELECT digit, CAST(count(*) AS BIGINT) AS observed FROM digits
    GROUP BY 1
),
tot AS (SELECT CAST(sum(observed) AS BIGINT) AS total FROM counts)
SELECT digit, observed,
       CAST(floor(1000.0 * observed / total + 0.5) AS BIGINT)
           AS observed_milli,
       CAST({_BENFORD_SQL_CASE} AS BIGINT) AS expected_milli,
       CAST(floor(1000.0 * observed / total + 0.5) AS BIGINT)
           - CAST({_BENFORD_SQL_CASE} AS BIGINT) AS excess_milli
FROM counts CROSS JOIN tot
"""


@register("benford_first_digit", BENFORD_ORACLE)
def q_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law data-quality audit: distribution of the first
    significant digit of the price column vs the expected
    log10(1+1/d) mass — the standard screen for fabricated or
    truncated numeric feeds. The first digit is taken via the decimal
    string of the integer-cent value, NOT floor(log10(x)), so no
    transcendental function (with per-libm ULP variance) is in the
    deterministic path. One narrow 9-group aggregate; scales as a
    single scan."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.substring(
            F.round(F.col("l_extendedprice") * 100).cast("long").cast(
                "string"
            ),
            1,
            1,
        )
        .cast("long")
        .alias("digit")
    )
    counts = li.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("observed")
    )
    tot = counts.agg(F.sum("observed").cast("long").alias("total"))
    return counts.crossJoin(F.broadcast(tot)).selectExpr(
        "digit",
        "observed",
        "CAST(floor(1000.0 * observed / total + 0.5) AS BIGINT)"
        " AS observed_milli",
        f"CAST({_BENFORD_SQL_CASE} AS BIGINT) AS expected_milli",
        "CAST(floor(1000.0 * observed / total + 0.5) AS BIGINT)"
        f" - CAST({_BENFORD_SQL_CASE} AS BIGINT) AS excess_milli",
    )


# ---------------------------------------------------------------- #
# cusum_change_days                                                 #
# ---------------------------------------------------------------- #
CUSUM_ORACLE = """
WITH daily AS (
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS daily_cents
    FROM events GROUP BY 1
),
params AS (
    SELECT CAST(sum(daily_cents) AS BIGINT) // count(*) AS mu
    FROM daily
),
pref AS (
    SELECT day, daily_cents,
           sum(daily_cents - mu - mu // 20) OVER (
               ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS p,
           mu
    FROM daily CROSS JOIN params
)
SELECT day, daily_cents,
       CAST(p - least(
           min(p) OVER (ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           0) AS BIGINT) AS cusum_cents,
       CAST(CASE WHEN p - least(
           min(p) OVER (ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           0) > mu THEN 1 ELSE 0 END AS BIGINT) AS alert
FROM pref
"""


@register("cusum_change_days", CUSUM_ORACLE)
def q_cusum_change_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection on daily revenue. The textbook
    recursion S_t = max(0, S_{t-1} + x_t − μ − k) is not directly
    window-expressible, but has the exact closed form
    S_t = P_t − min(0, min_{j≤t} P_j) over the drift-adjusted prefix
    sum P — two stacked running windows, no recursion, no UDF.
    Allowance k = μ/20, alert threshold h = μ, all in integer cents
    (integer division for μ), so both engines agree bit-for-bit.

    Scale shape: the windows run over the POST-aggregation daily
    series (365 rows/year at any data volume), so the global sort is
    bounded; the only data-sized stage is the day groupBy."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("daily_cents")
    )
    params = daily.agg(
        F.expr("CAST(sum(daily_cents) AS BIGINT) DIV count(*)").alias("mu")
    )
    w_cum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pref = (
        daily.crossJoin(F.broadcast(params))
        .withColumn(
            "p",
            F.sum(
                F.expr("daily_cents - mu - mu DIV 20")
            ).over(w_cum),
        )
    )
    run_min = F.min("p").over(w_cum)
    s = F.col("p") - F.least(run_min, F.lit(0))
    return pref.select(
        "day",
        "daily_cents",
        s.cast("long").alias("cusum_cents"),
        F.when(s > F.col("mu"), 1).otherwise(0).cast("long").alias("alert"),
    )


# ---------------------------------------------------------------- #
# ols_normal_equations                                              #
# ---------------------------------------------------------------- #
# Cramer's rule over the 3×3 normal equations, written ONCE and used
# verbatim by both engines. Inputs are the *_d columns (exact-integer
# sums cast to double); every product/sub/add below is then the same
# IEEE op on the same operands in the same order.
_OLS_DET = (
    "(n_d*(s11_d*s22_d - s12_d*s12_d)"
    " - sx1_d*(sx1_d*s22_d - s12_d*sx2_d)"
    " + sx2_d*(sx1_d*s12_d - s11_d*sx2_d))"
)
_OLS_DET0 = (
    "(sy_d*(s11_d*s22_d - s12_d*s12_d)"
    " - sx1_d*(s1y_d*s22_d - s12_d*s2y_d)"
    " + sx2_d*(s1y_d*s12_d - s11_d*s2y_d))"
)
_OLS_DET1 = (
    "(n_d*(s1y_d*s22_d - s12_d*s2y_d)"
    " - sy_d*(sx1_d*s22_d - s12_d*sx2_d)"
    " + sx2_d*(sx1_d*s2y_d - s1y_d*sx2_d))"
)
_OLS_DET2 = (
    "(n_d*(s11_d*s2y_d - s1y_d*s12_d)"
    " - sx1_d*(sx1_d*s2y_d - s1y_d*sx2_d)"
    " + sy_d*(sx1_d*s12_d - s11_d*sx2_d))"
)
_OLS_OUT = (
    "n_rows, "
    f"CAST(floor({_OLS_DET0} / {_OLS_DET} * 1000000.0 + 0.5) AS BIGINT)"
    " AS b0_micro, "
    f"CAST(floor({_OLS_DET1} / {_OLS_DET} * 1000000.0 + 0.5) AS BIGINT)"
    " AS b1_micro, "
    f"CAST(floor({_OLS_DET2} / {_OLS_DET} * 1000000.0 + 0.5) AS BIGINT)"
    " AS b2_micro"
)

OLS_ORACLE = f"""
WITH obs AS (
    SELECT CAST(l_quantity AS BIGINT) AS x1,
           CAST(round(l_discount * 100) AS BIGINT) AS x2,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS y
    FROM lineitem
),
sums AS (
    SELECT CAST(count(*) AS BIGINT)  AS n_rows,
           CAST(sum(x1) AS BIGINT)   AS sx1,
           CAST(sum(x2) AS BIGINT)   AS sx2,
           CAST(sum(x1*x1) AS BIGINT) AS s11,
           CAST(sum(x1*x2) AS BIGINT) AS s12,
           CAST(sum(x2*x2) AS BIGINT) AS s22,
           CAST(sum(y) AS BIGINT)    AS sy,
           CAST(sum(x1*y) AS BIGINT) AS s1y,
           CAST(sum(x2*y) AS BIGINT) AS s2y
    FROM obs
),
d AS (
    SELECT n_rows,
           CAST(n_rows AS DOUBLE) AS n_d,
           CAST(sx1 AS DOUBLE) AS sx1_d, CAST(sx2 AS DOUBLE) AS sx2_d,
           CAST(s11 AS DOUBLE) AS s11_d, CAST(s12 AS DOUBLE) AS s12_d,
           CAST(s22 AS DOUBLE) AS s22_d, CAST(sy AS DOUBLE)  AS sy_d,
           CAST(s1y AS DOUBLE) AS s1y_d, CAST(s2y AS DOUBLE) AS s2y_d
    FROM sums
)
SELECT {_OLS_OUT} FROM d
"""


@register("ols_normal_equations", OLS_ORACLE)
def q_ols_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed multivariate linear regression by normal equations:
    price_cents ~ b0 + b1·quantity + b2·discount_cents. The nine
    sufficient statistics (X'X, X'y) are EXACT integer sums — the
    whole regression is one map-side-combinable aggregate, the
    paradigm case of 'ML as aggregation': at 100 TB this is a single
    scan with a 9-number result, no iteration, no driver data. The
    3×3 solve (Cramer) runs on a one-row frame with the algebra text
    shared verbatim with the oracle, so the doubles agree exactly.

    Integer headroom: Σ x1·y ≤ rows·50·10^7 — int64-safe beyond
    10^9 rows; past that, partial sums per partition stay exact and
    only the final combine would need decimal widening."""
    obs = _t(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    sums = obs.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("x1").cast("long").alias("sx1"),
        F.sum("x2").cast("long").alias("sx2"),
        F.sum(F.col("x1") * F.col("x1")).cast("long").alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("long").alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).cast("long").alias("s22"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).cast("long").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("long").alias("s2y"),
    )
    d = sums.selectExpr(
        "n_rows",
        "CAST(n_rows AS DOUBLE) AS n_d",
        "CAST(sx1 AS DOUBLE) AS sx1_d",
        "CAST(sx2 AS DOUBLE) AS sx2_d",
        "CAST(s11 AS DOUBLE) AS s11_d",
        "CAST(s12 AS DOUBLE) AS s12_d",
        "CAST(s22 AS DOUBLE) AS s22_d",
        "CAST(sy AS DOUBLE) AS sy_d",
        "CAST(s1y AS DOUBLE) AS s1y_d",
        "CAST(s2y AS DOUBLE) AS s2y_d",
    )
    return d.selectExpr(*[e.strip() for e in _split_select(_OLS_OUT)])


def _split_select(select_list: str) -> list[str]:
    """Split a SQL select list on top-level commas (the OLS output
    expressions contain commas only inside parens we never nest
    commas in, so a paren-depth scanner suffices)."""
    out, depth, cur = [], 0, []
    for ch in select_list:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out


# ---------------------------------------------------------------- #
# markov_stationary_micro                                           #
# ---------------------------------------------------------------- #
def _mk_step(prev: str) -> str:
    """One all-integer power-iteration step as a DuckDB CTE body:
    v'(t) = Σ_s (v(s)·cnt(s,t)) // tot(s). Every term is an integer
    division of integers, so the sum is order-independent — no float
    enters the iteration in either engine."""
    return f"""
    SELECT t.nxt AS s,
           CAST(sum((v.v * t.cnt) // t.tot) AS BIGINT) AS v
    FROM {prev} v JOIN trans t ON v.s = t.cur
    GROUP BY t.nxt
    """


MARKOV_ORACLE = f"""
WITH seq AS (
    SELECT event_type AS cur,
           lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS nxt
    FROM events
),
trans AS (
    SELECT cur, nxt, CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(count(*)) OVER (PARTITION BY cur) AS BIGINT) AS tot
    FROM seq WHERE nxt IS NOT NULL
    GROUP BY cur, nxt
),
states AS (SELECT DISTINCT cur AS s FROM trans),
ns AS (SELECT CAST(count(*) AS BIGINT) AS k FROM states),
v0 AS (SELECT s, CAST(1000000 // k AS BIGINT) AS v
       FROM states CROSS JOIN ns),
v1 AS ({_mk_step('v0')}),
v2 AS ({_mk_step('v1')}),
v3 AS ({_mk_step('v2')}),
v4 AS ({_mk_step('v3')})
SELECT s AS event_type, v AS stationary_micro FROM v4
"""


@register("markov_stationary_micro", MARKOV_ORACLE)
def q_markov_stationary_micro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the user-journey Markov chain by
    power iteration (4 unrolled steps from uniform), entirely in
    integer micro-units: each step is v'(t) = Σ_s (v(s)·cnt(s,t))
    DIV tot(s) — integer terms, order-independent sums, so the
    iterate is reproducible across engines and partitionings (the
    floor leaks ≤ |states| micro per step, identically everywhere).

    Scale shape: the transition matrix is |states|² after one
    data-sized groupBy (lead() windows are per-user, bounded
    partitions); the iteration then runs on that tiny aggregate —
    same post-aggregation-iteration pattern as pagerank/pca here."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).where(F.col("nxt").isNotNull())
    counts = seq.groupBy("cur", "nxt").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    trans = counts.withColumn(
        "tot",
        F.sum("cnt").over(Window.partitionBy("cur")).cast("long"),
    )
    # |states|² rows, consumed by the states probe AND all 4 unrolled
    # iterations: without this checkpoint the events-scale lead-window
    # + groupBy lineage re-executes per consumer (~8 copies in the lazy
    # plan, round-11 audit) — the same reason pagerank/kcore truncate
    # per round. Lazy: the first action fills it.
    from taxi_trips_etl_spark.dataprep.materialize import materialize

    trans = trans.transform(materialize, eager=False)
    states = trans.select(F.col("cur").alias("s")).distinct()
    ns = states.agg(F.count(F.lit(1)).cast("long").alias("k"))
    v = states.crossJoin(F.broadcast(ns)).selectExpr(
        "s", "CAST(1000000 DIV k AS BIGINT) AS v"
    )
    for _ in range(4):
        v = (
            v.join(trans, F.col("s") == F.col("cur"))
            .select(
                F.col("nxt").alias("s2"),
                F.expr("(v * cnt) DIV tot").alias("term"),
            )
            .groupBy("s2")
            .agg(F.sum("term").cast("long").alias("v"))
            .withColumnRenamed("s2", "s")
        )
    return v.select(
        F.col("s").alias("event_type"),
        F.col("v").alias("stationary_micro"),
    )


# ---------------------------------------------------------------- #
# acctbal_decile_profile                                            #
# ---------------------------------------------------------------- #
# NTILE's remainder rule written explicitly from row_number, shared by
# both engines (first n%10 buckets get the extra row), instead of
# trusting two engines' ntile() tie conventions to coincide.
_DECILE_EXPR = (
    "CAST(CASE WHEN rn <= (n_total % 10) * ((n_total DIV 10) + 1)"
    " THEN (rn - 1) DIV ((n_total DIV 10) + 1)"
    " ELSE (n_total % 10)"
    "  + (rn - 1 - (n_total % 10) * ((n_total DIV 10) + 1))"
    "    DIV (n_total DIV 10)"
    " END + 1 AS BIGINT)"
)

DECILE_ORACLE = f"""
WITH ranked AS (
    SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
           row_number() OVER (
               ORDER BY CAST(round(c_acctbal * 100) AS BIGINT), c_custkey
           ) AS rn,
           count(*) OVER () AS n_total
    FROM customer
),
assigned AS (
    SELECT bal_cents, {_DECILE_EXPR.replace('DIV', '//')} AS decile
    FROM ranked
)
SELECT decile,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(bal_cents) AS BIGINT) AS min_cents,
       CAST(max(bal_cents) AS BIGINT) AS max_cents,
       CAST(sum(bal_cents) AS BIGINT) AS sum_cents
FROM assigned GROUP BY 1
"""


@register("acctbal_decile_profile", DECILE_ORACLE)
def q_acctbal_decile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile profiling of account balances (feature binning for
    model inputs / monitoring) WITHOUT the single-partition window
    ntile() would plan: global ranks come from the two-pass
    range-partition + partition-offset scheme (operators/ids.py), so
    the sort parallelizes at any scale; the NTILE remainder rule is
    then pure arithmetic on (rank, n). Tie order is pinned by the
    (balance, custkey) unique key — same rule the oracle uses."""
    from taxi_trips_etl_spark.operators.ids import assign_global_ids

    cust = _t(spark, sf_dir, "customer").select(
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
        "c_custkey",
    )
    ranked = assign_global_ids(
        cust, ["bal_cents", "c_custkey"], id_col="rn"
    )
    n_total = ranked.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    assigned = ranked.crossJoin(F.broadcast(n_total)).selectExpr(
        "bal_cents", f"{_DECILE_EXPR} AS decile"
    )
    return assigned.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("bal_cents").cast("long").alias("min_cents"),
        F.max("bal_cents").cast("long").alias("max_cents"),
        F.sum("bal_cents").cast("long").alias("sum_cents"),
    )
