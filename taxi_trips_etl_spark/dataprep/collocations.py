"""Collocation statistics over a tokenized corpus.

PMI collocation mining and nucleus (top-p) vocabulary truncation —
the two vocabulary-level statistics a tokenizer/mixture pipeline
reads off a corpus before training.

Scale shapes (both): the corpus is touched ONCE by a map-side-
combinable count aggregate; every subsequent step (windows, joins,
thresholds) runs on the aggregated vocab/bigram table, which is
bounded by distinct-token (not corpus) size. PMI's marginal counts
come from windows OVER THE PAIR-COUNT TABLE rather than re-scanning
the corpus: sum(pair_cnt) partitioned by the left word IS the left
marginal, because every bigram occurrence appears exactly once in
the pair counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_PATTERN = r"\s+"


def _tokens(docs: DataFrame, text: str) -> F.Column:
    return F.split(F.trim(F.lower(F.col(text))), TOKEN_PATTERN)


def pmi_collocations(
    docs: DataFrame, text: str = "text", min_count: int = 5
) -> DataFrame:
    """Pointwise mutual information of adjacent token bigrams.

    pmi(x,y) = ln( c_xy · N / (c_x· · c_·y) ) with all counts taken
    over bigram positions (N = total bigrams, c_x· = bigrams with x on
    the left, c_·y = with y on the right), so every number derives
    from one bigram-count aggregate. The ln input is a single IEEE
    division of two exactly-representable integer products; round(6)
    absorbs last-ulp log differences across engines.

    Returns (w1, w2, pair_cnt, pmi) for pairs with pair_cnt >= min_count.
    """
    toks = docs.select(_tokens(docs, text).alias("t")).filter(
        F.size("t") >= 2
    )
    pairs = (
        toks.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t)-1),"
                    " i -> struct(t[i-1] AS w1, t[i] AS w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )
    pc = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("pair_cnt")
    )
    total = pc.agg(F.sum("pair_cnt").alias("n_bigrams"))
    enriched = (
        pc.withColumn(
            "cl", F.sum("pair_cnt").over(Window.partitionBy("w1"))
        )
        .withColumn("cr", F.sum("pair_cnt").over(Window.partitionBy("w2")))
        .crossJoin(F.broadcast(total))
    )
    return enriched.filter(F.col("pair_cnt") >= min_count).select(
        "w1",
        "w2",
        "pair_cnt",
        F.round(
            F.log(
                (F.col("pair_cnt") * F.col("n_bigrams")).cast("double")
                / (F.col("cl") * F.col("cr")).cast("double")
            ),
            6,
        ).alias("pmi"),
    )


def vocab_top_p(
    docs: DataFrame,
    text: str = "text",
    p_num: int = 1,
    p_den: int = 2,
) -> DataFrame:
    """Nucleus (top-p) vocabulary: the smallest count-descending
    prefix of the vocabulary covering fraction p_num/p_den of all
    token occurrences — i.e. keep a token iff the coverage BEFORE it
    is still short of p. The comparison is exact integer arithmetic
    ((cum - cnt)·p_den < p_num·N), no float thresholds.

    The rank/cumsum window is global but runs on the aggregated VOCAB
    table (distinct tokens), never the corpus; at a billion-token
    vocab swap in approx-percentile cutpoints instead.

    Returns (word, cnt, rnk, cum_cnt) for the kept prefix.
    """
    words = (
        docs.select(F.explode(_tokens(docs, text)).alias("word"))
        .filter(F.col("word") != "")
    )
    vc = words.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    total = vc.agg(F.sum("cnt").alias("n_tokens"))
    w = Window.orderBy(F.col("cnt").desc(), "word")
    cum = (
        vc.withColumn("rnk", F.row_number().over(w).cast("long"))
        .withColumn(
            "cum_cnt",
            F.sum("cnt")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
        .crossJoin(F.broadcast(total))
    )
    return cum.filter(
        (F.col("cum_cnt") - F.col("cnt")) * p_den
        < p_num * F.col("n_tokens")
    ).select("word", "cnt", "rnk", "cum_cnt")
