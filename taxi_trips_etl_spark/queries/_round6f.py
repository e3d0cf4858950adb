# Round-6 batch 9: positional phrase search (the IR posting-join
# primitive), Merkle-style table-diff checksums (anti-entropy sync),
# and prefix autocomplete. Counts and xor-folded hashes are exact
# integers — nothing float in any of the three.
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from taxi_trips_etl_spark.queries._registry import TOKS_SQL, _t, register

__all__ = [
    "q_phrase_search_positional",
    "q_table_diff_checksums",
    "q_autocomplete_prefixes",
]


# ---------------------------------------------------------------- #
# phrase_search_positional                                          #
# ---------------------------------------------------------------- #
_PHRASE = ("the", "table")

PHRASE_ORACLE = f"""
WITH toks AS (
    SELECT doc_id,
           unnest(generate_series(1, len({TOKS_SQL}))) AS pos,
           unnest({TOKS_SQL}) AS tok
    FROM documents
),
hits AS (
    SELECT t1.doc_id, t1.pos
    FROM toks t1
    JOIN toks t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
    WHERE t1.tok = '{_PHRASE[0]}' AND t2.tok = '{_PHRASE[1]}'
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches,
       CAST(min(pos) AS BIGINT) AS first_pos
FROM hits GROUP BY 1
"""


@register("phrase_search_positional", PHRASE_ORACLE)
def q_phrase_search_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search over a positional inverted index: the
    phrase matches where consecutive postings align at pos, pos+1 —
    the adjacency-join every phrase/proximity query engine runs over
    its positional postings (longer phrases chain more of the same
    join; the testdata's uniform 30-word vocabulary makes no 3-gram
    reliably frequent, so the registered phrase is a bigram).

    Scale shape: only postings for the phrase's OWN terms enter the
    joins (filter before join — the posting lists, not the corpus),
    and both joins are equi-joins on (doc_id, pos) so one hash
    partitioning serves the chain. Rarest-term-first ordering is the
    classic next knob; positions are integers, counts exact."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("toks")
    )
    toks = docs.select(
        "doc_id", F.posexplode("toks").alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    t1 = toks.filter(F.col("tok") == _PHRASE[0]).select("doc_id", "pos")
    t2 = toks.filter(F.col("tok") == _PHRASE[1]).select(
        F.col("doc_id").alias("d2"), F.col("pos").alias("p2")
    )
    hits = t1.join(
        t2,
        (F.col("doc_id") == F.col("d2")) & (F.col("p2") == F.col("pos") + 1),
    )
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.min("pos").cast("long").alias("first_pos"),
    )


# ---------------------------------------------------------------- #
# table_diff_checksums                                              #
# ---------------------------------------------------------------- #
_DIFF_BUCKETS = 64

TABLE_DIFF_ORACLE = f"""
WITH a AS (
    SELECT o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           o_orderpriority
    FROM orders
),
-- version B: deterministic drift — keys ≡7 (mod 1000) get +1 cent,
-- keys ≡13 (mod 1000) are deleted
b AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 1000 = 7 THEN cents + 1 ELSE cents END
               AS cents,
           o_orderpriority
    FROM a WHERE o_orderkey % 1000 != 13
),
ha AS (
    SELECT CAST(o_orderkey % {_DIFF_BUCKETS} AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_a,
           CAST(bit_xor(CAST(('0x' || substr(md5(
               CAST(o_orderkey AS VARCHAR) || '|' ||
               CAST(cents AS VARCHAR) || '|' || o_orderpriority
           ), 1, 15)) AS BIGINT)) AS BIGINT) AS hash_a
    FROM a GROUP BY 1
),
hb AS (
    SELECT CAST(o_orderkey % {_DIFF_BUCKETS} AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_b,
           CAST(bit_xor(CAST(('0x' || substr(md5(
               CAST(o_orderkey AS VARCHAR) || '|' ||
               CAST(cents AS VARCHAR) || '|' || o_orderpriority
           ), 1, 15)) AS BIGINT)) AS BIGINT) AS hash_b
    FROM b GROUP BY 1
)
SELECT bucket, n_a, n_b,
       CAST(CASE WHEN n_a != n_b OR hash_a != hash_b
            THEN 1 ELSE 0 END AS BIGINT) AS differs
FROM ha JOIN hb USING (bucket)
"""


@register("table_diff_checksums", TABLE_DIFF_ORACLE)
def q_table_diff_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-style anti-entropy table diff: both table versions fold
    a per-row md5 fingerprint into ONE xor per key bucket, so two
    100 TB replicas compare by exchanging |buckets| rows — only
    buckets that differ need row-level drill-down (the
    replica-reconciliation shape used by sync protocols). xor is
    commutative/associative, so the fold is partition-order-free,
    and the md5→int64 fingerprint matches the engine's established
    sampling-hash pattern (dataprep/sampling.py).

    The drifted version B is derived in-plan (keys ≡7 mod 1000
    updated, ≡13 deleted) so the entry is self-contained; production
    points A and B at two real snapshots. One hash aggregate per
    side, broadcast-size output."""
    a = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderpriority",
    )
    b = a.filter(F.col("o_orderkey") % 1000 != 13).withColumn(
        "cents",
        F.when(
            F.col("o_orderkey") % 1000 == 7, F.col("cents") + 1
        ).otherwise(F.col("cents")),
    )
    fp = (
        "CAST(conv(substr(md5(CAST(o_orderkey AS STRING) || '|' ||"
        " CAST(cents AS STRING) || '|' || o_orderpriority), 1, 15),"
        " 16, 10) AS BIGINT)"
    )

    def side(df: DataFrame, suffix: str) -> DataFrame:
        return df.selectExpr(
            f"CAST(o_orderkey % {_DIFF_BUCKETS} AS BIGINT) AS bucket",
            f"{fp} AS h",
        ).groupBy("bucket").agg(
            F.count(F.lit(1)).cast("long").alias(f"n_{suffix}"),
            F.expr("bit_xor(h)").cast("long").alias(f"hash_{suffix}"),
        )

    return (
        side(a, "a")
        .join(side(b, "b"), "bucket")
        .selectExpr(
            "bucket",
            "n_a",
            "n_b",
            "CAST(CASE WHEN n_a != n_b OR hash_a != hash_b"
            " THEN 1 ELSE 0 END AS BIGINT) AS differs",
        )
    )


# ---------------------------------------------------------------- #
# autocomplete_prefixes                                             #
# ---------------------------------------------------------------- #
AUTOCOMPLETE_ORACLE = f"""
WITH tok AS (
    SELECT unnest({TOKS_SQL}) AS tok FROM documents
),
counted AS (
    SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM tok
    WHERE len(tok) >= 3 GROUP BY 1
),
pref AS (
    SELECT CAST(p AS BIGINT) AS prefix_len, substr(tok, 1, p) AS prefix,
           tok, cnt
    FROM counted CROSS JOIN (SELECT unnest([3, 4]) AS p)
    WHERE len(tok) >= p
),
ranked AS (
    SELECT prefix_len, prefix, tok, cnt,
           row_number() OVER (PARTITION BY prefix_len, prefix
                              ORDER BY cnt DESC, tok) AS rk,
           CAST(sum(cnt) OVER (PARTITION BY prefix_len, prefix)
                AS BIGINT) AS prefix_total
    FROM pref
)
SELECT prefix_len, prefix, tok AS top_token, cnt AS token_count,
       prefix_total
FROM ranked WHERE rk = 1
"""


@register("autocomplete_prefixes", AUTOCOMPLETE_ORACLE)
def q_autocomplete_prefixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocomplete index build: for every 3- and 4-character token
    prefix, the highest-frequency completion (count-desc, lexical
    tiebreak) plus the prefix's total mass — the offline artifact
    behind type-ahead suggestion serving.

    Scale shape: the corpus collapses to (token, count) FIRST (one
    partial+final agg), and prefixes expand from that vocabulary-
    sized table (×2 rows each), so the window sorts run over
    vocabulary, never corpus. Counts exact."""
    toks = (
        _t(spark, sf_dir, "documents")
        .select(
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok")
        )
        .filter(F.length("tok") >= 3)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    pref = (
        toks.crossJoin(
            F.broadcast(
                toks.sparkSession.range(3, 5).select(
                    F.col("id").cast("int").alias("p")
                )
            )
        )
        .filter(F.length("tok") >= F.col("p"))
        .select(
            F.col("p").cast("long").alias("prefix_len"),
            F.expr("substr(tok, 1, p)").alias("prefix"),
            "tok",
            "cnt",
        )
    )
    w = Window.partitionBy("prefix_len", "prefix")
    ranked = pref.select(
        "prefix_len",
        "prefix",
        "tok",
        "cnt",
        F.row_number()
        .over(w.orderBy(F.col("cnt").desc(), "tok"))
        .alias("rk"),
        F.sum("cnt").over(w).cast("long").alias("prefix_total"),
    )
    return ranked.filter(F.col("rk") == 1).select(
        "prefix_len",
        "prefix",
        F.col("tok").alias("top_token"),
        F.col("cnt").alias("token_count"),
        "prefix_total",
    )
