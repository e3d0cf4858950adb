# Round-6 batch 12: warehouse-hygiene audits — referential-integrity
# orphan counts across the star schema's foreign keys, and join-
# multiplicity hotspot diagnosis (the report that tells you WHICH keys
# will skew a join before you run it). Pure integer counting.
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taxi_trips_etl_spark.queries._registry import _t, register

__all__ = [
    "q_referential_integrity_audit",
    "q_join_multiplicity_hotspots",
]

REFINTEG_ORACLE = """
SELECT * FROM (
    SELECT 'lineitem.l_orderkey->orders' AS fk,
           CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_child,
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_orphans
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM part p
                                   WHERE p.p_partkey = l.l_partkey))
                AS BIGINT)
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier',
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                   WHERE s.s_suppkey = l.l_suppkey))
                AS BIGINT)
    UNION ALL
    SELECT 'orders.o_custkey->customer',
           CAST((SELECT count(*) FROM orders) AS BIGINT),
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT)
    UNION ALL
    SELECT 'customer.c_nationkey->nation',
           CAST((SELECT count(*) FROM customer) AS BIGINT),
           CAST((SELECT count(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey))
                AS BIGINT)
)
"""


@register("referential_integrity_audit", REFINTEG_ORACLE)
def q_referential_integrity_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Referential-integrity sweep over the star schema's foreign
    keys: child row count and orphan count (child keys with no
    parent) per FK — the load-gate check a lakehouse runs because,
    unlike a warehouse, nothing enforces FKs at write time.

    Scale shape (r13): ONE pass per child table. All FKs of a child
    are checked in a single scan — LEFT joins against the DISTINCT
    parent keys (broadcast for the dims, key-shuffle for the fact-fact
    lineitem→orders FK), one aggregate counting rows and per-FK
    parent-key nulls, then ``stack`` to one row per FK. A left join
    against distinct keys neither duplicates nor drops child rows, so
    null-parent counting ≡ the per-FK anti-join count, while lineitem
    is scanned once instead of six times and the five
    ``count(*)``-crossJoin nested-loop broadcasts disappear (guide
    §1.2/§2.4: fewest passes fundamentally required; before/after
    plans in plans/r13/)."""

    def nulls(pkey: str) -> F.Column:
        return F.sum(
            F.when(F.col(pkey).isNull(), 1).otherwise(0)
        ).cast("long")

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    o = _t(spark, sf_dir, "orders")
    li_row = (
        li.join(
            o.select("o_orderkey").distinct(),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left",
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "part").select("p_partkey").distinct()),
            F.col("l_partkey") == F.col("p_partkey"),
            "left",
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "supplier").select("s_suppkey").distinct()
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_child"),
            nulls("o_orderkey").alias("orph_orders"),
            nulls("p_partkey").alias("orph_part"),
            nulls("s_suppkey").alias("orph_supp"),
        )
        .selectExpr(
            "stack(3, "
            "'lineitem.l_orderkey->orders', n_child, orph_orders, "
            "'lineitem.l_partkey->part', n_child, orph_part, "
            "'lineitem.l_suppkey->supplier', n_child, orph_supp"
            ") AS (fk, n_child, n_orphans)"
        )
    )
    o_row = (
        o.select("o_custkey")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "customer").select("c_custkey").distinct()
            ),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_child"),
            nulls("c_custkey").alias("n_orphans"),
        )
        .select(
            F.lit("orders.o_custkey->customer").alias("fk"),
            "n_child",
            "n_orphans",
        )
    )
    c_row = (
        _t(spark, sf_dir, "customer")
        .select("c_nationkey")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").select("n_nationkey").distinct()
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "left",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_child"),
            nulls("n_nationkey").alias("n_orphans"),
        )
        .select(
            F.lit("customer.c_nationkey->nation").alias("fk"),
            "n_child",
            "n_orphans",
        )
    )
    return li_row.unionAll(o_row).unionAll(c_row)


JOIN_HOTSPOT_ORACLE = """
WITH l AS (
    SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS n_l
    FROM lineitem GROUP BY 1
),
r AS (
    SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS n_r
    FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1
),
m AS (
    SELECT l.k, n_l, n_r, n_l * n_r AS fanout
    FROM l JOIN r ON l.k = r.k
)
SELECT CAST(k AS BIGINT) AS join_key, n_l, n_r,
       CAST(fanout AS BIGINT) AS fanout
FROM m
ORDER BY fanout DESC, join_key
LIMIT 10
"""


@register("join_multiplicity_hotspots", JOIN_HOTSPOT_ORACLE)
def q_join_multiplicity_hotspots(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Join-skew pre-flight: for a prospective self-join of lineitem
    against its returned subset on l_partkey, the top-10 keys by
    OUTPUT fanout (n_left × n_right) — the diagnosis that tells you
    which keys need salting (operators/skew.salted_join /
    adaptive_salt_plan consume exactly this shape) BEFORE the join
    melts an executor.

    Scale shape: two partial+final counts and a key-level join of
    the two count tables — the diagnostic costs two aggregations, it
    never materializes the fanout it predicts. TakeOrdered top-10."""
    li = _t(spark, sf_dir, "lineitem")
    left = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("n_l")
    )
    right = (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy(F.col("l_partkey").alias("k2"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_r"))
    )
    m = left.join(right, F.col("k") == F.col("k2")).select(
        F.col("k").cast("long").alias("join_key"),
        "n_l",
        "n_r",
        (F.col("n_l") * F.col("n_r")).cast("long").alias("fanout"),
    )
    return m.orderBy(F.col("fanout").desc(), "join_key").limit(10)
