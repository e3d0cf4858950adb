"""Bucketed tables must join without a shuffle (co-located join)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from taxi_trips_etl_spark.sources.writers import write_bucketed


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(
        li, "b_lineitem", ["l_orderkey"], buckets=8,
        sort_cols=["l_orderkey"], path=str(tmp_path / "b_li"),
    )
    write_bucketed(
        od, "b_orders", ["o_orderkey"], buckets=8,
        sort_cols=["o_orderkey"], path=str(tmp_path / "b_od"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _plan(joined)
        # Co-located: SortMergeJoin with zero Exchange operators.
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")
