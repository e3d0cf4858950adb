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


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_dir):
    """Runtime row-level filtering: a selective dim filter injects a
    bloom_filter_agg on the build side and a might_contain probe on the
    fact side (the shuffle-reduction lever when broadcast is off /
    impossible). At 100 TB the defaults trigger this on their own —
    the scan-size threshold is lowered here only because the test
    corpus is tiny."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            "1GB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_totalprice") > 400000
        )
        j = li.join(o, li["l_orderkey"] == o["o_orderkey"])
        plan = j._jdf.queryExecution().toString()
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
        # And the filtered result is still correct.
        expect = (
            li.join(o.hint("broadcast"), li["l_orderkey"] == o["o_orderkey"])
            .count()
        )
        assert j.count() == expect
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
