"""Approximate aggregates: sketch accuracy bounds vs exact answers.

Not oracle-checkable (HLL/KLL internals are engine-specific) — verified
by bounding error against the exact computation instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = li.select(F.countDistinct("l_partkey").alias("n")).collect()[0].n
    approx = li.select(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("n")
    ).collect()[0].n
    assert abs(approx - exact) / exact < 0.06  # 3×rsd headroom


def test_approx_percentile_brackets_exact(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = li.select(F.expr("percentile(l_extendedprice, 0.5)").alias("m")).collect()[
        0
    ].m
    approx = li.select(
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("m")
    ).collect()[0].m
    assert abs(approx - exact) / exact < 0.01
