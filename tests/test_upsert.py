from __future__ import annotations

from taxi_trips_etl_spark.operators.upsert import upsert


def test_upsert_update_insert_passthrough(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, v double",
    )
    updates = spark.createDataFrame(
        [(2, "B!", 99.0), (4, "d", 40.0)], "k long, name string, v double"
    )
    out = {r.k: (r.name, r.v) for r in upsert(target, updates, ["k"]).collect()}
    assert out == {
        1: ("a", 10.0),    # untouched
        2: ("B!", 99.0),   # updated
        3: ("c", 30.0),    # untouched
        4: ("d", 40.0),    # inserted
    }


def test_upsert_null_values_in_update_win(spark):
    # An update row carrying NULL in a value column must still win
    # (MERGE semantics: matched → take source values, even NULL).
    target = spark.createDataFrame([(1, "x")], "k long, name string")
    updates = spark.createDataFrame([(1, None)], "k long, name string")
    out = upsert(target, updates, ["k"]).collect()
    assert out[0].name is None
