"""Airflow DAG shim: stage callables run standalone (as Airflow would
drive them), staging dirs are dropped like the reference's temp tables,
and build_dag import-gates airflow cleanly."""

from __future__ import annotations

import os

import pytest

from taxi_trips_etl_spark.plans.airflow_dag import (
    build_dag,
    enrichment,
    final_result,
    normalization,
    storage_to_bq,
)


def test_stage_chain_end_to_end(spark, sf_dir, tmp_path):
    work = str(tmp_path / "work")
    ds = "2026-02-01"
    assert storage_to_bq(spark, sf_dir=sf_dir, work_dir=work) is True
    normalization(spark, work_dir=work)
    enrichment(spark, work_dir=work, ds=ds)
    final_result(spark, work_dir=work, ds=ds)

    # Temp-table discipline: intermediates dropped, outputs present.
    assert not os.path.exists(f"{work}/temp_trips")
    assert not os.path.exists(f"{work}/normalized_trips")
    assert os.path.exists(f"{work}/trips_20260201")
    result = spark.read.parquet(f"{work}/most_populars_20260201")
    assert result.count() > 0
    assert {"popularity", "route", "dropoff_hexagon", "pickup_hexagon"} <= set(
        result.columns
    )


def test_short_circuit_on_missing_input(spark, tmp_path):
    work = str(tmp_path / "work")
    assert storage_to_bq(spark, sf_dir=str(tmp_path / "nope"), work_dir=work) is False
    # Downstream stages gate on missing staging dirs without raising.
    normalization(spark, work_dir=work)
    enrichment(spark, work_dir=work, ds="2026-02-01")
    final_result(spark, work_dir=work, ds="2026-02-01")
    assert not os.listdir(work) if os.path.exists(work) else True


def test_build_dag_needs_airflow(tmp_path):
    try:
        import airflow  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError):
            build_dag(str(tmp_path), str(tmp_path))
    else:
        dag = build_dag(str(tmp_path), str(tmp_path))
        assert [t.task_id for t in dag.topological_sort()] == [
            "storage_to_bq", "normalization", "enrichment", "final_result",
        ]
