"""dbt-parity model registry (SURVEY.md §1.1 dbt row, EP3).

The reference's dbt project (/root/reference/models/) is four models —
``tripss`` (date/drive_time projection, models/tripss.sql:1-6),
``daily_trip_metrics`` (grouped avg/sum, models/daily_trip_metrics.sql:1-3),
``trips_view`` (count(1) view, models/trips_view.sql:1) and the staging
rename model (models/staging/taxi_trips/stg_taxi_trips__tripss.sql:1-21)
— wired by ``ref()``/``source()`` with table-or-view materialization
(dbt_project.yml:38-43).

Here: a model is a named function ``(registry) -> DataFrame``; ``ref``
and ``source`` are catalog lookups; ``materialized='table'`` persists
parquet, ``'view'`` registers a temp view. Python is the template
language — no Jinja. Topological execution follows from models calling
``ref()`` (memoized), so a model DAG of any depth resolves correctly.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taxi_trips_etl_spark.functions.scalar import timestamp_diff_minutes


class ModelRegistry:
    def __init__(self, spark: SparkSession, out_dir: str | None = None):
        self.spark = spark
        self.out_dir = out_dir
        self._sources: dict[str, DataFrame] = {}
        self._models: dict[str, tuple[Callable[["ModelRegistry"], DataFrame], str]] = {}
        self._built: dict[str, DataFrame] = {}

    # -- declaration ------------------------------------------------------
    def add_source(self, name: str, df: DataFrame) -> None:
        """dbt ``source()`` analogue (models/sources.yml:3-29)."""
        self._sources[name] = df

    def model(self, name: str, materialized: str = "table"):
        """Decorator: register a model fn with its materialization."""
        def deco(fn: Callable[["ModelRegistry"], DataFrame]):
            self._models[name] = (fn, materialized)
            return fn
        return deco

    # -- resolution -------------------------------------------------------
    def source(self, name: str) -> DataFrame:
        return self._sources[name]

    def ref(self, name: str) -> DataFrame:
        """dbt ``ref()``: build-on-demand with memoization (DAG order)."""
        if name not in self._built:
            fn, materialized = self._models[name]
            df = fn(self)
            if materialized == "table" and self.out_dir:
                path = f"{self.out_dir}/{name}"
                df.write.mode("overwrite").parquet(path)
                df = self.spark.read.parquet(path)
            elif materialized == "view":
                df.createOrReplaceTempView(name)
            self._built[name] = df
        return self._built[name]

    def run(self) -> dict[str, DataFrame]:
        """``dbt run``: build every declared model."""
        return {name: self.ref(name) for name in list(self._models)}


def taxi_models(spark: SparkSession, enriched: DataFrame, out_dir: str | None = None) -> ModelRegistry:
    """The four reference models over an enriched-trips input.

    ``drive_time`` = timestamp_diff(dropoff, pickup, minute)
    (models/tripss.sql:3); daily metrics = avg/sum of drive_time and
    total_amount per pickup_date ordered date-desc
    (models/daily_trip_metrics.sql:1-3); trips_view = count(1)
    (models/trips_view.sql:1); staging model renames source columns
    (stg_taxi_trips__tripss.sql:9-19).
    """
    reg = ModelRegistry(spark, out_dir)
    reg.add_source("trips_enriched", enriched)

    @reg.model("stg_taxi_trips__tripss")
    def stg(reg: ModelRegistry) -> DataFrame:
        src = reg.source("trips_enriched")
        return src.select(
            F.col("pickup_datetime").alias("pickup_ts"),
            F.col("dropoff_datetime").alias("dropoff_ts"),
            F.col("pickup_location_id").alias("pickup_zone"),
            F.col("dropoff_location_id").alias("dropoff_zone"),
            F.col("daypart"),
        )

    @reg.model("tripss")
    def tripss(reg: ModelRegistry) -> DataFrame:
        src = reg.source("trips_enriched")
        return src.select(
            F.to_date("pickup_datetime").alias("pickup_date"),
            timestamp_diff_minutes(
                F.col("dropoff_datetime"), F.col("pickup_datetime")
            ).alias("drive_time"),
            F.col("total_amount"),
            F.col("pickup_location_id"),
        )

    @reg.model("daily_trip_metrics")
    def daily(reg: ModelRegistry) -> DataFrame:
        # Money is aggregated as exact integer cents (then divided once
        # for the average): float sums of cent-quantized values land
        # exactly on .005 rounding boundaries, where engines disagree —
        # integer sums are portable and exact at any scale/parallelism.
        cents = F.round(F.col("total_amount") * 100).cast("long")
        return (
            reg.ref("tripss")
            .groupBy("pickup_date")
            .agg(
                F.count(F.lit(1)).alias("n_trips"),
                F.avg("drive_time").alias("avg_drive_time"),
                F.sum("drive_time").alias("total_drive_time"),
                F.sum(cents).alias("total_amount_cents"),
            )
            .withColumn(
                "avg_amount",
                F.col("total_amount_cents").cast("double") / 100.0 / F.col("n_trips"),
            )
            .orderBy(F.col("pickup_date").desc())
        )

    @reg.model("trips_view", materialized="view")
    def trips_view(reg: ModelRegistry) -> DataFrame:
        return reg.source("trips_enriched").agg(
            F.count(F.lit(1)).alias("trip_count")
        )

    return reg
