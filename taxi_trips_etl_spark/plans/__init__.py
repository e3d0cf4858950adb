from taxi_trips_etl_spark.plans.pipeline import Pipeline, Stage, run_taxi_pipeline
from taxi_trips_etl_spark.plans.models import ModelRegistry

__all__ = ["Pipeline", "Stage", "run_taxi_pipeline", "ModelRegistry"]
