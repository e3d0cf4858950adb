from taxi_trips_etl_spark.operators.normalize import normalize_trips
from taxi_trips_etl_spark.operators.enrich import dedup_zones, enrich_trips
from taxi_trips_etl_spark.operators.popularity import most_populars

__all__ = ["normalize_trips", "dedup_zones", "enrich_trips", "most_populars"]
