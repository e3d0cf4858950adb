from taxi_trips_etl_spark.dataprep import dedup, similarity, text, multimodal

__all__ = ["dedup", "similarity", "text", "multimodal"]
