from taxi_trips_etl_spark.dataprep import (
    clustering,
    components,
    corpus,
    dedup,
    multimodal,
    packing,
    profile,
    sampling,
    similarity,
    text,
)

__all__ = [
    "clustering",
    "components",
    "corpus",
    "dedup",
    "multimodal",
    "packing",
    "profile",
    "sampling",
    "similarity",
    "text",
]
