from taxi_trips_etl_spark.sources.catalog import (
    drop_table,
    register_sources,
    table_exists,
)
from taxi_trips_etl_spark.sources.readers import (
    list_day_files,
    read_csv,
    read_day_batch,
    read_parquet,
)
from taxi_trips_etl_spark.sources.writers import (
    write_append,
    write_overwrite,
    write_partitioned_by_run_date,
)

__all__ = [
    "drop_table",
    "register_sources",
    "table_exists",
    "list_day_files",
    "read_csv",
    "read_day_batch",
    "read_parquet",
    "write_append",
    "write_overwrite",
    "write_partitioned_by_run_date",
]
