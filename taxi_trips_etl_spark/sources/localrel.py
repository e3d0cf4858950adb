"""Small driver-built DataFrames without the 32-worker tax.

``spark.createDataFrame(list, schema)`` parallelizes the list over
``defaultParallelism`` slices (32 here), and EVERY downstream action
then pays one Python-worker round-trip per slice — measured ~4.3 s
per action for a 2-row frame on local[32], vs 0.35 s with a single
slice. Driver-built results (graph iterations, BPE merge tables,
connected-components mappings, the zone dim) are by construction
small enough that one slice is also the right partitioning: they are
broadcast or crossJoined downstream, never scanned in parallel.

``local_rows`` is the drop-in replacement: same (rows, DDL-schema)
contract, single slice.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession


def local_rows(
    spark: SparkSession, rows: Iterable, schema: str
) -> DataFrame:
    """createDataFrame(rows, schema) on ONE slice — see module
    docstring for why this is ~12x cheaper per downstream action for
    the small driver-built frames this engine creates."""
    data = rows if isinstance(rows, list) else list(rows)
    if not data:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(data, 1), schema
    )
