"""Spark 4 Python DataSource API — the object-store listing as a
first-class pluggable source.

The reference's S1 surface (sources/readers.py:day_glob — list a
day's ``YYYY/MM/DD/000*`` objects, excluding decoy prefixes) is a
filesystem walk today; this module packages the same semantics as a
registered `spark.read.format(...)` source via the Python DataSource
API (new in Spark 4), the extension point a real deployment uses to
mount an object-store inventory/manifest service as a table:

- `partitions()` splits the listing across ``n_partitions`` input
  partitions, so the manifest scan itself parallelizes (a real
  bucket inventory is millions of objects);
- the listing is generated DETERMINISTICALLY here (integer
  arithmetic over file ordinals — no filesystem, no RNG), which is
  what makes the entry oracle-replayable: DuckDB rebuilds the same
  manifest from generate_series.

The per-file schema matches an inventory row: (path, size_bytes,
hour). Decoy exclusion (the `.tmp`/`_SUCCESS`-style objects S1 must
skip) is part of the generated manifest: every 7th ordinal is a
decoy the reader filters out — the same contract
tests/test_sources.py pins for the filesystem walker.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)


class _ListingPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class ObjectListingReader(DataSourceReader):
    def __init__(self, options):
        self.ds = options.get("ds", "2026/02/01")
        self.n_files = int(options.get("n_files", 24))
        self.n_partitions = int(options.get("n_partitions", 4))

    def partitions(self):
        per = max(1, self.n_files // self.n_partitions)
        return [
            _ListingPartition(i, min(i + per, self.n_files))
            for i in range(0, self.n_files, per)
        ]

    def read(self, partition):
        for f in range(partition.start, partition.end):
            if f % 7 == 3:  # decoy object (tmp/marker) — excluded
                continue
            yield (
                f"{self.ds}/{f:04d}.parquet",
                1000 + 37 * f,
                f % 24,
            )


class ObjectListingSource(DataSource):
    """`spark.read.format("object_listing")` after registration."""

    @classmethod
    def name(cls) -> str:
        return "object_listing"

    def schema(self) -> str:
        return "path string, size_bytes long, hour long"

    def reader(self, schema) -> DataSourceReader:
        return ObjectListingReader(self.options)


def register_object_listing(spark) -> None:
    spark.dataSource.register(ObjectListingSource)
