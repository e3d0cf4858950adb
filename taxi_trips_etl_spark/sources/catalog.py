"""Catalog helpers: sources manifest → views, existence gates, drops.

Re-expresses (SURVEY.md §2.1 S7/S8/S10, §2.11 O3):

- dbt source declarations (``/root/reference/models/sources.yml:3-29``)
  → :func:`register_sources`, a manifest of name→path registered as
  temp views so every downstream operator addresses tables by name.
- table-existence probe (``taxi_trips_etl.py:88-93``) →
  :func:`table_exists`.
- temp-table lifecycle drops (``taxi_trips_etl.py:112,141``) →
  :func:`drop_table` (mostly unnecessary in Spark — lazy lineage
  replaces materialized temp tables — kept for pipeline parity).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_sources(
    spark: SparkSession, manifest: dict[str, str]
) -> dict[str, DataFrame]:
    """Register each source parquet path as a temp view; return the DFs.

    Tolerates TIMESTAMP(NANOS) parquet (which Spark's reader rejects):
    nanos are read as long and truncated to micros with an exact
    integer div. Applies to any column the footer typed as nanos —
    detected as bigint columns that the nanosAsLong fallback produced.
    """
    from pyspark.sql import functions as F

    # Entry-point pin (not a reader side effect): registering sources is
    # session-catalog mutation by design, so pinning the conf the views
    # need to read those sources belongs here — see
    # readers.require_nanos_as_long for the reader-side posture.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out: dict[str, DataFrame] = {}
    for name, path in manifest.items():
        df = spark.read.parquet(path)
        if name == "events" and dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def testdata_manifest(sf_dir: str) -> dict[str, str]:
    """Manifest for the driver-generated tables (TESTDATA.md)."""
    return {t: os.path.join(sf_dir, f"{t}.parquet") for t in TESTDATA_TABLES}


def load_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return register_sources(spark, testdata_manifest(sf_dir))


def table_exists(spark: SparkSession, name: str) -> bool:
    """S7: existence gate (catalog view/table or parquet path)."""
    if spark.catalog.tableExists(name):
        return True
    return os.path.exists(name)


def drop_table(spark: SparkSession, name: str) -> None:
    """S8: DROP TABLE IF EXISTS / drop temp view; never raises."""
    try:
        spark.catalog.dropTempView(name)
    except Exception:
        pass
    spark.sql(f"DROP TABLE IF EXISTS {name}")
