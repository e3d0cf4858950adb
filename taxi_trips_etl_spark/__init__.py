"""taxi_trips_etl_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference ETL
pipeline (``efesabanogluu/taxi_trips_etl``: a BigQuery-delegating daily
batch pipeline over NYC green-taxi trips) as an idiomatic Spark
DataFrame/SQL engine, extended with large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Layout:

- ``session``    — SparkSession factory tuned for local testing but
                   configured the way a 1000-executor cluster run would be
                   (AQE, adaptive skew join, broadcast thresholds).
- ``sources``    — readers/writers/catalog (reference: object-store listing,
                   parquet/csv loads, write dispositions, date-partitioned
                   outputs; see SURVEY.md §2.1 S1-S10).
- ``functions``  — scalar function surface (daypart CASE, time extraction,
                   timestamp_diff, octet_length, WKT centroid, hex-cell
                   indexing; SURVEY.md §2.8 F1-F12).
- ``operators``  — the relational core: normalization filter, dedup-rank,
                   broadcast enrichment joins, popularity rank/top-k/USING
                   joins (SURVEY.md §2.2-§2.6).
- ``plans``      — pipeline runner (Airflow-free orchestration parity,
                   SURVEY.md §2.11) and the dbt-parity model registry.
- ``dataprep``   — beyond-reference LLM-data-pipeline operators: exact /
                   MinHash-LSH / SimHash / n-gram-Jaccard dedup, cosine
                   top-k similarity (brute force + sign-LSH), text quality /
                   language-id / token stats / fingerprinting, multimodal
                   binary-column plumbing.
- ``streaming``  — Structured Streaming variant of the daily rollup (the
                   "instant results" architecture the reference README
                   discusses but never built).
"""

__version__ = "0.1.0"
