"""Schema-level contract guard: every registered oracle's column NAMES
must match its Spark query's columns (the driver sorts columns by name
before hashing — an alias drift fails the round even when values are
right). Runs plan-only: no Spark action, DuckDB LIMIT 0 — seconds for
the whole registry, vs minutes for full value validation."""

from __future__ import annotations

import duckdb
import pytest

from taxi_trips_etl_spark.queries import all_oracles, all_queries

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def test_every_oracle_schema_matches_spark(spark, sf_dir, ddb):
    oracles = all_oracles()
    queries = all_queries()
    mismatches = []
    for name, sql in oracles.items():
        try:
            spark_cols = sorted(queries[name](spark, sf_dir).columns)
        except Exception as e:  # building the lazy DF must never fail
            mismatches.append(f"{name}: spark build error: {e}")
            continue
        try:
            oracle_cols = sorted(
                ddb.sql(f"SELECT * FROM ({sql}) LIMIT 0").columns
            )
        except Exception as e:
            mismatches.append(f"{name}: oracle parse error: {e}")
            continue
        if spark_cols != oracle_cols:
            mismatches.append(
                f"{name}: spark={spark_cols} oracle={oracle_cols}"
            )
    assert not mismatches, "\n".join(mismatches)


def test_rotation_bookkeeping_names_exist():
    """A typo in _REVERIFY or a _R{N}_VERIFIED tuple silently breaks
    the rotation (the name would sort nothing / mark nothing) — every
    bookkeeping name must be a registered query."""
    from taxi_trips_etl_spark.queries._registry import (
        _QUERIES,
        _REVERIFY,
        _VERIFIED_ROUNDS,
    )

    registered = set(_QUERIES)
    ghosts = sorted(
        (set(_REVERIFY) | set(_VERIFIED_ROUNDS)) - registered
    )
    assert not ghosts, f"rotation bookkeeping names not registered: {ghosts}"
