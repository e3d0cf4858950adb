"""Table profiling: per-column null/distinct statistics in one pass.

The data-quality primitive a pipeline runs before trusting a new drop
of 100 TB: one aggregate job computes every column's null count and
exact distinct count (expand-based multi-distinct — swap to
``approx_count_distinct`` when exactness stops paying for itself at
extreme cardinality), then unpivots to one row per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """→ (column_name, n_rows, n_nulls, n_distinct), one row per column."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"__nn_{c}")
        )
        aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (column_name, n_nulls, n_distinct)"
        ),
        "n_rows",
    ).select("column_name", "n_rows", "n_nulls", "n_distinct")
