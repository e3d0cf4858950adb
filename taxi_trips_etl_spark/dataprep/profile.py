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


def validate_constraints(
    df: DataFrame,
    not_null: list[str] | None = None,
    unique: list[list[str]] | None = None,
    ranges: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Declarative data-quality checks (the dbt-tests / expectations
    analog): → (rule, violations) with one row per declared rule.

    All not-null and range rules fold into ONE conditional-aggregate
    scan (no per-rule pass); each uniqueness rule is one partial-agg
    groupBy counting keys seen more than once. At 100 TB that's a
    single read plus one narrow shuffle per unique-key rule.
    """
    aggs = []
    for c in not_null or []:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"not_null:{c}")
        )
    for c, (lo, hi) in (ranges or {}).items():
        bad = ~F.col(c).between(lo, hi) | F.col(c).isNull()
        aggs.append(F.sum(bad.cast("long")).alias(f"range:{c}:[{lo},{hi}]"))
    parts = []
    if aggs:
        row = df.agg(*aggs)
        cols = row.columns
        parts.append(
            row.select(
                F.explode(
                    F.array(*[
                        F.struct(
                            F.lit(c).alias("rule"),
                            F.col(f"`{c}`").cast("long").alias("violations"),
                        )
                        for c in cols
                    ])
                ).alias("r")
            ).select("r.rule", "r.violations")
        )
    for keys in unique or []:
        dup = (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") > 1)
            .agg(F.coalesce(F.sum(F.col("c")), F.lit(0)).alias("violations"))
            .select(
                F.lit("unique:" + ",".join(keys)).alias("rule"),
                F.col("violations").cast("long"),
            )
        )
        parts.append(dup)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def hll_distinct_rollup(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    partial_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Mergeable distinct-count rollup via DataSketches HLL
    (hll_sketch_agg → hll_union_agg → hll_sketch_estimate).

    THE cardinality pattern at 100 TB: exact countDistinct re-shuffles
    raw values for every regrouping, but sketches are built once per
    fine partition (here ``partial_col``, e.g. a day), persisted as
    ~2^lg_k-byte binaries, and any coarser rollup is a cheap union of
    sketches — no second pass over the data. Standard error
    ~1.04/sqrt(2^lg_k) ≈ 1.6% at lg_k=12; the error-bound pytest pins
    it against exact countDistinct.

    Returns per ``key_cols`` group: the merged estimate and how many
    partial sketches were unioned.
    """
    partials = df.groupBy(*key_cols, partial_col).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch")
    )
    return (
        partials.groupBy(*key_cols)
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
                "approx_distinct"
            ),
            F.count(F.lit(1)).alias("n_partials_merged"),
        )
    )
