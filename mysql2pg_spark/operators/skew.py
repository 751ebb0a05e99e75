"""Skew-handling aggregation (the 100 TB hot-key lever).

A groupBy on a low-cardinality or power-law key sends every row of a hot
key to one reducer. Salted two-phase aggregation splits each key into
``num_salts`` partial groups (map-side parallel), then merges partials —
turning one hot reducer into N. Because the partial aggregate is an
exact DECIMAL sum, the final result is bit-identical to the unsalted
plan, so correctness oracles don't see the difference.

(AQE skew-join splitting — on in session.py — handles skewed JOINS at
runtime; salting here covers skewed AGGREGATIONS, which AQE does not
re-plan.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEC = "decimal(38,4)"


def salted_sum(
    df: DataFrame,
    key_cols: list[str],
    value_col: str | Column,
    out_col: str,
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase exact SUM with key salting. The salt is derived from
    row content (hash % num_salts) — deterministic, partitioning-free;
    for a pure SUM any row→salt assignment yields the same total."""
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(num_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(
            F.sum(value.cast(DEC)).alias("_partial_sum"),
            F.count(F.lit(1)).alias("_partial_n"),
        )
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_partial_sum").cast("double").alias(out_col),
        F.sum("_partial_n").cast("bigint").alias(f"{out_col}_n"),
    )
