"""Banded range (interval) join: match each left row to right rows of
the same key whose timestamp falls in a bounded lookback window ending
at the left row's timestamp.

Spark has no native range-join operator (the brief's as-of/range-join
family; reference has none either — net-new). The naive formulation
``l JOIN r ON key AND r.ts BETWEEN l.ts - W AND l.ts`` becomes a
BroadcastNestedLoop or a sort-merge with an unbounded range condition.
The scale-correct shape is BANDING: bucket the right side by
``floor(ts / W)``; a left row's window [l.ts - W, l.ts) then overlaps
exactly two buckets, so exploding the left side to those two bucket
keys turns the range join into an equi-join on (key, bucket) + a cheap
residual filter. Shuffle volume is 2× the left side — independent of
window width vs data density — and Catalyst plans a plain hash join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_US = 1_000_000


def _bucket(ts: Column, width_us: int) -> Column:
    return F.floor(F.unix_micros(ts) / F.lit(width_us))


def range_lookback_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lookback_seconds: int,
    value_cols: list[str],
) -> DataFrame:
    """Inner-match pairs: every (left row, right row) with equal `key`
    and ``left.ts - lookback <= right.ts < left.ts``. Right value
    columns come back prefixed ``r_``. Aggregate / left-join back to
    the probe side in the caller (semantics differ per use)."""
    width_us = lookback_seconds * _US

    l_us = F.unix_micros(F.col(left_ts))
    probe = left.withColumn(
        "_bkt",
        F.explode(
            F.array(
                F.floor((l_us - F.lit(width_us)) / F.lit(width_us)),
                F.floor(l_us / F.lit(width_us)),
            )
        ),
    )
    build = right.select(
        F.col(key),
        _bucket(F.col(right_ts), width_us).alias("_bkt"),
        F.col(right_ts).alias("_r_ts"),
        *[F.col(c).alias(f"r_{c}") for c in value_cols],
    )
    lo = F.col(left_ts) - F.expr(f"INTERVAL {lookback_seconds} SECOND")
    return (
        probe.join(build, [key, "_bkt"])
        .filter((F.col("_r_ts") >= lo) & (F.col("_r_ts") < F.col(left_ts)))
        .drop("_bkt")
        .withColumnRenamed("_r_ts", f"r_{right_ts}")
    )
