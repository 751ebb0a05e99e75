"""Upsert / latest-wins merge — the incremental-sync primitive.

The reference re-syncs incrementally via keyset resume (last PK value,
sync_data.go); the general form at 100 TB is merge-on-read: union base
with the update stream and keep the highest-version row per key. One
shuffle on the key; with bucketed storage on the key even that shuffle
disappears (see tests/test_bucketed_join.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def upsert_latest(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    version_col: str,
) -> DataFrame:
    """Latest-wins merge of updates over base. Deterministic: ties on
    version resolve to the updates side via a source tag."""
    tagged_base = base.withColumn("_src", F.lit(0))
    tagged_updates = updates.withColumn("_src", F.lit(1))
    merged = tagged_base.unionByName(tagged_updates)
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col).desc(), F.col("_src").desc()
    )
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
