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


def scd2_intervals(
    changes: DataFrame,
    key_cols: list[str],
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 history from a change feed:
    collapse each key's consecutive runs of an attribute value into
    validity intervals (valid_from, valid_to, version), valid_to NULL on
    the current row — the standard warehouse history-tracking shape the
    reference's one-shot snapshot copy cannot express.

    Run detection is the gaps-and-islands double row_number (rn_all -
    rn_within_value), then one aggregate per run and a lead() for the
    interval close — ALL windows share one hash partitioning on the key,
    so the whole operator is a single shuffle. Ordering ties on ts are
    broken by ``tiebreak_col`` for determinism.
    """
    keys = [F.col(k) for k in key_cols]
    order = [F.col(ts_col).asc(), F.col(tiebreak_col).asc()]
    w_all = Window.partitionBy(*keys).orderBy(*order)
    w_val = Window.partitionBy(*keys, F.col(attr_col)).orderBy(*order)
    runs = (
        changes.select(*key_cols, attr_col, ts_col, tiebreak_col)
        .withColumn(
            "_run",
            F.row_number().over(w_all) - F.row_number().over(w_val),
        )
        .groupBy(*key_cols, F.col(attr_col), F.col("_run"))
        .agg(F.min(ts_col).alias("valid_from"))
    )
    # attr as the final order key: two runs of DIFFERENT values can open
    # at the same timestamp when events tie on ts — determinism needs a
    # total order.
    w_runs = Window.partitionBy(*keys).orderBy(
        F.col("valid_from").asc(), F.col(attr_col).asc()
    )
    return (
        runs.withColumn("valid_to", F.lead("valid_from").over(w_runs))
        .withColumn("version", F.row_number().over(w_runs).cast("bigint"))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(
            *key_cols, attr_col, "valid_from", "valid_to", "version",
            "is_current",
        )
    )
