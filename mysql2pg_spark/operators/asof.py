"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as the union-tag-window composition (SURVEY §2 custom-op
guidance option (a): composition of existing DataFrame ops):

    left ∪ right → window last(right_value) ignoreNulls
                   over (partition key ORDER BY ts, tag)

One shuffle on the join key; NO range-join explosion — at 100 TB this
is the difference between a sort within partitions and a quadratic
interval join. Matches DuckDB/kdb ASOF semantics: each left row gets the
latest right row with right.ts <= left.ts (inclusive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Backward as-of join. ``left`` keeps all its columns; matched
    ``value_cols`` from ``right`` arrive as ``asof_<name>`` plus
    ``asof_ts``. Right rows with duplicate (key, ts) are deduped to the
    one with max ``tiebreak_col`` (required for determinism if dupes are
    possible)."""
    if tiebreak_col is not None:
        w_dedup = Window.partitionBy(key, right_ts).orderBy(
            F.col(tiebreak_col).desc()
        )
        right = (
            right.withColumn("_rn", F.row_number().over(w_dedup))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    left_cols = left.columns
    l = left.select(
        *left_cols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),  # left sorts AFTER right at equal ts → inclusive
        F.lit(None).cast("timestamp").alias("_r_ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}") for c in value_cols],
    )
    r = right.select(
        *[
            # the join key comes from the right row; every other left
            # column rides as NULL on right-carrier rows
            (F.col(key) if c == key else F.lit(None).cast(left.schema[c].dataType)).alias(c)
            for c in left_cols
        ],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.col(right_ts).alias("_r_ts"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )

    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts"), F.col("_tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l.unionByName(r)
    filled = unioned.select(
        *left_cols,
        "_tag",
        F.last("_r_ts", ignorenulls=True).over(w).alias("asof_ts"),
        *[
            F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("_tag") == 1).drop("_tag")
