"""Time-series regularization + cohort analytics over event streams.

- ``hourly_gap_fill``: resample an irregular event stream onto a dense
  per-entity hourly spine and forward-fill values across the gaps — the
  feature-engineering step that turns raw events into model-ready
  regular series.
- ``cohort_retention``: first-seen cohort × day-offset distinct-user
  matrix — the standard retention triangle.

Scale shape: the spine is generated per entity with ``sequence`` +
``explode`` (JVM-side, distributed — no driver loop, no cross join
against a global calendar); forward-fill is ONE window shuffle keyed on
the entity. Spine size is bounded by each entity's own [min, max] span,
so a sparse entity never pays for the global time range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hourly_gap_fill(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Dense per-user hourly series: ``n_events`` (0 in gaps),
    ``filled_value`` (hourly exact-decimal sum, forward-filled across
    gaps), ``is_gap``. The value aggregation uses the
    DECIMAL(38,4)-accumulate-then-DOUBLE pattern so results are
    partitioning-independent and oracle-exact."""
    hour = F.date_trunc("hour", F.col(ts_col)).alias("hour")
    buckets = events.groupBy(F.col(user_col), hour).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(38,4)"))
        .cast("double")
        .alias("sum_value"),
    )
    spine = (
        buckets.groupBy(user_col)
        .agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
        .select(
            user_col,
            F.explode(
                F.sequence("h0", "h1", F.expr("interval 1 hour"))
            ).alias("hour"),
        )
    )
    joined = spine.join(buckets, [user_col, "hour"], "left")
    w = (
        Window.partitionBy(user_col)
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        user_col,
        "hour",
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        F.last("sum_value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("n_events").isNull().alias("is_gap"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Retention triangle: users grouped by first-seen day (cohort),
    counted distinct on each later activity day offset. Two shuffles:
    the per-user min (map-side combinable) and the two-phase exact
    count-distinct on (cohort_day, day_offset)."""
    day = F.date_trunc("day", F.col(ts_col))
    firsts = events.groupBy(user_col).agg(
        F.min(day).alias("cohort_day")
    )
    return (
        events.select(user_col, day.alias("d"))
        .join(firsts, user_col)
        .groupBy(
            F.col("cohort_day").cast("date").alias("cohort_day"),
            F.datediff(F.col("d"), F.col("cohort_day")).cast("bigint").alias(
                "day_offset"
            ),
        )
        .agg(F.countDistinct(user_col).cast("bigint").alias("n_users"))
    )
