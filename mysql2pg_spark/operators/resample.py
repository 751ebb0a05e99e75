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


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Ordered-funnel progression per user: step k completes at the
    earliest event of type ``steps[k]`` STRICTLY after step k-1's
    completion time. Output: one row per user with ``t_<step>``
    timestamps (NULL where the funnel stalled) and ``steps_completed``.

    Spark shape: ONE shuffle (groupBy user), then a JVM-side
    ``aggregate`` fold over the user's time-sorted event array — no join
    chain, no repeated scans per step. Per-user event arrays must fit in
    memory, the usual contract of per-entity analytics (salt or
    pre-filter event types if a bot user has millions of rows; the
    projection below already drops every column but (ts, id, type)).

    Strict ``>`` comparisons make the fold equal to the min-chained
    subquery definition an external SQL oracle uses, independent of how
    same-timestamp events are ordered."""
    evs = F.array_sort(
        F.collect_list(F.struct(F.col(ts_col), F.col(id_col), F.col(type_col)))
    )

    fields = [f"t{i}" for i in range(len(steps))]

    def initial():
        return F.struct(
            *[F.lit(None).cast("timestamp").alias(f) for f in fields]
        )

    def merge(acc, e):
        outs = []
        for i, (f, step) in enumerate(zip(fields, steps)):
            cond = acc[f].isNull() & (e[type_col] == step)
            if i > 0:
                prev = acc[fields[i - 1]]
                cond = cond & prev.isNotNull() & (e[ts_col] > prev)
            outs.append(F.when(cond, e[ts_col]).otherwise(acc[f]).alias(f))
        return F.struct(*outs)

    folded = events.select(user_col, ts_col, id_col, type_col).groupBy(
        user_col
    ).agg(F.aggregate(evs, initial(), merge).alias("fn"))
    done = sum(
        F.when(F.col(f"fn.{f}").isNotNull(), 1).otherwise(0) for f in fields
    )
    return folded.select(
        user_col,
        *[
            F.col(f"fn.{f}").alias(f"t_{step}")
            for f, step in zip(fields, steps)
        ],
        done.cast("bigint").alias("steps_completed"),
    )
