"""Row-quality quarantine — the pipeline pattern for 100 TB ingest:
classify every row as clean/quarantined in ONE pass (no second scan),
route clean rows onward and quarantined rows to a dead-letter target
with a reason column. Classification is pure column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def json_validity_flag(c: str | Column) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.try_parse_json(col.cast("string")).isNotNull()


def quarantine_split(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> DataFrame:
    """rules: (reason, is_valid_condition). Adds `quarantine_reason`
    (first failing rule, NULL when clean). Callers filter on it to route;
    both routes share one scan via the common classified frame."""
    reason = F.lit(None).cast("string")
    for name, cond in reversed(rules):
        reason = F.when(~cond, F.lit(name)).otherwise(reason)
    return df.withColumn("quarantine_reason", reason)


def decile_profile(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Exact per-group decile profile of an integer column — the data-
    profiling pass that sizes shards / length-filters a corpus before a
    training run. One row per (group, decile 1..10): ``value`` is the
    order statistic at rank ceil(d·n/10) (d=10 → max).

    Determinism: rank positions use pure integer arithmetic
    ((d·n + 9) div 10, no float ceil) and the value at a rank is
    independent of how equal values are tie-broken, so the result is
    engine-exact. Scale shape: one shuffle for the per-group sort
    window; each row then emits the (0..10) deciles it realizes via a
    JVM-side array filter — no second pass, no collect. A group's rows
    must fit one partition for the window sort — group by source/shard
    keys, not by nothing; AQE splits nothing here, so at 100 TB profile
    within natural partition-sized groups.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(value_col, tiebreak_col)
    ranked = (
        df.select(group_col, value_col, tiebreak_col)
        .withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy(group_col))
        )
    )
    realized = F.filter(
        F.sequence(F.lit(1), F.lit(10)),
        lambda d: ((d.cast("bigint") * F.col("n") + 9) / 10).cast("bigint")
        == F.col("rn"),
    )
    return ranked.select(
        F.col(group_col),
        F.explode(realized).alias("decile"),
        F.col(value_col).cast("bigint").alias("value"),
        F.col("n").cast("bigint").alias("n_rows"),
    )
