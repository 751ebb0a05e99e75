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
