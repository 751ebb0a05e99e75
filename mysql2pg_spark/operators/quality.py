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
    # integer `div` keeps the documented pure-integer contract at ANY n:
    # double division + bigint cast is exact only while d·n+9 ≤ 2^53,
    # after which engine and oracle (integer //) could disagree
    realized = F.expr(
        "filter(sequence(1, 10), "
        "d -> (CAST(d AS BIGINT) * n + 9) div 10 = rn)"
    )
    return ranked.select(
        F.col(group_col),
        F.explode(realized).alias("decile"),
        F.col(value_col).cast("bigint").alias("value"),
        F.col("n").cast("bigint").alias("n_rows"),
    )


def value_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_cols: list[str],
    k: int = 3,
) -> DataFrame:
    """Per-group k-sigma outliers with engine-exact arithmetic: flag rows
    where (x − μ)² > k²·σ² — algebraically rearranged to
    (n·x − S₁)² > k²·(n·S₂ − S₁²) so no division or square root happens.
    Values are quantized to 1e-4 integers first; S₁/S₂ are exact integer
    sums, and the final compare runs on doubles derived from identical
    integers by the identical expression, so the flagged set matches an
    external SQL oracle bit-for-bit (a naive mean/stddev float pipeline
    would not).

    Scale shape: one map-side-combinable groupBy for the (n, S₁, S₂)
    moments, one broadcast-or-shuffle join back — two passes over the
    group key, no window sort, skew-safe."""
    q = F.round(F.col(value_col) * 10000, 0).cast("bigint")
    moments = (
        df.select(F.col(group_col), q.alias("q"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("q").alias("s1"),
            F.sum(F.col("q") * F.col("q")).alias("s2"),
        )
    )
    joined = df.select(*id_cols, group_col, value_col).withColumn(
        "q", q
    ).join(moments, group_col)
    nd = F.col("n").cast("double")
    xd = F.col("q").cast("double")
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    dev = nd * xd - s1d
    lhs = dev * dev
    rhs = F.lit(float(k * k)) * (nd * s2d - s1d * s1d)
    return (
        joined.filter(lhs > rhs)
        .select(*id_cols, group_col, value_col)
    )


def distribution_drift(
    df: DataFrame,
    value_col: str,
    split_col: Column,
    bucket_width: float,
    n_buckets: int,
) -> DataFrame:
    """Distribution-drift profile between two slices of one table (the
    monitoring primitive run between pipeline versions or time windows):
    fixed-width histogram of ``value_col``, per-bucket counts for each
    slice, slice-relative fractions, and the per-bucket chi-square-style
    contribution (fa−fb)²/(fa+fb).

    Determinism: counts are exact integers aggregated map-side; the
    fractions and contribution are per-ROW double arithmetic on those
    integers (no float SUM whose order could differ across engines — a
    total statistic is the consumer's one-line fold over ~n_buckets
    rows). The totals window runs over the ALREADY-AGGREGATED n_buckets
    rows, not the raw table, so the single-partition window is O(buckets)
    at any corpus size.
    """
    from pyspark.sql.window import Window

    # clamp BOTH ends: without greatest(0, ...), negative values yield
    # unbounded negative bucket ids and n_buckets no longer bounds the
    # output cardinality
    bucket = F.greatest(
        F.lit(0),
        F.least(
            F.lit(n_buckets - 1),
            F.floor(F.col(value_col) / F.lit(float(bucket_width))),
        ),
    ).cast("bigint")
    grouped = (
        df.select(bucket.alias("bucket"), split_col.alias("_s"))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("_s"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_a"),
            F.sum(F.when(~F.col("_s"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_b"),
        )
    )
    w = Window.partitionBy()
    ta = F.sum("n_a").over(w)
    tb = F.sum("n_b").over(w)
    # empty slice → NULL fraction (matching SQL-engine 0/0 → NULL), not
    # a NaN/ANSI-error divergence
    fa = F.when(ta > 0, F.col("n_a").cast("double") / ta.cast("double"))
    fb = F.when(tb > 0, F.col("n_b").cast("double") / tb.cast("double"))
    diff2 = (fa - fb) * (fa - fb)
    return (
        grouped.select(
            "bucket",
            "n_a",
            "n_b",
            fa.alias("frac_a"),
            fb.alias("frac_b"),
            F.when(fa + fb > 0, diff2 / (fa + fb))
            .otherwise(F.lit(0.0))
            .alias("drift_term"),
        )
        .orderBy("bucket")
    )
