"""Scale-technique queries: salted aggregation (bit-identical to the
plain plan), sketch-based approximate distinct (rows-only check — the
sketch has no external oracle), and quarantine routing."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql2pg_spark.operators.quality import json_validity_flag, quarantine_split
from mysql2pg_spark.operators.skew import salted_sum
from mysql2pg_spark.plans.registry import query
from mysql2pg_spark.plans.relational import _dsum
from mysql2pg_spark.tables import load_table


# --------------------------------------------------------------------------
# sk01 — salted two-phase SUM over a 6-value key (the skew shape).
# Oracle: PLAIN group-by — salting must be invisible in results.
# --------------------------------------------------------------------------
@query(
    "sk01_salted_agg",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {_dsum('l_extendedprice')} AS revenue,
       COUNT(*) AS revenue_n
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def sk01_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return salted_sum(
        li, ["l_returnflag", "l_linestatus"], "l_extendedprice", "revenue"
    )


# --------------------------------------------------------------------------
# sk02 — HLL approximate distinct (no SQL oracle: sketch estimates are
# engine-specific; accuracy is asserted in tests against the exact count).
# --------------------------------------------------------------------------
@query("sk02_approx_distinct")  # rows-only check by design
def sk02_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
            F.countDistinct("l_orderkey").alias("exact_orders"),
        )
    )


# --------------------------------------------------------------------------
# qa01 — quarantine routing: classify every event once; corrupted JSON
# (synthesized deterministically) and out-of-range values are flagged
# with the FIRST failing rule.
# --------------------------------------------------------------------------
@query(
    "qa01_quarantine",
    oracle="""
WITH classified AS (
  SELECT event_id,
         CASE WHEN event_id % 13 = 0 THEN substr(props, 1, 4) ELSE props END AS props2,
         value,
         CASE
           WHEN NOT json_valid(CASE WHEN event_id % 13 = 0 THEN substr(props, 1, 4) ELSE props END)
             THEN 'bad_json'
           WHEN value < 0 OR value > 400 THEN 'value_range'
           ELSE NULL
         END AS quarantine_reason
  FROM events
)
SELECT coalesce(quarantine_reason, 'clean') AS route, COUNT(*) AS n
FROM classified
GROUP BY 1
ORDER BY route
""",
)
def qa01_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # deterministic corruption: every 13th event's JSON is truncated
    corrupted = e.withColumn(
        "props2",
        F.when(
            F.col("event_id") % 13 == 0, F.substring("props", 1, 4)
        ).otherwise(F.col("props")),
    )
    routed = quarantine_split(
        corrupted,
        [
            ("bad_json", json_validity_flag("props2")),
            ("value_range", (F.col("value") >= 0) & (F.col("value") <= 400)),
        ],
    )
    return (
        routed.groupBy(
            F.coalesce("quarantine_reason", F.lit("clean")).alias("route")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# qa02 — exact k-sigma outlier detection per user: (x−μ)² > k²σ²
# rearranged to (n·x−S₁)² > k²(n·S₂−S₁²) over 1e-4-quantized integer
# moments, so there is no division/sqrt and the flagged set is
# engine-exact (a naive stddev float pipeline would drift). Not in the
# driver window; pytest-oracle-checked.
# --------------------------------------------------------------------------
SIGMA_K = 2


@query(
    "qa02_outliers",
    oracle=f"""
WITH q AS (
  SELECT event_id, user_id, value,
         CAST(round(value * 10000, 0) AS BIGINT) AS qv
  FROM events
),
m AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(qv) AS BIGINT) AS s1,
         CAST(sum(qv * qv) AS BIGINT) AS s2
  FROM q GROUP BY 1
)
SELECT q.event_id, q.user_id, q.value
FROM q JOIN m USING (user_id)
WHERE (CAST(n AS DOUBLE) * CAST(qv AS DOUBLE) - CAST(s1 AS DOUBLE))
      * (CAST(n AS DOUBLE) * CAST(qv AS DOUBLE) - CAST(s1 AS DOUBLE))
      > {float(SIGMA_K * SIGMA_K)} * (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
         - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
ORDER BY q.event_id
""",
    driver=False,
)
def qa02_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql2pg_spark.operators.quality import value_outliers

    e = load_table(spark, sf_dir, "events")
    return value_outliers(e, "user_id", "value", ["event_id"], SIGMA_K)


# --------------------------------------------------------------------------
# qa03 — distribution-drift profile between two deterministic slices of
# the events feed (event_id parity stands in for "pipeline version A/B"
# or "this week vs last"): fixed-width value histogram, per-slice exact
# counts, and the per-bucket chi-square-style drift term. Integer counts
# shuffle once; fractions are per-row doubles over those integers, so
# the profile is engine-exact (no cross-engine float SUM ordering).
# --------------------------------------------------------------------------
DRIFT_WIDTH = 25.0
DRIFT_BUCKETS = 20


@query(
    "qa03_drift_profile",
    oracle=f"""
WITH g AS (
  SELECT CAST(greatest(0, least({DRIFT_BUCKETS - 1},
               CAST(floor(value / {DRIFT_WIDTH}) AS BIGINT))) AS BIGINT)
           AS bucket,
         CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END)
              AS BIGINT) AS n_b
  FROM events GROUP BY 1
), f AS (
  SELECT bucket, n_a, n_b,
         -- empty-slice guard mirrored from distribution_drift (NULL on
         -- every DuckDB version, not version-dependent 0/0 behavior)
         CASE WHEN sum(n_a) OVER () > 0 THEN
           CAST(n_a AS DOUBLE) / CAST(sum(n_a) OVER () AS DOUBLE) END AS frac_a,
         CASE WHEN sum(n_b) OVER () > 0 THEN
           CAST(n_b AS DOUBLE) / CAST(sum(n_b) OVER () AS DOUBLE) END AS frac_b
  FROM g
)
SELECT bucket, n_a, n_b, frac_a, frac_b,
       CASE WHEN frac_a + frac_b > 0
            THEN (frac_a - frac_b) * (frac_a - frac_b) / (frac_a + frac_b)
            ELSE 0.0 END AS drift_term
FROM f ORDER BY bucket
""",
    driver=False,
)
def qa03_drift_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql2pg_spark.operators.quality import distribution_drift

    e = load_table(spark, sf_dir, "events")
    return distribution_drift(
        e, "value", F.col("event_id") % 2 == 0, DRIFT_WIDTH, DRIFT_BUCKETS
    )


# --------------------------------------------------------------------------
# qa05 — engine-exact Pearson correlation (value vs hour-of-day, per
# event type): the profiling statistic computed the qa02 way — quantize
# to integers (floor(v·100 + 0.5)), aggregate EXACT integer moments
# (order-independent sums), finish with per-row double arithmetic on
# those integers. A float corr() aggregate would diverge across engines
# with partitioning; this cannot. One combineable shuffle, 5 groups.
# --------------------------------------------------------------------------
@query(
    "qa05_correlation_profile",
    oracle="""
WITH q AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x,
         CAST(hour(ts) AS BIGINT) AS y
  FROM events
), m AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM q GROUP BY event_type
)
SELECT event_type, n, sx, sy, sxy,
       CASE WHEN (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) > 0
             AND (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) > 0
            THEN (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * sqrt(CAST(n AS DOUBLE) * syy
                           - CAST(sy AS DOUBLE) * sy))
       END AS pearson_r
FROM m ORDER BY event_type
""",
    driver=False,
)
def qa05_correlation_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    q = e.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("x"),
        F.hour("ts").cast("bigint").alias("y"),
    )
    m = q.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    vx = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    vy = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    r = F.when(
        (vx > 0) & (vy > 0),
        (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
        / (F.sqrt(vx) * F.sqrt(vy)),
    )
    return m.select(
        "event_type", "n", "sx", "sy", "sxy", r.alias("pearson_r")
    ).orderBy("event_type")
