"""Validation queries (SURVEY D3/A12): distributed row counts and
order-insensitive content checksums, oracle-checked.

The checksum query fingerprints integer/string columns — identical text
rendering across engines. Cross-engine float canonicalization (Spark
renders 1e-4 as '1.0E-4', DuckDB as '0.0001') is the caller's job via
explicit format strings; keys and flags are what migration validation
actually compares (the reference compares COUNT(*) only — D3; this is
strictly stronger).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql2pg_spark.operators.validate import table_checksum
from mysql2pg_spark.plans.registry import query
from mysql2pg_spark.tables import TABLE_NAMES, load_table

_CHECK_COLS = [
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_returnflag",
    "l_linestatus",
]


@query(
    "val01_table_checksum",
    oracle=f"""
WITH h AS (
  SELECT md5(concat_ws(chr(1),
    {", ".join(f"coalesce(CAST({c} AS VARCHAR), chr(0) || 'NULL')" for c in _CHECK_COLS)}
  )) AS h
  FROM lineitem
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(('0x' || substr(h, 1, 15))::BIGINT) AS VARCHAR) AS hash_sum,
       min(h)   AS min_digest,
       max(h)   AS max_digest
FROM h
""",
)
def val01_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql2pg_spark.tables import fan_out

    # Round 16: the single-row-group fixture scan is one task, so the
    # md5-per-row partial aggregate ran on one core; fan_out spreads the
    # 6 projected columns across the cluster (no-op at real scale where
    # the scan already has ≥ defaultParallelism splits). Measured
    # 1.56 s → 1.14 s at sf0.1; result unchanged (the checksum is an
    # order-insensitive aggregate).
    li = fan_out(load_table(spark, sf_dir, "lineitem").select(*_CHECK_COLS))
    return table_checksum(li, _CHECK_COLS)


@query(
    "val02_row_counts",
    oracle=" UNION ALL ".join(
        f"SELECT '{t}' AS table_name, COUNT(*) AS n_rows FROM {t}"
        for t in TABLE_NAMES
    )
    + " ORDER BY table_name",
)
def val02_row_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12/D3: one count per table, assembled lazily (no driver loop over
    collect — each count is a map-side-combined aggregate)."""
    parts = [
        load_table(spark, sf_dir, t)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(F.lit(t).alias("table_name"), "n_rows")
        for t in TABLE_NAMES
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


# --------------------------------------------------------------------------
# val03 — ANALYZE-style per-column statistics for the orders table:
# count / nulls / exact NDV / numeric min-max — the optimizer-statistics
# collection pass (the reference's A12 row count generalized to the
# stats a cost-based planner actually consumes). One aggregate computes
# every column's stats in a single scan (no per-column passes); NDV here
# is exact count_distinct for oracle parity — at 100 TB you'd flip the
# same plan to approx_count_distinct (sk02's tolerance pattern).
# --------------------------------------------------------------------------
_STAT_STR_COLS = ("o_orderstatus", "o_orderpriority")
_STAT_NUM_COLS = ("o_orderkey", "o_custkey", "o_totalprice")


@query(
    "val03_table_stats",
    oracle=" UNION ALL ".join(
        [
            f"""SELECT '{c}' AS col_name, COUNT(*) AS n,
  CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
  CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv,
  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num
FROM orders"""
            for c in _STAT_STR_COLS
        ]
        + [
            f"""SELECT '{c}', COUNT(*),
  CAST(COUNT(*) - COUNT({c}) AS BIGINT),
  CAST(COUNT(DISTINCT {c}) AS BIGINT),
  CAST(MIN({c}) AS DOUBLE), CAST(MAX({c}) AS DOUBLE)
FROM orders"""
            for c in _STAT_NUM_COLS
        ]
    )
    + " ORDER BY col_name",
    driver=False,  # 50-slot driver window is full; pytest-oracle-checked
)
def val03_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cols = _STAT_STR_COLS + _STAT_NUM_COLS
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append(F.count(c).alias(f"cnt_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"ndv_{c}"))
    for c in _STAT_NUM_COLS:
        aggs.append(F.min(c).cast("double").alias(f"min_{c}"))
        aggs.append(F.max(c).cast("double").alias(f"max_{c}"))
    # every column's stats ride ONE aggregate over ONE scan; stack()
    # unpivots the single row into the per-column shape (a union of
    # per-column o.agg() selects would re-scan the table per column)
    rows = []
    for c in cols:
        minmax = (
            f"min_{c}, max_{c}"
            if c in _STAT_NUM_COLS
            else "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)"
        )
        rows.append(
            f"'{c}', n, CAST(n - cnt_{c} AS BIGINT), ndv_{c}, {minmax}"
        )
    return (
        o.agg(*aggs)
        .selectExpr(
            f"stack({len(cols)}, {', '.join(rows)}) AS "
            "(col_name, n, n_null, ndv, min_num, max_num)"
        )
        .orderBy("col_name")
    )
