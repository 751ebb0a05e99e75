"""Relational core — SURVEY.md §2.C.1 (C1-C11).

The reference honors full SELECT semantics inside view definitions
(projection/aliasing, multi-way joins, WHERE, CASE, LIMIT a,b, ORDER BY,
GROUP_CONCAT, aggregate casts — sync_viewddl.go:141-920); here each of
those constructs is a first-class DataFrame plan.

Output-type conventions (hash parity with external oracles):
- fractional aggregates: SUM over DECIMAL(38,4)-cast inputs (exact,
  order-independent) then ONE cast to DOUBLE → deterministic bits on any
  engine / any partitioning;
- integer aggregates: explicit BIGINT (DuckDB SUM(int) is HUGEINT, which
  pandas lossily widens to float64 — cast on both sides).

Scale notes (100 TB posture): fact-side plans filter + project before any
shuffle (Catalyst pushes both into the parquet scan); joins against
``region``/``nation`` are explicit broadcasts; the remaining equi-joins are
left to Catalyst (shuffled hash / sort-merge with AQE skew splitting).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mysql2pg_spark.plans.registry import query
from mysql2pg_spark.tables import load_table

# Exact-sum accumulator type — canonical definition (and rationale) in
# mysql2pg_spark.tables; re-exported here for the plan modules.
from mysql2pg_spark.tables import DEC  # noqa: E402,F401


def _c(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dsum(c: str | Column) -> Column:
    """Deterministic double SUM: exact decimal accumulation, one final cast."""
    return F.sum(_c(c).cast(DEC)).cast("double")


def davg(c: str | Column) -> Column:
    """Deterministic double AVG = exact-decimal sum / count."""
    return F.sum(_c(c).cast(DEC)).cast("double") / F.count(_c(c))


def isum(c: str | Column) -> Column:
    return F.sum(_c(c)).cast("bigint")


# SQL-side equivalents for oracle strings.
def _dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,4))) AS DOUBLE)"


def _isum(expr: str) -> str:
    return f"CAST(SUM({expr}) AS BIGINT)"


# --------------------------------------------------------------------------
# q01 — pricing summary (filter → groupBy → multi-agg → orderBy).
# Reference parity: SUM with cast injection (sync_viewddl.go:359-370, C8),
# AVG/COUNT passthrough (C9), ORDER BY (C6).
# --------------------------------------------------------------------------
@query(
    "q01_pricing_summary",
    oracle=f"""
SELECT
  l_returnflag,
  l_linestatus,
  {_dsum('l_quantity')}                            AS sum_qty,
  {_dsum('l_extendedprice')}                       AS sum_base_price,
  {_dsum('l_extendedprice * (1 - l_discount)')}    AS sum_disc_price,
  {_dsum('l_quantity')} / COUNT(l_quantity)        AS avg_qty,
  COUNT(*)                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            davg("l_quantity").alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# q02 — multi-way join (C2): fact → customer → nation → region with
# explicit broadcast of the tiny dims; revenue per region/nation.
# --------------------------------------------------------------------------
@query(
    "q02_region_revenue",
    oracle=f"""
SELECT
  r.r_name                                         AS region_name,
  n.n_name                                         AS nation_name,
  {_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
  COUNT(*)                                         AS n_items
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY r.r_name, n.n_name
ORDER BY region_name, nation_name
""",
)
def q02_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name")
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# q03 — LEFT JOIN + null-handling of unmatched rows (C2 LEFT variant).
# --------------------------------------------------------------------------
@query(
    "q03_left_join_counts",
    oracle=f"""
SELECT
  c.c_mktsegment                                   AS segment,
  COUNT(*)                                         AS n_pairs,
  COUNT(o.o_orderkey)                              AS n_orders,
  {_isum('CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END')} AS n_unmatched
FROM customer c
LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment
ORDER BY segment
""",
)
def q03_left_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.count("o_orderkey").alias("n_orders"),
            isum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias(
                "n_unmatched"
            ),
        )
    )


# --------------------------------------------------------------------------
# q04 — MySQL `LIMIT offset, count` semantics (C5: sync_viewddl.go:26,217
# rewrites `LIMIT a,b` → `LIMIT b OFFSET a`). Deterministic via unique
# tiebreaker o_orderkey.
# --------------------------------------------------------------------------
@query(
    "q04_limit_offset",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20 OFFSET 10
""",
    driver=False,
)
def q04_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(10)
        .limit(20)
    )


# --------------------------------------------------------------------------
# q05 — CASE WHEN (C4) + conditional aggregation; the reference rewrites
# MySQL IF(a,b,c) into exactly this CASE form (sync_functions.go:823-907).
# --------------------------------------------------------------------------
@query(
    "q05_case_when",
    oracle=f"""
SELECT
  o_orderpriority                                            AS priority,
  {_isum("CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END")} AS n_finished,
  {_isum("CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END")} AS n_open,
  {_isum("CASE WHEN o_orderstatus NOT IN ('F','O') THEN 1 ELSE 0 END")} AS n_other,
  {_dsum('CASE WHEN o_totalprice > 250000 THEN o_totalprice ELSE 0 END')} AS big_total
FROM orders
GROUP BY o_orderpriority
ORDER BY priority
""",
)
def q05_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            isum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias(
                "n_finished"
            ),
            isum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_open"),
            isum(
                F.when(~F.col("o_orderstatus").isin("F", "O"), 1).otherwise(0)
            ).alias("n_other"),
            dsum(
                F.when(F.col("o_totalprice") > 250000, F.col("o_totalprice")).otherwise(
                    F.lit(0.0)
                )
            ).alias("big_total"),
        )
    )


# --------------------------------------------------------------------------
# q06 — GROUP_CONCAT(DISTINCT x ORDER BY x SEPARATOR s) (C7:
# sync_viewddl.go:16,177-193 → string_agg). Spark expression:
# array_join(sort_array(collect_set(...))).
# --------------------------------------------------------------------------
@query(
    "q06_group_concat",
    oracle="""
SELECT
  n.n_name                                                  AS nation_name,
  COUNT(DISTINCT c.c_mktsegment)                            AS n_segments,
  STRING_AGG(DISTINCT c.c_mktsegment, ',' ORDER BY c.c_mktsegment) AS segments
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY nation_name
""",
)
def q06_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.countDistinct("c_mktsegment").alias("n_segments"),
            F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias(
                "segments"
            ),
        )
    )


# --------------------------------------------------------------------------
# q07 — window functions (C10): ROW_NUMBER / RANK / running SUM per
# partition. The reference only hardcodes one ROW_NUMBER patch
# (sync_functions.go:450-455); here the full window surface is native.
# --------------------------------------------------------------------------
@query(
    "q07_window_topn",
    oracle="""
SELECT *
FROM (
  SELECT
    o_custkey,
    o_orderkey,
    o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
    RANK()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
      OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
  FROM orders
) t
WHERE rn <= 3
ORDER BY o_custkey, rn
""",
)
def q07_window_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.sum(F.col("o_totalprice").cast(DEC))
            .over(wsum)
            .cast("double")
            .alias("running_total"),
        )
        .filter(F.col("rn") <= 3)
    )


# --------------------------------------------------------------------------
# q08 — set operations (C10): UNION / INTERSECT / EXCEPT (distinct
# semantics, matching SQL defaults). Fully lazy: three 1-row aggregates
# unioned — no driver-side collect.
# --------------------------------------------------------------------------
@query(
    "q08_set_ops",
    oracle="""
WITH big_buyers AS (
  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
), urgent_buyers AS (
  SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
SELECT 'except' AS op, COUNT(*) AS n FROM (SELECT custkey FROM big_buyers EXCEPT SELECT custkey FROM urgent_buyers) e
UNION ALL
SELECT 'intersect' AS op, COUNT(*) AS n FROM (SELECT custkey FROM big_buyers INTERSECT SELECT custkey FROM urgent_buyers) i
UNION ALL
SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT custkey FROM big_buyers UNION SELECT custkey FROM urgent_buyers) u
ORDER BY op
""",
)
def q08_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("custkey")
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )

    def tagged_count(df: DataFrame, op: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(op).alias("op"), F.col("n")
        )

    return (
        tagged_count(big.subtract(urgent), "except")
        .union(tagged_count(big.intersect(urgent), "intersect"))
        .union(tagged_count(big.union(urgent).distinct(), "union"))
    )


# --------------------------------------------------------------------------
# q09 — semi/anti joins (C10): EXISTS → left_semi, NOT EXISTS → left_anti.
# --------------------------------------------------------------------------
@query(
    "q09_semi_anti",
    oracle="""
SELECT
  c_mktsegment AS segment,
  CAST(SUM(CASE WHEN has_order THEN 1 ELSE 0 END) AS BIGINT) AS n_with_orders,
  CAST(SUM(CASE WHEN has_order THEN 0 ELSE 1 END) AS BIGINT) AS n_without_orders
FROM (
  SELECT c.c_mktsegment,
         EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) AS has_order
  FROM customer c
) t
GROUP BY c_mktsegment
ORDER BY segment
""",
)
def q09_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round 17 (guide §2.4 remove shuffles / §3.1): the semi+anti pair
    # scanned customer AND orders twice, built TWO broadcasts of the
    # same orders keyset (no exchange reuse — the subtrees canonicalize
    # differently under the two join types), and stitched two 5-row
    # aggregates with a full-outer sort-merge join (2 more exchanges +
    # sorts). EXISTS and NOT EXISTS over the same subquery are one
    # left join against the DISTINCT keys plus a null test: every
    # customer row appears exactly once (the right side is distinct),
    # matched ⟺ has_order. One scan of each table, one broadcast
    # build, one aggregate — and the full-outer's coalesce-to-0 falls
    # out of the conditional sums (a segment appears iff it has a
    # customer, exactly as before). Oracle-verified identical rows.
    cust = load_table(spark, sf_dir, "customer")
    okeys = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey")
        .distinct()
    )
    return (
        cust.join(okeys, cust.c_custkey == okeys.o_custkey, "left")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            isum(
                F.when(F.col("o_custkey").isNotNull(), 1).otherwise(0)
            ).alias("n_with_orders"),
            isum(
                F.when(F.col("o_custkey").isNull(), 1).otherwise(0)
            ).alias("n_without_orders"),
        )
    )


# --------------------------------------------------------------------------
# q10 — scalar + IN subqueries (C10/C11): orders above the global average
# price, restricted to customers of one region's nations.
# --------------------------------------------------------------------------
@query(
    "q10_subqueries",
    oracle=f"""
SELECT o.o_orderstatus AS status, COUNT(*) AS n,
       {_dsum('o.o_totalprice')} AS total
FROM orders o
WHERE o.o_totalprice > (SELECT {_dsum('o_totalprice')} / COUNT(*) FROM orders)
  AND o.o_custkey IN (SELECT c_custkey FROM customer WHERE c_nationkey IN
                      (SELECT n_nationkey FROM nation WHERE n_regionkey = 0))
GROUP BY o.o_orderstatus
ORDER BY status
""",
)
def q10_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    # scalar subquery as a broadcast 1-row crossJoin (review r14: the
    # previous .collect() made the registered plan two jobs and pulled
    # the scalar through the driver; this keeps it one lazy plan —
    # BroadcastNestedLoopJoin on a single aggregate row is free)
    avg_price = orders.agg(
        (F.sum(F.col("o_totalprice").cast(DEC)).cast("double")
         / F.count(F.lit(1))).alias("_avg_price")
    )
    nkeys = nation.filter(F.col("n_regionkey") == 0).select("n_nationkey")
    ckeys = cust.join(
        F.broadcast(nkeys), cust.c_nationkey == nkeys.n_nationkey, "left_semi"
    ).select("c_custkey")
    return (
        orders.crossJoin(F.broadcast(avg_price))
        .filter(F.col("o_totalprice") > F.col("_avg_price"))
        .join(ckeys, orders.o_custkey == ckeys.c_custkey, "left_semi")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice").alias("total"),
        )
    )


# --------------------------------------------------------------------------
# q11 — ROLLUP grouping (C10 extension): hierarchical totals.
# --------------------------------------------------------------------------
@query(
    "q11_rollup",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {_dsum('l_quantity')} AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""",
)
def q11_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --------------------------------------------------------------------------
# q14 — CUBE grouping with grouping_id (C10 extension): all 4 grouping
# sets in one pass; gid disambiguates real NULL keys from subtotal rows.
# --------------------------------------------------------------------------
@query(
    "q14_cube",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
       {_dsum('l_quantity')} AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def q14_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            dsum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n")
    )


# --------------------------------------------------------------------------
# q16 — correlated LATERAL join (MySQL 8.0.14 parity): top-2 orders per
# customer via a correlated ORDER BY + LIMIT subquery in the FROM
# clause — the "top-N per row" idiom that predates window functions.
# The IDENTICAL SQL text runs on Spark 4 and DuckDB. Not in the driver
# window; pytest-oracle-checked.
# --------------------------------------------------------------------------
_Q16_SQL = """
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM customer c,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
ORDER BY c.c_custkey, o.o_orderkey
"""


@query("q16_lateral_topn", oracle=_Q16_SQL)
def q16_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql2pg_spark.tables import register_views

    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_Q16_SQL)
