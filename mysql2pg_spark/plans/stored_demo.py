"""Stored-function + generated-column queries (C95/C90) and extended
analytics (pivot, lag/lead window family)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mysql2pg_spark.functions.stored import CUSTOMER_LABEL, CUSTOMER_LEVEL
from mysql2pg_spark.operators.generated import apply_generated_columns
from mysql2pg_spark.plans.registry import query
from mysql2pg_spark.plans.relational import DEC, _dsum, dsum
from mysql2pg_spark.tables import load_table

_LEVEL_CASE = """
CASE WHEN total IS NULL OR total = 0 THEN 'none'
     WHEN total >= 1000000.0 THEN 'gold'
     WHEN total >= 200000.0 THEN 'silver'
     ELSE 'bronze' END
"""


# --------------------------------------------------------------------------
# sf01 — the three fixture stored functions, inlined set-based (C95 scale
# path): per-order totals → per-customer spend → level CASE → label concat.
# --------------------------------------------------------------------------
@query(
    "sf01_stored_functions",
    oracle=f"""
WITH order_tot AS (
  SELECT o.o_custkey,
         {_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS t
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_custkey
), cust AS (
  SELECT c.c_custkey, c.c_name, coalesce(ot.t, 0.0) AS total
  FROM customer c LEFT JOIN order_tot ot ON ot.o_custkey = c.c_custkey
)
SELECT c_custkey,
       total,
       {_LEVEL_CASE} AS level,
       c_name || ' [' || ({_LEVEL_CASE}) || ']' AS label
FROM cust
ORDER BY c_custkey
""",
)
def sf01_stored_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    per_cust = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("t")
        )
    )
    base = (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce("t", F.lit(0.0)).alias("total"),
        )
    )
    level = CUSTOMER_LEVEL.inline(F.col("total"))
    return base.select(
        "c_custkey",
        "total",
        level.alias("level"),
        CUSTOMER_LABEL.inline(F.col("c_name"), level).alias("label"),
    )


# --------------------------------------------------------------------------
# sf02 — the SAME function through the registered-UDF compatibility path
# (spark.sql callers): proves C95's dual evaluation contract.
# --------------------------------------------------------------------------
@query(
    "sf02_stored_function_udf",
    oracle=f"""
WITH order_tot AS (
  SELECT o.o_custkey, {_dsum('o.o_totalprice')} AS total
  FROM orders o GROUP BY o.o_custkey
)
SELECT o_custkey, {_LEVEL_CASE} AS level, COUNT(*) AS n
FROM order_tot
GROUP BY o_custkey, {_LEVEL_CASE}
ORDER BY o_custkey
""",
)
def sf02_stored_function_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    CUSTOMER_LEVEL.register_udf(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        f"""
        WITH order_tot AS (
          SELECT o_custkey,
                 CAST(SUM(CAST(o_totalprice AS {DEC})) AS DOUBLE) AS total
          FROM orders GROUP BY o_custkey
        )
        SELECT o_custkey, customer_level(total) AS level, COUNT(*) AS n
        FROM order_tot
        GROUP BY o_custkey, customer_level(total)
        ORDER BY o_custkey
        """
    )


# --------------------------------------------------------------------------
# gen01 — chained generated columns (C90): total references subtotal,
# mirroring the reference's generated-column inlining.
# --------------------------------------------------------------------------
@query(
    "gen01_generated_columns",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * l_quantity, 2) AS subtotal,
       round(round(l_extendedprice * l_quantity, 2) * (1 - l_discount), 4) AS total
FROM lineitem
WHERE l_orderkey <= 2000
ORDER BY l_orderkey, l_linenumber
""",
)
def gen01_generated_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    out = apply_generated_columns(
        li,
        [
            # rounding scales are chosen so the true value is exactly on
            # the rounding grid (2dp*int -> 2dp; 2dp*2dp -> 4dp): rounding
            # is then an identity on every engine. Rounding AT a midpoint
            # scale (e.g. 2dp of a 3dp-exact product) diverges across
            # engines (Spark exact-decimal HALF_UP vs DuckDB float shift).
            ("subtotal", "round(l_extendedprice * l_quantity, 2)"),
            ("total", "round(subtotal * (1 - l_discount), 4)"),
        ],
    )
    return out.select(
        "l_orderkey", "l_linenumber", "subtotal", "total"
    )


# --------------------------------------------------------------------------
# q12 — pivot (conditional-aggregation form in the oracle).
# --------------------------------------------------------------------------
@query(
    "q12_pivot",
    oracle="""
SELECT o_orderpriority AS priority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
FROM orders
GROUP BY o_orderpriority
ORDER BY priority
""",
)
def q12_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
    )


# --------------------------------------------------------------------------
# q13 — navigation window family: lag/lead/first/last/ntile/cume_dist.
# --------------------------------------------------------------------------
@query(
    "q13_lag_lead",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
       lag(o_totalprice)  OVER w AS prev_price,
       lead(o_totalprice) OVER w AS next_price,
       first_value(o_totalprice) OVER w AS first_price,
       last_value(o_totalprice)
         OVER (PARTITION BY o_custkey ORDER BY o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS last_price,
       ntile(4)    OVER w AS quartile,
       cume_dist() OVER w AS cd
FROM orders
WHERE o_custkey <= 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
ORDER BY o_custkey, o_orderkey
""",
)
def q13_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
        F.ntile(4).over(w).alias("quartile"),
        F.cume_dist().over(w).alias("cd"),
    )


# --------------------------------------------------------------------------
# sf03 — the cursor+REPEAT stored function's set-based twin (C95
# procedural half). The MySQL fixture below (BUDGET_PICK_DDL) walks a
# price-ordered cursor accumulating orders while they fit a budget —
# the canonical imperative cursor-loop shape the reference translates
# at sync_functions.go:1040-1283 / :220-407 and
# sinks/plpgsql_builder.build_spec_from_mysql now parses to a statement
# tree (golden plpgsql pinned in tests/test_schema.py). Because the
# cursor scans prices ASCENDING, "skip what doesn't fit and keep
# going" equals "take the maximal prefix whose cumulative sum fits" —
# so the per-row loop is exactly a window cumulative sum + filter.
# Generalized per order-month (each month = one independent budget
# run), the O(n) serial cursor becomes a partitioned window: parallel
# across months, one shuffle, no driver loop — the set-based rewrite
# that survives 100 TB where a row-at-a-time cursor cannot.
# Determinism: the cumsum runs in DECIMAL(38,4) over a unique ordering
# (o_totalprice, o_orderkey), so the <= budget cut is engine-exact.
# --------------------------------------------------------------------------
PICK_BUDGET = "400000.0000"

#: MySQL fixture translated by the procedural plpgsql path — kept next
#: to its Spark twin so the two halves of C95 stay in one place.
BUDGET_PICK_DDL = """
CREATE FUNCTION budget_pick_count(budget DECIMAL(18,2)) RETURNS INT
READS SQL DATA
COMMENT 'greedy order picker'
BEGIN
  DECLARE done INT DEFAULT 0;
  DECLARE price DECIMAL(18,2);
  DECLARE spent DECIMAL(18,2) DEFAULT 0;
  DECLARE n INT DEFAULT 0;
  DECLARE cur CURSOR FOR SELECT o_totalprice FROM orders
    ORDER BY o_totalprice, o_orderkey;
  DECLARE CONTINUE HANDLER FOR NOT FOUND SET done = 1;
  OPEN cur;
  pick: REPEAT
    FETCH cur INTO price;
    IF done = 0 AND spent + price <= budget THEN
      SET spent = spent + price;
      SET n = n + 1;
    END IF;
  UNTIL done = 1 END REPEAT pick;
  CLOSE cur;
  RETURN n;
END
"""


@query(
    "sf03_cursor_loop_twin",
    oracle=f"""
WITH ranked AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS om, o_orderkey, o_totalprice,
         sum(CAST(o_totalprice AS DECIMAL(38,4))) OVER (
           PARTITION BY strftime(o_orderdate, '%Y-%m')
           ORDER BY o_totalprice, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM orders
)
SELECT om,
       CAST(sum(CASE WHEN cum <= CAST({PICK_BUDGET} AS DECIMAL(38,4))
                     THEN 1 ELSE 0 END) AS BIGINT) AS picked_n,
       CAST(coalesce(sum(CASE WHEN cum <= CAST({PICK_BUDGET}
                                              AS DECIMAL(38,4))
                              THEN CAST(o_totalprice AS DECIMAL(38,4))
                         END), 0) AS DOUBLE) AS spent
FROM ranked GROUP BY om ORDER BY om
""",
    driver=False,
)
def sf03_cursor_loop_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("om")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = orders.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("om"),
        "o_orderkey",
        "o_totalprice",
    ).withColumn("cum", F.sum(F.col("o_totalprice").cast(DEC)).over(w))
    fits = F.col("cum") <= F.lit(PICK_BUDGET).cast(DEC)
    return (
        ranked.groupBy("om")
        .agg(
            F.sum(F.when(fits, 1).otherwise(0))
            .cast("bigint")
            .alias("picked_n"),
            F.coalesce(
                F.sum(F.when(fits, F.col("o_totalprice").cast(DEC))),
                F.lit(0).cast(DEC),
            )
            .cast("double")
            .alias("spent"),
        )
        .orderBy("om")
    )


# --------------------------------------------------------------------------
# sf04 — the nested-block / CASE-statement / EXIT-handler stored
# function's set-based twin (round-7 C95 widening). ORDER_TIER_DDL
# below exercises all three newly-translatable shapes — a nested
# BEGIN…END whose DECLARE is scope-lifted, a searched CASE *statement*,
# and DECLARE EXIT HANDLER FOR SQLEXCEPTION (golden plpgsql pinned in
# tests/test_schema.py; the reference strips handlers wholesale at
# sync_functions.go:1086 and has no CASE-statement pass at all). The
# per-row function is a pure banding of o_totalprice, so its set-based
# twin is one map-side CASE expression + a grouped aggregate: no
# per-row UDF, one shuffle on a 3-value key, decimal-exact totals —
# the shape that survives 100 TB where row-at-a-time evaluation
# cannot.
# --------------------------------------------------------------------------
ORDER_TIER_DDL = """
CREATE FUNCTION order_tier(p_price DECIMAL(18,2)) RETURNS VARCHAR(10)
DETERMINISTIC
COMMENT 'price band for one order'
BEGIN
  DECLARE v_tier VARCHAR(10) DEFAULT 'mid';
  DECLARE EXIT HANDLER FOR SQLEXCEPTION RETURN 'err';
  BEGIN
    DECLARE v_price DECIMAL(18,2) DEFAULT 0;
    SET v_price = p_price;
    CASE
      WHEN v_price < 50000 THEN SET v_tier = 'low';
      WHEN v_price < 200000 THEN SET v_tier = 'mid';
      ELSE SET v_tier = 'high';
    END CASE;
  END;
  RETURN v_tier;
END
"""

_TIER_CASE = (
    "CASE WHEN o_totalprice < 50000 THEN 'low' "
    "WHEN o_totalprice < 200000 THEN 'mid' ELSE 'high' END"
)


@query(
    "sf04_case_block_twin",
    oracle=f"""
SELECT {_TIER_CASE} AS tier,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE)
         AS total_spend
FROM orders
GROUP BY 1 ORDER BY tier
""",
    driver=False,
)
def sf04_case_block_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 200000, "mid")
        .otherwise("high")
    )
    return (
        orders.groupBy(tier.alias("tier"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC))
            .cast("double")
            .alias("total_spend"),
        )
        .orderBy("tier")
    )


# --------------------------------------------------------------------------
# sf05 — the SIGNAL / named-condition / specific-SQLSTATE-handler stored
# function's set-based twin (round-7 C95 widening). GUARDED_REV_DDL
# exercises all three newly-translatable shapes — a named condition
# (`DECLARE bad_disc CONDITION FOR SQLSTATE '45000'`), a `SIGNAL
# bad_disc SET MESSAGE_TEXT` validation raise, and a specific-SQLSTATE
# EXIT handler (`EXCEPTION WHEN SQLSTATE '45000' THEN` on the PG side;
# translation golden-pinned in tests/test_schema.py — the reference has
# no SIGNAL or condition pass at all, sync_functions.go:477-570). The
# per-row raise+catch collapses set-based into ONE branch of a CASE:
# rows the function would SIGNAL on take the handler's sentinel, all
# others the computed value — no per-row error machinery, no UDF, one
# map-side projection + a grouped decimal-exact aggregate. That
# collapse is the rewrite that survives 100 TB: a million raises/sec
# would serialize in any engine, a CASE branch is free.
# --------------------------------------------------------------------------
GUARDED_REV_DDL = """
CREATE FUNCTION guarded_rev(p_price DECIMAL(18,2), p_disc DECIMAL(18,2))
RETURNS DECIMAL(18,2)
DETERMINISTIC
BEGIN
  DECLARE bad_disc CONDITION FOR SQLSTATE '45000';
  DECLARE EXIT HANDLER FOR bad_disc RETURN -1;
  IF p_disc * 100 > 5 THEN
    SIGNAL bad_disc SET MESSAGE_TEXT = 'discount above policy';
  END IF;
  RETURN p_price * (1 - p_disc);
END
"""

# `l_discount * 100 > 5` (not `> 0.05`): decimal*int stays exact on
# both engines, so the guard can never flip on a float boundary.
_GUARD_SQL = "l_discount * 100 > 5"


@query(
    "sf05_signal_guard_twin",
    oracle=f"""
SELECT l_returnflag AS flag,
       CAST(SUM(CASE WHEN {_GUARD_SQL} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_guarded,
       CAST(SUM(CAST(CASE WHEN {_GUARD_SQL} THEN -1
                ELSE l_extendedprice * (1 - l_discount) END
                AS DECIMAL(38,4))) AS DOUBLE) AS guarded_rev
FROM lineitem
GROUP BY 1 ORDER BY flag
""",
    driver=False,
)
def sf05_signal_guard_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    guard = (F.col("l_discount") * 100) > 5
    per_row = (
        F.when(guard, F.lit(-1))
        .otherwise(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast(DEC)
    )
    return (
        li.groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.sum(F.when(guard, 1).otherwise(0)).cast("bigint")
            .alias("n_guarded"),
            F.sum(per_row).cast("double").alias("guarded_rev"),
        )
        .orderBy("flag")
    )


# --------------------------------------------------------------------------
# sf06 — the nested-block-with-inner-handler stored function's set-based
# twin (round-8 C95 widening: block-scoped DECLAREs and handlers).
# NESTED_GUARD_DDL exercises the two shapes round 8 made translatable —
# a handler declared INSIDE a nested BEGIN…END (it becomes that block's
# own EXCEPTION clause; round 7 refused these, the reference strips
# them at sync_functions.go:1086) and an inner-block DECLARE whose
# DEFAULT re-initializes on every entry (the round-7 scope-lift
# initialized once — the ADVICE mistranslation).  The per-row
# raise+catch collapses set-based into one CASE branch: rows whose
# inner block would raise 22012 (quantity = 25 makes the probe divisor
# zero) take the handler's sentinel, all others the price — no per-row
# error machinery, decimal-exact, one map-side projection + a grouped
# aggregate.  That collapse is the 100 TB rewrite: a raise per row
# serializes in any engine, a CASE branch is free.
# --------------------------------------------------------------------------
NESTED_GUARD_DDL = """
CREATE FUNCTION guarded_price(p_price DECIMAL(18,2), p_qty INT)
RETURNS DECIMAL(18,2)
DETERMINISTIC
BEGIN
  DECLARE r DECIMAL(18,2) DEFAULT 0;
  BEGIN
    DECLARE chk DECIMAL(18,2) DEFAULT 0;
    DECLARE EXIT HANDLER FOR SQLSTATE '22012' SET r = -1;
    SET chk = p_price / (p_qty - 25);
    SET r = p_price;
  END;
  RETURN r;
END
"""

_NG_GUARD = "l_quantity = 25"


@query(
    "sf06_nested_guard_twin",
    oracle=f"""
SELECT l_linestatus AS status,
       CAST(SUM(CASE WHEN {_NG_GUARD} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_caught,
       CAST(SUM(CASE WHEN {_NG_GUARD} THEN CAST(-1 AS DECIMAL(38,4))
                ELSE CAST(l_extendedprice AS DECIMAL(38,4)) END)
            AS DOUBLE) AS guarded_sum
FROM lineitem
GROUP BY 1 ORDER BY status
""",
    driver=False,
)
def sf06_nested_guard_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    guard = F.col("l_quantity") == 25
    per_row = (
        F.when(guard, F.lit(-1).cast(DEC))
        .otherwise(F.col("l_extendedprice").cast(DEC))
    )
    return (
        li.groupBy(F.col("l_linestatus").alias("status"))
        .agg(
            F.sum(F.when(guard, 1).otherwise(0)).cast("bigint")
            .alias("n_caught"),
            F.sum(per_row).cast("double").alias("guarded_sum"),
        )
        .orderBy("status")
    )


# --------------------------------------------------------------------------
# sf07 — the @user-variable cursor accumulator's set-based twin (round-9
# C95 widening: plain @vars now translate as synthesized typed locals —
# the reference name-rewrites them with a name heuristic at
# sync_functions.go:1180-1224, this repo infers the type from the
# assignments and seeds NULL). USERVAR_TOTAL_DDL is the canonical
# accumulator shape — `SET @total = 0` then `SET @total = @total + v`
# in a cursor loop (golden plpgsql pinned in tests/test_schema.py:
# @total/@n become `uv_total NUMERIC`/`uv_n NUMERIC` at function
# scope). The per-customer function collapses set-based into ONE
# grouped aggregate — the 100 TB rewrite: a session-variable
# accumulator serializes per row in any engine, a groupBy sum is one
# partial-agg shuffle.
# --------------------------------------------------------------------------
USERVAR_TOTAL_DDL = """
CREATE FUNCTION customer_spend(p_cust INT) RETURNS DECIMAL(18,2)
READS SQL DATA
COMMENT 'sum of one customer''s order totals'
BEGIN
  DECLARE done INT DEFAULT 0;
  DECLARE v DECIMAL(18,2);
  DECLARE cur CURSOR FOR SELECT o_totalprice FROM orders
    WHERE o_custkey = p_cust;
  DECLARE CONTINUE HANDLER FOR NOT FOUND SET done = 1;
  SET @total = 0;
  SET @n = 0;
  OPEN cur;
  read_loop: LOOP
    FETCH cur INTO v;
    IF done = 1 THEN LEAVE read_loop; END IF;
    SET @total = @total + v, @n = @n + 1;
  END LOOP;
  CLOSE cur;
  RETURN @total;
END
"""


@query(
    "sf07_uservar_accum_twin",
    oracle="""
SELECT o_custkey AS a_custkey,
       CAST(count(*) AS BIGINT) AS a_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE)
         AS acct_total
FROM orders GROUP BY 1 ORDER BY a_custkey
""",
    driver=False,
)
def sf07_uservar_accum_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_custkey").alias("a_custkey"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("a_orders"),
            F.sum(F.col("o_totalprice").cast(DEC))
            .cast("double")
            .alias("acct_total"),
        )
        .orderBy("a_custkey")
    )


# --------------------------------------------------------------------------
# sf08 — the result-set procedure's set-based twin (round 9: a MySQL
# procedure whose body streams ONE bare SELECT gains an
# ``INOUT p_resultset refcursor`` parameter and ``OPEN p_resultset FOR
# <select>`` — plpgsql's native result-set idiom; the reference drops
# ALL procedures). RESULTSET_PROC_DDL is the canonical shape (golden
# pinned in tests/test_schema.py); the twin runs the SELECT itself —
# deterministic top-10 (acctbal DESC, custkey tie-break) so the
# cross-engine hash is stable.
# --------------------------------------------------------------------------
RESULTSET_PROC_DDL = """
CREATE PROCEDURE top_customers()
READS SQL DATA
COMMENT 'ten largest accounts'
BEGIN
  SELECT c_custkey, c_name, c_acctbal FROM customer
  ORDER BY c_acctbal DESC, c_custkey LIMIT 10;
END
"""


@query(
    "sf08_resultset_proc_twin",
    oracle="""
SELECT c_custkey AS rs_custkey, c_name AS rs_name,
       CAST(c_acctbal AS DOUBLE) AS rs_acctbal
FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 10
""",
    driver=False,
)
def sf08_resultset_proc_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.select(
            F.col("c_custkey").alias("rs_custkey"),
            F.col("c_name").alias("rs_name"),
            F.col("c_acctbal").cast("double").alias("rs_acctbal"),
        )
        .orderBy(F.desc("rs_acctbal"), "rs_custkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# sf09 — the loop-result-set procedure's set-based twin (round 12: the
# cursor-accumulate shape — FETCH into variables, per-iteration
# ``SELECT v_a, v_b`` — now translates via a statically-typed temp-table
# accumulator + one final ``OPEN p_resultset FOR SELECT * FROM <tmp>``
# instead of refusing; MySQL's N one-row result sets arrive as ONE
# result set with the same rows). LOOP_RESULTSET_PROC_DDL is the
# canonical shape (golden-pinned in tests/test_schema.py); the twin
# runs the accumulated set itself — top-20 suppliers by acctbal with
# the in-loop IF filter applied.
# --------------------------------------------------------------------------
LOOP_RESULTSET_PROC_DDL = """
CREATE PROCEDURE emit_top_suppliers()
READS SQL DATA
BEGIN
  DECLARE done INT DEFAULT 0;
  DECLARE v_suppkey INT;
  DECLARE v_name VARCHAR(25);
  DECLARE v_acctbal DECIMAL(15,2);
  DECLARE c CURSOR FOR
    SELECT s_suppkey, s_name, s_acctbal FROM supplier
    ORDER BY s_acctbal DESC, s_suppkey LIMIT 20;
  DECLARE CONTINUE HANDLER FOR NOT FOUND SET done = 1;
  OPEN c;
  emit_loop: LOOP
    FETCH c INTO v_suppkey, v_name, v_acctbal;
    IF done = 1 THEN LEAVE emit_loop; END IF;
    IF v_acctbal > 0 THEN
      SELECT v_suppkey, v_name, v_acctbal;
    END IF;
  END LOOP;
  CLOSE c;
END
"""


@query(
    "sf09_loop_resultset_twin",
    oracle="""
SELECT s_suppkey AS lr_suppkey, s_name AS lr_name,
       CAST(s_acctbal AS DOUBLE) AS lr_acctbal
FROM (
  SELECT * FROM supplier ORDER BY s_acctbal DESC, s_suppkey LIMIT 20
) WHERE s_acctbal > 0
ORDER BY lr_acctbal DESC, lr_suppkey
""",
    driver=False,
)
def sf09_loop_resultset_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    return (
        sup.orderBy(F.desc("s_acctbal"), "s_suppkey")
        .limit(20)
        .filter(F.col("s_acctbal") > 0)
        .select(
            F.col("s_suppkey").alias("lr_suppkey"),
            F.col("s_name").alias("lr_name"),
            F.col("s_acctbal").cast("double").alias("lr_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# sf10 — the @@system-variable mapping surface as data (round 12: the
# read-only subset with a faithful PG analog maps to current_setting();
# writes refuse by name). Like m01_type_map, the query pins the mapping
# MATRIX itself — the runtime value of @@version differs per engine, so
# the translation table is the hash-stable observable. SYSVAR_FN_DDL is
# the canonical read shape (golden-pinned in tests/test_schema.py).
# --------------------------------------------------------------------------
SYSVAR_FN_DDL = """
CREATE FUNCTION server_tag() RETURNS VARCHAR(128)
READS SQL DATA
BEGIN
  RETURN CONCAT(@@version, ' tz=', @@session.time_zone);
END
"""


def _sysvar_oracle() -> str:
    from mysql2pg_spark.sinks.plpgsql_builder import _SYSVAR_READS

    rows = ", ".join(
        "('{}', '{}', 'refused')".format(k, v.replace("'", "''"))
        for k, v in sorted(_SYSVAR_READS.items())
    )
    return (
        f"SELECT * FROM (VALUES {rows}) "
        "AS t(sv_name, sv_reader, sv_write) ORDER BY sv_name"
    )


@query("sf10_sysvar_twin", oracle=_sysvar_oracle(), driver=False)
def sf10_sysvar_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql2pg_spark.sinks.plpgsql_builder import _SYSVAR_READS

    rows = [(k, v, "refused") for k, v in sorted(_SYSVAR_READS.items())]
    return spark.createDataFrame(
        rows, "sv_name string, sv_reader string, sv_write string"
    )
