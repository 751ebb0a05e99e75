"""Dialect-layer queries: MySQL-dialect view texts (modeled on the
reference's view corpus — reserved-word aliases, IFNULL/IF/CASE chains,
GROUP_CONCAT with ORDER BY + SEPARATOR, %-token DATE_FORMAT, LIMIT a,b)
are transpiled by dialect.transpile_mysql and EXECUTED via spark.sql —
proving the text-level surface end-to-end, with hand-written ANSI
oracles for DuckDB.

This replaces the reference's regex chain + PG execution (ConvertViewDDL
→ ExecuteDDL, manager.go:1148-1195) with transpile → Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mysql2pg_spark.dialect.transpile import transpile_mysql
from mysql2pg_spark.plans.registry import query
from mysql2pg_spark.tables import register_views

V01_MYSQL = """
SELECT o.o_orderkey AS id,
       CONCAT(c.c_name, '-', c.c_mktsegment) AS `rank`,
       IFNULL(NULLIF(o.o_orderstatus, 'O'), 'OPEN') AS `window`,
       IF(o.o_totalprice > 200000, 'big', 'small') AS size_class,
       CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS urgent,
       DATE_FORMAT(o.o_orderdate, '%Y-%m') AS ym,
       CAST(o.o_totalprice AS SIGNED) AS price_int
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 10, 15
"""

V02_MYSQL = """
SELECT n.n_name AS nation,
       GROUP_CONCAT(c.c_mktsegment ORDER BY c.c_custkey SEPARATOR '|') AS segs_by_key,
       GROUP_CONCAT(DISTINCT c.c_mktsegment ORDER BY c.c_mktsegment SEPARATOR ',') AS segs
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_custkey <= 60
GROUP BY n.n_name
ORDER BY nation
"""

V03_MYSQL = """
SELECT event_id,
       JSON_UNQUOTE(JSON_EXTRACT(props, '$.k')) AS k_val,
       STR_TO_DATE(DATE_FORMAT(ts, '%Y-%m-%d %H:%i:%s'), '%Y-%m-%d %H:%i:%s') AS rt,
       TO_DAYS(ts) AS td,
       INET_NTOA(event_id * 100000 % 4294967296) AS ip,
       event_type REGEXP '^(click|view)$' AS is_cv,
       ISNULL(NULLIF(event_type, 'error')) AS is_err,
       STRCMP(event_type, 'view') AS cmp_v
FROM events
WHERE event_id <= 1500
ORDER BY event_id
"""


@query(
    "v01_view_basics",
    oracle="""
SELECT o.o_orderkey AS id,
       c.c_name || '-' || c.c_mktsegment AS rank,
       coalesce(nullif(o.o_orderstatus, 'O'), 'OPEN') AS "window",
       CASE WHEN o.o_totalprice > 200000 THEN 'big' ELSE 'small' END AS size_class,
       CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS urgent,
       strftime(o.o_orderdate, '%Y-%m') AS ym,
       CAST(round(o.o_totalprice, 0) AS BIGINT) AS price_int
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 15 OFFSET 10
""",
)
def v01_view_basics(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(transpile_mysql(V01_MYSQL))


@query(
    "v02_group_concat_view",
    oracle="""
SELECT n.n_name AS nation,
       string_agg(c.c_mktsegment, '|' ORDER BY c.c_custkey) AS segs_by_key,
       string_agg(DISTINCT c.c_mktsegment, ',' ORDER BY c.c_mktsegment) AS segs
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE c.c_custkey <= 60
GROUP BY n.n_name
ORDER BY nation
""",
)
def v02_group_concat_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "nation"))
    return spark.sql(transpile_mysql(V02_MYSQL))


@query(
    "v03_view_functions",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k') AS k_val,
       strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS rt,
       date_diff('day', DATE '0001-01-01', CAST(ts AS DATE)) + 366 AS td,
       CAST((event_id * 100000 % 4294967296) // 16777216 % 256 AS VARCHAR) || '.' ||
       CAST((event_id * 100000 % 4294967296) // 65536 % 256 AS VARCHAR) || '.' ||
       CAST((event_id * 100000 % 4294967296) // 256 % 256 AS VARCHAR) || '.' ||
       CAST((event_id * 100000 % 4294967296) % 256 AS VARCHAR) AS ip,
       regexp_matches(event_type, '^(click|view)$') AS is_cv,
       (nullif(event_type, 'error') IS NULL) AS is_err,
       CASE WHEN event_type = 'view' THEN 0
            WHEN event_type < 'view' THEN -1 ELSE 1 END AS cmp_v
FROM events
WHERE event_id <= 1500
ORDER BY event_id
""",
)
def v03_view_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return spark.sql(transpile_mysql(V03_MYSQL))


# The kitchen-sink view: ~25 rewrites in one text, modeled on the
# reference's dense fixture views (create_view.sql — each view stacks
# dozens of function calls over joins with reserved-word aliases).
V04_MYSQL = """
SELECT c.c_custkey AS id,
       UPPER(CONCAT(LEFT(c.c_name, 8), '...', RIGHT(c.c_name, 3))) AS `groups`,
       LPAD(CONV(c.c_custkey, 10, 16), 6, '0') AS hex_id,
       SUBSTRING_INDEX(c.c_name, '#', 1) AS name_prefix,
       LOCATE('0', c.c_name) AS first_zero,
       REPLACE(LOWER(c.c_mktsegment), 'a', '@') AS seg_munged,
       IF(ISNULL(NULLIF(c.c_mktsegment, 'MACHINERY')), 'machine', 'other') AS seg_class,
       CAST(c.c_acctbal AS SIGNED) AS bal_int,
       GREATEST(ABS(c.c_acctbal), 1000.0) AS bal_floor,
       ROUND(SQRT(POWER(c.c_nationkey + 1, 2)), 4) AS nk_ident,
       DATE_FORMAT(o.o_orderdate, '%Y/%m/%d') AS od,
       YEAR(o.o_orderdate) + MONTH(o.o_orderdate) AS ym_sum,
       DATEDIFF(o.o_orderdate, '1995-01-01') AS days_since,
       CONCAT_WS(':', c.c_mktsegment, o.o_orderstatus, o.o_orderpriority) AS triple,
       MD5(CONCAT(c.c_name, o.o_orderstatus)) AS row_hash,
       STRCMP(o.o_orderstatus, 'O') AS st_cmp,
       REPEAT(SUBSTRING(o.o_orderpriority, 1, 1), 3) AS prio_rep
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
WHERE c.c_custkey <= 200 AND o.o_orderkey % 3 = 0
ORDER BY id, o.o_orderkey
LIMIT 0, 500
"""


@query(
    "v04_kitchen_sink",
    oracle="""
SELECT c.c_custkey AS id,
       upper(left(c.c_name, 8) || '...' || right(c.c_name, 3)) AS groups,
       lpad(upper(to_hex(c.c_custkey)), 6, '0') AS hex_id,
       array_to_string((string_split(c.c_name, '#'))[1:1], '#') AS name_prefix,
       CAST(strpos(c.c_name, '0') AS INTEGER) AS first_zero,
       replace(lower(c.c_mktsegment), 'a', '@') AS seg_munged,
       CASE WHEN nullif(c.c_mktsegment, 'MACHINERY') IS NULL
            THEN 'machine' ELSE 'other' END AS seg_class,
       CAST(round(c.c_acctbal, 0) AS BIGINT) AS bal_int,
       greatest(abs(c.c_acctbal), 1000.0) AS bal_floor,
       round(sqrt(pow(c.c_nationkey + 1, 2)), 4) AS nk_ident,
       strftime(o.o_orderdate, '%Y/%m/%d') AS od,
       year(o.o_orderdate) + month(o.o_orderdate) AS ym_sum,
       date_diff('day', DATE '1995-01-01', CAST(o.o_orderdate AS DATE)) AS days_since,
       concat_ws(':', c.c_mktsegment, o.o_orderstatus, o.o_orderpriority) AS triple,
       md5(c.c_name || o.o_orderstatus) AS row_hash,
       CASE WHEN o.o_orderstatus = 'O' THEN 0
            WHEN o.o_orderstatus < 'O' THEN -1 ELSE 1 END AS st_cmp,
       repeat(substring(o.o_orderpriority, 1, 1), 3) AS prio_rep
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
WHERE c.c_custkey <= 200 AND o.o_orderkey % 3 = 0
ORDER BY id, o.o_orderkey
LIMIT 500 OFFSET 0
""",
)
def v04_kitchen_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(transpile_mysql(V04_MYSQL))
