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
