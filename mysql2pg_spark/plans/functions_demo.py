"""Function-surface batteries — SURVEY.md §2.C.2-C.7 (C12-C85).

Each battery exercises one function family from the reference's
translation contract through ``mysql2pg_spark.functions.mysql_compat``
(the DataFrame-level MySQL-semantics layer), with a DuckDB oracle
encoding the expected MySQL behavior.

Batteries run over small deterministic key-sliced subsets: functions are
row-wise (no aggregation), so a slice proves semantics while keeping the
oracle compare fast; the full-scan perf path is covered by the relational
and pipeline plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql2pg_spark.functions import mysql_compat as M
from mysql2pg_spark.plans.registry import query
from mysql2pg_spark.tables import load_table


# --------------------------------------------------------------------------
# f01 — string battery I (C12-C21): concat/length/substring/search/replace.
# --------------------------------------------------------------------------
@query(
    "f01_string_basics",
    oracle="""
SELECT
  c_custkey,
  c_name || '|' || c_mktsegment                   AS full_name,
  concat_ws('-', c_name, c_mktsegment)            AS ws_name,
  CAST(strlen(c_name) AS INTEGER)                 AS byte_len,
  CAST(length(c_name) AS INTEGER)                 AS chr_len,
  substring(c_name, 4, 5)                         AS sub5,
  array_to_string((string_split(c_name, '#'))[1:1], '#') AS sub_idx,
  CAST(strpos(c_name, 'er') AS INTEGER)           AS loc_er,
  CAST(instr(c_name, '#') AS INTEGER)             AS ins_hash,
  replace(c_name, 'Customer', 'Cust')             AS repl,
  upper(c_name)                                   AS up,
  lower(c_name)                                   AS lo,
  reverse(c_mktsegment)                           AS rev
FROM customer
WHERE c_custkey <= 300
ORDER BY c_custkey
""",
)
def f01_string_basics(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 300)
    return c.select(
        "c_custkey",
        M.concat("c_name", F.lit("|"), "c_mktsegment").alias("full_name"),
        M.concat_ws("-", "c_name", "c_mktsegment").alias("ws_name"),
        M.length("c_name").alias("byte_len"),
        M.char_length("c_name").alias("chr_len"),
        M.substr("c_name", 4, 5).alias("sub5"),
        M.substring_index("c_name", "#", 1).alias("sub_idx"),
        M.locate("er", "c_name").alias("loc_er"),
        M.instr("c_name", "#").alias("ins_hash"),
        M.replace("c_name", "Customer", "Cust").alias("repl"),
        M.upper("c_name").alias("up"),
        M.lower("c_name").alias("lo"),
        M.reverse("c_mktsegment").alias("rev"),
    )


# --------------------------------------------------------------------------
# f02 — string battery II (C22-C28): pad/repeat/space/cmp/base-convert/
# overlay/regexp.
# --------------------------------------------------------------------------
@query(
    "f02_string_advanced",
    oracle="""
SELECT
  c_custkey,
  left(c_name, 4)                                 AS lft,
  right(c_name, 3)                                AS rgt,
  lpad(c_mktsegment, 12, '*')                     AS lp,
  rpad(c_mktsegment, 12, '.')                     AS rp,
  repeat(c_mktsegment, 2)                         AS rpt,
  '[' || repeat(' ', 3) || ']'                    AS spc,
  CAST(ascii(c_name) AS INTEGER)                  AS asc_first,
  CASE WHEN c_name = c_mktsegment THEN 0
       WHEN c_name < c_mktsegment THEN -1 ELSE 1 END AS cmp,
  upper(to_hex(c_custkey))                        AS hx,
  bin(c_custkey)                                  AS cv2,
  substr(c_name, 1, 2-1) || 'XYZ' || substr(c_name, 2+3) AS ovl,
  regexp_matches(c_name, '#0*1')                  AS rx
FROM customer
WHERE c_custkey <= 300
ORDER BY c_custkey
""",
)
def f02_string_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 300)
    return c.select(
        "c_custkey",
        M.left("c_name", 4).alias("lft"),
        M.right("c_name", 3).alias("rgt"),
        M.lpad("c_mktsegment", 12, "*").alias("lp"),
        M.rpad("c_mktsegment", 12, ".").alias("rp"),
        M.repeat("c_mktsegment", 2).alias("rpt"),
        M.concat(F.lit("["), M.space(F.lit(3)), F.lit("]")).alias("spc"),
        M.ascii("c_name").alias("asc_first"),
        M.strcmp("c_name", "c_mktsegment").alias("cmp"),
        M.hex("c_custkey").alias("hx"),
        M.conv("c_custkey", 10, 2).alias("cv2"),
        M.insert("c_name", 2, 3, "XYZ").alias("ovl"),
        M.regexp("c_name", "#0*1").alias("rx"),
    )


# --------------------------------------------------------------------------
# f03 — conditional/null battery (C29-C33) + MySQL-null GREATEST/LEAST
# (C38). NULLs are synthesized via NULLIF so the battery exercises
# propagation even on a NULL-free corpus.
# --------------------------------------------------------------------------
@query(
    "f03_null_conditional",
    oracle="""
SELECT
  event_id,
  nullif(user_id % 5, 0)                          AS nv,
  coalesce(nullif(user_id % 5, 0), -1)            AS ifn,
  (nullif(user_id % 5, 0) IS NULL)                AS isn,
  CASE WHEN value > 100 THEN 'hi' ELSE 'lo' END   AS iff,
  coalesce(nullif(user_id % 5, 0), nullif(user_id % 3, 0), 99) AS coal,
  CASE WHEN nullif(user_id % 5, 0) IS NULL OR (user_id % 7) IS NULL THEN NULL
       ELSE greatest(nullif(user_id % 5, 0), user_id % 7) END  AS grt,
  CASE WHEN nullif(user_id % 5, 0) IS NULL OR (user_id % 7) IS NULL THEN NULL
       ELSE least(nullif(user_id % 5, 0), user_id % 7) END     AS lst
FROM events
WHERE event_id <= 2000
ORDER BY event_id
""",
)
def f03_null_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    nv = M.nullif(F.col("user_id") % 5, F.lit(0))
    return e.select(
        "event_id",
        nv.alias("nv"),
        M.ifnull(nv, F.lit(-1)).alias("ifn"),
        M.isnull(nv).alias("isn"),
        M.if_(F.col("value") > 100, F.lit("hi"), F.lit("lo")).alias("iff"),
        M.coalesce(nv, M.nullif(F.col("user_id") % 3, F.lit(0)), F.lit(99)).alias(
            "coal"
        ),
        M.greatest(nv, F.col("user_id") % 7).alias("grt"),
        M.least(nv, F.col("user_id") % 7).alias("lst"),
    )


# --------------------------------------------------------------------------
# f04 — math battery (C34-C39). Transcendentals are rounded to 6 dp in
# BOTH engines (libm vs JVM may differ in the last ulp — rounding makes
# the compare deterministic except on measure-zero boundaries).
# --------------------------------------------------------------------------
@query(
    "f04_math",
    oracle="""
SELECT
  l_orderkey, l_linenumber,
  round(l_extendedprice / 3.0, 2)                 AS rnd,
  CAST(l_quantity AS BIGINT) % 7                  AS md,
  CAST(ceil(l_extendedprice) AS BIGINT)           AS cl,
  CAST(floor(l_extendedprice) AS BIGINT)          AS fl,
  abs(l_discount - 0.05)                          AS ab,
  pow(l_linenumber, 2)                            AS pw,
  sqrt(l_quantity)                                AS sq,
  round(exp(l_discount), 6)                       AS ex,
  round(ln(l_quantity + 1), 6)                    AS lg,
  CAST(round(l_extendedprice, 0) AS BIGINT)       AS cast_signed
FROM lineitem
WHERE l_orderkey <= 2000
ORDER BY l_orderkey, l_linenumber
""",
)
def f04_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        M.round(F.col("l_extendedprice") / 3.0, 2).alias("rnd"),
        M.mod(F.col("l_quantity").cast("bigint"), 7).alias("md"),
        M.ceiling("l_extendedprice").alias("cl"),
        M.floor("l_extendedprice").alias("fl"),
        M.abs(F.col("l_discount") - 0.05).alias("ab"),
        M.power("l_linenumber", F.col("l_linenumber") * 0 + 2).alias("pw"),
        M.sqrt("l_quantity").alias("sq"),
        M.round(M.exp("l_discount"), 6).alias("ex"),
        M.round(M.ln(F.col("l_quantity") + 1), 6).alias("lg"),
        M.cast_signed("l_extendedprice").alias("cast_signed"),
    )


# --------------------------------------------------------------------------
# f05 — date battery (C47-C56 on DATE-grain timestamps).
# --------------------------------------------------------------------------
@query(
    "f05_date",
    oracle="""
SELECT
  o_orderkey,
  year(o_orderdate)                               AS yr,
  quarter(o_orderdate)                            AS qt,
  month(o_orderdate)                              AS mo,
  day(o_orderdate)                                AS dy,
  dayofweek(o_orderdate) + 1                      AS dow,
  dayofyear(o_orderdate)                          AS doy,
  weekofyear(o_orderdate)                         AS woy,
  last_day(o_orderdate)                           AS ld,
  date_diff('day', DATE '1995-01-01', o_orderdate) AS dd,
  o_orderdate + INTERVAL 3 DAY                    AS d_add,
  o_orderdate - INTERVAL 2 MONTH                  AS d_sub,
  date_diff('day', DATE '0001-01-01', o_orderdate) + 366 AS todays,
  CAST(o_orderdate AS DATE)                       AS dpart
FROM orders
WHERE o_orderkey <= 3000
ORDER BY o_orderkey
""",
)
def f05_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 3000)
    return o.select(
        "o_orderkey",
        M.year("o_orderdate").alias("yr"),
        M.quarter("o_orderdate").alias("qt"),
        M.month("o_orderdate").alias("mo"),
        M.day("o_orderdate").alias("dy"),
        M.dayofweek("o_orderdate").alias("dow"),
        M.dayofyear("o_orderdate").alias("doy"),
        M.weekofyear("o_orderdate").alias("woy"),
        M.last_day("o_orderdate").alias("ld"),
        M.datediff("o_orderdate", F.lit("1995-01-01").cast("date")).cast(
            "bigint"
        ).alias("dd"),
        M.date_add("o_orderdate", 3, "DAY").alias("d_add"),
        M.date_sub("o_orderdate", 2, "MONTH").alias("d_sub"),
        M.to_days("o_orderdate").alias("todays"),
        M.date("o_orderdate").alias("dpart"),
    )


# --------------------------------------------------------------------------
# f06 — time-of-day battery (C41-C46, C49, C57) on microsecond
# timestamps; epoch compares use millis (exact integers in both engines).
# --------------------------------------------------------------------------
@query(
    "f06_time",
    oracle="""
SELECT
  event_id,
  hour(ts)                                        AS hr,
  minute(ts)                                      AS mi,
  second(ts)                                      AS sec,
  epoch_ms(date_trunc('millisecond', ts))         AS ep_ms,
  CAST(floor(epoch(ts)) AS BIGINT)                AS ep_s,
  strftime(ts, '%Y-%m-%d %H:%M:%S')               AS fmt,
  strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS reparsed,
  date_diff('second', TIMESTAMP '2024-01-01 00:00:00', ts) AS tsd_sec,
  strftime(ts, '%H:%M:%S')                        AS tpart,
  hour(ts) * 3600 + minute(ts) * 60 + second(ts)  AS t2s
FROM events
WHERE event_id <= 2000
ORDER BY event_id
""",
)
def f06_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    return e.select(
        "event_id",
        M.hour("ts").alias("hr"),
        M.minute("ts").alias("mi"),
        M.second("ts").alias("sec"),
        F.unix_millis(F.date_trunc("millisecond", F.col("ts"))).alias("ep_ms"),
        M.unix_timestamp("ts").alias("ep_s"),
        M.date_format("ts", "%Y-%m-%d %H:%i:%s").alias("fmt"),
        M.str_to_date(M.date_format("ts", "%Y-%m-%d %H:%i:%s"), "%Y-%m-%d %H:%i:%s").alias(
            "reparsed"
        ),
        M.timestampdiff("SECOND", F.lit("2024-01-01 00:00:00").cast("timestamp"), "ts").alias(
            "tsd_sec"
        ),
        M.time("ts").alias("tpart"),
        M.time_to_sec(M.time("ts")).alias("t2s"),
    )


# --------------------------------------------------------------------------
# f07 — JSON battery (C60-C69) on events.props plus constructed docs.
# --------------------------------------------------------------------------
@query(
    "f07_json",
    oracle="""
SELECT
  event_id,
  json_extract_string(props, '$.k')               AS jx,
  (props IS NOT NULL AND json_valid(props))       AS jvalid,
  CAST(len(json_keys(props)) AS BIGINT)           AS jlen,
  CASE json_type(props)
    WHEN 'OBJECT' THEN 'OBJECT' WHEN 'ARRAY' THEN 'ARRAY'
    WHEN 'VARCHAR' THEN 'STRING' WHEN 'DOUBLE' THEN 'DOUBLE'
    ELSE 'INTEGER' END                            AS jtype,
  json_keys(props)                                AS jkeys,
  json_object('id', event_id, 'type', event_type)::VARCHAR AS jobj,
  to_json([event_id, user_id])::VARCHAR           AS jarr
FROM events
WHERE event_id <= 2000
ORDER BY event_id
""",
)
def f07_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    return e.select(
        "event_id",
        M.json_extract("props", "$.k").alias("jx"),
        M.json_valid("props").alias("jvalid"),
        M.json_length("props").alias("jlen"),
        M.json_type("props").alias("jtype"),
        M.json_keys("props").alias("jkeys"),
        M.json_object("id", "event_id", "type", "event_type").alias("jobj"),
        M.json_array(F.col("event_id"), F.col("user_id")).alias("jarr"),
    )


# --------------------------------------------------------------------------
# f08 — JSON mutation (C73): pandas-UDF slow path vs DuckDB json_merge.
# --------------------------------------------------------------------------
@query(
    "f08_json_mutation",
    oracle="""
SELECT
  event_id,
  json_merge_patch(props, '{"tag":"x"}')::VARCHAR AS jset,
  CASE WHEN json_extract(props, '$.k') IS NULL
       THEN json_merge_patch(props, '{"k":0}')::VARCHAR
       ELSE props END                             AS jins,
  json_merge_patch(props, '{"k":null}')::VARCHAR  AS jrem
FROM events
WHERE event_id <= 1000
ORDER BY event_id
""",
)
def f08_json_mutation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 1000)
    return e.select(
        "event_id",
        M.json_set("props", "$.tag", '"x"').alias("jset"),
        M.json_insert("props", "$.k", "0").alias("jins"),
        M.json_remove("props", "$.k").alias("jrem"),
    )


# --------------------------------------------------------------------------
# f09 — crypto + network battery (C76-C79).
# --------------------------------------------------------------------------
@query(
    "f09_crypto_net",
    oracle="""
SELECT
  c_custkey,
  md5(c_name)                                     AS h_md5,
  sha256(c_name)                                  AS h_sha256,
  (c_custkey % 223) * 16777216 + (c_custkey % 251) * 65536
    + (c_custkey % 253) * 256 + (c_custkey % 255) AS ip_num,
  CAST((c_custkey % 223) AS VARCHAR) || '.' ||
  CAST((c_custkey % 251) AS VARCHAR) || '.' ||
  CAST((c_custkey % 253) AS VARCHAR) || '.' ||
  CAST((c_custkey % 255) AS VARCHAR)              AS ip_str
FROM customer
WHERE c_custkey <= 300
ORDER BY c_custkey
""",
)
def f09_crypto_net(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 300)
    ip_str = M.concat_ws(
        ".",
        (F.col("c_custkey") % 223).cast("string"),
        (F.col("c_custkey") % 251).cast("string"),
        (F.col("c_custkey") % 253).cast("string"),
        (F.col("c_custkey") % 255).cast("string"),
    )
    return c.select(
        "c_custkey",
        M.md5("c_name").alias("h_md5"),
        M.sha2("c_name", 256).alias("h_sha256"),
        M.inet_aton(ip_str).alias("ip_num"),
        M.inet_ntoa(M.inet_aton(ip_str)).alias("ip_str"),
    )
