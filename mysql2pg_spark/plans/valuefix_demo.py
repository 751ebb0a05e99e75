"""Extract-side value-fix queries (SURVEY B7/B8) — the mid-copy
transforms the reference performs, exposed as oracle-checked queries.

The WKB fixtures are MySQL-internal geometry bytes (4-byte SRID=0 +
little-endian WKB POINT) precomputed for (k+0.5, -k-0.25) — halves and
quarters so the ``%g`` text rendering matches SQL varchar casts exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql2pg_spark.plans.registry import query
from mysql2pg_spark.sinks.jdbc_sink import decode_mysql_point, normalize_zero_dates
from mysql2pg_spark.tables import load_table

# (k, hex of SRID+WKB for POINT(k+0.5, -k-0.25)); struct-packed offline.
WKB_POINTS = [
    (1, "000000000101000000000000000000f83f000000000000f4bf"),
    (2, "000000000101000000000000000000044000000000000002c0"),
    (3, "0000000001010000000000000000000c400000000000000ac0"),
    (4, "000000000101000000000000000000124000000000000011c0"),
    (5, "000000000101000000000000000000164000000000000015c0"),
]


# --------------------------------------------------------------------------
# b01 — zero-date normalization (B7): MySQL '0000-00-00[ 00:00:00]'
# sentinel values arrive as NULL; real dates survive.
# --------------------------------------------------------------------------
@query(
    "b01_zero_dates",
    oracle="""
WITH raw AS (
  SELECT event_id,
         CASE WHEN event_id % 7 = 0 THEN '0000-00-00 00:00:00'
              WHEN event_id % 11 = 0 THEN '0000-00-00'
              ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END AS dt_text
  FROM events WHERE event_id <= 3000
)
SELECT event_id,
       CASE WHEN dt_text LIKE '0000-00-00%' THEN NULL ELSE dt_text END AS dt_fixed,
       (CASE WHEN dt_text LIKE '0000-00-00%' THEN NULL ELSE dt_text END IS NULL) AS was_zero
FROM raw
ORDER BY event_id
""",
)
def b01_zero_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 3000)
    raw = e.select(
        "event_id",
        F.when(F.col("event_id") % 7 == 0, F.lit("0000-00-00 00:00:00"))
        .when(F.col("event_id") % 11 == 0, F.lit("0000-00-00"))
        .otherwise(F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
        .alias("dt_text"),
    )
    fixed = normalize_zero_dates("dt_text")
    return raw.select(
        "event_id",
        fixed.alias("dt_fixed"),
        fixed.isNull().alias("was_zero"),
    )


# --------------------------------------------------------------------------
# b02 — MySQL geometry POINT decode (B8): SRID+WKB bytes → "(x,y)" text.
# Spark decodes real bytes (unhex → pandas UDF struct.unpack); the oracle
# states the expected text directly from the coordinates.
# --------------------------------------------------------------------------
@query(
    "b02_wkb_points",
    oracle=" UNION ALL ".join(
        f"SELECT {k} AS id, '({k}.5,-{k}.25)' AS pt" for k, _ in WKB_POINTS
    )
    + " ORDER BY id",
)
def b02_wkb_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.createDataFrame(WKB_POINTS, "id int, wkb_hex string")
    return df.select(
        "id",
        decode_mysql_point(F.unhex("wkb_hex")).alias("pt"),
    )
