"""Function batteries vs DuckDB oracle + unit tests for the format-token
converter and MySQL-specific semantics."""

from __future__ import annotations

import pytest

from mysql2pg_spark.functions.datetime_fmt import mysql_format_to_spark

@pytest.mark.parametrize(
    "mysql,spark_fmt",
    [
        ("%Y-%m-%d", "yyyy-MM-dd"),
        ("%Y-%m-%d %H:%i:%s", "yyyy-MM-dd HH:mm:ss"),
        ("%d/%m/%y", "dd/MM/yy"),
        ("%H:%i", "HH:mm"),
        ("%Y year", "yyyy' year'"),
        ("%%Y", "%'Y'"),
    ],
)
def test_format_tokens(mysql, spark_fmt):
    assert mysql_format_to_spark(mysql) == spark_fmt


def test_mysql_greatest_null_semantics(spark):
    """MySQL GREATEST returns NULL when any arg is NULL (C38)."""
    from mysql2pg_spark.functions import mysql_compat as M

    df = spark.createDataFrame([(1, None), (2, 5)], "a int, b int")
    rows = df.select(M.greatest("a", "b").alias("g")).collect()
    assert rows[0]["g"] is None
    assert rows[1]["g"] == 5


def test_mysql_length_is_bytes(spark):
    from mysql2pg_spark.functions import mysql_compat as M
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("héllo",)], "s string")
    r = df.select(
        M.length("s").alias("b"), M.char_length("s").alias("c")
    ).collect()[0]
    assert r["b"] == 6 and r["c"] == 5


def test_json_extended_family(spark):
    """C70/C72/C75: pretty, depth, merge_patch (reference declares depth
    unsupported; we implement it)."""
    from mysql2pg_spark.functions import mysql_compat as M
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [('{"a":1,"b":{"c":[1,2]}}',), (None,)], "j string"
    )
    r = df.select(
        M.json_depth("j").alias("d"),
        M.json_merge_patch("j", '{"a":null,"x":5}').alias("m"),
        M.json_pretty("j").alias("p"),
    ).collect()
    assert r[0]["d"] == 4  # obj > obj > array > scalar
    assert r[0]["m"] == '{"b":{"c":[1,2]},"x":5}'
    assert r[0]["p"].startswith('{\n  "a": 1')
    assert r[1]["d"] is None and r[1]["m"] is None and r[1]["p"] is None


def test_json_merge_preserve(spark):
    """C75 JSON_MERGE_PRESERVE: arrays concat, same-key object values
    merge-preserve recursively, scalars wrap to arrays."""
    from mysql2pg_spark.functions import mysql_compat as M

    df = spark.createDataFrame(
        [('{"a":1,"b":[1],"c":{"x":1}}',), (None,)], "j string"
    )
    r = df.select(
        M.json_merge_preserve("j", '{"a":2,"b":[2],"c":{"x":9,"y":0}}').alias("m"),
        M.json_merge_preserve("j", "[7]").alias("arr"),
    ).collect()
    assert r[0]["m"] == '{"a":[1,2],"b":[1,2],"c":{"x":[1,9],"y":0}}'
    assert r[0]["arr"] == '[{"a":1,"b":[1],"c":{"x":1}},7]'
    assert r[1]["m"] is None and r[1]["arr"] is None
