"""Unit tests for the MySQL → Spark SQL transpiler."""

from __future__ import annotations

from mysql2pg_spark.dialect.transpile import (
    mask_literals,
    split_top_level,
    transpile_mysql,
)


def test_mask_literals_with_escapes():
    masked, lits = mask_literals("SELECT 'it''s (a, b)' AS x, 'y'")
    assert "(" not in masked.replace("SELECT", "")
    assert lits == ["'it''s (a, b)'", "'y'"]


def test_split_top_level():
    assert split_top_level("a, f(b, c), d") == ["a", "f(b, c)", "d"]


def test_limit_comma():
    assert transpile_mysql("SELECT 1 FROM t LIMIT 5, 10").endswith(
        "LIMIT 10 OFFSET 5"
    )


def test_isnull_and_strcmp():
    out = transpile_mysql("SELECT ISNULL(a), STRCMP(a, b) FROM t")
    assert "(a IS NULL)" in out
    assert "CASE WHEN a = b THEN 0" in out


def test_cast_signed_rounds():
    out = transpile_mysql("SELECT CAST(x AS SIGNED) FROM t")
    assert out == "SELECT CAST(round(x, 0) AS BIGINT) FROM t"
    # nested casts terminate and only rewrite the SIGNED one
    out2 = transpile_mysql("SELECT CAST(CAST(x AS CHAR) AS UNSIGNED) FROM t")
    assert "round(CAST(x AS STRING), 0)" in out2  # CHAR → STRING


def test_group_concat_variants():
    out = transpile_mysql("SELECT GROUP_CONCAT(x SEPARATOR '-') FROM t")
    assert "array_join(collect_list(CAST(x AS STRING)), '-')" in out
    out = transpile_mysql("SELECT GROUP_CONCAT(DISTINCT x ORDER BY x) FROM t")
    assert "sort_array(collect_set(CAST(x AS STRING)), true)" in out
    out = transpile_mysql("SELECT GROUP_CONCAT(x ORDER BY y DESC SEPARATOR ',') FROM t")
    assert "array_sort(collect_list(struct(y AS o, CAST(x AS STRING) AS v))" in out


def test_date_format_tokens_converted():
    out = transpile_mysql("SELECT DATE_FORMAT(d, '%Y-%m-%d %H:%i:%s') FROM t")
    assert "date_format(d, 'yyyy-MM-dd HH:mm:ss')" in out


def test_json_chain():
    out = transpile_mysql(
        "SELECT JSON_UNQUOTE(JSON_EXTRACT(j, '$.k')) FROM t"
    )
    assert out == "SELECT get_json_object(j, '$.k') FROM t"


def test_literals_untouched():
    sql = "SELECT 'LIMIT 1, 2 ISNULL(x)' AS s FROM t"
    assert transpile_mysql(sql) == sql


def test_str_to_date_returns_date_for_date_only_formats():
    # MySQL STR_TO_DATE yields DATE when the format has no time tokens —
    # the transpiler must mirror mysql_compat.str_to_date's heuristic.
    out = transpile_mysql("SELECT STR_TO_DATE(s, '%Y-%m-%d') FROM t")
    assert "to_date(s, 'yyyy-MM-dd')" in out
    out = transpile_mysql("SELECT STR_TO_DATE(s, '%d/%m/%Y %H:%i:%s') FROM t")
    assert "to_timestamp(s, 'dd/MM/yyyy HH:mm:ss')" in out
    # dynamic (non-literal) format: can't inspect → keep timestamp
    out = transpile_mysql("SELECT STR_TO_DATE(s, fmt_col) FROM t")
    assert "to_timestamp(s, fmt_col)" in out


def test_json_battery_rewrites_execute(spark):
    """The fixture views' wider JSON surface (create_view.sql uses
    JSON_LENGTH/KEYS/TYPE/VALID) transpiles to executable Spark SQL with
    MySQL semantics."""
    out = transpile_mysql(
        "SELECT JSON_LENGTH(j), JSON_TYPE(j), JSON_VALID(j), "
        "JSON_LENGTH(j, '$.a'), JSON_KEYS(j) FROM t"
    )
    assert "JSON_LENGTH" not in out.upper().replace("JSON_ARRAY_LENGTH", "")
    row = spark.sql(
        out.replace(
            "FROM t",
            "FROM VALUES ('{\"a\": [1, 2, 3], \"b\": 1}') AS t(j)",
        )
    ).collect()[0]
    assert row[0] == 2           # object with 2 keys
    assert row[1] == "OBJECT"
    assert row[2] is True
    assert row[3] == 3           # $.a is a 3-element array
    assert list(row[4]) == ["a", "b"]

    row2 = spark.sql(
        transpile_mysql("SELECT JSON_TYPE(j), JSON_LENGTH(j), JSON_VALID(j) FROM t")
        .replace("FROM t", "FROM VALUES ('12.5') AS t(j)")
    ).collect()[0]
    assert row2[0] == "DOUBLE" and row2[1] == 1 and row2[2] is True

    row3 = spark.sql(
        transpile_mysql("SELECT JSON_VALID(j) FROM t")
        .replace("FROM t", "FROM VALUES ('{broken') AS t(j)")
    ).collect()[0]
    assert row3[0] is False


def test_json_udf_backed_rewrites_execute(spark):
    """JSON_PRETTY/DEPTH/OVERLAPS/CONTAINS_PATH — the UDF-backed tail of
    the fixture views' JSON surface — execute after create_view's
    compat-UDF registration."""
    from mysql2pg_spark.functions.mysql_compat import register_compat_udfs

    register_compat_udfs(spark)
    out = transpile_mysql(
        "SELECT JSON_DEPTH(j), JSON_OVERLAPS(j, k), "
        "JSON_CONTAINS_PATH(j, 'one', '$.a', '$.zz'), "
        "JSON_CONTAINS_PATH(j, 'all', '$.a', '$.zz'), JSON_PRETTY(j) FROM t"
    )
    row = spark.sql(
        out.replace(
            "FROM t",
            'FROM VALUES (\'{"a": {"b": 1}}\', \'{"a": {"b": 1}, "c": 2}\')'
            " AS t(j, k)",
        )
    ).collect()[0]
    assert row[0] == 3                      # depth: obj > obj > scalar
    assert row[1] is True                   # shared ("a", {"b": 1}) pair
    assert row[2] is True and row[3] is False  # one vs all
    assert '"a"' in row[4] and "\n" in row[4]  # pretty-printed


def test_all_reference_fixture_views_transpile_and_parse(spark):
    """Every view in the reference's create_view.sql fixture transpiles
    into text Spark's SQL parser accepts — the C94 surface end to end.
    (Analysis needs the case_* tables; parsing catches every syntax-level
    translation gap.)"""
    import re

    sql = open("/root/reference/scripts/mysql/create_view.sql").read()
    bodies = re.split(r"CREATE OR REPLACE VIEW \w+ AS", sql)[1:]
    assert len(bodies) >= 10
    parser = spark._jsparkSession.sessionState().sqlParser()
    for i, body in enumerate(bodies):
        body = body.split(";")[0]
        out = transpile_mysql(body)
        parser.parsePlan(out)  # raises ParseException on any gap
        assert "\x00" not in out and "\x02" not in out


def test_fixture_views_execute_on_schema_mapped_tables(spark):
    """End-to-end C94+C86 integration: build every case_* table the
    fixture views reference as a temp view whose Spark schema comes from
    the reference DDL through THIS repo's type map, then create_view
    each fixture view and execute it. Catches unknown functions, column
    resolution and type errors the parse-only check cannot."""
    import re

    from pyspark.sql import Row
    from mysql2pg_spark.dialect.transpile import create_view
    from mysql2pg_spark.schema.schema_map import map_mysql_type
    from pyspark.sql.types import StructField, StructType

    tsql = open("/root/reference/scripts/mysql/create_table.sql").read()
    vsql = open("/root/reference/scripts/mysql/create_view.sql").read()
    needed = set(re.findall(r"\b(case_\w+)\b", vsql)) - {"case_result"}

    blocks = re.findall(
        r"CREATE TABLE `?(\w+)`?\s*\((.*?)\n\)", tsql, re.S
    )
    built = set()
    for name, body in blocks:
        if name not in needed:
            continue
        fields = []
        for line in body.splitlines():
            mo = re.match(
                r"\s*`?(\w+)`?\s+([a-zA-Z]+(?:\([^)]*\))?(?:\s+unsigned)?)",
                line,
            )
            if not mo or mo.group(1).upper() in (
                "PRIMARY", "UNIQUE", "KEY", "CONSTRAINT", "INDEX",
            ):
                continue
            fields.append(
                StructField(
                    mo.group(1), map_mysql_type(mo.group(2)).spark_type
                )
            )
        schema = StructType(fields)
        # one all-NULL row: enough for analysis + execution of every
        # expression path without fabricating per-type values
        spark.createDataFrame(
            [Row(*([None] * len(fields)))], schema
        ).createOrReplaceTempView(name)
        built.add(name)
    assert needed <= built, needed - built

    bodies = re.findall(
        r"CREATE OR REPLACE VIEW (\w+) AS(.*?);", vsql, re.S
    )
    assert len(bodies) >= 10
    # MySQL's loose typing lets these views mix INT/STRING/TIMESTAMP in
    # one COALESCE; every strictly-typed engine rejects that — including
    # PostgreSQL on the reference's own conversion. Such views must fail
    # with a TYPE error (never an unresolved function), all others must
    # execute.
    expected_type_divergent = {"view_case10_defaults"}
    from pyspark.errors.exceptions.captured import AnalysisException

    for vname, body in bodies:
        if vname in expected_type_divergent:
            try:
                create_view(spark, vname, body)
                spark.table(vname).collect()
            except AnalysisException as e:
                assert "DATATYPE_MISMATCH" in str(e), vname
            continue
        create_view(spark, vname, body)
        rows = spark.table(vname).collect()  # executes the full view
        assert rows is not None, vname


def test_cast_mysql_target_types(spark):
    """CAST to MySQL-only target types: DATETIME → TIMESTAMP, TIME →
    HH:mm:ss string, bare CHAR → STRING."""
    out = transpile_mysql(
        "SELECT CAST(s AS DATETIME), CAST(ts AS TIME), CAST(n AS CHAR) FROM t"
    )
    assert "CAST(s AS TIMESTAMP)" in out
    assert "date_format(ts, 'HH:mm:ss')" in out
    assert "CAST(n AS STRING)" in out
    row = spark.sql(
        out.replace(
            "FROM t",
            "FROM VALUES ('2024-05-01 10:30:00', timestamp'2024-05-01 10:30:00', 7) AS t(s, ts, n)",
        )
    ).collect()[0]
    assert str(row[0]) == "2024-05-01 10:30:00"
    assert row[1] == "10:30:00"
    assert row[2] == "7"


def test_time_shift_insert_and_session_functions(spark):
    """ADDTIME/SUBTIME durations, INSERT string splice, SCHEMA()/USER()
    — the remaining spellings the reference's view converter handles."""
    out = transpile_mysql(
        "SELECT ADDTIME(ts, '01:30:00'), SUBTIME(ts, '00:00:30'), "
        "INSERT(s, 3, 2, 'XY'), SCHEMA(), USER() FROM t"
    )
    assert "make_dt_interval" in out
    assert "overlay(s, 'XY', 3, 2)" in out
    assert "current_database()" in out and "current_user()" in out
    row = spark.sql(
        out.replace(
            "FROM t",
            "FROM VALUES (timestamp'2024-05-01 10:00:00', 'abcdef') AS t(ts, s)",
        )
    ).collect()[0]
    assert str(row[0]) == "2024-05-01 11:30:00"
    assert str(row[1]) == "2024-05-01 09:59:30"
    assert row[2] == "abXYef"


def test_json_mutation_family_in_views(spark):
    """C73-C75 in transpiled view text: set/insert/replace/remove, array
    append/insert, merge patch/preserve — all through the registered
    mysql_* UDFs with MySQL semantics."""
    from mysql2pg_spark.functions.mysql_compat import register_compat_udfs

    register_compat_udfs(spark)
    out = transpile_mysql(
        "SELECT JSON_SET(j, '$.a', 9), JSON_INSERT(j, '$.a', 9), "
        "JSON_REPLACE(j, '$.zz', 9), JSON_REMOVE(j, '$.a'), "
        "JSON_ARRAY_APPEND(j, '$.arr', 4), JSON_ARRAY_INSERT(j, '$.arr[0]', 0), "
        "JSON_MERGE_PATCH(j, '{\"a\":null}'), JSON_MERGE(j, '{\"b\":2}') FROM t"
    )
    row = spark.sql(
        out.replace(
            "FROM t", "FROM VALUES ('{\"a\":1,\"arr\":[1,2]}') AS t(j)"
        )
    ).collect()[0]
    assert row[0] == '{"a":9,"arr":[1,2]}'          # set overwrites
    assert row[1] == '{"a":1,"arr":[1,2]}'          # insert no-op (exists)
    assert row[2] == '{"a":1,"arr":[1,2]}'          # replace no-op (absent)
    assert row[3] == '{"arr":[1,2]}'                # remove
    assert row[4] == '{"a":1,"arr":[1,2,4]}'        # array append
    assert row[5] == '{"a":1,"arr":[0,1,2]}'        # array insert at 0
    assert row[6] == '{"arr":[1,2]}'                # patch null deletes
    assert row[7] == '{"a":1,"arr":[1,2],"b":2}'    # merge preserve


def test_json_constructors(spark):
    """C60/C61: JSON_OBJECT/JSON_ARRAY construct document text."""
    out = transpile_mysql(
        "SELECT JSON_OBJECT('a', 1, 'b', s), JSON_ARRAY(1, 2, 3) FROM t"
    )
    row = spark.sql(
        out.replace("FROM t", "FROM VALUES ('x') AS t(s)")
    ).collect()[0]
    assert row[0] == '{"a":1,"b":"x"}'
    assert row[1] == "[1,2,3]"


def test_json_mutation_variadic_args(spark):
    """MySQL's variadic arities: repeated (path, value) pairs chain
    left-to-right, JSON_REMOVE takes multiple paths, merges take 3+
    documents — nothing is silently dropped."""
    from mysql2pg_spark.functions.mysql_compat import register_compat_udfs

    register_compat_udfs(spark)
    out = transpile_mysql(
        "SELECT JSON_SET(j, '$.a', 9, '$.c', 7), "
        "JSON_REMOVE(j, '$.a', '$.arr'), "
        "JSON_MERGE_PATCH(j, '{\"a\":2}', '{\"b\":3}'), "
        "JSON_MERGE(j, '{\"b\":2}', '{\"b\":3}') FROM t"
    )
    row = spark.sql(
        out.replace(
            "FROM t", "FROM VALUES ('{\"a\":1,\"arr\":[1,2]}') AS t(j)"
        )
    ).collect()[0]
    assert row[0] == '{"a":9,"arr":[1,2],"c":7}'     # both pairs applied
    assert row[1] == "{}"                            # both paths removed
    assert row[2] == '{"a":2,"arr":[1,2],"b":3}'     # 3-doc patch
    assert row[3] == '{"a":1,"arr":[1,2],"b":[2,3]}' # 3-doc preserve


def test_json_bad_arity_raises():
    """Unsupported arities fail loudly at transpile time instead of
    silently truncating (MySQL errors on these too)."""
    import pytest

    with pytest.raises(ValueError, match="JSON_OBJECT"):
        transpile_mysql("SELECT JSON_OBJECT('a', 1, 'b') FROM t")
    with pytest.raises(ValueError, match="JSON_SET"):
        transpile_mysql("SELECT JSON_SET(j, '$.a') FROM t")
    with pytest.raises(ValueError, match="JSON_REMOVE"):
        transpile_mysql("SELECT JSON_REMOVE(j) FROM t")


def test_time_to_sec_sign_and_short_forms(spark):
    """MySQL TIME parses right-aligned with a whole-value sign:
    '-01:30:00' → -5400 (not -3600+1800), 'MM:SS'/'SS' short forms
    right-align, and ADDTIME with a negative duration subtracts."""
    out = transpile_mysql(
        "SELECT TIME_TO_SEC('-01:30:00'), TIME_TO_SEC('01:30:00'), "
        "TIME_TO_SEC('05:30'), TIME_TO_SEC('45'), "
        "ADDTIME(ts, '-00:30:00') FROM t"
    )
    row = spark.sql(
        out.replace(
            "FROM t",
            "FROM VALUES (timestamp'2024-05-01 10:00:00') AS t(ts)",
        )
    ).collect()[0]
    assert row[0] == -5400
    assert row[1] == 5400
    assert row[2] == 330          # MM:SS right-aligned
    assert row[3] == 45           # bare seconds
    assert str(row[4]) == "2024-05-01 09:30:00"


def test_week_mode0_year_boundaries(spark):
    """MySQL default WEEK (mode 0: Sunday-start, 0-53): week 0 exists
    when the year doesn't start on Sunday, week 1 starts at the first
    Sunday — exact at year boundaries where ISO weekofyear diverges."""
    out = transpile_mysql(
        "SELECT WEEK(d), WEEK(d, 3), CAST(ts AS TIME(3)), CAST(ts AS TIME) FROM t"
    )
    rows = spark.sql(
        out.replace(
            "FROM t",
            "FROM VALUES (date'2024-01-01', timestamp'2024-05-01 10:30:00.250'),"
            " (date'2023-01-01', timestamp'2024-05-01 10:30:00.250'),"
            " (date'2023-12-31', timestamp'2024-05-01 10:30:00.250'),"
            " (date'2024-01-07', timestamp'2024-05-01 10:30:00.250')"
            " AS t(d, ts)",
        )
    ).collect()
    by_date = {i: tuple(r) for i, r in enumerate(rows)}
    assert by_date[0][0] == 0    # 2024-01-01 is a Monday → week 0
    assert by_date[1][0] == 1    # 2023-01-01 is a Sunday → week 1
    assert by_date[2][0] == 53   # 2023-12-31 (Sunday) opens week 53
    assert by_date[3][0] == 1    # first Sunday of 2024 → week 1
    assert by_date[0][1] == 1    # mode 3 = ISO weekofyear
    assert by_date[0][2] == "10:30:00.250"
    assert by_date[0][3] == "10:30:00"


def test_more_mysql_spellings(spark):
    """Infix MOD, FORMAT, FIELD, OCT, TO_DAYS, YEARWEEK(mode 0) — the
    long tail of MySQL spellings Spark lacks natively."""
    out = transpile_mysql(
        "SELECT 7 MOD 2, MOD(7, 2), FORMAT(1234567.891, 2), "
        "FIELD('b', 'a', 'b', 'c'), FIELD('z', 'a', 'b'), OCT(8), "
        "TO_DAYS(d), YEARWEEK(d), YEARWEEK(d2) FROM t"
    )
    row = spark.sql(
        out.replace(
            "FROM t",
            "FROM VALUES (date'1970-01-01', date'2024-01-01') AS t(d, d2)",
        )
    ).collect()[0]
    assert row[0] == 1 and row[1] == 1
    assert row[2] == "1,234,567.89"
    assert row[3] == 2 and row[4] == 0
    assert row[5] == "10"
    assert row[6] == 719528          # MySQL TO_DAYS('1970-01-01')
    assert row[7] == 196952         # 1970-01-01 (Thu) → 1969 week 52
    assert row[8] == 202353         # 2024-01-01 (Mon) → 2023 week 53


def test_recursive_cte_view_transpiles_and_runs(spark):
    """MySQL 8 recursive-CTE view bodies (DATE_ADD / DATETIME / IFNULL
    spellings) transpile and execute on Spark 4's WITH RECURSIVE."""
    from mysql2pg_spark.dialect.transpile import transpile_mysql

    mysql_view = """
WITH RECURSIVE days (d) AS (
  SELECT CAST('2024-01-01 00:00:00' AS DATETIME)
  UNION ALL
  SELECT DATE_ADD(d, INTERVAL 1 DAY) FROM days
  WHERE d < CAST('2024-01-05 00:00:00' AS DATETIME)
)
SELECT d, IFNULL(NULL, 'x') AS tag FROM days
"""
    sql = transpile_mysql(mysql_view)
    assert "AS TIMESTAMP" in sql and "DATE_ADD" not in sql
    rows = spark.sql(sql).collect()
    assert len(rows) == 5
    assert all(r.tag == "x" for r in rows)


def test_null_safe_equal_rewrites_portable(spark):
    """MySQL <=> becomes ANSI IS NOT DISTINCT FROM — executable on
    Spark AND valid in the PG view-DDL target (PG has no <=>)."""
    from mysql2pg_spark.dialect.transpile import transpile_mysql

    sql = transpile_mysql(
        "SELECT NULL <=> NULL AS a, 1 <=> 2 AS b, 'x<=>y' AS lit"
    )
    assert "<=>" not in sql.replace("x<=>y", "")  # operator gone
    assert "x<=>y" in sql                         # string literal untouched
    row = spark.sql(sql).collect()[0]
    assert row.a is True and row.b is False and row.lit == "x<=>y"
