"""REAL JDBC round-trip (round 14): Spark ships Apache Derby in its
jar classpath, so the A13/A14 partitioned-read plan and the B4/B5 JDBC
sink — until now exercised only as plan dictionaries — drive an actual
``spark.read.jdbc`` / ``DataFrame.write.jdbc`` against an embedded
JDBC database in this container:

- keyset bounds probed through ``keyset_bounds_sql`` via the real JDBC
  scan (the one scalar probe per table);
- ``plan_partitioned_read``'s kwargs feed ``spark.read.jdbc`` and the
  resulting DataFrame must carry exactly the planned partition count
  with no row lost or duplicated across the range splits;
- ``plan_predicate_read``'s disjoint predicates feed the
  predicate-list overload and must cover the full domain incl. NULLs;
- the sink path writes through ``write_jdbc`` (mode/batchsize
  properties from ``plan_write``) and reads back identically.

Derby's JDBC URL is ``jdbc:derby:<path>;create=true`` with the
embedded driver — no server process, same JVM as the executors, which
is exactly Spark's own test harness pattern for JDBC.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    """(url, run_sql) for a seeded embedded Derby database."""
    db_dir = tmp_path_factory.mktemp("derby") / "db"
    url = f"jdbc:derby:{db_dir};create=true"
    jvm = spark._jvm
    # route derby.log away from the repo root
    jvm.java.lang.System.setProperty(
        "derby.stream.error.file",
        str(tmp_path_factory.mktemp("derbylog") / "derby.log"),
    )
    conn = jvm.java.sql.DriverManager.getConnection(url)

    def run_sql(sql: str) -> None:
        st = conn.createStatement()
        try:
            st.execute(sql)
        finally:
            st.close()

    run_sql(
        "CREATE TABLE orders_src ("
        "o_id BIGINT NOT NULL PRIMARY KEY, "
        "o_status VARCHAR(8), o_total DOUBLE)"
    )
    ps = conn.prepareStatement(
        "INSERT INTO orders_src VALUES (?, ?, ?)"
    )
    for i in range(1, 501):
        ps.setLong(1, i)
        ps.setString(2, "OPEN" if i % 3 else "DONE")
        ps.setDouble(3, float(i) * 1.5)
        ps.addBatch()
    ps.executeBatch()
    ps.close()
    run_sql(
        "CREATE TABLE names_src (name VARCHAR(16), v INT)"
    )
    st = conn.createStatement()
    for n, v in [("alice", 1), ("bob", 2), ("frank", 3),
                 ("mia", 4), ("zoe", 5), (None, 6)]:
        lit = f"'{n}'" if n is not None else "NULL"
        st.execute(f"INSERT INTO names_src VALUES ({lit}, {v})")
    st.close()
    yield url, run_sql
    conn.close()


def test_partitioned_jdbc_read_real(spark, derby):
    from mysql2pg_spark.sources.jdbc import (
        keyset_bounds_sql,
        plan_partitioned_read,
    )

    url, _ = derby
    # the A14 keyset probe runs as a REAL pushed-down scalar query
    bounds = spark.read.jdbc(
        url, keyset_bounds_sql("orders_src", "o_id")
    ).collect()[0]
    assert (bounds["LO"], bounds["HI"], bounds["N"]) == (1, 500, 500)

    plan = plan_partitioned_read(
        "orders_src", "o_id", bounds["LO"], bounds["HI"],
        row_count=bounds["N"], rows_per_partition=100,
    )
    assert plan["numPartitions"] == 5
    df = spark.read.jdbc(
        url,
        plan["table"],
        column=plan["column"],
        lowerBound=plan["lowerBound"],
        upperBound=plan["upperBound"],
        numPartitions=plan["numPartitions"],
    )
    assert df.rdd.getNumPartitions() == 5
    rows = df.collect()
    # no row lost or duplicated across the range splits
    assert sorted(r["O_ID"] for r in rows) == list(range(1, 501))
    assert sum(1 for r in rows if r["O_STATUS"] == "DONE") == 500 // 3
    # per-partition loads: range splits really did split the key space
    sizes = df.rdd.glom().map(len).collect()
    assert len(sizes) == 5 and all(s > 0 for s in sizes)


def test_predicate_jdbc_read_real(spark, derby):
    from mysql2pg_spark.sources.jdbc import plan_predicate_read

    url, _ = derby
    plan = plan_predicate_read("names_src", "name", ["f", "m"])
    df = spark.read.jdbc(
        url, plan["table"], predicates=plan["predicates"],
        properties={},
    )
    assert df.rdd.getNumPartitions() == 3
    vals = sorted(r["V"] for r in df.collect())
    # full domain covered exactly once, NULL key included
    assert vals == [1, 2, 3, 4, 5, 6]


def test_jdbc_sink_write_real_roundtrip(spark, derby):
    from mysql2pg_spark.sinks.jdbc_sink import (
        JdbcSinkConfig,
        plan_write,
    )

    url, _ = derby
    src = spark.range(1, 201).selectExpr(
        "id AS k", "CAST(id % 7 AS INT) AS bucket",
        "concat('v', id) AS label",
    )
    cfg = JdbcSinkConfig(url=url, user="", batchsize=50)
    plan = plan_write(src, cfg, "sink_t")
    assert plan["mode"] == "append"
    # Derby ignores the PG-only reWriteBatchedInserts property; the
    # batchsize cap still applies
    src.write.jdbc(
        url, plan["table"], mode=plan["mode"],
        properties=plan["properties"],
    )
    # Spark's JDBC writer QUOTES identifiers, so the created table
    # keeps the DataFrame's lowercase column names verbatim
    back = spark.read.jdbc(url, "sink_t")
    rows = {r["k"]: (r["bucket"], r["label"]) for r in back.collect()}
    assert len(rows) == 200
    assert rows[7] == (0, "v7")
    assert rows[200] == (200 % 7, "v200")


def test_pipeline_executes_from_real_jdbc_source(spark, derby, tmp_path):
    """End-to-end: MigrationPipeline.execute() with a source_reader
    that honors the pipeline's OWN partitioned read_plan against the
    real Derby JDBC endpoint (A13/A14 live extract), landing in DuckDB
    through the dbapi sink with count + checksum validation green."""
    import duckdb
    import yaml

    from mysql2pg_spark.config import load_config
    from mysql2pg_spark.orchestrator import (
        ColumnMeta,
        CatalogSnapshot,
        MigrationPipeline,
        TableMeta,
    )
    from mysql2pg_spark.runlog import RunLogger
    from mysql2pg_spark.sinks.dbapi_sink import make_dbapi_writer

    url, _ = derby
    snap = CatalogSnapshot(tables=[TableMeta(
        name="orders_src",
        columns=[
            ColumnMeta("o_id", "bigint", nullable=False),
            ColumnMeta("o_status", "varchar(8)"),
            ColumnMeta("o_total", "double"),
        ],
        primary_key=["o_id"],
        row_count=500,
        pk_bounds=(1, 500),
    )])
    p = tmp_path / "cfg.yml"
    p.write_text(yaml.safe_dump({
        "mysql": {"host": "h", "database": "d"},
        "postgresql": {"host": "p", "database": "d"},
        "conversion": {
            "options": {"indexes": False, "users": False,
                        "table_privileges": False},
            "limits": {"concurrency": 1, "max_rows_per_batch": 2},
        },
    }))

    def jdbc_reader(sp, plan):
        kwargs = {}
        if "column" in plan:
            kwargs = dict(
                column=plan["column"],
                lowerBound=plan["lowerBound"],
                upperBound=plan["upperBound"],
                numPartitions=plan["numPartitions"],
            )
        df = sp.read.jdbc(url, plan["table"], **kwargs)
        # Derby uppercases unquoted catalog names; the plan speaks the
        # source's declared (lowercase) identifiers
        return df.toDF(*[c.lower() for c in df.columns])

    con = duckdb.connect()
    result = MigrationPipeline(load_config(str(p)), snap).execute(
        spark,
        con,
        source_reader=jdbc_reader,
        sink_writer=make_dbapi_writer(
            con.cursor, paramstyle="qmark", via="driver"
        ),
        dest_reader=lambda sp, t: sp.createDataFrame(
            con.cursor().execute(f'SELECT * FROM "{t}"')
            .fetch_arrow_table()
        ),
        logger=RunLogger(str(tmp_path / "logs")),
        target_dialect="duckdb",
    )
    assert result["synced"] == {"orders_src": 500}
    assert result["validation"]["orders_src"]["consistent"] is True
    assert con.execute(
        "SELECT count(*), min(o_id), max(o_id) FROM orders_src"
    ).fetchone() == (500, 1, 500)


def test_catalog_sql_runs_on_a_real_engine(spark, derby):
    """The A1-A11 information_schema queries are deliberately pure ANSI
    (no backticks, no MySQL functions) — prove it by EXECUTING the
    exact query text against a real SQL engine: the recorded replay
    fixture rows (tests/golden/infoschema.json) are loaded into a
    Derby-hosted mock information_schema, ``run_query`` is the genuine
    ``spark.read.jdbc`` seam, and ``build_snapshot`` must assemble the
    IDENTICAL snapshot the fake-DB-API replay assembles from the same
    rows — every subquery, join, filter and ORDER BY parsed and
    executed by a second engine's SQL compiler."""
    import json
    import os

    from mysql2pg_spark.sources.catalog import build_snapshot

    url, run_sql = derby
    planes = json.load(open(os.path.join(
        os.path.dirname(__file__), "golden", "infoschema.json"
    )))

    V = "VARCHAR(31000)"
    tables_ddl = {
        "tables": f"table_schema {V}, table_name {V}, "
                  f"table_comment {V}, table_rows BIGINT, table_type {V}",
        "columns": f"table_schema {V}, table_name {V}, column_name {V}, "
                   f"column_type {V}, is_nullable {V}, column_default {V},"
                   f" column_comment {V}, extra {V}, "
                   f"ordinal_position INT, generation_expression {V}",
        "statistics": f"table_schema {V}, table_name {V}, index_name {V},"
                      f" column_name {V}, seq_in_index INT, "
                      f"non_unique INT, index_type {V}, expression {V}",
        "key_column_usage": f"table_schema {V}, constraint_schema {V}, "
                            f"constraint_name {V}, table_name {V}, "
                            f"column_name {V}, ordinal_position INT, "
                            f"referenced_table_name {V}, "
                            f"referenced_column_name {V}",
        "referential_constraints": f"constraint_schema {V}, "
                                   f"constraint_name {V}, table_name {V},"
                                   f" delete_rule {V}, update_rule {V}",
        "views": f"table_schema {V}, table_name {V}, view_definition {V}",
        "routines": f"routine_schema {V}, routine_name {V}, "
                    f"routine_type {V}, routine_definition {V}, "
                    f"dtd_identifier {V}, is_deterministic {V}, "
                    f"sql_data_access {V}",
        "parameters": f"specific_schema {V}, specific_name {V}, "
                      f"routine_type {V}, ordinal_position INT, "
                      f"parameter_mode {V}, parameter_name {V}, "
                      f"dtd_identifier {V}",
        "events": f"event_schema {V}, event_name {V}, "
                  f"event_definition {V}, event_type {V}, "
                  f"execute_at {V}, interval_value INT, "
                  f"interval_field {V}, starts {V}, ends {V}, "
                  f"status {V}, event_comment {V}",
        "partitions": f"table_schema {V}, table_name {V}, "
                      f"partition_name {V}, subpartition_name {V}, "
                      f"partition_ordinal_position INT, "
                      f"subpartition_ordinal_position INT, "
                      f"partition_method {V}, subpartition_method {V}, "
                      f"partition_expression {V}, "
                      f"subpartition_expression {V}, "
                      f"partition_description {V}",
        "table_constraints": f"table_schema {V}, constraint_schema {V}, "
                             f"constraint_name {V}, table_name {V}, "
                             f"constraint_type {V}, enforced {V}",
        "check_constraints": f"constraint_schema {V}, "
                             f"constraint_name {V}, check_clause {V}",
        "triggers": f"trigger_schema {V}, trigger_name {V}, "
                    f"action_timing {V}, event_manipulation {V}, "
                    f"event_object_table {V}, action_statement {V}, "
                    f"action_order INT",
        "table_privileges": f"table_schema {V}, grantee {V}, "
                            f"table_name {V}, privilege_type {V}",
    }
    run_sql("CREATE SCHEMA information_schema")
    for t, cols in tables_ddl.items():
        run_sql(f"CREATE TABLE information_schema.{t} ({cols})")

    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "1" if v else "0"
        if isinstance(v, (int, float)):
            return str(v)
        return "'" + str(v).replace("'", "''") + "'"

    def load(table: str, rows: list[dict], extra: dict):
        for r in rows:
            vals = {**r, **extra}
            cols = ", ".join(vals)
            run_sql(
                f"INSERT INTO information_schema.{table} ({cols}) "
                f"VALUES ({', '.join(lit(v) for v in vals.values())})"
            )

    db = {"table_schema": "testdb"}
    load("tables", planes["tables"], {**db, "table_type": "BASE TABLE"})
    load("columns", planes["columns"], db)
    load("statistics", planes["statistics"], db)
    load("key_column_usage", planes["key_column_usage_pk"],
         {**db, "constraint_name": "PRIMARY"})
    def _fk_name(r):
        # a real MySQL auto-names nameless FOREIGN KEYs <table>_ibfk_n;
        # the join on constraint_name needs a non-NULL key either way
        return r["constraint_name"] or f"{r['table_name']}_ibfk_1"

    for r in planes["foreign_keys"]:
        load("key_column_usage", [{
            "constraint_name": _fk_name(r),
            **{k: r[k] for k in (
                "table_name", "column_name", "ordinal_position",
                "referenced_table_name", "referenced_column_name",
            )},
        }], {**db, "constraint_schema": "testdb"})
    seen_rc = set()
    for r in planes["foreign_keys"]:
        key = (_fk_name(r), r["table_name"])
        if key in seen_rc:
            continue
        seen_rc.add(key)
        load("referential_constraints", [{
            "constraint_name": _fk_name(r),
            "table_name": r["table_name"],
            "delete_rule": r["delete_rule"],
            "update_rule": r["update_rule"],
        }], {"constraint_schema": "testdb"})
    load("views", [
        {"table_name": r["view_name"],
         "view_definition": r["view_definition"]}
        for r in planes["views"]
    ], db)
    load("routines", [
        {"routine_name": r["routine_name"],
         "routine_type": r["routine_type"],
         "routine_definition": r["routine_definition"],
         "dtd_identifier": r["return_type"],
         "is_deterministic": r["is_deterministic"],
         "sql_data_access": r["sql_data_access"]}
        for r in planes["routines"]
    ], {"routine_schema": "testdb"})
    load("parameters", planes["parameters"],
         {"specific_schema": "testdb"})
    load("events", planes["events"], {"event_schema": "testdb"})
    load("partitions", planes["partitions"], db)
    load("triggers", planes["triggers"], {"trigger_schema": "testdb"})
    load("table_constraints", [
        {"constraint_name": r["constraint_name"] or "c_unnamed",
         "table_name": r["table_name"], "enforced": r["enforced"]}
        for r in planes["check_constraints"]
    ], {**db, "constraint_schema": "testdb",
        "constraint_type": "CHECK"})
    load("check_constraints", [
        {"constraint_name": r["constraint_name"] or "c_unnamed",
         "check_clause": r["check_clause"]}
        for r in planes["check_constraints"]
    ], {"constraint_schema": "testdb"})

    def run_query(q):
        df = spark.read.jdbc(url, q)
        # Derby stores unquoted identifiers uppercase; the groupers
        # speak MySQL's lowercase catalog names
        return [
            {k.lower(): v for k, v in row.asDict().items()}
            for row in df.collect()
        ]

    jdbc_snap = build_snapshot("testdb", run_query)

    # the fake-DB-API replay snapshot from the SAME recorded rows
    def run_rows(q):
        for plane, needles in _ROWS_ROUTES:
            if all(n in q for n in needles):
                return list(planes[plane])
        raise AssertionError(q[:120])

    ref_snap = build_snapshot("testdb", run_rows)
    assert [t.name for t in jdbc_snap.tables] == \
        [t.name for t in ref_snap.tables]
    # plane-by-plane equality (dataclass ==); the unnamed-check
    # placeholder is the one deliberate difference (SQL NULL vs the
    # synthesized name a real MySQL would carry anyway)
    ref_by = {t.name: t for t in ref_snap.tables}
    for t in jdbc_snap.tables:
        r = ref_by[t.name]
        assert t.columns == r.columns, t.name
        assert t.indexes == r.indexes, t.name
        assert t.primary_key == r.primary_key, t.name
        # FK parity modulo the auto-name a real server assigns to
        # nameless constraints (the raw rows carry None)
        assert [
            (f.columns, f.ref_table, f.ref_columns, f.on_delete,
             f.on_update) for f in t.foreign_keys
        ] == [
            (f.columns, f.ref_table, f.ref_columns, f.on_delete,
             f.on_update) for f in r.foreign_keys
        ], t.name
        assert t.partition_def == r.partition_def, t.name
        # order-insensitive: the unnamed-check placeholder name
        # ('c_unnamed' in the mock catalog vs None in the raw rows)
        # changes the ORDER BY constraint_name position only
        assert {(c[1], c[2]) for c in t.checks} == \
            {(c[1], c[2]) for c in r.checks}, t.name
    assert jdbc_snap.views == ref_snap.views
    assert jdbc_snap.functions == ref_snap.functions
    assert jdbc_snap.triggers == ref_snap.triggers if \
        planes["triggers"] else True
    assert jdbc_snap.events == ref_snap.events


_ROWS_ROUTES = (
    ("key_column_usage_pk",
     ("information_schema.key_column_usage", "'PRIMARY'")),
    ("foreign_keys", ("information_schema.referential_constraints",)),
    ("check_constraints", ("constraint_type = 'CHECK'",)),
    ("partitions", ("information_schema.partitions",)),
    ("statistics", ("information_schema.statistics",)),
    ("columns", ("information_schema.columns",)),
    ("views", ("information_schema.views",)),
    ("parameters", ("information_schema.parameters",)),
    ("routines", ("information_schema.routines",)),
    ("triggers", ("information_schema.triggers",)),
    ("events", ("information_schema.events",)),
    ("table_privileges", ("information_schema.table_privileges",)),
    ("tables", ("information_schema.tables",)),
)
