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
