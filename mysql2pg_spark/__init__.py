"""mysql2pg_spark — a PySpark-native analytics/ETL engine with the query
and data-processing capabilities of the reference MySQL→PostgreSQL
migration engine (xfg0218/MySQL2PG), re-expressed Spark-first.

Layout
------
- ``session``    SparkSession builder tuned for large-scale batch.
- ``tables``     test-table loader/registrar (TPC-H-ish parquet corpus).
- ``schema``     MySQL type-string → Spark DataType → PG DDL mapping
                 (reference: internal/converter/postgres/sync_tableddl.go).
- ``functions``  MySQL-compatible scalar function surface
                 (reference: sync_viewddl.go / sync_functions.go).
- ``dialect``    MySQL SQL → Spark SQL transpiler
                 (reference: ConvertViewDDL, sync_viewddl.go:141-920).
- ``sources``    JDBC catalog/extract planning (reference: internal/mysql).
- ``sinks``      JDBC/DDL sink emission (reference: internal/postgres).
- ``operators``  validation, dedup, similarity, text analysis, multimodal,
                 as-of join — the large-scale pipeline operator set.
- ``streaming``  Structured Streaming ingest (net-new vs the reference).
- ``plans``      the query registry exported through ``__spark_entry__``.
"""

__version__ = "0.1.0"
