"""MySQL SQL → Spark SQL dialect layer."""

from mysql2pg_spark.dialect.transpile import transpile_mysql, create_view  # noqa: F401
