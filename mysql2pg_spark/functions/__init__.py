"""MySQL-compatible scalar function surface for Spark.

``mysql_compat`` is the DataFrame-level API (Column → Column); the SQL
text level is handled by ``mysql2pg_spark.dialect``. Together they cover
the reference's translation contract (SURVEY.md §2.C, derived from
sync_viewddl.go / sync_functions.go).
"""

from mysql2pg_spark.functions import mysql_compat as M  # noqa: F401
from mysql2pg_spark.functions.datetime_fmt import (  # noqa: F401
    mysql_format_to_spark,
)
