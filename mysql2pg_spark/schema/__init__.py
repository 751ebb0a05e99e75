"""Schema plane: MySQL type strings → Spark DataTypes → PostgreSQL DDL.

Catalog-driven (reads information_schema metadata, never parses CREATE
TABLE text) — deliberately unlike the reference's regex DDL rewriting
(sync_tableddl.go), which SURVEY §3.3/§7.4 identifies as the fragile
part of that design.
"""

from mysql2pg_spark.schema.schema_map import (  # noqa: F401
    TypeMapping,
    map_mysql_type,
    struct_field_for,
)
from mysql2pg_spark.schema.identifiers import (  # noqa: F401
    normalize_identifier,
    quote_pg,
)
