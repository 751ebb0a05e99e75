"""Incremental schema diff: two catalog snapshots → an ALTER plan.

The reference is strictly one-shot (internal/converter/postgres
manager.go drives CREATE + full copy; re-running after source drift
means dropping and recopying everything). This module adds the
incremental primitive: diff the snapshot that WAS migrated against the
source's snapshot NOW and emit exactly the DDL the target needs to
catch up — new tables (full CREATE), added columns, type changes,
nullability flips, new indexes. Destructive statements (DROP TABLE /
DROP COLUMN) are emitted only with ``allow_drop=True``; otherwise they
surface as ``-- SKIPPED (destructive)`` comment lines so the plan is
reviewable without being dangerous by default.

Statements are executable ANSI (exercised for real against DuckDB in
tests/test_schema.py); PG-only refinements ride the existing
``sinks.ddl.adapt_ddl`` dialect seam. A NOT NULL column added without a
default is emitted nullable (adding NOT NULL to a populated table needs
a backfill, which is data movement, not DDL — the plan notes it).
"""

from __future__ import annotations

from pyspark.sql.types import StructType

from mysql2pg_spark.schema.schema_map import map_mysql_type, struct_field_for
from mysql2pg_spark.sinks.ddl import (
    create_index_ddl,
    create_table_ddl,
    default_sql,
    quote_pg,
)


def _pg_type(col) -> str:
    return map_mysql_type(col.column_type, col.auto_increment).pg_type


def _table_struct(t) -> StructType:
    return StructType(
        [
            struct_field_for(
                c.name,
                c.column_type,
                c.nullable,
                c.default,
                c.comment,
                c.auto_increment,
            )
            for c in t.columns
        ]
    )


def diff_snapshots(
    old,
    new,
    allow_drop: bool = False,
    identity_style: str = "serial",
) -> list[str]:
    """ALTER/CREATE plan taking a target at snapshot ``old`` to snapshot
    ``new``. Pure metadata — no session, no data movement."""
    stmts: list[str] = []
    old_tables = {t.name: t for t in old.tables}
    new_tables = {t.name: t for t in new.tables}

    for name, t in new_tables.items():
        if name not in old_tables:
            stmts.append(
                create_table_ddl(
                    name,
                    _table_struct(t),
                    primary_key=t.primary_key,
                    identity_style=identity_style,
                )
            )
            for ix in t.indexes:
                stmts.append(create_index_ddl(name, ix))
            continue

        o = old_tables[name]
        old_cols = {c.name: c for c in o.columns}
        new_cols = {c.name: c for c in t.columns}
        qt = quote_pg(name)

        for cname, c in new_cols.items():
            if cname not in old_cols:
                parts = [
                    f"ALTER TABLE {qt} ADD COLUMN "
                    f"{quote_pg(cname)} {_pg_type(c)}"
                ]
                if c.default is not None:
                    parts.append(f"DEFAULT {default_sql(c.default)}")
                    if not c.nullable:
                        parts.append("NOT NULL")
                elif not c.nullable:
                    stmts.append(
                        f"-- NOTE {name}.{cname}: NOT NULL requested but "
                        "no default; added nullable (backfill, then SET "
                        "NOT NULL)"
                    )
                stmts.append(" ".join(parts))
                continue
            oc = old_cols[cname]
            qc = quote_pg(cname)
            if _pg_type(c) != _pg_type(oc):
                stmts.append(
                    f"ALTER TABLE {qt} ALTER COLUMN {qc} "
                    f"SET DATA TYPE {_pg_type(c)}"
                )
            if c.nullable != oc.nullable:
                verb = "DROP" if c.nullable else "SET"
                stmts.append(
                    f"ALTER TABLE {qt} ALTER COLUMN {qc} {verb} NOT NULL"
                )

        for cname in old_cols:
            if cname not in new_cols:
                stmt = f"ALTER TABLE {qt} DROP COLUMN {quote_pg(cname)}"
                stmts.append(
                    stmt if allow_drop else f"-- SKIPPED (destructive) {stmt}"
                )

        old_ix = {ix.name for ix in o.indexes}
        for ix in t.indexes:
            if ix.name not in old_ix:
                stmts.append(create_index_ddl(name, ix))

        if t.primary_key != o.primary_key:
            if o.primary_key:
                stmts.append(
                    f"ALTER TABLE {qt} DROP CONSTRAINT "
                    f"{quote_pg(name + '_pkey')}"
                )
            if t.primary_key:
                pk = ", ".join(quote_pg(c) for c in t.primary_key)
                stmts.append(f"ALTER TABLE {qt} ADD PRIMARY KEY ({pk})")

        if (t.comment or None) != (o.comment or None):
            esc = (t.comment or "").replace("'", "''")
            stmts.append(f"COMMENT ON TABLE {qt} IS '{esc}'")
        for cname, c in new_cols.items():
            oc = old_cols.get(cname)
            if oc is not None and (c.comment or None) != (oc.comment or None):
                esc = (c.comment or "").replace("'", "''")
                stmts.append(
                    f"COMMENT ON COLUMN {qt}.{quote_pg(cname)} IS '{esc}'"
                )

    for name in old_tables:
        if name not in new_tables:
            stmt = f"DROP TABLE {quote_pg(name)}"
            stmts.append(
                stmt if allow_drop else f"-- SKIPPED (destructive) {stmt}"
            )

    return stmts
