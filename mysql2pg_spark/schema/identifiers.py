"""Identifier normalization + PostgreSQL quoting policy.

Reference behavior re-expressed (SURVEY §1.4): optional global
lowercasing (config `lowercase_columns`, sync_tableddl.go:783-791),
backtick→double-quote conversion, reserved-word-aware quoting
(keywords.go), and the 63-byte PG identifier cap with table-prefixed
index names (sync_indexes.go:65-74).
"""

from __future__ import annotations

import re

PG_MAX_IDENTIFIER = 63

# Standard PostgreSQL reserved key words (public documentation, Table C.1
# "reserved" category) — enough for a safe always-quote-when-needed policy.
PG_RESERVED = frozenset(
    """
all analyse analyze and any array as asc asymmetric authorization between
bigint binary bit boolean both case cast char character check collate
collation column concurrently constraint create cross current_catalog
current_date current_role current_schema current_time current_timestamp
current_user default deferrable desc distinct do else end except exists
extract false fetch float for foreign freeze from full grant group having
ilike in initially inner int integer intersect interval into is isnull
join lateral leading left like limit localtime localtimestamp natural not
notnull null numeric offset on only or order outer overlaps placing
primary real references returning right row select session_user setof
similar smallint some symmetric table tablesample then time timestamp to
trailing treat trigger true union unique user using values varchar
variadic verbose when where window with
""".split()
    # Plus the non-reserved-but-troublesome words the reference's fixture
    # corpus exercises as identifiers (create_view.sql:19-27 aliases) —
    # the always-quote policy covers them.
    + ["rank", "system", "groups", "function", "role", "admin"]
)

_SAFE_IDENT = re.compile(r"^[a-z_][a-z0-9_]*$")


def normalize_identifier(name: str, lowercase: bool = False) -> str:
    """Backticks stripped; optional global lowercasing (the reference's
    `lowercase_columns` behavior)."""
    name = name.strip().strip("`")
    return name.lower() if lowercase else name


def quote_pg(name: str) -> str:
    """Quote for PG DDL when needed: reserved word, uppercase letters, or
    non-identifier characters. Embedded quotes are doubled."""
    if _SAFE_IDENT.match(name) and name not in PG_RESERVED:
        return name
    return '"' + name.replace('"', '""') + '"'


def pg_index_name(table: str, index: str) -> str:
    """Table-prefixed index name truncated to PG's 63-byte cap
    (sync_indexes.go:65-74)."""
    name = index if index.startswith(f"{table}_") else f"{table}_{index}"
    return name[:PG_MAX_IDENTIFIER]
