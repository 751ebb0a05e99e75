"""MySQL type-string → (Spark DataType, PostgreSQL DDL type) mapping.

Implements the full SURVEY.md §1.3 matrix (reference: the MySQL→PG map
in sync_tableddl.go:113-167 with priority ordering :78-97 and
precision-preserving patterns :100-110), extended with the Spark column
type the engine carries internally.

Differences from the reference, on purpose:
- decimal precision is clamped to Spark's 38-digit cap (the reference
  passes decimal(65,30) through; we clamp and record the clamp in the
  mapping notes — SURVEY §7.4 risk 2);
- composite handling is data-driven: the input is the catalog's type
  string (`information_schema.columns.column_type`), never CREATE TABLE
  text.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    ByteType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    TimestampType,
)

SPARK_DECIMAL_MAX = 38

_RE_TINYINT1 = re.compile(r"^tinyint\(1\)", re.I)
_RE_DECIMAL = re.compile(r"^(?:decimal|numeric)\s*\((\d+)\s*,\s*(\d+)\)", re.I)
_RE_DECIMAL_P = re.compile(r"^(?:decimal|numeric)\s*\((\d+)\)", re.I)
_RE_CHAR = re.compile(r"^char\s*\((\d+)\)", re.I)
_RE_VARCHAR = re.compile(r"^varchar\s*\((\d+)\)", re.I)
_RE_DATETIME_P = re.compile(r"^(?:datetime|timestamp)\s*\((\d+)\)", re.I)
_RE_TIME_P = re.compile(r"^time\s*\((\d+)\)", re.I)
# Display width (int(11)) and float/double precision ((10,2)) suffixes —
# both discarded by the reference (:41-43, :605-609).
_RE_DISPLAY_WIDTH = re.compile(r"\(\s*\d+(\s*,\s*\d+)?\s*\)")


@dataclass
class TypeMapping:
    mysql_type: str            # original catalog string, e.g. "int(11) unsigned"
    spark_type: DataType       # engine-internal column type
    pg_type: str               # sink DDL type, e.g. "INTEGER"
    notes: str = ""            # lossy/clamped conversions documented here
    is_auto_increment: bool = False


def _strip_attrs(t: str) -> tuple[str, bool]:
    """Remove unsigned/zerofill/charset/collation attributes (reference
    strips these at :366, :524-525); returns (base, was_unsigned)."""
    low = t.strip().lower()
    unsigned = " unsigned" in f" {low}" or low.endswith("unsigned")
    for attr in ("unsigned", "zerofill"):
        low = re.sub(rf"\b{attr}\b", "", low)
    low = re.sub(r"character set \S+", "", low)
    low = re.sub(r"collate \S+", "", low)
    return low.strip(), unsigned


_RE_ENUM = re.compile(r"(?is)^enum\s*\((.*)\)\s*$")
_RE_SET = re.compile(r"(?is)^set\s*\((.*)\)\s*$")
#: one PG-safe quoted literal: '' doubling only, no backslash escapes
_RE_SQL_LIT = re.compile(r"^'(?:[^'\\]|'')*'$")


def enum_values(column_type: str) -> list[str] | None:
    """The quoted value literals of an ``enum('a','b',…)`` column type.
    None for non-enum types; ``[]`` for an enum whose value list is not
    PG-safe ('' doubling only — a token carrying backslash escapes or
    anything PG would read differently makes the whole list
    untranslatable, and the caller surfaces a named skip instead of
    mistranslating)."""
    return _quoted_value_list(column_type, _RE_ENUM)


def set_values(column_type: str) -> list[str] | None:
    """The quoted member literals of a ``set('a','b',…)`` column type,
    with the same None / ``[]`` contract as :func:`enum_values`.

    The SET domain (any comma-joined subset of the members, in MySQL's
    canonical definition order) IS CHECK-expressible in PostgreSQL —
    ``string_to_array(col, ',') <@ ARRAY[members]`` — because MySQL
    forbids commas inside SET members, so splitting on ',' recovers
    the element list exactly (round 13; previously a documented
    discard, and the reference discards the list too,
    sync_tableddl.go:601-603)."""
    return _quoted_value_list(column_type, _RE_SET)


def _quoted_value_list(column_type: str, head_re) -> list[str] | None:
    mo = head_re.match(column_type.strip())
    if not mo:
        return None
    from mysql2pg_spark.dialect.transpile import (
        mask_literals,
        split_top_level,
        unmask_literals,
    )

    masked, lits = mask_literals(mo.group(1))
    vals = []
    for tok in split_top_level(masked):
        lit = unmask_literals(tok.strip(), lits)
        if not _RE_SQL_LIT.match(lit):
            return []
        vals.append(lit)
    return vals


def map_mysql_type(mysql_type: str, auto_increment: bool = False) -> TypeMapping:
    """Map one MySQL column type string (priority order mirrors the
    reference's convertDataType, sync_tableddl.go:78-97)."""
    t, unsigned = _strip_attrs(mysql_type)
    notes = ""

    def m(spark: DataType, pg: str) -> TypeMapping:
        if auto_increment:
            # SERIAL family at the sink (C89); engine carries plain ints —
            # Spark never generates identity values (SURVEY §7.4 risk 6).
            pg_serial = {"SMALLINT": "SMALLSERIAL", "INTEGER": "SERIAL",
                         "BIGINT": "BIGSERIAL"}.get(pg, pg)
            return TypeMapping(mysql_type, spark, pg_serial, notes, True)
        return TypeMapping(mysql_type, spark, pg, notes)

    # ---- exact-width specials first ------------------------------------
    if _RE_TINYINT1.match(t):
        # MySQL tinyint(1) IS numeric — views compare and do arithmetic
        # on it (the reference's own fixture does: is_active = 1,
        # ROUND(is_active, 2)). Carry SMALLINT engine-side so those
        # expressions type-check exactly as in MySQL; the sink column is
        # BOOLEAN (reference parity, sync_tableddl.go:121) with the 0/1
        # → false/true cast applied at the write boundary
        # (orchestrator._value_fix_transform).
        notes = "tinyint(1): smallint engine-side, boolean at the sink"
        return m(ShortType(), "BOOLEAN")
    if mo := _RE_DECIMAL.match(t):
        p, s = int(mo.group(1)), int(mo.group(2))
        cp, cs = p, s
        if p > SPARK_DECIMAL_MAX:
            overflow = p - SPARK_DECIMAL_MAX
            cp = SPARK_DECIMAL_MAX
            cs = max(s - overflow, 0)
            notes = f"decimal({p},{s}) clamped to Spark cap ({cp},{cs})"
        return m(DecimalType(cp, cs), f"DECIMAL({p},{s})")
    if mo := _RE_DECIMAL_P.match(t):
        p = min(int(mo.group(1)), SPARK_DECIMAL_MAX)
        return m(DecimalType(p, 0), f"DECIMAL({mo.group(1)},0)")
    if mo := _RE_CHAR.match(t):
        n = int(mo.group(1))
        # reference patches char(0)→char(10) (postgres/connection.go:84)
        pg_n = 10 if n == 0 else n
        if n == 0:
            notes = "char(0) widened to char(10)"
        return m(StringType(), f"CHAR({pg_n})")
    if mo := _RE_VARCHAR.match(t):
        n = int(mo.group(1))
        pg_n = 1 if n == 0 else n  # varchar(0)→VARCHAR(1) (:604)
        if n == 0:
            notes = "varchar(0) widened to varchar(1)"
        return m(StringType(), f"VARCHAR({pg_n})")
    if mo := _RE_DATETIME_P.match(t):
        return m(TimestampType(), f"TIMESTAMP({mo.group(1)})")
    if mo := _RE_TIME_P.match(t):
        notes = "no Spark TimeType; carried as HH:MM:SS[.ffffff] string"
        return m(StringType(), f"TIME({mo.group(1)})")

    # ---- family matches (display widths like int(11) discarded, :43) ---
    base = _RE_DISPLAY_WIDTH.sub("", t).split()[0] if t else ""
    if base == "tinyint":
        return m(ShortType(), "SMALLINT")
    if base == "smallint":
        return m(IntegerType(), "INTEGER") if unsigned else m(ShortType(), "SMALLINT")
    if base in ("mediumint", "int", "integer", "year"):
        return m(LongType(), "BIGINT") if unsigned else m(IntegerType(), "INTEGER")
    if base == "bigint":
        if unsigned:
            # Deliberate divergence: the reference just drops "unsigned"
            # (sync_tableddl.go:365) so values > 2^63-1 overflow at the
            # sink. DECIMAL(20,0) holds the full unsigned range.
            notes = "bigint unsigned widened to DECIMAL(20,0) (reference overflows)"
            return m(DecimalType(20, 0), "NUMERIC(20,0)")
        return m(LongType(), "BIGINT")
    if base == "float":
        return m(FloatType(), "REAL")
    if base in ("double", "real") or t.startswith("double precision"):
        return m(DoubleType(), "DOUBLE PRECISION")
    if base in ("decimal", "numeric"):
        return m(DecimalType(10, 0), "DECIMAL(10,0)")
    if base in ("char", "varchar"):
        return m(StringType(), "TEXT")
    if base in ("text", "tinytext", "mediumtext", "longtext"):
        return m(StringType(), "TEXT")
    if base in ("blob", "tinyblob", "mediumblob", "longblob", "binary", "varbinary"):
        return m(BinaryType(), "BYTEA")
    if base in ("datetime", "timestamp"):
        return m(TimestampType(), "TIMESTAMP")
    if base == "date":
        return m(DateType(), "DATE")
    if base == "time":
        notes = "no Spark TimeType; carried as HH:MM:SS string"
        return m(StringType(), "TIME")
    if base == "json" or t.startswith("json("):
        # json(n) length suffix dropped (reJsonLength, sync_tableddl.go:30-31)
        return m(StringType(), "JSON")
    if base == "jsonb":
        return m(StringType(), "JSONB")
    if base == "enum" or t.startswith("enum("):
        # round 12: the value list is ENFORCED via a post-data CHECK
        # constraint (orchestrator checks stage); the reference
        # discards it entirely (sync_tableddl.go:601-603)
        notes = "value list enforced via post-data CHECK (round 12)"
        return m(StringType(), "VARCHAR(255)")
    if base == "set" or t.startswith("set("):
        # round 13: the member list is ENFORCED via a post-data
        # string_to_array-membership CHECK (orchestrator checks stage);
        # the reference discards it (sync_tableddl.go:601-603). MySQL's
        # store-time normalization (definition order, dup removal) is
        # not reproduced — a CHECK can only validate, not rewrite.
        notes = "member list enforced via post-data CHECK (round 13)"
        return m(StringType(), "VARCHAR(255)")
    if base == "point":
        notes = 'WKB-decoded to "(x,y)" text at extract (SURVEY B8)'
        return m(StringType(), "POINT")
    if base in (
        "geometry",
        "linestring",
        "polygon",
        "multipoint",
        "multilinestring",
        "multipolygon",
        "geometrycollection",
    ):
        # round 12: WKB-decoded to WKT/EWKT text at extract (B8
        # widened) — loads into PostGIS via ST_GeomFromEWKT, readable
        # without it; previously opaque BYTEA (and the POINT-only
        # decoder NULLed every non-point geometry)
        notes = "WKB-decoded to WKT/EWKT text at extract (SURVEY B8)"
        return m(StringType(), "TEXT")
    if base == "bit":
        return m(BinaryType(), "BIT VARYING")
    if base == "bool" or base == "boolean":
        return m(BooleanType(), "BOOLEAN")

    notes = f"unknown MySQL type '{mysql_type}' defaulted to TEXT"
    return m(StringType(), "TEXT")


def struct_field_for(
    name: str,
    mysql_type: str,
    nullable: bool = True,
    default: str | None = None,
    comment: str | None = None,
    auto_increment: bool = False,
    generated_expr: str | None = None,
) -> StructField:
    """Build the engine-side StructField carrying sink metadata (the Spark
    analog of ColumnInfo, metadata.go:21-27). ``generated_expr`` is the
    raw MySQL GENERATED ALWAYS AS expression (round 11); the DDL
    emitter rewrites it to PG and the data stage excludes the column
    from the sink write (PG computes it)."""
    mapping = map_mysql_type(mysql_type, auto_increment)
    metadata: dict = {"mysql_type": mysql_type, "pg_type": mapping.pg_type}
    if default is not None:
        metadata["default"] = default
    if comment:
        metadata["comment"] = comment
    if mapping.notes:
        metadata["notes"] = mapping.notes
    if generated_expr:
        metadata["generated_mysql"] = generated_expr
    return StructField(name, mapping.spark_type, nullable, metadata)
