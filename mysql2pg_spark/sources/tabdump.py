"""``mysqldump --tab`` directory source: per-table ``<t>.sql`` (CREATE
TABLE) + ``<t>.txt`` (escaped TSV via ``SELECT … INTO OUTFILE``) — the
bulk-export format real large-scale MySQL migrations use (it is the
LOAD DATA mirror and dumps tables in parallel), which a dump-file user
switching engines needs alongside the single-file format.

Spark-first shape (mirrors ``sources.dumpfile``):

- ``spark.read.text`` splits each ``.txt`` by LINE across tasks — the
  separator is a RAW tab (0x09) and the line terminator a RAW newline:
  mysqldump escapes any tab/newline INSIDE data as the two-character
  sequences ``\\t``/``\\n``, so splitting on raw bytes is exact and a
  multi-TB table parallelizes for free.
- Field decode (``\\N`` → NULL; ``\\t \\n \\r \\0 \\\\`` escape pairs →
  their characters) is pure Catalyst expressions — ``split`` on the
  escaped-backslash pair, per-segment literal ``replace`` chain plus
  one leftover-pair ``regexp_replace``, ``array_join`` back with a
  literal backslash (see ``_decode_field_col``). No Python worker, no
  Arrow transfer: the decode rides the scan inside whole-stage
  codegen.
- Typed output: decoded string cells cast through the declared schema
  JVM-side (one ``select``), like the INSERT-dump reader.

The ``.sql`` halves run through the SAME statement parsers as a
single-file dump (``snapshot_from_dump`` accepts a list of paths), so
a ``--tab`` directory gets the full A4-A9 scan: columns, PK, indexes,
FKs, comments.

Reference: the reference tool reads only a live server
(internal/db/mysql/connection.go); both dump formats are deliberate
beyond-reference surface.
"""

from __future__ import annotations

import os
import re as _re

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: LOAD DATA / INTO OUTFILE default escapes (ESCAPED BY '\\'): the
#: escape char, field sep, line sep, CR and NUL. ``\N`` is NOT in this
#: table — it is the whole-field NULL marker, not an escape pair.
_TAB_UNESCAPES = {
    "t": "\t",
    "n": "\n",
    "r": "\r",
    "0": "\x00",
    "b": "\b",
    "Z": "\x1a",
    "\\": "\\",
}

_ESCAPE_PAIR = _re.compile(r"\\(.)", _re.S)


def decode_tab_field(raw: str) -> str | None:
    """One escaped TSV field → its value (None for the ``\\N`` NULL
    marker). An escape pair outside the table decodes to its second
    character, matching LOAD DATA's rule."""
    if raw == "\\N":
        return None
    if "\\" not in raw:
        return raw
    return _ESCAPE_PAIR.sub(
        lambda m: _TAB_UNESCAPES.get(m.group(1), m.group(1)), raw
    )


def encode_tab_field(v) -> str:
    """Inverse of :func:`decode_tab_field` (test/tooling side — what
    ``SELECT … INTO OUTFILE`` emits): None → ``\\N``; escape char,
    tab, newline, CR and NUL escape as pairs."""
    if v is None:
        return "\\N"
    s = str(v)
    s = s.replace("\\", "\\\\")
    s = s.replace("\t", "\\t").replace("\n", "\\n")
    s = s.replace("\r", "\\r").replace("\x00", "\\0")
    return s


def _decode_field_col(x):
    """JVM-side decode of one escaped field column, sentinel-free (a
    sentinel byte could also occur RAW in real data — OUTFILE only
    escapes its special set — and would decode corrupted):

    1. the ``\\N`` NULL marker compares on the RAW field, so the 3-char
       ``\\\\N`` (escaped backslash + literal N) correctly decodes to
       the string ``\\N``;
    2. split on the ESCAPED-BACKSLASH pair ``\\\\`` — inside each
       segment every remaining backslash starts a single escape pair,
       so the ordered literal replaces (``\\t \\n \\r \\0 \\b \\Z``)
       plus one leftover-pair regexp (LOAD DATA's strip-the-backslash
       rule for unrecognized escapes) are unambiguous;
    3. re-join the segments with a literal backslash — exactly what
       each consumed ``\\\\`` pair means.

    Every step is a Catalyst expression (split / transform / replace /
    array_join) — the 100 TB path stays entirely JVM-side."""

    def _seg(s):
        dec = s
        for pair, ch in (("\\t", "\t"), ("\\n", "\n"), ("\\r", "\r"),
                         ("\\0", "\x00"), ("\\b", "\b"), ("\\Z", "\x1a")):
            dec = F.replace(dec, F.lit(pair), F.lit(ch))
        return F.regexp_replace(dec, r"\\(.)", r"$1")

    segs = F.split(x, r"\\\\")
    dec = F.array_join(F.transform(segs, _seg), "\\")
    return F.when(x == F.lit("\\N"), F.lit(None)).otherwise(dec)


def read_tab_dump(
    spark: SparkSession, txt_path: str, schema: StructType | str
) -> DataFrame:
    """One ``<table>.txt`` (or a glob/directory of them) → typed
    DataFrame. Splitting on the RAW tab is exact (escaped tabs in data
    are the two-character sequence ``\\t``); the escape decode is a
    literal-``replace`` chain + one leftover-pair regexp, all JVM-side
    expressions — no Python worker, no Arrow transfer in the hot path,
    so at 100 TB the decode rides the scan. Rows with a column-count
    mismatch raise (``raise_error``) rather than silently misalign."""
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    n_cols = len(schema.fields)

    lines = spark.read.text(txt_path)
    if n_cols > 1:
        # an empty line cannot be a valid multi-column row (it would
        # carry n_cols-1 raw tabs), so dropping it here is the benign
        # trailing-newline case and keeps the raise_error guard quiet
        lines = lines.filter(F.col("value") != "")
    # n_cols == 1: SELECT … INTO OUTFILE emits a single-column row
    # whose value is the empty string as an EMPTY LINE — dropping those
    # would silently lose rows (and validation checksums the source
    # through this same reader, so the loss would be invisible)
    fields = F.split(F.col("value"), "\t", -1)
    guarded = F.when(F.size(fields) == n_cols, fields).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"--tab row does not have {n_cols} fields: "),
                F.substring(F.col("value"), 1, 120),
            )
        )
    )
    split = lines.select(guarded.alias("f"))
    return split.select(
        *[
            _decode_field_col(F.element_at(F.col("f"), j + 1))
            .cast(fld.dataType)
            .alias(fld.name)
            for j, fld in enumerate(schema.fields)
        ]
    )


def snapshot_from_tab_dir(spark: SparkSession, dir_path: str):
    """CatalogSnapshot from a ``mysqldump --tab`` directory: every
    ``*.sql`` file (one CREATE TABLE each, plus whatever comments
    mysqldump wrapped it in) through the same block parser as a
    single-file dump — columns, PK, inline indexes and FKs all land.

    Real ``--tab`` runs also write each table's TRIGGERS (and, with
    ``--routines``/``--events``, the routine/event bodies) into the
    per-table ``.sql`` as DELIMITER-switched ``/*!50003 CREATE*/``
    sections, and ``/*!50001*/`` view shells get their own ``.sql`` —
    so the same routine/view scans a single-file dump gets run over
    the concatenated texts here too (skip-don't-drop: a trigger in the
    file must at least reach the plan's skip note, never vanish)."""
    from mysql2pg_spark.sources.dumpfile import (
        _VIEW_STMT_RE,
        functions_from_text,
        iter_sql_statements,
        snapshot_from_dump,
    )

    sqls = sorted(
        os.path.join(dir_path, f)
        for f in os.listdir(dir_path)
        if f.endswith(".sql")
    )
    if not sqls:
        raise FileNotFoundError(
            f"--tab directory {dir_path!r} has no .sql schema files"
        )
    snap = snapshot_from_dump(spark, sqls)
    # per-table schema files are small (DDL only, data lives in the
    # .txt halves) — a driver-side read is the right tool here
    text = "\n".join(
        open(p, encoding="utf-8", errors="replace").read() for p in sqls
    )
    views: dict[str, str] = {}
    for stmt in iter_sql_statements(text):
        mo = _VIEW_STMT_RE.match(stmt)
        if mo:
            views[mo.group(1)] = mo.group(2).strip()
    snap.views = views
    snap.functions = list(functions_from_text(text))
    snap.triggers = list(functions_from_text(text, kinds=("TRIGGER",)))
    snap.events = list(functions_from_text(text, kinds=("EVENT",)))
    return snap


def tab_source_reader(dir_path: str, schemas: dict[str, StructType | str]):
    """Factory adapting a ``--tab`` directory to
    ``MigrationPipeline.execute``'s ``source_reader`` seam — the same
    plan/DDL/sink/validation control flow as a live-MySQL or
    single-file-dump migration, swapping only the reader."""

    def reader(spark: SparkSession, plan: dict) -> DataFrame:
        table = plan["table"]
        return read_tab_dump(
            spark, os.path.join(dir_path, f"{table}.txt"), schemas[table]
        )

    return reader
