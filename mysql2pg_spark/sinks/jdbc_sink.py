"""PostgreSQL JDBC sink planning + extract-side value fixes (SURVEY B2-B9).

The reference's entire write path (page pump → per-page transaction →
COPY protocol, postgres/connection.go:447-593) collapses into
``df.write.jdbc`` with per-partition transactions. This module plans the
write options and implements the two value transforms the reference
performs mid-copy:

- B7 zero dates ``0000-00-00 [00:00:00]`` → NULL;
- B8 MySQL geometry POINT (4-byte SRID + WKB, either endianness) →
  ``(x, y)`` text — an Arrow-batched pandas UDF (struct.unpack over 25
  binary bytes has no builtin expression).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

PG_MAX_QUERY_PARAMS = 65535  # PG wire-protocol bind-parameter cap (B4)


@dataclass
class JdbcSinkConfig:
    url: str                      # jdbc:postgresql://host:port/db
    user: str
    password: str = ""
    batchsize: int = 10_000       # reference batch_insert_size default
    truncate_before_sync: bool = False

    def properties(self) -> dict[str, str]:
        return {
            "user": self.user,
            "password": self.password,
            # multi-row INSERT rewriting ≈ the reference's batched VALUES
            "reWriteBatchedInserts": "true",
        }


def effective_batchsize(batchsize: int, num_columns: int) -> int:
    """B4: stay under PG's 65535 bind-parameter cap per statement
    (maxRowsPerBatch = 65535 / ncols, postgres/connection.go:268)."""
    if num_columns <= 0:
        return batchsize
    return max(1, min(batchsize, PG_MAX_QUERY_PARAMS // num_columns))


def plan_write(df: DataFrame, cfg: JdbcSinkConfig, table: str) -> dict:
    mode = "overwrite" if cfg.truncate_before_sync else "append"
    return {
        "table": table,
        "mode": mode,
        "properties": {
            **cfg.properties(),
            "batchsize": str(effective_batchsize(cfg.batchsize, len(df.columns))),
            # overwrite+truncate preserves the DDL we emitted (B2)
            **({"truncate": "true"} if cfg.truncate_before_sync else {}),
        },
    }


def write_jdbc(df: DataFrame, cfg: JdbcSinkConfig, table: str) -> None:
    plan = plan_write(df, cfg, table)
    df.write.jdbc(
        cfg.url, plan["table"], mode=plan["mode"], properties=plan["properties"]
    )


# ---- value fixes ---------------------------------------------------------

ZERO_DATE = "0000-00-00"
ZERO_DATETIME = "0000-00-00 00:00:00"


def normalize_zero_dates(c: Column | str) -> Column:
    """B7 (postgres/connection.go:526-543): MySQL zero dates, arriving as
    strings from a permissive extract, become NULL."""
    col = F.col(c) if isinstance(c, str) else c
    return F.when(
        col.cast("string").startswith(ZERO_DATE), F.lit(None)
    ).otherwise(col)


@F.pandas_udf(StringType())
def decode_mysql_point(payload: pd.Series) -> pd.Series:
    """B8 (postgres/connection.go:596-633): MySQL internal geometry =
    4-byte SRID + WKB point (1-byte byte order, 4-byte type, 2×8-byte
    doubles) → "(x,y)" text, both endians, NULL on malformed input."""

    def one(b):
        if b is None or len(b) < 25:
            return None
        wkb = b[4:]
        little = wkb[0] == 1
        fmt = "<" if little else ">"
        (geom_type,) = struct.unpack(f"{fmt}I", wkb[1:5])
        if geom_type != 1:  # not a POINT
            return None
        x, y = struct.unpack(f"{fmt}dd", wkb[5:21])
        return f"({x:g},{y:g})"

    return payload.map(one)


# WKB geometry type codes → WKT tag (round 12: the full geometry
# family; previously every non-POINT geometry column ran through the
# point decoder and silently became NULL)
_WKT_TAGS = {
    1: "POINT", 2: "LINESTRING", 3: "POLYGON", 4: "MULTIPOINT",
    5: "MULTILINESTRING", 6: "MULTIPOLYGON", 7: "GEOMETRYCOLLECTION",
}


def _wkt_num(v: float) -> str:
    return f"{v:g}"


def _parse_wkb(b: bytes, off: int) -> tuple[str, int]:
    """(WKT text, next offset) for one WKB geometry at ``off``.
    Raises struct.error / ValueError on malformed input (caller maps
    to NULL). Each nested geometry carries its own byte-order flag,
    per the WKB spec — mixed-endian collections decode correctly."""
    little = b[off] == 1
    fmt = "<" if little else ">"
    (gtype,) = struct.unpack_from(f"{fmt}I", b, off + 1)
    off += 5
    tag = _WKT_TAGS.get(gtype)
    if tag is None:
        raise ValueError(f"unknown WKB geometry type {gtype}")

    def points(n: int, o: int) -> tuple[str, int]:
        coords = struct.unpack_from(f"{fmt}{2 * n}d", b, o)
        txt = ", ".join(
            f"{_wkt_num(coords[i])} {_wkt_num(coords[i + 1])}"
            for i in range(0, 2 * n, 2)
        )
        return txt, o + 16 * n

    if gtype == 1:  # POINT
        txt, off = points(1, off)
        return f"POINT({txt})", off
    if gtype == 2:  # LINESTRING
        (n,) = struct.unpack_from(f"{fmt}I", b, off)
        if n == 0:
            return "LINESTRING EMPTY", off + 4  # WKT spells empties so
        txt, off = points(n, off + 4)
        return f"LINESTRING({txt})", off
    if gtype == 3:  # POLYGON: rings of points
        (nrings,) = struct.unpack_from(f"{fmt}I", b, off)
        off += 4
        if nrings == 0:
            return "POLYGON EMPTY", off
        rings = []
        for _ in range(nrings):
            (n,) = struct.unpack_from(f"{fmt}I", b, off)
            txt, off = points(n, off + 4)
            rings.append(f"({txt})")
        return f"POLYGON({', '.join(rings)})", off
    # MULTI* / GEOMETRYCOLLECTION: n nested full WKB geometries
    (n,) = struct.unpack_from(f"{fmt}I", b, off)
    off += 4
    if n == 0:
        return f"{tag} EMPTY", off
    #: MULTI* members must be the matching single type — a mismatched
    #: nested type is malformed input and maps to NULL, not garbled WKT
    inner_tag = {4: "POINT(", 5: "LINESTRING(", 6: "POLYGON("}.get(gtype)
    parts = []
    for _ in range(n):
        wkt, off = _parse_wkb(b, off)
        if inner_tag is None:   # GEOMETRYCOLLECTION(POINT(…), …)
            parts.append(wkt)
            continue
        if not wkt.startswith(inner_tag):
            raise ValueError(
                f"{tag} member is {wkt.split('(')[0]}, not "
                f"{inner_tag[:-1]}"
            )
        parts.append("(" + wkt[len(inner_tag):-1] + ")")
    return f"{tag}({', '.join(parts)})", off


@F.pandas_udf(StringType())
def decode_mysql_geometry(payload: pd.Series) -> pd.Series:
    """Round 12 (B8 widened): MySQL internal geometry (4-byte SRID +
    WKB, any type, either endianness — nested geometries carry their
    own byte order) → WKT text, or PostGIS EWKT ``SRID=n;…`` when the
    SRID is nonzero. NULL on malformed input. The reference decodes
    POINT only (postgres/connection.go:596-633) and ships every other
    geometry as opaque bytes; WKT loads into PostGIS via
    ST_GeomFromEWKT and stays human-readable without it."""

    def one(b):
        if b is None or len(b) < 9:
            return None
        try:
            (srid,) = struct.unpack_from("<I", b, 0)
            wkt, _ = _parse_wkb(b, 4)
        except (struct.error, ValueError, IndexError):
            return None
        return f"SRID={srid};{wkt}" if srid else wkt

    return payload.map(one)
