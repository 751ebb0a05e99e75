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
