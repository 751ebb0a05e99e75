"""Replica of the driver's t2 comparison: run the Spark query and the
DuckDB oracle on the same tables, sort columns by name, compare
order-insensitively with EXACT value equality (no tolerance — the plans
are written so floats are bit-deterministic; see plans/registry.py).
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        # Should not appear in hashed outputs (plans cast to double) but
        # normalize for robustness in local tests.
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return ("b", bytes(v))
    return str(v)


def rows_sorted(columns, rows):
    """Sort columns by name, then rows lexicographically (normalized)."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(columns), sorted(out, key=repr)


def compare_spark_duckdb(spark_df, duck_con, oracle_sql: str):
    """Assert spark_df ≡ oracle result (column-name set + values)."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = duck_con.execute(oracle_sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = rel.fetchall()

    sc, sr = rows_sorted(s_cols, s_rows)
    dc, dr = rows_sorted(d_cols, d_rows)

    assert sc == dc, f"column mismatch: spark={sc} duckdb={dc}"
    assert len(sr) == len(dr), f"row count: spark={len(sr)} duckdb={len(dr)}"
    for i, (a, b) in enumerate(zip(sr, dr)):
        assert a == b, f"row {i} differs:\n  spark : {a}\n  duckdb: {b}"
