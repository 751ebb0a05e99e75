"""Partitioned JDBC extract planning (SURVEY A12-A15, §3.2).

The reference pumps pages in a loop — keyset `WHERE pk > ? LIMIT n` when
the table has a single-column PK, OFFSET paging otherwise
(sync_data.go:171-311). In Spark the whole loop collapses into ONE
`spark.read.jdbc` whose partition options make every executor fetch a
disjoint key range in parallel. This module computes those options:

- numeric single PK → partitionColumn/lowerBound/upperBound/numPartitions
  (Spark generates the range predicates);
- non-numeric or composite PK → explicit `predicates` built from quantile
  boundaries (the caller samples them with keyset_bounds_sql / a
  percentile probe);
- no PK → single partition + fetchsize streaming (the reference's OFFSET
  path is strictly worse: O(n²) server-side skips).

Executing against a live MySQL needs the JDBC driver jar on the
classpath; everything here is a pure planner and fully unit-testable
without a server.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field


@dataclass
class JdbcSourceConfig:
    """Connection config (mirrors config.example.yml keys)."""

    url: str                       # jdbc:mysql://host:port/db
    user: str
    password: str = ""
    fetchsize: int = 10_000        # reference max_rows_per_batch analog
    max_connections: int = 50      # caps numPartitions (pool parity)

    def properties(self) -> dict[str, str]:
        return {
            "user": self.user,
            "password": self.password,
            "fetchsize": str(self.fetchsize),
            # zero dates arrive as NULL, matching B7 without a transform
            "zeroDateTimeBehavior": "convertToNull",
        }


DEFAULT_ROWS_PER_PARTITION = 1_000_000
#: Partition byte budget: keep each JDBC range fetch comfortably inside
#: executor memory (Spark's files.maxPartitionBytes analog for JDBC).
DEFAULT_PARTITION_BYTES = 256 * 1024 * 1024

#: A15 type-aware per-column byte estimates. The reference punts with a
#: flat 20 bytes/column (mysql/connection.go:231-244, "每列平均占用20字
#: 节"); declared widths are strictly better information we already hold
#: from the A4 column scan, so use them (deliberate divergence).
_FIXED_SIZES = {
    "tinyint": 1, "smallint": 2, "mediumint": 3, "int": 4, "integer": 4,
    "bigint": 8, "float": 4, "double": 8, "decimal": 16, "numeric": 16,
    "date": 3, "time": 3, "year": 1, "datetime": 8, "timestamp": 4,
    "bit": 2, "json": 256, "text": 256, "tinytext": 64, "mediumtext": 512,
    "longtext": 1024, "blob": 256, "tinyblob": 64, "mediumblob": 512,
    "longblob": 1024, "enum": 2, "set": 4, "point": 25, "geometry": 64,
}
_RE_WIDTH = re.compile(r"^(?:var)?(?:char|binary)\s*\((\d+)\)", re.I)


def estimate_row_bytes(column_types: list[str]) -> int:
    """A15: estimated bytes per row from the declared column types
    (char/varchar use half the declared width as the expected fill)."""
    total = 0
    for t in column_types:
        t = t.strip().lower()
        if mo := _RE_WIDTH.match(t):
            total += max(1, int(mo.group(1)) // 2)
            continue
        base = t.split("(")[0].split()[0] if t else ""
        total += _FIXED_SIZES.get(base, 20)  # unknown → reference default
    return max(total, 1)


def keyset_bounds_sql(table: str, pk: str) -> str:
    """The one scalar probe per table feeding lower/upper bounds
    (SURVEY §4.3 item 5)."""
    return f"(SELECT MIN({pk}) AS lo, MAX({pk}) AS hi, COUNT(*) AS n FROM {table}) b"


def plan_partitioned_read(
    table: str,
    pk: str | None,
    lo=None,
    hi=None,
    row_count: int | None = None,
    rows_per_partition: int = DEFAULT_ROWS_PER_PARTITION,
    max_partitions: int = 64,
    row_bytes: int | None = None,
    target_partition_bytes: int = DEFAULT_PARTITION_BYTES,
) -> dict:
    """Build spark.read.jdbc kwargs for one table. When ``row_bytes``
    (A15 estimate) is given, the rows-per-partition cap is ALSO bounded
    by a byte budget — a 50-column wide table gets proportionally more,
    smaller partitions than a 2-column narrow one, so partitions stay
    executor-memory-sized at any schema width."""
    if pk is None or lo is None or hi is None:
        return {"table": table}  # single partition; fetchsize still streams
    n = row_count or 0
    if row_bytes:
        rows_per_partition = max(
            1, min(rows_per_partition, target_partition_bytes // row_bytes)
        )
    parts = max(1, min(max_partitions, math.ceil(n / rows_per_partition) or 1))
    return {
        "table": table,
        "column": pk,
        "lowerBound": str(lo),
        "upperBound": str(hi),
        "numPartitions": parts,
    }


def plan_predicate_read(
    table: str, pk: str, boundaries: list
) -> dict:
    """Range predicates over sampled boundaries for non-numeric /
    composite leading keys (SURVEY §7.4 risk 7). Produces N+1 disjoint
    predicates covering the full domain incl. NULLs."""
    preds: list[str] = []
    if not boundaries:
        return {"table": table, "predicates": [f"{pk} IS NOT NULL OR {pk} IS NULL"]}
    bs = [f"'{b}'" if isinstance(b, str) else str(b) for b in boundaries]
    preds.append(f"{pk} < {bs[0]} OR {pk} IS NULL")
    for a, b in zip(bs, bs[1:]):
        preds.append(f"{pk} >= {a} AND {pk} < {b}")
    preds.append(f"{pk} >= {bs[-1]}")
    return {"table": table, "predicates": preds}


def read_jdbc(spark, cfg: JdbcSourceConfig, plan: dict):
    """Execute a planned read (requires the MySQL JDBC driver jar)."""
    kwargs = dict(plan)
    table = kwargs.pop("table")
    return spark.read.jdbc(
        cfg.url, table, properties=cfg.properties(), **kwargs
    )
