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
) -> dict:
    """Build spark.read.jdbc kwargs for one table."""
    if pk is None or lo is None or hi is None:
        return {"table": table}  # single partition; fetchsize still streams
    n = row_count or 0
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
