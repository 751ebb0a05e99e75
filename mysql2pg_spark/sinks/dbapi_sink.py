"""Generic DB-API batched-INSERT sink (B3/B4/B6 executed for real).

The production write paths are executor-side — COPY protocol
(``sinks.copy_sink``) and ``df.write.jdbc`` (``sinks.jdbc_sink``).
This module drives the SAME batching semantics through any DB-API
connection with ``executemany``:

- B4: rows per statement-batch bounded by the 65535 bind-parameter
  budget divided by column count (reference maxRowsPerBatch,
  postgres/connection.go:268) — ``effective_batchsize`` is shared
  with the JDBC planner so the two paths can never drift;
- B6: one COMMIT per batch (per-batch transaction,
  postgres/connection.go:571-593);
- B3: ``executemany`` degrades to per-row execute inside the DB-API
  driver when the engine lacks multi-row binding — the reference's
  own legacy ``InsertData`` shape.

Two transports:

- ``via="executors"``: ``foreachPartition``, a fresh connection per
  partition — the client-server shape (PostgreSQL): rows never pass
  through the driver, partitions write concurrently.
- ``via="driver"``: ``toLocalIterator`` — for embedded single-process
  engines (DuckDB), whose database file cannot be co-written by
  Spark's separate Python worker processes. Rows stream through the
  driver one partition at a time (bounded memory), so this transport
  is for integration testing and small embedded targets, NOT the
  100 TB path — the cluster path is COPY/JDBC above.

``toLocalIterator``/``foreachPartition`` are both actions, so a
``df.observe()`` checksum attached upstream (orchestrator D3)
materializes during the write exactly as it does on the JDBC path.
"""

from __future__ import annotations

from typing import Callable, Iterator

from pyspark.sql import DataFrame

from mysql2pg_spark.sinks.jdbc_sink import effective_batchsize

_PLACEHOLDER = {"qmark": "?", "format": "%s"}


def insert_sql(table: str, columns: list[str], paramstyle: str = "format") -> str:
    """One parameterized multi-column INSERT (quoted identifiers)."""
    ph = _PLACEHOLDER[paramstyle]
    col_list = ", ".join(f'"{c}"' for c in columns)
    return (
        f'INSERT INTO "{table}" ({col_list}) '
        f"VALUES ({', '.join([ph] * len(columns))})"
    )


def insert_batches(
    rows: Iterator,
    table: str,
    columns: list[str],
    conn_factory: Callable[[], object],
    paramstyle: str = "format",
    batch_rows: int = 10_000,
) -> int:
    """Pump an iterator of row-tuples through executemany in B4-sized
    batches, committing each batch (B6). Returns rows written."""
    bs = effective_batchsize(batch_rows, len(columns))
    sql = insert_sql(table, columns, paramstyle)
    conn = conn_factory()
    written = 0
    try:
        cur = conn.cursor()
        buf: list[tuple] = []
        for row in rows:
            buf.append(tuple(row))
            if len(buf) >= bs:
                cur.executemany(sql, buf)
                conn.commit()
                written += len(buf)
                buf = []
        if buf:
            cur.executemany(sql, buf)
            conn.commit()
            written += len(buf)
    finally:
        close = getattr(conn, "close", None)
        if close:
            close()
    return written


def write_dbapi(
    df: DataFrame,
    table: str,
    conn_factory: Callable[[], object],
    paramstyle: str = "format",
    batch_rows: int = 10_000,
    via: str = "executors",
) -> None:
    columns = list(df.columns)
    if via == "executors":

        def run(part: Iterator) -> None:
            insert_batches(
                part, table, columns, conn_factory, paramstyle, batch_rows
            )

        df.foreachPartition(run)
    elif via == "driver":
        # collect(), not toLocalIterator() (round 12): the driver mode
        # exists for EMBEDDED in-process engines (DuckDB/SQLite in
        # tests and the corpus bench), where the rows funnel through
        # the driver either way — and toLocalIterator never completes
        # a df.observe() Observation (its partition-at-a-time jobs
        # don't fire the listener), so every table paid the full
        # get_observation timeout (~10 s/table of pure wait in the
        # corpus data stage) and validation fell back to a second
        # source scan. collect() is one action: the checksum
        # observation riding the sink write materializes instantly.
        # The 100 TB path is via="executors" (foreachPartition).
        insert_batches(
            iter(df.collect()),
            table,
            columns,
            conn_factory,
            paramstyle,
            batch_rows,
        )
    else:
        raise ValueError(f"via must be 'executors' or 'driver', got {via!r}")


def make_dbapi_writer(
    conn_factory: Callable[[], object],
    paramstyle: str = "format",
    batch_rows: int = 10_000,
    via: str = "executors",
):
    """``sink_writer(df, table)`` seam for ``orchestrator.execute()``."""

    def sink_writer(df: DataFrame, table: str) -> None:
        write_dbapi(df, table, conn_factory, paramstyle, batch_rows, via)

    sink_writer.sink_kind = "dbapi"
    return sink_writer
