"""Migration pipeline orchestrator (SURVEY §2.D, manager.go:88-268).

Stage order matches the reference: table DDL → views → data → indexes →
functions → users → table grants → validation. `plan()` is a pure
function from (config, catalog snapshot) to an ordered action list — the
driver-side "logical plan" of the migration. `execute()` runs it: DDL
actions over a DB-API connection, data actions as partitioned
spark.read.jdbc → write.jdbc jobs fanned out on a thread pool of
`limits.concurrency` (the Spark replacement for the reference's
goroutine+semaphore scheme; within-table parallelism belongs to Spark's
scheduler, the pool only overlaps per-table JDBC latencies).

Everything that needs a live server is isolated inside execute();
plan() is fully testable offline — including idempotency (B10
skip-existing), include/exclude lists (A2/A3), lowercase normalization,
truncate mode (B2), and keyset-partitioned extract planning (A13/A14).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from mysql2pg_spark.config import EngineConfig
from mysql2pg_spark.dialect.transpile import transpile_mysql
from mysql2pg_spark.schema.identifiers import normalize_identifier, quote_pg
from mysql2pg_spark.schema.schema_map import struct_field_for
from mysql2pg_spark.sinks.ddl import (
    IndexSpec,
    comment_ddl,
    create_index_ddl,
    create_table_ddl,
    grant_ddl,
    truncate_ddl,
)
from mysql2pg_spark.sources.jdbc import plan_partitioned_read


@dataclass
class ColumnMeta:
    """One information_schema.columns row (A5)."""

    name: str
    column_type: str
    nullable: bool = True
    default: str | None = None
    comment: str | None = None
    auto_increment: bool = False


@dataclass
class TableMeta:
    name: str
    columns: list[ColumnMeta]
    comment: str | None = None
    primary_key: list[str] = field(default_factory=list)
    indexes: list[IndexSpec] = field(default_factory=list)
    row_count: int = 0
    pk_bounds: tuple | None = None  # (lo, hi) for the leading numeric PK


@dataclass
class CatalogSnapshot:
    """Output of the sources.catalog readers, assembled."""

    tables: list[TableMeta] = field(default_factory=list)
    views: dict[str, str] = field(default_factory=dict)       # name → MySQL SQL
    users: dict[str, list[str]] = field(default_factory=dict)  # user → grants
    table_privileges: list[tuple[str, str, str]] = field(default_factory=list)
    # (user, table, "Select,Insert")


@dataclass
class Action:
    stage: str       # tableddl | view | data | indexes | functions | users |
                     # table_privileges | validate
    kind: str        # ddl | read_plan | write_plan | spark_sql | check
    target: str
    payload: object


STAGE_ORDER = (
    "tableddl",
    "view",
    "data",
    "indexes",
    "functions",
    "users",
    "table_privileges",
    "validate",
)


class MigrationPipeline:
    def __init__(self, cfg: EngineConfig, snapshot: CatalogSnapshot,
                 existing_pg_tables: set[str] | None = None):
        self.cfg = cfg
        self.snapshot = snapshot
        self.existing = existing_pg_tables or set()

    # ---- helpers ---------------------------------------------------------

    def _selected_tables(self) -> list[TableMeta]:
        """A2/A3 include/exclude filtering."""
        inc = self.cfg.include_tables
        exc = self.cfg.exclude_tables or []
        out = []
        for t in self.snapshot.tables:
            if inc is not None and t.name not in inc:
                continue
            if t.name in exc:
                continue
            out.append(t)
        return out

    def _norm(self, name: str) -> str:
        return normalize_identifier(name, self.cfg.options.lowercase_columns)

    def _schema_of(self, t: TableMeta):
        from pyspark.sql.types import StructType

        return StructType(
            [
                struct_field_for(
                    self._norm(c.name),
                    c.column_type,
                    c.nullable,
                    c.default,
                    c.comment,
                    c.auto_increment,
                )
                for c in t.columns
            ]
        )

    # ---- the plan --------------------------------------------------------

    def plan(self) -> list[Action]:
        o = self.cfg.options
        actions: list[Action] = []
        tables = self._selected_tables()

        if o.tableddl:
            for t in tables:
                name = self._norm(t.name)
                if o.skip_existing_tables and name in self.existing:
                    continue
                schema = self._schema_of(t)
                actions.append(
                    Action(
                        "tableddl",
                        "ddl",
                        name,
                        create_table_ddl(
                            name,
                            schema,
                            [self._norm(c) for c in t.primary_key] or None,
                        ),
                    )
                )
                for c_ddl in comment_ddl(name, schema, t.comment):
                    actions.append(Action("tableddl", "ddl", name, c_ddl))

        if o.view:
            for vname, vsql in self.snapshot.views.items():
                name = self._norm(vname)
                body = transpile_mysql(vsql)
                actions.append(
                    Action(
                        "view",
                        "ddl",
                        name,
                        f"DROP VIEW IF EXISTS {quote_pg(name)} CASCADE; "
                        f"CREATE OR REPLACE VIEW {quote_pg(name)} AS {body}",
                    )
                )

        if o.data:
            for t in tables:
                name = self._norm(t.name)
                if o.truncate_before_sync:
                    actions.append(Action("data", "ddl", name, truncate_ddl(name)))
                pk = t.primary_key[0] if len(t.primary_key) == 1 else None
                lo, hi = t.pk_bounds or (None, None)
                actions.append(
                    Action(
                        "data",
                        "read_plan",
                        name,
                        plan_partitioned_read(
                            t.name, pk, lo, hi, t.row_count,
                            rows_per_partition=max(
                                self.cfg.limits.max_rows_per_batch, 1
                            ) * 100,
                        ),
                    )
                )

        if o.indexes:
            for t in tables:
                name = self._norm(t.name)
                for idx in t.indexes:
                    actions.append(
                        Action(
                            "indexes", "ddl", name, create_index_ddl(name, idx)
                        )
                    )

        if o.users:
            for user, grants in self.snapshot.users.items():
                for g in grants:
                    actions.append(Action("users", "ddl", user, g))

        if o.table_privileges:
            for user, table, privs in self.snapshot.table_privileges:
                for g in grant_ddl(self._norm(table), user, privs):
                    actions.append(Action("table_privileges", "ddl", user, g))

        if o.validate_data and o.data:
            for t in tables:
                name = self._norm(t.name)
                actions.append(
                    Action("validate", "check", name,
                           {"type": "count+checksum", "table": name})
                )

        order = {s: i for i, s in enumerate(STAGE_ORDER)}
        actions.sort(key=lambda a: order[a.stage])
        return actions

    # ---- execution -------------------------------------------------------

    def execute(self, spark, pg_conn=None) -> dict:
        """Run the plan against live MySQL/PostgreSQL: DDL via pg_conn
        (DB-API), data via Spark JDBC with a ThreadPoolExecutor of
        limits.concurrency. Not runnable in this container (no servers,
        no driver jars); use execute_local for the same control flow over
        file sources/sinks."""
        raise NotImplementedError(
            "execution requires live MySQL/PostgreSQL + JDBC driver jars; "
            "use plan() for the dry-run action list or execute_local() "
            "for a file-backed run"
        )

    def execute_local(self, spark, source_loader, sink_dir: str) -> dict:
        """Container-runnable execution of the SAME plan control flow with
        file-backed endpoints (the integration-test analog of the
        reference harness's full-run case):

        - ddl actions are collected (emitted SQL, no PG to execute on);
        - data read_plans load via ``source_loader(table_name)`` and write
          parquet under ``sink_dir`` — table fan-out on a thread pool of
          ``limits.concurrency`` exactly like the JDBC path would
          (overlapping per-table latencies; Spark schedules within-table
          parallelism);
        - validate actions re-read the sink and compare count + checksum
          against the source.

        Returns {"ddl": [...], "synced": {table: rows}, "validation":
        {table: {...}}}.
        """
        import os
        from concurrent.futures import ThreadPoolExecutor

        from mysql2pg_spark.operators.validate import checksum_validation

        actions = self.plan()
        ddl = [a.payload for a in actions if a.kind == "ddl"]
        reads = [a for a in actions if a.kind == "read_plan"]
        checks = [a for a in actions if a.kind == "check"]

        synced: dict[str, int] = {}

        def sync_one(action: Action) -> tuple[str, int]:
            src_table = action.payload["table"]
            df = source_loader(src_table)
            dest = os.path.join(sink_dir, action.target)
            df.write.mode("overwrite").parquet(dest)
            return action.target, spark.read.parquet(dest).count()

        with ThreadPoolExecutor(self.cfg.limits.concurrency) as pool:
            for name, n in pool.map(sync_one, reads):
                synced[name] = n

        validation: dict[str, dict] = {}
        by_target = {a.payload["table"]: a.target for a in reads}
        for chk in checks:
            src_name = next(
                (s for s, t in by_target.items() if t == chk.target), None
            )
            if src_name is None:
                continue
            src = source_loader(src_name)
            dst = spark.read.parquet(os.path.join(sink_dir, chk.target))
            # checksum string/int columns only (cross-source float text
            # rendering is the caller's concern; see operators/validate)
            cols = [
                f.name
                for f in src.schema.fields
                if f.dataType.simpleString() in ("bigint", "int", "string")
            ]
            validation[chk.target] = checksum_validation(src, dst, cols)
        return {"ddl": ddl, "synced": synced, "validation": validation}
