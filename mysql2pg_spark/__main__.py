"""CLI entry point — the `mysql2pg -c config.yml` analog (SURVEY §3.1,
cmd/mysql2pg/main.go behavior: load config → assemble catalog → run the
staged pipeline).

Three modes, least- to most-connected:

  plan       print the ordered action list (DDL text + read plans) as
             JSON lines — the dry run; needs only a snapshot.
  local      execute the same plan control flow over file endpoints
             (parquet source dir → parquet sink dir + validation) —
             the container/CI mode, no servers.
  live       execute against MySQL/PostgreSQL via JDBC + a DB-API
             connection (requires driver jars and a psycopg-style
             module; everything is injected through execute()'s seams).
  dump       offline migration from a mysqldump file: schema AND data
             both come from the dump (full_snapshot_from_dump +
             dump_source_reader), written to a parquet sink dir with
             validation — no servers at all.
  duckdb     the full live execute() path — real DDL execution, real
             batched DB-API inserts, real read-back validation —
             against an embedded DuckDB file. Source is a parquet dir
             (--source-dir, with --snapshot) or a mysqldump file
             (--dump-file, snapshot parsed from its DDL). The offline
             analog of a live PG migration, usable end-to-end today.
  pgddl      schema-only: print the complete PostgreSQL DDL script
             (tables, indexes, comments, views, plpgsql functions,
             roles, grants) for a snapshot or dump — pipe to psql.
  tabexport  the EXPORT mirror: write a mysqldump --tab-style directory
             (per-table MySQL-dialect .sql + escaped .txt data via the
             JVM OUTFILE encoder, plus a restore.sql of LOAD DATA
             statements) from a dump file or a parquet dir + snapshot.
  pgexport   the offline PostgreSQL artifact (round 13): schema_pre.sql
             + per-table COPY-text data directories (JVM encoder,
             partition-parallel) + schema_post.sql + a psql load.sql —
             convert a mysqldump with NO live PostgreSQL, then load the
             artifact later with plain psql.

The catalog snapshot comes from a YAML file (``--snapshot``): offline
parity with what sources/catalog.py reads from information_schema, so
planning is fully testable without a MySQL. In live mode
``sources.catalog.build_snapshot`` assembles it from the A1-A11
information_schema scans through spark.read.jdbc (round 13; one
set-based query per plane).
"""

from __future__ import annotations

import argparse
import json
import sys

import yaml

from mysql2pg_spark.config import load_config
from mysql2pg_spark.orchestrator import (
    CatalogSnapshot,
    ColumnMeta,
    MigrationPipeline,
    TableMeta,
)
from mysql2pg_spark.sinks.ddl import FkSpec, IndexSpec


def load_snapshot(path: str) -> CatalogSnapshot:
    """YAML → CatalogSnapshot (the offline stand-in for the A1-A11
    information_schema scans)."""
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    tables = []
    for t in raw.get("tables", []):
        tables.append(
            TableMeta(
                name=t["name"],
                columns=[
                    ColumnMeta(
                        name=c["name"],
                        column_type=c["type"],
                        nullable=c.get("nullable", True),
                        default=c.get("default"),
                        comment=c.get("comment"),
                        auto_increment=c.get("auto_increment", False),
                        generated_expr=c.get("generated_expr"),
                        generated_stored=c.get("generated_stored", False),
                    )
                    for c in t.get("columns", [])
                ],
                comment=t.get("comment"),
                primary_key=t.get("primary_key", []),
                indexes=[
                    IndexSpec(
                        i["name"],
                        i["columns"],
                        i.get("unique", False),
                        kind=i.get("kind", "btree"),
                    )
                    for i in t.get("indexes", [])
                ],
                foreign_keys=[
                    FkSpec(
                        name=f.get("name"),
                        columns=f["columns"],
                        ref_table=f["ref_table"],
                        ref_columns=f["ref_columns"],
                        on_delete=f.get("on_delete"),
                        on_update=f.get("on_update"),
                    )
                    for f in t.get("foreign_keys", [])
                ],
                row_count=t.get("row_count", 0),
                pk_bounds=tuple(t["pk_bounds"]) if t.get("pk_bounds") else None,
                partition_clause=t.get("partition_clause"),
                # full definition text (round 13): lets YAML snapshots
                # carry the per-partition list the C92 planner needs —
                # partition_clause alone only names the skip
                partition_def=t.get("partition_def"),
                checks=[
                    (c.get("name"), c["expr"], c.get("enforced", True))
                    for c in t.get("checks", [])
                ],
            )
        )
    return CatalogSnapshot(
        tables=tables,
        views=raw.get("views", {}),
        users=raw.get("users", {}),
        table_privileges=[
            tuple(p) for p in raw.get("table_privileges", [])
        ],
        # raw MySQL CREATE FUNCTION DDL strings — plan() converts them
        # through sinks.plpgsql_builder.build_spec_from_mysql (C95)
        functions=raw.get("functions", []),
        # raw MySQL CREATE TRIGGER DDL strings (round 8) — plan()
        # converts them via sinks.plpgsql_builder.build_trigger_from_mysql
        triggers=raw.get("triggers", []),
    )


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="mysql2pg_spark")
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument(
        "--mode",
        choices=("plan", "local", "live", "dump", "duckdb", "diff",
                 "pgddl", "tabexport", "pgexport"),
        default="plan",
    )
    ap.add_argument("--snapshot", help="catalog snapshot YAML (plan/local)")
    ap.add_argument(
        "--old-snapshot",
        help="previously-migrated snapshot YAML (diff mode)",
    )
    ap.add_argument(
        "--allow-drop",
        action="store_true",
        help="diff mode: emit destructive DROPs instead of comments",
    )
    ap.add_argument("--source-dir", help="parquet source dir (local mode)")
    ap.add_argument("--sink-dir", help="parquet sink dir (local/dump mode)")
    ap.add_argument("--dump-file", help="mysqldump .sql file (dump mode)")
    ap.add_argument(
        "--tab-dir",
        help="mysqldump --tab directory: per-table <t>.sql schema + "
        "<t>.txt escaped-TSV data (dump/duckdb modes)",
    )
    ap.add_argument("--duckdb-file", help="target database (duckdb mode)")
    ap.add_argument(
        "--tab-out",
        help="tabexport mode: output directory for the --tab-style "
        "export (per-table .sql + .txt, plus restore.sql)",
    )
    ap.add_argument(
        "--pg-out",
        help="pgexport mode: output directory for the offline "
        "PostgreSQL artifact (schema_pre.sql + per-table COPY-text "
        "data dirs + schema_post.sql + psql load.sql)",
    )
    ap.add_argument(
        "--check",
        action="store_true",
        help="pgddl mode: run the golden-file structural lint over the "
        "generated script (exit 1 on problems) — a CI gate that needs "
        "no pytest",
    )
    args = ap.parse_args(argv)

    cfg = load_config(args.config)

    if args.mode == "dump":
        if not ((args.dump_file or args.tab_dir) and args.sink_dir):
            print("dump mode needs --dump-file or --tab-dir, and "
                  "--sink-dir", file=sys.stderr)
            return 2
        from mysql2pg_spark.session import get_spark
        from mysql2pg_spark.sources.dumpfile import (
            dump_read_schemas,
            full_snapshot_from_dump,
        )

        spark = get_spark(app_name="mysql2pg_spark-cli")
        if args.tab_dir:
            from mysql2pg_spark.sources.tabdump import (
                snapshot_from_tab_dir,
                tab_source_reader,
            )

            snap = snapshot_from_tab_dir(spark, args.tab_dir)
            schemas = dump_read_schemas(snap)
            _tab = tab_source_reader(args.tab_dir, schemas)
            source_loader = lambda t: _tab(spark, {"table": t})  # noqa: E731
        else:
            from mysql2pg_spark.sources.loaddata import (
                load_data_source_reader,
            )

            snap = full_snapshot_from_dump(spark, args.dump_file)
            schemas = dump_read_schemas(snap)
            # reads LOAD DATA INFILE statements' files AND classic
            # INSERT bulk; pure-INSERT dumps pay nothing extra
            _ld = load_data_source_reader(args.dump_file, schemas)
            source_loader = lambda t: _ld(spark, {"table": t})  # noqa: E731
        pipe = MigrationPipeline(cfg, snap)
        result = pipe.execute_local(
            spark,
            source_loader=source_loader,
            sink_dir=args.sink_dir,
        )
        print(json.dumps({
            "tables": [t.name for t in snap.tables],
            "synced": result["synced"],
            "validation": {
                k: v.get("consistent") for k, v in result["validation"].items()
            },
            "n_ddl": len(result["ddl"]),
        }))
        return 0

    if args.mode == "duckdb":
        if not args.duckdb_file or not (
            args.source_dir or args.dump_file or args.tab_dir
        ):
            print(
                "duckdb mode needs --duckdb-file plus --source-dir "
                "(with --snapshot), --dump-file or --tab-dir",
                file=sys.stderr,
            )
            return 2
        import duckdb

        from mysql2pg_spark.session import get_spark
        from mysql2pg_spark.sinks.dbapi_sink import make_dbapi_writer
        from mysql2pg_spark.tables import load_table

        spark = get_spark(app_name="mysql2pg_spark-cli")
        if args.tab_dir:
            from mysql2pg_spark.sources.dumpfile import dump_read_schemas
            from mysql2pg_spark.sources.tabdump import (
                snapshot_from_tab_dir,
                tab_source_reader,
            )

            snap = snapshot_from_tab_dir(spark, args.tab_dir)
            source_reader = tab_source_reader(
                args.tab_dir, dump_read_schemas(snap)
            )
        elif args.dump_file:
            from mysql2pg_spark.sources.dumpfile import (
                dump_read_schemas,
                full_snapshot_from_dump,
            )
            from mysql2pg_spark.sources.loaddata import (
                load_data_source_reader,
            )

            snap = full_snapshot_from_dump(spark, args.dump_file)
            schemas = dump_read_schemas(snap)
            source_reader = load_data_source_reader(args.dump_file, schemas)
        else:
            if not args.snapshot:
                print("--source-dir needs --snapshot", file=sys.stderr)
                return 2
            snap = load_snapshot(args.snapshot)
            source_reader = lambda sp, plan: load_table(  # noqa: E731
                sp, args.source_dir, plan["table"]
            )

        con = duckdb.connect(args.duckdb_file)
        result = MigrationPipeline(cfg, snap).execute(
            spark,
            con,
            source_reader=source_reader,
            sink_writer=make_dbapi_writer(
                con.cursor, paramstyle="qmark", via="driver"
            ),
            dest_reader=lambda sp, table: sp.createDataFrame(
                con.cursor()
                .execute(f'SELECT * FROM "{table}"')
                .fetch_arrow_table()
            ),
            target_dialect="duckdb",
        )
        print(json.dumps({
            "synced": result["synced"],
            "validation": {
                k: v.get("consistent") for k, v in result["validation"].items()
            },
            "ddl": result["ddl"],
        }))
        return 0

    if args.mode == "tabexport":
        if not args.tab_out or not (
            args.dump_file or (args.source_dir and args.snapshot)
        ):
            print(
                "tabexport mode needs --tab-out plus --dump-file or "
                "--source-dir with --snapshot",
                file=sys.stderr,
            )
            return 2
        from mysql2pg_spark.session import get_spark
        from mysql2pg_spark.sinks.tabexport import export_tab_dir

        spark = get_spark(app_name="mysql2pg_spark-cli")
        if args.dump_file:
            from mysql2pg_spark.sources.dumpfile import (
                dump_read_schemas,
                full_snapshot_from_dump,
            )
            from mysql2pg_spark.sources.loaddata import (
                load_data_source_reader,
            )

            snap = full_snapshot_from_dump(spark, args.dump_file)
            _rdr = load_data_source_reader(
                args.dump_file, dump_read_schemas(snap)
            )
            loader = lambda t: _rdr(spark, {"table": t})  # noqa: E731
        else:
            from mysql2pg_spark.tables import load_table

            snap = load_snapshot(args.snapshot)
            loader = lambda t: load_table(  # noqa: E731
                spark, args.source_dir, t
            )
        result = export_tab_dir(spark, snap, args.tab_out, loader)
        print(json.dumps(result))
        return 0

    if args.mode == "pgexport":
        # offline PostgreSQL artifact (round 13): schema_pre.sql +
        # per-table COPY-text data directories + schema_post.sql +
        # a psql load.sql — "convert my mysqldump without a live
        # PostgreSQL", which the reference cannot do at all
        if not args.pg_out or not (
            args.dump_file or (args.source_dir and args.snapshot)
        ):
            print(
                "pgexport mode needs --pg-out plus --dump-file or "
                "--source-dir with --snapshot",
                file=sys.stderr,
            )
            return 2
        from mysql2pg_spark.session import get_spark
        from mysql2pg_spark.sinks.copyexport import export_pg_dir

        spark = get_spark(app_name="mysql2pg_spark-cli")
        if args.dump_file:
            from mysql2pg_spark.sources.dumpfile import (
                dump_read_schemas,
                full_snapshot_from_dump,
                read_dump_inserts,
            )

            snap = full_snapshot_from_dump(spark, args.dump_file)
            # dump_read_schemas keys by VERBATIM table name (review
            # r13c: a .lower() here KeyError'd on mixed-case tables)
            schemas = dump_read_schemas(snap)
            loader = lambda t: read_dump_inserts(  # noqa: E731
                spark, args.dump_file, t, schemas[t]
            )
        else:
            from mysql2pg_spark.tables import load_table

            snap = load_snapshot(args.snapshot)
            loader = lambda t: load_table(  # noqa: E731
                spark, args.source_dir, t
            )
        # the artifact carries ALL schema stages (same contract as
        # pgddl mode — a partial artifact is not reviewable)
        cfg.options.view = True
        cfg.options.functions = True
        cfg.options.triggers = True
        cfg.options.users = True
        cfg.options.table_privileges = True
        cfg.options.validate_data = False
        result = export_pg_dir(
            MigrationPipeline(cfg, snap), args.pg_out, loader
        )
        print(json.dumps(result))
        return 0

    if args.mode == "diff":
        # incremental catch-up: the plan that takes a target migrated at
        # --old-snapshot to the source's current --snapshot
        if not (args.old_snapshot and args.snapshot):
            print("diff mode needs --old-snapshot and --snapshot",
                  file=sys.stderr)
            return 2
        from mysql2pg_spark.schema.diff import diff_snapshots

        for stmt in diff_snapshots(
            load_snapshot(args.old_snapshot),
            load_snapshot(args.snapshot),
            allow_drop=args.allow_drop,
        ):
            print(stmt + ("" if stmt.startswith("--") else ";"))
        return 0

    if args.mode == "pgddl":
        # schema-only migration script: every executable statement the
        # plan would run, as plain PostgreSQL SQL (pipe to psql). Skips
        # are preserved as comment lines so the script stays reviewable.
        if not (args.snapshot or args.dump_file):
            print("pgddl mode needs --snapshot or --dump-file",
                  file=sys.stderr)
            return 2
        if args.dump_file:
            from mysql2pg_spark.session import get_spark
            from mysql2pg_spark.sources.dumpfile import full_snapshot_from_dump

            snap = full_snapshot_from_dump(
                get_spark(app_name="mysql2pg_spark-cli"), args.dump_file
            )
        else:
            snap = load_snapshot(args.snapshot)
        # a schema script means ALL schema stages, regardless of the
        # config's sync toggles (data/validation are not DDL anyway)
        cfg.options.view = True
        cfg.options.functions = True
        cfg.options.triggers = True
        cfg.options.users = True
        cfg.options.table_privileges = True
        cfg.options.data = False
        cfg.options.validate_data = False
        from mysql2pg_spark.sinks.ddl import render_script

        script = render_script(MigrationPipeline(cfg, snap).plan())
        print(script)
        if args.check:
            # same checks the golden-corpus pytest runs — head
            # whitelist, balance, MySQL-ism scan — as a plain CLI gate
            from mysql2pg_spark.schema.ddl_lint import lint_ddl

            problems = lint_ddl(script)
            for p in problems:
                print(f"LINT: {p}", file=sys.stderr)
            if problems:
                return 1
            print(f"-- lint: OK ({script.count(chr(10)) + 1} lines)",
                  file=sys.stderr)
        return 0

    if not args.snapshot:
        print("--snapshot is required (live catalog scan needs a server)",
              file=sys.stderr)
        return 2
    pipe = MigrationPipeline(cfg, load_snapshot(args.snapshot))

    if args.mode == "plan":
        for a in pipe.plan():
            print(
                json.dumps(
                    {
                        "stage": a.stage,
                        "kind": a.kind,
                        "target": a.target,
                        "payload": a.payload
                        if isinstance(a.payload, (str, dict))
                        else str(a.payload),
                    }
                )
            )
        return 0

    from mysql2pg_spark.session import get_spark
    from mysql2pg_spark.tables import load_table

    spark = get_spark(app_name="mysql2pg_spark-cli")
    if args.mode == "local":
        if not (args.source_dir and args.sink_dir):
            print("local mode needs --source-dir and --sink-dir",
                  file=sys.stderr)
            return 2
        result = pipe.execute_local(
            spark,
            source_loader=lambda t: load_table(spark, args.source_dir, t),
            sink_dir=args.sink_dir,
        )
        print(json.dumps({
            "synced": result["synced"],
            "validation": {
                k: v.get("consistent") for k, v in result["validation"].items()
            },
            "n_ddl": len(result["ddl"]),
        }))
        return 0

    # live: DB-API connection for the PG side; import lazily so the
    # container (which has no driver) never pays for it.
    import importlib

    psycopg = importlib.import_module("psycopg2")  # or psycopg
    conn = psycopg.connect(
        host=cfg.postgresql.host,
        port=cfg.postgresql.port,
        user=cfg.postgresql.username,
        password=cfg.postgresql.password,
        dbname=cfg.postgresql.database,
    )
    result = pipe.execute(spark, conn)
    print(json.dumps({"synced": result["synced"], "log": result["log"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
