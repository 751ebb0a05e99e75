"""MySQL catalog readers (SURVEY A1-A11) as information_schema queries.

The reference issues SHOW statements per table with goroutine fan-out
(metadata.go:133-235); here each catalog plane is ONE set-based
information_schema query pushed through spark.read.jdbc — the driver
never loops over tables. Each builder returns (subquery_sql, parser) so
the fetch is testable without a live server.
"""

from __future__ import annotations

from dataclasses import dataclass

from mysql2pg_spark.sinks.ddl import IndexSpec


def tables_query(
    database: str,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
) -> str:
    """A1-A3: base tables with include/exclude lists pushed into the scan
    (the reference filters client-side, metadata.go:89-122)."""
    preds = [
        f"table_schema = '{database}'",
        "table_type = 'BASE TABLE'",
    ]
    if include:
        quoted = ", ".join(f"'{t}'" for t in include)
        preds.append(f"table_name IN ({quoted})")
    if exclude:
        quoted = ", ".join(f"'{t}'" for t in exclude)
        preds.append(f"table_name NOT IN ({quoted})")
    where = " AND ".join(preds)
    # table_rows is InnoDB's ESTIMATE — good enough for read-partition
    # planning (the exact count rides D3 validation); round 13, for
    # the live snapshot assembler
    return (
        "(SELECT table_name, table_comment, table_rows "
        "FROM information_schema.tables "
        f"WHERE {where}) t"
    )


def columns_query(database: str) -> str:
    """A5: all columns of all tables in one scan (SHOW FULL COLUMNS
    equivalent, metadata.go:259-292). ``generation_expression``
    (round 13, MySQL 5.7+) rides along so live-scanned generated
    columns carry their expression exactly like dump-parsed ones —
    previously the live plane lost it."""
    return (
        "(SELECT table_name, column_name, column_type, is_nullable, "
        "column_default, column_comment, extra, ordinal_position, "
        "generation_expression "
        "FROM information_schema.columns "
        f"WHERE table_schema = '{database}' ORDER BY table_name, "
        "ordinal_position) c"
    )


def group_columns(rows: list[dict]) -> dict[str, list]:
    """Column-scan rows → per-table ``ColumnMeta`` lists with the SAME
    provenance conventions as the dump parser (round 13):

    - ``extra`` carries ``auto_increment``, ``VIRTUAL|STORED
      GENERATED`` (expression in ``generation_expression``), and
      MySQL 8's ``DEFAULT_GENERATED`` for expression defaults;
    - expression defaults mark as ``EXPR:(<expr>)`` — except the
      ``CURRENT_TIMESTAMP[(n)]`` family, which ``default_sql`` passes
      through directly on both paths;
    - plain defaults arrive UNQUOTED from the catalog (matching the
      producers-deliver-unquoted contract); a NULL catalog default is
      no default."""
    from mysql2pg_spark.orchestrator import ColumnMeta

    out: dict[str, list] = {}
    for r in sorted(
        rows, key=lambda r: (r["table_name"], r["ordinal_position"])
    ):
        extra = str(r.get("extra") or "")
        eu = extra.upper()
        gen = "GENERATED" in eu and "DEFAULT_GENERATED" not in eu
        dflt = r.get("column_default")
        if dflt is not None:
            d = str(dflt)
            if "DEFAULT_GENERATED" in eu and not d.upper().startswith(
                "CURRENT_TIMESTAMP"
            ):
                dflt = f"EXPR:({d})"
            elif d.upper() == "NULL":
                dflt = None
        out.setdefault(r["table_name"], []).append(ColumnMeta(
            name=r["column_name"],
            column_type=r["column_type"],
            nullable=str(r.get("is_nullable") or "YES").upper() == "YES",
            default=dflt,
            comment=r.get("column_comment") or None,
            auto_increment="AUTO_INCREMENT" in eu,
            generated_expr=(
                r.get("generation_expression") or None if gen else None
            ),
            generated_stored=gen and "STORED" in eu,
        ))
    return out


def indexes_query(database: str) -> str:
    """A6: index columns ordered by seq_in_index (metadata.go:295-344).
    ``index_type`` (BTREE/FULLTEXT/SPATIAL/HASH) rides along so the
    emitter can map non-btree classes to GIN/GiST (round 11) instead of
    flattening everything to btree; ``expression`` (MySQL 8) rides so a
    functional index — column_name NULL — reconstructs with its key
    expression and gets a documented skip instead of a crash or a
    silent drop (round 15)."""
    return (
        "(SELECT table_name, index_name, column_name, seq_in_index, "
        "non_unique, index_type, expression "
        "FROM information_schema.statistics "
        f"WHERE table_schema = '{database}' "
        "ORDER BY table_name, index_name, seq_in_index) i"
    )


def indexes_query_legacy(database: str) -> str:
    """A6 without the EXPRESSION column — MySQL < 8.0.13 (which cannot
    have functional indexes); build_snapshot falls back here when the
    primary query errors on the unknown column."""
    return (
        "(SELECT table_name, index_name, column_name, seq_in_index, "
        "non_unique, index_type FROM information_schema.statistics "
        f"WHERE table_schema = '{database}' "
        "ORDER BY table_name, index_name, seq_in_index) i"
    )


def primary_keys_query(database: str) -> str:
    """A7: ordered PK columns (SHOW KEYS WHERE Key_name='PRIMARY')."""
    return (
        "(SELECT table_name, column_name, ordinal_position "
        "FROM information_schema.key_column_usage "
        f"WHERE table_schema = '{database}' AND constraint_name = 'PRIMARY' "
        "ORDER BY table_name, ordinal_position) k"
    )


def foreign_keys_query(database: str) -> str:
    """A6b (round 8, beyond-reference — the reference skips FOREIGN KEY
    lines wholesale, sync_tableddl.go:738): one set-based scan of the
    FK graph with referential actions, ordered for the grouper."""
    return (
        "(SELECT k.table_name, k.constraint_name, k.column_name, "
        "k.ordinal_position, k.referenced_table_name, "
        "k.referenced_column_name, r.delete_rule, r.update_rule "
        "FROM information_schema.key_column_usage k "
        "JOIN information_schema.referential_constraints r "
        "ON r.constraint_schema = k.constraint_schema "
        "AND r.constraint_name = k.constraint_name "
        "AND r.table_name = k.table_name "
        f"WHERE k.table_schema = '{database}' "
        "AND k.referenced_table_name IS NOT NULL "
        "ORDER BY k.table_name, k.constraint_name, k.ordinal_position) fk"
    )


def views_query(database: str) -> str:
    """A8: view name + definition (metadata.go:347-374)."""
    return (
        "(SELECT table_name AS view_name, view_definition "
        "FROM information_schema.views "
        f"WHERE table_schema = '{database}') v"
    )


def routines_query(database: str) -> str:
    """A9: stored routines (information_schema.routines replaces the
    SHOW CREATE FUNCTION + paren-matching parser, metadata.go:377-531).
    Round 13: BOTH functions and procedures (the reference scans
    ROUTINE_TYPE='FUNCTION' only, silently dropping every procedure),
    with ``dtd_identifier`` for the FULL return type text
    (``varchar(20)``, not just ``varchar``) and ``is_deterministic``
    for the volatility marker. ``routine_definition`` is the BODY
    only — :func:`render_routine_ddl` joins the parameter scan back
    into the canonical CREATE text the C95 builder parses."""
    return (
        "(SELECT routine_name, routine_type, routine_definition, "
        "dtd_identifier AS return_type, is_deterministic, "
        "sql_data_access "
        "FROM information_schema.routines "
        f"WHERE routine_schema = '{database}' "
        "AND routine_type IN ('FUNCTION', 'PROCEDURE')) r"
    )


def parameters_query(database: str) -> str:
    """A9b (round 13): routine parameter signatures —
    ``routine_definition`` alone is untranslatable (no parameter list,
    no return type); ``information_schema.parameters`` carries them
    decomposed, ordinal 0 being a function's RETURNS row."""
    return (
        "(SELECT specific_name, routine_type, ordinal_position, "
        "parameter_mode, parameter_name, dtd_identifier "
        "FROM information_schema.parameters "
        f"WHERE specific_schema = '{database}' "
        "ORDER BY specific_name, ordinal_position) pr"
    )


def render_routine_ddl(row: dict, param_rows: list[dict]) -> str | None:
    """One ``information_schema.routines`` row + its parameter rows →
    the canonical ``CREATE FUNCTION/PROCEDURE`` text the dump path
    sees (pure), so ``sinks/plpgsql_builder.build_spec_from_mysql``
    translates both paths identically. None when the catalog withheld
    the body (``routine_definition`` is NULL without SELECT privilege
    on mysql.proc / SHOW_ROUTINE — the caller surfaces a named
    skip)."""
    body = row.get("routine_definition")
    if not body or not str(body).strip():
        return None
    name = row["routine_name"]
    rtype = (row.get("routine_type") or "FUNCTION").upper()
    ps = sorted(
        (
            p for p in param_rows
            if p.get("specific_name") == name
            and (p.get("ordinal_position") or 0) > 0
            # MySQL keeps functions and procedures in SEPARATE
            # namespaces — a same-named pair must not merge parameter
            # lists (rows missing the key match any type, for callers
            # with pre-r13b row shapes)
            and str(p.get("routine_type") or rtype).upper() == rtype
        ),
        key=lambda p: p["ordinal_position"],
    )
    args = []
    for p in ps:
        arg = f"`{p['parameter_name']}` {p['dtd_identifier']}"
        if rtype == "PROCEDURE":
            arg = f"{(p.get('parameter_mode') or 'IN').upper()} {arg}"
        args.append(arg)
    head = f"CREATE {rtype} `{name}`({', '.join(args)})"
    if rtype == "FUNCTION":
        head += f" RETURNS {row.get('return_type')}"
    if str(row.get("is_deterministic") or "").upper() == "YES":
        head += " DETERMINISTIC"
    # READS SQL DATA / NO SQL drive the volatility marker exactly like
    # dump-carried characteristics text (CONTAINS SQL is MySQL's
    # default — volatile on both paths)
    access = str(row.get("sql_data_access") or "").upper().strip()
    if access in ("READS SQL DATA", "NO SQL", "MODIFIES SQL DATA"):
        head += f" {access}"
    return f"{head} {body}"


def events_query(database: str) -> str:
    """A9+ (round 12): scheduler events — the reference never scans
    ``information_schema.events`` at all, silently losing every
    scheduled job. Rows feed :func:`render_event_ddl`, which
    reconstructs the canonical CREATE EVENT text the dump path sees,
    so ``schema/events.py`` translates both paths identically."""
    return (
        "(SELECT event_name, event_definition, event_type, execute_at, "
        "interval_value, interval_field, starts, ends, status, "
        "event_comment FROM information_schema.events "
        f"WHERE event_schema = '{database}') e"
    )


def render_event_ddl(row: dict) -> str:
    """One canonical ``CREATE EVENT`` statement from an
    ``information_schema.events`` row (pure; tested without a server).
    MySQL's catalog stores the schedule decomposed — ONE TIME rows
    carry ``execute_at``, RECURRING rows ``interval_value/field`` +
    optional ``starts``/``ends`` — and the DO body in
    ``event_definition``; ``status`` 'ENABLED' / 'DISABLED' /
    'SLAVESIDE_DISABLED' maps to ENABLE / DISABLE."""
    if (row.get("event_type") or "").upper() == "ONE TIME":
        sched = f"AT '{row['execute_at']}'"
    else:
        sched = f"EVERY {row['interval_value']} {row['interval_field']}"
        if row.get("starts"):
            sched += f" STARTS '{row['starts']}'"
        if row.get("ends"):
            sched += f" ENDS '{row['ends']}'"
    status = (
        "ENABLE"
        if (row.get("status") or "").upper() == "ENABLED"
        else "DISABLE"
    )
    cmt = ""
    if row.get("event_comment"):
        c = str(row["event_comment"]).replace("'", "''")
        cmt = f" COMMENT '{c}'"
    return (
        f"CREATE EVENT `{row['event_name']}` ON SCHEDULE {sched} "
        f"{status}{cmt} DO {row['event_definition']}"
    )


def partitions_query(database: str) -> str:
    """A4+ (round 13): partition schemes — one set-based scan of
    ``information_schema.partitions``. The dump path parses the
    ``/*!50100 PARTITION BY …*/`` clause; without this scan a
    LIVE-server migration silently lost partitioning the dump path
    preserves. Rows feed :func:`group_partition_defs`, which
    reconstructs the canonical clause text the dump parser sees, so
    ``schema/partitioning.py`` translates both paths identically (the
    reference strips partitioning on every path,
    sync_tableddl.go:268-302)."""
    return (
        "(SELECT table_name, partition_name, subpartition_name, "
        "partition_ordinal_position, subpartition_ordinal_position, "
        "partition_method, subpartition_method, partition_expression, "
        "subpartition_expression, partition_description "
        "FROM information_schema.partitions "
        f"WHERE table_schema = '{database}' "
        "AND partition_name IS NOT NULL "
        "ORDER BY table_name, partition_ordinal_position, "
        "subpartition_ordinal_position) pt"
    )


def render_partition_def(rows: list[dict]) -> str | None:
    """One table's ``information_schema.partitions`` rows → the
    canonical ``PARTITION BY …`` clause text (pure; tested without a
    server). MySQL stores the scheme decomposed — method + expression
    on every row, per-partition bound text in
    ``partition_description`` (``LESS THAN`` value or ``IN`` list;
    NULL for HASH/KEY), sub-schemes in ``subpartition_method`` /
    ``subpartition_expression`` with one row per (partition,
    subpartition). The reconstruction keeps source partition AND
    subpartition names, so the PG child/grandchild tables are named
    exactly as the dump path would name them."""
    rows = [r for r in rows if r.get("partition_name")]
    if not rows:
        return None
    method = (rows[0].get("partition_method") or "").upper().strip()
    if not method:
        return None
    expr = (rows[0].get("partition_expression") or "").strip()
    head = f"PARTITION BY {method} ({expr})"
    sub_method = (rows[0].get("subpartition_method") or "").upper().strip()
    # group rows per partition in ordinal order, collecting the
    # (table-globally unique) subpartition names
    parts: list[dict] = []
    by_name: dict[str, dict] = {}
    for r in sorted(
        rows,
        key=lambda r: (
            r.get("partition_ordinal_position") or 0,
            r.get("subpartition_ordinal_position") or 0,
        ),
    ):
        p = by_name.get(r["partition_name"])
        if p is None:
            p = {
                "name": r["partition_name"],
                "desc": r.get("partition_description"),
                "subnames": [],
            }
            by_name[r["partition_name"]] = p
            parts.append(p)
        if r.get("subpartition_name"):
            p["subnames"].append(r["subpartition_name"])
    auto_sub = False
    if sub_method:
        sub_expr = (rows[0].get("subpartition_expression") or "").strip()
        counts = {len(p["subnames"]) for p in parts}
        k = counts.pop() if len(counts) == 1 else 0
        head += f" SUBPARTITION BY {sub_method} ({sub_expr})"
        if k:
            head += f" SUBPARTITIONS {k}"
            # implicit `SUBPARTITIONS k` declarations surface in the
            # catalog under MySQL's auto-generated names
            # `<partition>sp<n>` (round 14) — reconstruct the
            # dump-canonical implicit form instead of a named list, so
            # live and dump paths name the PG grandchildren identically
            auto_sub = all(
                p["subnames"] == [f"{p['name']}sp{j}" for j in range(k)]
                for p in parts
            )
    entries = []
    for p in parts:
        e = f"PARTITION {p['name']}"
        desc = (p["desc"] or "").strip()
        if method.startswith("RANGE"):
            if desc.upper() == "MAXVALUE":
                e += " VALUES LESS THAN MAXVALUE"
            else:
                e += f" VALUES LESS THAN ({desc})"
        elif method.startswith("LIST"):
            e += f" VALUES IN ({desc})"
        if sub_method and p["subnames"] and not auto_sub:
            e += " (" + ", ".join(
                f"SUBPARTITION {n}" for n in p["subnames"]
            ) + ")"
        entries.append(e)
    return head + " (" + ", ".join(entries) + ")"


def group_partition_defs(rows: list[dict]) -> dict[str, str]:
    """Partition-scan rows → per-table canonical clause text (tables
    whose rows don't reconstruct — no method — are absent, leaving the
    table unpartitioned exactly like a dump with no clause)."""
    by_table: dict[str, list[dict]] = {}
    for r in rows:
        by_table.setdefault(r["table_name"], []).append(r)
    out: dict[str, str] = {}
    for t, trs in by_table.items():
        text = render_partition_def(trs)
        if text:
            out[t] = text
    return out


def check_constraints_query(database: str) -> str:
    """A5+ (round 13): CHECK constraints — the dump path parses inline
    CHECK clauses (corpus case 27) but a live scan never read
    ``information_schema.check_constraints``, silently losing the
    domain rules on live-server migrations. One set-based join with
    ``table_constraints`` carries the table name and MySQL's ENFORCED
    flag (NOT ENFORCED checks surface as named skips downstream — PG's
    NOT VALID still enforces new rows)."""
    return (
        "(SELECT tc.table_name, cc.constraint_name, cc.check_clause, "
        "tc.enforced "
        "FROM information_schema.table_constraints tc "
        "JOIN information_schema.check_constraints cc "
        "ON cc.constraint_schema = tc.constraint_schema "
        "AND cc.constraint_name = tc.constraint_name "
        f"WHERE tc.table_schema = '{database}' "
        "AND tc.constraint_type = 'CHECK' "
        "ORDER BY tc.table_name, cc.constraint_name) ck"
    )


def group_check_constraints(rows: list[dict]) -> dict[str, list[tuple]]:
    """Check-scan rows → per-table ``(name, expr, enforced)`` tuples —
    the exact shape ``TableMeta.checks`` carries from the dump parser.
    MySQL stores the clause parenthesized (``(`age` > 18)``); the
    outer parens stay (the checks stage rewrites the expression as-is,
    and PG accepts the parenthesized form)."""
    out: dict[str, list[tuple]] = {}
    for r in rows:
        out.setdefault(r["table_name"], []).append((
            r["constraint_name"],
            r["check_clause"],
            str(r.get("enforced") or "YES").upper() != "NO",
        ))
    return out


def triggers_query(database: str) -> str:
    """A9++ (round 13): triggers — mysqldump carries them by default
    (the dump path translates them since round 8), but a live scan
    never read ``information_schema.triggers``. ``action_order``
    rides along so same-event triggers emit in MySQL's firing order."""
    return (
        "(SELECT trigger_name, action_timing, event_manipulation, "
        "event_object_table, action_statement, action_order "
        "FROM information_schema.triggers "
        f"WHERE trigger_schema = '{database}' "
        "ORDER BY event_object_table, event_manipulation, "
        "action_timing, action_order) tg"
    )


def render_trigger_ddl(row: dict, follows: str | None = None) -> str:
    """One ``information_schema.triggers`` row → the canonical
    ``CREATE TRIGGER`` text the dump path sees (pure; the catalog
    stores the definition decomposed: timing + event + table on their
    own columns, the FOR EACH ROW body in ``action_statement``), so
    ``sinks/plpgsql_builder.build_trigger_from_mysql`` translates both
    paths identically. ``follows`` names the previous trigger of the
    same (table, event, timing) — the catalog stores the ABSOLUTE
    ``action_order``, which re-expresses as a FOLLOWS chain so the
    emitter's tNN_ rename machinery reproduces MySQL's firing sequence
    (review r13b: without the clause PostgreSQL fires same-event
    triggers alphabetically, silently reordering side effects)."""
    head = (
        f"CREATE TRIGGER `{row['trigger_name']}` "
        f"{row['action_timing']} {row['event_manipulation']} "
        f"ON `{row['event_object_table']}` FOR EACH ROW "
    )
    if follows:
        head += f"FOLLOWS `{follows}` "
    return head + str(row["action_statement"])


def table_privileges_query(database: str) -> str:
    """A11: per-table grants (mysql.tables_priv, metadata.go:601-625)."""
    return (
        "(SELECT grantee, table_name, privilege_type "
        "FROM information_schema.table_privileges "
        f"WHERE table_schema = '{database}') p"
    )


# ---- row-group parsers (pure; tested without a server) -------------------


def group_indexes(rows: list[dict]) -> dict[str, list[IndexSpec]]:
    """(table, index, column, seq, non_unique) rows → per-table IndexSpec
    list with columns in seq order; PRIMARY skipped (emitted as PK DDL).

    MySQL 8 functional-index key parts report column_name NULL with the
    key expression in EXPRESSION (round 15): an index containing ANY
    such part reconstructs as an IndexSpec with empty columns and the
    FULL ordered part list in ``expression`` — plain column parts
    rendered backticked, expression parts as-is — the same
    dump-canonical shape the dump parser produces, so the shared
    planner translates a pure or MIXED key part-by-part (or surfaces
    the documented skip). Cherry-picking only the plain parts would
    silently reorder/over-constrain the index (review r15), and a NULL
    must never be appended as a column (it would render as ``"None"``
    in CREATE INDEX)."""
    grouped: dict[tuple[str, str], list[dict]] = {}
    order: list[tuple[str, str]] = []
    for r in sorted(
        rows, key=lambda r: (r["table_name"], r["index_name"], r["seq_in_index"])
    ):
        if r["index_name"] == "PRIMARY":
            continue
        key = (r["table_name"], r["index_name"])
        if key not in grouped:
            grouped[key] = []
            order.append(key)
        grouped[key].append(r)
    out: dict[str, list[IndexSpec]] = {}
    for table, iname in order:
        parts = grouped[(table, iname)]
        head = parts[0]
        itype = str(head.get("index_type") or "BTREE").lower()
        has_expr = any(p["column_name"] is None for p in parts)
        if has_expr:
            # ADVICE r15: a corrupt server row with NULL column_name AND
            # NULL expression previously rendered as '' — split_top_level
            # later drops empty parts, silently removing a key part from
            # the reconstructed index. Refuse loudly instead.
            for p in parts:
                if p["column_name"] is None and not (
                    p.get("expression") or ""
                ).strip():
                    raise ValueError(
                        f"index {table}.{iname}: key part with NULL "
                        "column_name and NULL/empty expression — "
                        "information_schema.statistics row is corrupt"
                    )
            rendered = ", ".join(
                f"`{p['column_name']}`"
                if p["column_name"] is not None
                else str(p.get("expression") or "")
                for p in parts
            )
            spec = IndexSpec(
                iname,
                [],
                not head["non_unique"],
                kind=itype if itype in ("fulltext", "spatial") else "btree",
                expression=rendered,
            )
        else:
            spec = IndexSpec(
                iname,
                [p["column_name"] for p in parts],
                not head["non_unique"],
                # HASH (MEMORY engine) has no PG hash-worthy semantics
                # worth preserving — btree covers it; FULLTEXT/SPATIAL
                # map to GIN/GiST in create_index_ddl (round 11)
                kind=itype if itype in ("fulltext", "spatial") else "btree",
            )
        out.setdefault(table, []).append(spec)
    return out


def group_primary_keys(rows: list[dict]) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for r in sorted(
        rows, key=lambda r: (r["table_name"], r["ordinal_position"])
    ):
        out.setdefault(r["table_name"], []).append(r["column_name"])
    return out


def group_foreign_keys(rows: list[dict]) -> dict:
    """FK scan rows → per-table FkSpec list (composite keys accumulate
    columns in ordinal order; MySQL's RESTRICT reports as the rule
    text, passed through verbatim — PG spells every MySQL action)."""
    from mysql2pg_spark.sinks.ddl import FkSpec

    out: dict[str, list[FkSpec]] = {}
    current: dict[tuple[str, str], FkSpec] = {}
    for r in sorted(
        rows,
        key=lambda r: (
            r["table_name"], r["constraint_name"], r["ordinal_position"]
        ),
    ):
        key = (r["table_name"], r["constraint_name"])
        if key not in current:
            # MySQL's catalog stores the literal 'NO ACTION' where the
            # declared DDL omitted the clause (its default action) —
            # normalize to None so live FKs emit the same DDL text as
            # dump-parsed ones (round 14; semantically identical in PG)
            def _rule(v):
                v = (v or "").strip().upper()
                return None if v in ("", "NO ACTION") else v

            spec = FkSpec(
                name=r["constraint_name"],
                columns=[],
                ref_table=r["referenced_table_name"],
                ref_columns=[],
                on_delete=_rule(r.get("delete_rule")),
                on_update=_rule(r.get("update_rule")),
            )
            current[key] = spec
            out.setdefault(r["table_name"], []).append(spec)
        current[key].columns.append(r["column_name"])
        current[key].ref_columns.append(r["referenced_column_name"])
    return out


def build_snapshot(
    database: str,
    run_query,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
):
    """Assemble the full ``CatalogSnapshot`` from the A1-A11 scans
    (round 13 — previously the module shipped the per-plane builders
    but no assembler, so "live mode" existed only as a docstring).

    ``run_query(subquery_sql) -> list[dict]`` is the injected fetch
    seam: in live mode ``lambda q: [r.asDict() for r in
    spark.read.jdbc(url, q, properties=...).collect()]`` — ONE
    set-based information_schema query per catalog plane, never a
    per-table loop (the reference fans out SHOW statements per table,
    metadata.go:133-235); in tests, canned row lists. Every plane
    reconstructs the DUMP-CANONICAL text/shape and feeds the shared
    parsers, so live and dump migrations plan identically: columns
    with EXPR:/GENERATED provenance, partition clauses with source
    partition names, CHECK tuples with ENFORCED, full routine
    signatures (privilege-withheld bodies become named inventory
    entries the plan surfaces as skips), trigger and event DDL.

    ``users`` stays empty here — grants come from the config-driven
    user plane, not information_schema."""
    from mysql2pg_spark.orchestrator import CatalogSnapshot, TableMeta

    tables_rows = run_query(tables_query(database, include, exclude))
    cols = group_columns(run_query(columns_query(database)))
    try:
        idx_rows = run_query(indexes_query(database))
    except Exception:
        # statistics.EXPRESSION exists only on MySQL >= 8.0.13 (review
        # r15: the unconditional column reference broke the whole A6
        # index scan on 5.7/early-8.0 servers). Older servers cannot
        # have functional indexes, so the legacy query loses nothing —
        # group_indexes reads the key via .get().
        idx_rows = run_query(indexes_query_legacy(database))
    idx = group_indexes(idx_rows)
    pks = group_primary_keys(run_query(primary_keys_query(database)))
    fks = group_foreign_keys(run_query(foreign_keys_query(database)))
    parts = group_partition_defs(run_query(partitions_query(database)))
    checks = group_check_constraints(
        run_query(check_constraints_query(database))
    )
    tables = []
    for tr in tables_rows:
        name = tr["table_name"]
        pdef = parts.get(name)
        tables.append(TableMeta(
            name=name,
            columns=cols.get(name, []),
            comment=tr.get("table_comment") or None,
            primary_key=pks.get(name, []),
            indexes=idx.get(name, []),
            foreign_keys=fks.get(name, []),
            row_count=int(tr.get("table_rows") or 0),
            partition_clause=(
                pdef.removeprefix("PARTITION BY ").split(" (", 1)[0]
                + " (…)" if pdef else None
            ),
            partition_def=pdef,
            checks=checks.get(name, []),
        ))
    # a NULL view_definition means the catalog WITHHELD the body
    # (missing SHOW VIEW privilege) — carried as None so plan()
    # surfaces a named skip instead of silently lacking the view
    views = {
        r["view_name"]: r.get("view_definition") or None
        for r in run_query(views_query(database))
    }
    param_rows = run_query(parameters_query(database))
    functions = []
    for r in run_query(routines_query(database)):
        ddl = render_routine_ddl(r, param_rows)
        if ddl is not None:
            functions.append(ddl)
        else:
            # body withheld (no SHOW_ROUTINE privilege): a skip marker
            # plan() surfaces verbatim (review r13b: a synthesized
            # pseudo-DDL here PARSED as a broken procedure body)
            functions.append(
                f"-- SKIP {r.get('routine_type', 'FUNCTION')} "
                f"{r['routine_name']}: routine_definition withheld by "
                "the source catalog (missing SHOW_ROUTINE privilege) — "
                "not migrated"
            )
    triggers = []
    prev_by_slot: dict[tuple, str] = {}
    for r in run_query(triggers_query(database)):
        slot = (
            r["event_object_table"], r["event_manipulation"],
            r["action_timing"],
        )
        triggers.append(render_trigger_ddl(r, prev_by_slot.get(slot)))
        prev_by_slot[slot] = r["trigger_name"]
    events = [
        render_event_ddl(r) for r in run_query(events_query(database))
    ]
    privs = [
        (r["grantee"], r["table_name"], r["privilege_type"])
        for r in run_query(table_privileges_query(database))
    ]
    return CatalogSnapshot(
        tables=tables,
        views=views,
        functions=functions,
        triggers=triggers,
        events=events,
        table_privileges=privs,
    )
