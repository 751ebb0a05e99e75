"""information_schema replay fixtures for the LIVE catalog path.

Round 14 (VERDICT r13 ask #1): the A-plane scans in
``sources/catalog.py`` had never driven a full migration — every
builder was unit-tested, but no end-to-end run existed. This tool
FORWARD-serializes the fixture corpus (tools/make_mysqldump) into the
row shapes MySQL 8's information_schema documents for each plane —
tables / columns / statistics / key_column_usage / referential
constraints / partitions / check_constraints / views / routines /
parameters / triggers / events / table_privileges — so a fake DB-API
shim can serve them to ``sources.catalog.build_snapshot`` and the
LIVE path can plan+execute the whole corpus without a server.

The serializer is deliberately a SEPARATE inverse implementation from
the catalog reconstructors it feeds: it writes the documented raw
formats (``extra`` flag soup, ``DEFAULT_GENERATED`` marks, decomposed
partition rows with per-(partition, subpartition) ordinals, parameter
rows with the ordinal-0 RETURNS convention), and the capstone test
asserts the resulting LIVE plan is byte-identical to the DUMP plan —
a shared bug would have to hold across two independent derivations
plus the golden-pinned DDL to self-confirm.

Known divergences from a real server, each harmless to plan parity:
- ``views.view_definition`` keeps the dump's body text (a real server
  stores the expanded, fully-qualified form; both parse identically
  through dialect/ansi.py).
- ``table_rows`` is the seeded row count (a real server estimates).

Regenerate the recorded fixtures with::

    python tools/make_infoschema.py  # writes tests/golden/infoschema.json
"""

from __future__ import annotations

import json
import re

#: MySQL's default referential action — information_schema stores the
#: literal 'NO ACTION' where dump text simply omits the clause.
_DEFAULT_RULE = "NO ACTION"


def _split_params(raw: str) -> list[str]:
    """Top-level comma split of a routine parameter list."""
    out, depth, buf = [], 0, []
    for ch in raw:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        out.append(tail)
    return out


_ROUTINE_RE = re.compile(
    r"(?is)\bCREATE\b(?:\s+DEFINER\s*=\s*\S+)?\s*"
    r"(?:\*/\s*)?(?P<type>FUNCTION|PROCEDURE)\s+`?(?P<name>\w+)`?\s*\(",
)
_CHAR_RE = re.compile(
    r"(?is)\s*(DETERMINISTIC|NOT\s+DETERMINISTIC|READS\s+SQL\s+DATA|"
    r"NO\s+SQL|MODIFIES\s+SQL\s+DATA|CONTAINS\s+SQL|"
    r"SQL\s+SECURITY\s+\w+|COMMENT\s+'(?:[^']|'')*')\s*"
)


def _balanced_end(text: str, open_idx: int) -> int:
    depth = 0
    i = open_idx
    in_q = None
    while i < len(text):
        ch = text[i]
        if in_q:
            if ch == in_q:
                in_q = None
        elif ch in ("'", '"', "`"):
            in_q = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise ValueError("unbalanced parameter list")


def routine_rows(ddls: list[str]) -> tuple[list[dict], list[dict]]:
    """Raw MySQL CREATE FUNCTION/PROCEDURE statements → (routines rows,
    parameters rows) per MySQL 8's documented catalog layout:
    ``routine_definition`` is the BODY only, parameters decompose one
    row per argument with ordinal 1.., and a function's RETURNS type is
    the ordinal-0 parameters row."""
    routines: list[dict] = []
    params: list[dict] = []
    for ddl in ddls:
        mo = _ROUTINE_RE.search(ddl)
        if mo is None:
            raise ValueError(f"unparseable routine DDL: {ddl[:80]!r}")
        rtype = mo.group("type").upper()
        name = mo.group("name")
        open_idx = ddl.index("(", mo.end() - 1)
        close = _balanced_end(ddl, open_idx)
        raw_params = ddl[open_idx + 1 : close]
        rest = ddl[close + 1 :].strip()
        return_type = None
        if rtype == "FUNCTION":
            rm = re.match(r"(?is)^RETURNS\s+(.+?)(?=\s(?:DETERMINISTIC|"
                          r"NOT\s+DETERMINISTIC|READS|NO\s+SQL|MODIFIES|"
                          r"CONTAINS|SQL\s+SECURITY|COMMENT|BEGIN|RETURN)\b)",
                          rest)
            if rm is None:
                raise ValueError(f"no RETURNS on function {name}")
            return_type = rm.group(1).strip()
            rest = rest[rm.end() :].strip()
        deterministic = "NO"
        access = "CONTAINS SQL"
        while (cm := _CHAR_RE.match(rest)) and not re.match(
            r"(?is)^(BEGIN|RETURN)\b", rest
        ):
            word = re.sub(r"\s+", " ", cm.group(1).upper())
            if word == "DETERMINISTIC":
                deterministic = "YES"
            elif word in ("READS SQL DATA", "NO SQL",
                          "MODIFIES SQL DATA", "CONTAINS SQL"):
                access = word
            rest = rest[cm.end() :]
        body = rest.strip().rstrip(";").strip()
        if body.upper().startswith("BEGIN") and not body.rstrip().upper(
        ).endswith("END"):
            body += " END" if not body.rstrip().endswith("END") else ""
        routines.append({
            "routine_name": name,
            "routine_type": rtype,
            "routine_definition": body,
            "return_type": return_type,
            "is_deterministic": deterministic,
            "sql_data_access": access,
        })
        if rtype == "FUNCTION":
            params.append({
                "specific_name": name, "routine_type": rtype,
                "ordinal_position": 0, "parameter_mode": None,
                "parameter_name": None, "dtd_identifier": return_type,
            })
        for i, p in enumerate(_split_params(raw_params), start=1):
            pm = re.match(
                r"(?is)^(?:(IN|OUT|INOUT)\s+)?`?(\w+)`?\s+(.+)$", p
            )
            if pm is None:
                raise ValueError(f"unparseable parameter {p!r} on {name}")
            params.append({
                "specific_name": name, "routine_type": rtype,
                "ordinal_position": i,
                "parameter_mode": (pm.group(1) or "IN").upper(),
                "parameter_name": pm.group(2),
                "dtd_identifier": pm.group(3).strip(),
            })
    return routines, params


_TRIGGER_RE = re.compile(
    r"(?is)\bCREATE\b(?:\s*/\*!\d+\s+DEFINER\s*=\s*\S+\s*\*/)?"
    r"(?:\s+DEFINER\s*=\s*\S+)?\s*(?:/\*!\d+\s+)?TRIGGER\s+`?(?P<name>\w+)`?\s+"
    r"(?P<timing>BEFORE|AFTER)\s+(?P<event>INSERT|UPDATE|DELETE)\s+"
    r"ON\s+`?(?P<table>\w+)`?\s+FOR\s+EACH\s+ROW\s+"
    r"(?:(?P<ord>FOLLOWS|PRECEDES)\s+`?(?P<other>\w+)`?\s+)?"
    r"(?P<body>.*?)(?:\s*\*/)?\s*$"
)


def trigger_rows(ddls: list[str]) -> list[dict]:
    """Raw CREATE TRIGGER statements → information_schema.triggers rows
    with ABSOLUTE ``action_order`` per (table, event, timing) slot —
    MySQL stores the resolved order, not the FOLLOWS chain."""
    rows = []
    order: dict[tuple, int] = {}
    for ddl in ddls:
        mo = _TRIGGER_RE.search(ddl)
        if mo is None:
            raise ValueError(f"unparseable trigger DDL: {ddl[:80]!r}")
        slot = (mo.group("table"), mo.group("event").upper(),
                mo.group("timing").upper())
        order[slot] = order.get(slot, 0) + 1
        rows.append({
            "trigger_name": mo.group("name"),
            "action_timing": mo.group("timing").upper(),
            "event_manipulation": mo.group("event").upper(),
            "event_object_table": mo.group("table"),
            "action_statement": mo.group("body").strip().rstrip(";"),
            "action_order": order[slot],
        })
    return rows


def event_rows(ddls: list[str]) -> list[dict]:
    """Raw CREATE EVENT statements → information_schema.events rows:
    the catalog stores the schedule DECOMPOSED (ONE TIME rows carry
    execute_at, RECURRING rows interval_value/field + starts/ends as
    bare datetimes) and the DO body in event_definition."""
    from mysql2pg_spark.schema.events import parse_event

    rows = []
    for ddl in ddls:
        spec = parse_event(ddl)
        if spec is None:
            raise ValueError(f"unparseable event DDL: {ddl[:80]!r}")

        def _lit(ts):
            return ts.strip().strip("'") if ts else None

        if spec.schedule_kind == "at":
            row = {"event_type": "ONE TIME",
                   "execute_at": _lit(spec.at_ts),
                   "interval_value": None, "interval_field": None,
                   "starts": None, "ends": None}
        else:
            row = {"event_type": "RECURRING", "execute_at": None,
                   "interval_value": spec.interval_n,
                   "interval_field": spec.interval_unit.upper(),
                   "starts": _lit(spec.starts), "ends": _lit(spec.ends)}
        row.update({
            "event_name": spec.name,
            "event_definition": spec.body,
            "status": "ENABLED" if spec.enabled else "DISABLED",
            "event_comment": spec.comment or "",
        })
        rows.append(row)
    return rows


def partition_rows(table: str, partition_def: str) -> list[dict]:
    """One table's partition clause → decomposed
    information_schema.partitions rows (one per partition, or one per
    (partition, subpartition) when a sub-scheme exists)."""
    from mysql2pg_spark.schema.partitioning import (
        parse_partition_def,
        parse_subpartition_scheme,
    )

    pd = parse_partition_def(partition_def)
    if pd is None:
        raise ValueError(f"unparseable partition def on {table}")
    method = pd.method.upper()
    if pd.columns_form:
        method += " COLUMNS"
    if pd.linear:
        method = "LINEAR " + method
    sub = parse_subpartition_scheme(pd.subpartition) \
        if pd.subpartition else None
    sub_method = None
    sub_expr = None
    if sub is not None:
        sub_method = ("LINEAR " if sub.linear else "") + sub.method.upper()
        sub_expr = sub.expr
    rows: list[dict] = []
    parts = pd.parts
    if not parts and pd.num_partitions:
        # HASH/KEY … PARTITIONS n with no explicit list: MySQL names
        # the implicit partitions p0..p<n-1>
        from mysql2pg_spark.schema.partitioning import PartitionPart

        parts = [PartitionPart(name=f"p{i}")
                 for i in range(pd.num_partitions)]
    for i, p in enumerate(parts, start=1):
        if p.op == "less_than":
            desc = p.values
        elif p.op == "in":
            desc = p.values
        else:
            desc = None
        base = {
            "table_name": table,
            "partition_name": p.name,
            "partition_ordinal_position": i,
            "partition_method": method,
            "partition_expression": pd.expr,
            "partition_description": desc,
            "subpartition_method": sub_method,
            "subpartition_expression": sub_expr,
        }
        subnames = p.subparts
        if not subnames and sub is not None and sub.count:
            # implicit SUBPARTITIONS n: MySQL names them <part>sp<j>
            subnames = [f"{p.name}sp{j}" for j in range(sub.count)]
        if subnames:
            for j, sn in enumerate(subnames, start=1):
                rows.append(dict(
                    base,
                    subpartition_name=sn,
                    subpartition_ordinal_position=j,
                ))
        else:
            rows.append(dict(
                base,
                subpartition_name=None,
                subpartition_ordinal_position=None,
            ))
    return rows


def snapshot_to_infoschema(
    snap, seeded_counts: dict[str, int] | None = None
) -> dict[str, list[dict]]:
    """CatalogSnapshot (dump-parsed) → {plane: rows} in MySQL 8's
    documented information_schema shapes."""
    seeded_counts = seeded_counts or {}
    out: dict[str, list[dict]] = {
        "tables": [], "columns": [], "statistics": [],
        "key_column_usage_pk": [], "foreign_keys": [], "partitions": [],
        "check_constraints": [], "views": [], "routines": [],
        "parameters": [], "triggers": [], "events": [],
        "table_privileges": [],
    }
    for t in snap.tables:
        out["tables"].append({
            "table_name": t.name,
            "table_comment": t.comment or "",
            "table_rows": seeded_counts.get(t.name, t.row_count),
        })
        for i, c in enumerate(t.columns, start=1):
            extra_bits = []
            default = c.default
            if c.auto_increment:
                extra_bits.append("auto_increment")
            if c.generated_expr:
                extra_bits.append(
                    ("STORED" if c.generated_stored else "VIRTUAL")
                    + " GENERATED"
                )
            if default is not None:
                d = str(default)
                if d.startswith("EXPR:(") and d.endswith(")"):
                    # MySQL 8 expression default: raw expression +
                    # DEFAULT_GENERATED in extra
                    default = d[len("EXPR:("):-1]
                    extra_bits.append("DEFAULT_GENERATED")
                elif d.upper().startswith("CURRENT_TIMESTAMP"):
                    extra_bits.append("DEFAULT_GENERATED")
            out["columns"].append({
                "table_name": t.name,
                "column_name": c.name,
                "column_type": c.column_type,
                "is_nullable": "YES" if c.nullable else "NO",
                "column_default": default,
                "column_comment": c.comment or "",
                "extra": " ".join(extra_bits),
                "ordinal_position": i,
                "generation_expression": c.generated_expr or "",
            })
        for j, col in enumerate(t.primary_key, start=1):
            out["key_column_usage_pk"].append({
                "table_name": t.name, "column_name": col,
                "ordinal_position": j,
            })
            # statistics carries PRIMARY rows too (group_indexes skips)
            out["statistics"].append({
                "table_name": t.name, "index_name": "PRIMARY",
                "column_name": col, "seq_in_index": j,
                "non_unique": 0, "index_type": "BTREE",
                "expression": None,
            })
        for ix in t.indexes:
            for j, col in enumerate(ix.columns, start=1):
                out["statistics"].append({
                    "table_name": t.name, "index_name": ix.name,
                    "column_name": col, "seq_in_index": j,
                    "non_unique": 0 if ix.unique else 1,
                    "index_type": ix.kind.upper(),
                    "expression": None,
                })
            if not ix.columns and getattr(ix, "expression", None):
                # MySQL 8 functional index: one key part with
                # column_name NULL and the expression in EXPRESSION —
                # the documented statistics layout (round 15)
                out["statistics"].append({
                    "table_name": t.name, "index_name": ix.name,
                    "column_name": None, "seq_in_index": 1,
                    "non_unique": 0 if ix.unique else 1,
                    "index_type": ix.kind.upper(),
                    "expression": ix.expression,
                })
        for fk in t.foreign_keys:
            for j, (col, rcol) in enumerate(
                zip(fk.columns, fk.ref_columns), start=1
            ):
                out["foreign_keys"].append({
                    "table_name": t.name,
                    "constraint_name": fk.name,
                    "column_name": col,
                    "ordinal_position": j,
                    "referenced_table_name": fk.ref_table,
                    "referenced_column_name": rcol,
                    "delete_rule": fk.on_delete or _DEFAULT_RULE,
                    "update_rule": fk.on_update or _DEFAULT_RULE,
                })
        if t.partition_def:
            out["partitions"].extend(
                partition_rows(t.name, t.partition_def)
            )
        for name, expr, enforced in t.checks:
            # a nameless CHECK is a source-DDL artifact of the fixture
            # corpus (a real server auto-names `<table>_chk_<n>`, and a
            # real mysqldump carries that name) — replay it as-is so
            # plan parity stays byte-exact
            out["check_constraints"].append({
                "table_name": t.name,
                "constraint_name": name,
                "check_clause": expr,
                "enforced": "YES" if enforced else "NO",
            })
    for vname, body in snap.views.items():
        out["views"].append({
            "view_name": vname, "view_definition": body,
        })
    out["routines"], out["parameters"] = routine_rows(snap.functions)
    out["triggers"] = trigger_rows(snap.triggers)
    out["events"] = event_rows(snap.events)
    for grantee, table, priv in snap.table_privileges:
        out["table_privileges"].append({
            "grantee": grantee, "table_name": table,
            "privilege_type": priv,
        })
    return out


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import tempfile

    from mysql2pg_spark.session import get_spark
    from mysql2pg_spark.sources.dumpfile import full_snapshot_from_dump
    from tools.make_mysqldump import render_corpus_dump

    spark = get_spark(app_name="make-infoschema")
    spark.sparkContext.setLogLevel("ERROR")
    dump = render_corpus_dump(
        os.path.join(tempfile.mkdtemp(), "corpus_dump.sql")
    )
    snap = full_snapshot_from_dump(spark, dump)
    rows = snapshot_to_infoschema(snap)
    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "golden", "infoschema.json",
    )
    with open(dest, "w", encoding="utf-8") as fh:
        json.dump(rows, fh, indent=1, sort_keys=True, default=str)
        fh.write("\n")
    print(dest, {k: len(v) for k, v in rows.items()})
