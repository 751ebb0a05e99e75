"""PG-side stored-function DDL emission (SURVEY C95, sink half).

The reference converts MySQL function DDL to plpgsql with a 10-step
regex pipeline plus per-function hardcoded patches
(internal/converter/postgres/sync_functions.go:173-213, 430-465) — the
patches are the tell that text surgery doesn't generalize. Here the
plpgsql is *generated from a declarative spec* — the same spec idea that
drives the engine-side evaluation in ``functions/stored.py`` — so every
emitted function is syntactically valid by construction:

- parameters and locals carry PG types directly (the MySQL→PG type
  mapping is schema_map's job, done once at spec build time);
- the body is ONE set-based ``SELECT … INTO`` in PG dialect plus a
  ``RETURN``; MySQL-only spellings are re-expressed semantically, not
  regexed (e.g. ``COALESCE(int_col, 'N/A')`` is well-typed in MySQL but
  a type error in PG → the spec writes ``int_col::text``; MySQL renders
  tinyint(1) as 1/0 where PG boolean prints true/false → ``::int``);
- ``READS SQL DATA`` maps to PG ``STABLE`` (reference
  parseCharacteristics :339-408 does the same mapping).

The three fixture functions model scripts/mysql/create_function.sql.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class PlpgsqlFunctionSpec:
    name: str
    params: list[tuple[str, str]]            # (name, pg_type)
    returns: str
    body_select: str                         # SELECT in PG dialect
    into_var: str = "result"
    declares: list[tuple[str, str]] = field(default_factory=list)
    volatility: str = "STABLE"               # READS SQL DATA analog
    comment: str | None = None
    pre_statements: list[str] = field(default_factory=list)  # `v := expr`
    #: Control-flow bodies (cursors / loops / handlers) carry a parsed
    #: statement tree instead of the declarative SELECT shape; see
    #: sinks.plpgsql_proc (C95 procedural half).
    procedural: object | None = None         # plpgsql_proc.ProceduralBody
    #: "function" | "procedure" (round 8). MySQL procedures emit as
    #: PostgreSQL 11+ CREATE PROCEDURE (CALL-able, IN/OUT/INOUT params,
    #: no RETURNS, no volatility marker — PG rejects one on procedures).
    #: The reference migrates FUNCTIONS only (sync_functions.go scans
    #: information_schema.ROUTINES WHERE ROUTINE_TYPE='FUNCTION');
    #: procedures are at least as common in real MySQL apps, so this is
    #: a deliberate beyond-reference widening.
    kind: str = "function"
    #: parameter modes aligned with ``params`` (procedures only);
    #: None means all-IN
    param_modes: list[str] | None = None


def emit_plpgsql(spec: PlpgsqlFunctionSpec) -> str:
    """One CREATE OR REPLACE FUNCTION/PROCEDURE statement (name lowered,
    like the reference's generateDDL :1286-1320)."""
    if spec.param_modes:
        params = ", ".join(
            (f"{m} " if m != "IN" else "") + f"{n} {t}"
            for m, (n, t) in zip(spec.param_modes, spec.params)
        )
    else:
        params = ", ".join(f"{n} {t}" for n, t in spec.params)
    if spec.procedural is not None:
        from mysql2pg_spark.sinks.plpgsql_proc import emit_statements

        declare_block = "".join(
            f"    {n} {t};\n" for n, t in spec.procedural.declares
        )
        # EXIT handlers (FOR SQLEXCEPTION → WHEN others; for a specific
        # SQLSTATE → WHEN SQLSTATE 'xxxxx') → the block's EXCEPTION
        # clauses, specific-first: plpgsql's native semantics (abort the
        # rest of the block, run the first matching clause) match
        # MySQL's EXIT handler + most-specific-wins precedence exactly
        exc = ""
        for k, (cond, action) in enumerate(
            getattr(spec.procedural, "exc_clauses", []) or []
        ):
            kw = "EXCEPTION WHEN" if k == 0 else "WHEN"
            exc += f"{kw} {cond} THEN\n" + emit_statements(action) + "\n"
        if spec.kind == "procedure":
            # PG procedures take no RETURNS and REJECT volatility markers
            head = (
                f"CREATE OR REPLACE PROCEDURE "
                f"{spec.name.lower()}({params})\n"
                f"AS $$\n"
            )
        else:
            head = (
                f"CREATE OR REPLACE FUNCTION {spec.name.lower()}({params})\n"
                f"RETURNS {spec.returns}\n"
                f"{spec.volatility} AS $$\n"
            )
        lines = (
            head
            + f"DECLARE\n{declare_block}"
            f"BEGIN\n"
            + emit_statements(spec.procedural.statements)
            + "\n"
            + exc
            + "END;\n$$ LANGUAGE plpgsql;"
        )
        if spec.comment:
            escaped = spec.comment.replace("'", "''")
            obj = "PROCEDURE" if spec.kind == "procedure" else "FUNCTION"
            lines += (
                f"\nCOMMENT ON {obj} {spec.name.lower()} IS '{escaped}';"
            )
        return lines
    declares = list(spec.declares)
    if spec.into_var and spec.into_var not in {n for n, _ in declares}:
        declares.insert(0, (spec.into_var, spec.returns))
    declare_block = "".join(f"    {n} {t};\n" for n, t in declares)
    pre = "".join(
        f"    {st.strip().rstrip(';')};\n" for st in spec.pre_statements
    )
    body = spec.body_select.strip().rstrip(";")
    lines = (
        f"CREATE OR REPLACE FUNCTION {spec.name.lower()}({params})\n"
        f"RETURNS {spec.returns}\n"
        f"{spec.volatility} AS $$\n"
        f"DECLARE\n{declare_block}"
        f"BEGIN\n{pre}"
        f"    {body}\n"
        f"    INTO {spec.into_var};\n"
        f"    RETURN {spec.into_var};\n"
        f"END;\n"
        f"$$ LANGUAGE plpgsql;"
    )
    if spec.comment:
        escaped = spec.comment.replace("'", "''")
        lines += (
            f"\nCOMMENT ON FUNCTION {spec.name.lower()} IS '{escaped}';"
        )
    return lines


# ---- fixture functions (scripts/mysql/create_function.sql) ----------------
# Semantic notes vs the MySQL originals:
#   * is_active tinyint(1) prints 1/0 in MySQL → ::int keeps the text;
#   * COALESCE(num, 'N/A') needs ::text in PG (MySQL coerces silently);
#   * the original INNER JOINs repeat `ON i.col_int = b.status` for every
#     table (a fixture quirk) — preserved faithfully.

GET_JOINED_DATA = PlpgsqlFunctionSpec(
    name="get_joined_data",
    params=[("p_id", "INTEGER")],
    returns="VARCHAR(255)",
    body_select="""SELECT concat('Int: ', i.col_int,
                  ', Bool: ', b.is_active::int,
                  ', Float: ', f.col_float,
                  ', Char: ', c.col_var_mb3,
                  ', Charset: ', cs.c1)
    FROM case_01_integers i
    JOIN case_02_boolean b ON i.col_int = b.status
    JOIN case_03_floats f ON i.col_int = b.status
    JOIN case_04_mb3_suffix c ON i.col_int = b.status
    JOIN case_05_charsets cs ON i.col_int = b.status
    WHERE i.col_int = p_id""",
)

GET_COMBINED_DATA = PlpgsqlFunctionSpec(
    name="get_combined_data",
    params=[("p_status", "INTEGER")],
    returns="VARCHAR(255)",
    body_select="""SELECT concat('Status: ', p_status,
                  ', Integer Data: ', COALESCE(i.col_int::text, 'N/A'),
                  ', Boolean Data: ', COALESCE(b.is_active::int::text, 'N/A'),
                  ', Float Data: ', COALESCE(f.col_float::text, 'N/A'))
    FROM case_01_integers i
    LEFT JOIN case_02_boolean b ON i.col_int = b.status
    RIGHT JOIN case_03_floats f ON b.status = f.col_float
    WHERE b.status = p_status
    ORDER BY i.col_int ASC
    LIMIT 1""",
)

GET_DETAILED_DATA = PlpgsqlFunctionSpec(
    name="get_detailed_data",
    params=[("p_id", "INTEGER")],
    returns="VARCHAR(255)",
    body_select="""SELECT concat('ID: ', p_id,
                  ', Integer Value: ', i.col_int,
                  ', Boolean Status: ', b.is_active::int,
                  ', Float Value: ', f.col_float,
                  ', String Value: ', c.col_var_mb3,
                  ', Charset Value: ', cs.c1)
    FROM case_01_integers i
    JOIN case_02_boolean b ON i.col_int = b.status AND b.is_active = true
    JOIN case_03_floats f ON b.status = p_id AND f.col_float > 0
    JOIN case_04_mb3_suffix c ON b.status = p_id
    JOIN case_05_charsets cs ON b.status = p_id
    WHERE i.col_int = p_id
    LIMIT 1""",
)

FIXTURE_FUNCTIONS = (GET_JOINED_DATA, GET_COMBINED_DATA, GET_DETAILED_DATA)


@dataclass
class PlpgsqlTriggerSpec:
    """One MySQL trigger, parsed (round 8, beyond-reference — the
    reference has no trigger pass at all, and mysqldump includes
    triggers by DEFAULT, so every real dump carries them). PostgreSQL
    splits a trigger into a trigger FUNCTION plus a CREATE TRIGGER
    binding; NEW/OLD row images spell identically in both engines, so
    the body reuses the C95 statement-tree parser with kind="trigger"
    (no RETURN allowed in the MySQL body; the emitter adds the plpgsql
    RETURN NEW/OLD)."""

    name: str
    table: str
    timing: str                      # BEFORE | AFTER
    event: str                       # INSERT | UPDATE | DELETE
    procedural: object               # plpgsql_proc.ProceduralBody
    #: MySQL firing-order clause: ("FOLLOWS"|"PRECEDES", other_trigger)
    #: or None. PostgreSQL fires same-event same-timing triggers
    #: alphabetically, so the orchestrator resolves the group order and
    #: passes a sortable ``pg_name`` to :func:`emit_trigger` (round 9).
    ordering: tuple | None = None


def emit_trigger(spec: PlpgsqlTriggerSpec, pg_name: str | None = None) -> str:
    """Trigger function + DROP IF EXISTS + CREATE TRIGGER, one payload
    (executes as one DB-API batch, like function+COMMENT). Row triggers
    must RETURN a row: NEW for INSERT/UPDATE (so BEFORE triggers keep
    their NEW.col mutations), OLD for DELETE; every EXCEPTION clause
    gets its own trailing RETURN so a handled error still returns a
    row instead of 'control reached end of trigger procedure'.

    ``pg_name`` (round 9): PG-side trigger name when the orchestrator
    enforces MySQL FOLLOWS/PRECEDES ordering via sortable prefixes —
    PostgreSQL fires same-event same-timing triggers alphabetically,
    so ``t01_a``/``t02_b`` reproduces MySQL's action order exactly.
    The rename is caveated in an emitted comment (DROP TRIGGER by the
    old MySQL name would miss; the comment carries the mapping)."""
    from mysql2pg_spark.sinks.plpgsql_proc import emit_statements

    trig_name = (pg_name or spec.name).lower()
    fn = f"trg_{trig_name}"
    ret = "OLD" if spec.event.upper() == "DELETE" else "NEW"
    declare_block = "".join(
        f"    {n} {t};\n" for n, t in spec.procedural.declares
    )
    exc = ""
    for k, (cond, action) in enumerate(
        getattr(spec.procedural, "exc_clauses", []) or []
    ):
        kw = "EXCEPTION WHEN" if k == 0 else "WHEN"
        exc += (
            f"{kw} {cond} THEN\n" + emit_statements(action)
            + f"\n    RETURN {ret};\n"
        )
    tbl = spec.table.lower()
    rename_note = ""
    if trig_name != spec.name.lower():
        rename_note = (
            f"-- MySQL trigger `{spec.name}` renamed to `{trig_name}`: "
            "PostgreSQL fires same-event triggers alphabetically, so "
            "the sortable prefix enforces the MySQL FOLLOWS/PRECEDES "
            "action order\n"
        )
    return (
        rename_note
        + f"CREATE OR REPLACE FUNCTION {fn}() RETURNS trigger AS $$\n"
        f"DECLARE\n{declare_block}"
        f"BEGIN\n"
        + emit_statements(spec.procedural.statements)
        + f"\n    RETURN {ret};\n"
        + exc
        + "END;\n$$ LANGUAGE plpgsql;\n"
        f"DROP TRIGGER IF EXISTS {trig_name} ON {tbl};\n"
        f"CREATE TRIGGER {trig_name} "
        f"{spec.timing.upper()} {spec.event.upper()} ON {tbl}\n"
        f"FOR EACH ROW EXECUTE FUNCTION {fn}();"
    )
