"""Procedural stored-function bodies: MySQL control flow → plpgsql
(SURVEY C95, the cursor / loop / handler half).

The reference translates these with flat regex passes over the body text
(internal/converter/postgres/sync_functions.go:
``LEAVE``→``EXIT`` / ``ITERATE``→``CONTINUE`` / ``REPEAT``→``LOOP`` /
``UNTIL c END REPEAT``→``EXIT WHEN c; END LOOP;`` at :532-535, cursor
declarations→``refcursor`` + ``OPEN c FOR <select>`` and
``FETCH c INTO v``→``FETCH NEXT FROM c INTO v; IF NOT FOUND THEN
done := true; END IF;`` at :1040-1077, handler/label removal at
:1083-1086) — and then needs per-function hardcoded patches (:430-465)
for the bodies the regexes mangle. Here the SAME target shapes are
produced from a parsed statement tree: a recursive-descent parser turns
the MySQL body into typed statement nodes, and the emitter prints
plpgsql from the tree, so nesting (an IF inside a REPEAT inside a
labeled LOOP) is structurally correct by construction instead of
hoping the regex order works out.

Round 8 makes the parse BLOCK-SCOPED, mirroring both engines' native
scoping instead of regex-lifting declarations to function scope:
``DECLARE`` statements (variables, conditions, cursors, handlers) are
parsed inline at the start of each ``BEGIN…END`` block — exactly where
MySQL requires them — and each nested block emits its OWN plpgsql
``DECLARE`` section and its OWN ``EXCEPTION`` clauses. That fixes two
real mistranslations of the round-7 scope-lifting design:

* per-block-entry DEFAULT re-initialization: ``DECLARE t INT DEFAULT 0``
  inside a loop body re-initializes on every iteration in MySQL; a
  lifted declaration initialized once.  plpgsql's own block DECLARE
  re-evaluates defaults on each entry, so emitting the declaration in
  its source block restores MySQL's semantics (and defaults that
  reference outer variables now evaluate at block entry, not function
  entry);
* handlers declared inside nested blocks: MySQL scopes handlers per
  block, and plpgsql scopes ``EXCEPTION`` clauses per block — attaching
  the translated handler to its own block (instead of refusing, as
  round 7 did) preserves the scope exactly.  Same-name re-declaration
  in an inner block (shadowing) is now legal too — plpgsql shadows the
  same way MySQL does.

Supported statements: ``SET``, ``SELECT … INTO``, ``RETURN``,
``IF/ELSEIF/ELSE``, ``LOOP``, ``REPEAT…UNTIL``, ``WHILE``,
``LEAVE``/``ITERATE`` (labels are KEPT as plpgsql ``<<label>>`` /
``EXIT label`` — the reference strips them at :1085, which silently
retargets a multi-level ``LEAVE outer`` at the inner loop),
``OPEN``/``FETCH``/``CLOSE`` cursors, nested ``BEGIN…END`` blocks with
their own DECLARE/EXCEPTION sections, the CASE *statement* (both
searched ``CASE WHEN … THEN stmts`` and value ``CASE expr WHEN v THEN
stmts`` forms → the plpgsql CASE statement, whose no-match/no-ELSE
error matches MySQL's "Case not found"), and these handler shapes:

* ``DECLARE CONTINUE HANDLER FOR NOT FOUND <action>`` — the action may
  be any single ``SET var = expr`` (round 8; round 7 accepted only the
  literal ``SET flag = 1``).  When the assigned value is boolean-ish
  (1/0/TRUE/FALSE) the variable is forced BOOLEAN (the reference does
  the same for ``done`` variables, :1116-1119) and integer comparisons
  against it (``done = 1``, ``UNTIL done = 1``) are rewritten to
  boolean form — the step the reference's flat replace misses, which
  leaves ``boolean = integer`` type errors in its output.  A
  general-expression action (``SET n_missing = n_missing + 1``) is
  emitted verbatim in the FETCH's ``IF NOT FOUND THEN`` arm with no
  type forcing.
* ``DECLARE EXIT HANDLER FOR SQLEXCEPTION <action>`` (the second-most-
  common real-world handler; the reference strips handlers wholesale
  at :1086) — the action (a single statement or a ``BEGIN…END`` group)
  becomes the DECLARING block's ``EXCEPTION WHEN others THEN`` clause,
  which is plpgsql's native exit-handler semantics: abort the block's
  remaining statements, run the handler.
* ``DECLARE EXIT/CONTINUE HANDLER FOR SQLSTATE 'xxxxx' <action>`` —
  same shapes but with ``EXCEPTION WHEN SQLSTATE 'xxxxx' THEN``,
  exactly as narrow as MySQL's handler.  Classes 00/01/02
  (success/warning/not-found) still refuse — plpgsql EXCEPTION clauses
  cannot trap them.  A comma list of SQLSTATE conditions becomes one
  clause with ``OR`` (round 8).
* ``DECLARE err CONDITION FOR SQLSTATE 'xxxxx'`` — named conditions
  resolve through the scope chain, so ``SIGNAL err`` and ``HANDLER FOR
  err`` translate through the SQLSTATE paths.
* Bare MySQL errnos (round 8) — ``HANDLER FOR 1062`` and ``DECLARE dup
  CONDITION FOR 1062`` map through ``MYSQL_ERRNO_SQLSTATE`` to the
  SQLSTATE the equivalent PostgreSQL runtime error carries (1062 →
  unique_violation 23505, 1452 → foreign_key_violation 23503, …).
  Errnos outside the well-known table refuse, and ``SIGNAL`` on an
  errno-declared condition refuses exactly as MySQL itself does
  (ER_SIGNAL_BAD_CONDITION_TYPE).
* ``SIGNAL SQLSTATE 'xxxxx' [SET MESSAGE_TEXT = …, MYSQL_ERRNO = …]``
  → ``RAISE EXCEPTION USING ERRCODE = 'xxxxx'[, MESSAGE = …][, HINT =
  'MYSQL_ERRNO …']`` — the validation-raise idiom real MySQL functions
  use; the errno rides in HINT because PG has no errno field (dropping
  it silently would be lossy).  The reference has no SIGNAL pass.
* ``RESIGNAL;`` (bare form, round 8) inside a handler action →
  plpgsql ``RAISE;`` — re-raise the condition being handled, which is
  exactly MySQL's bare RESIGNAL.  The attribute-modifying forms
  (round 9): ``RESIGNAL SET MESSAGE_TEXT = …`` re-raises the SAME
  condition with a new message (``RAISE EXCEPTION USING ERRCODE =
  SQLSTATE, MESSAGE = …`` — plpgsql's handler-scope SQLSTATE variable
  keeps the condition identity), and ``RESIGNAL SQLSTATE 'xxxxx'
  [SET …]`` raises the NEW condition, defaulting the message to
  ``SQLERRM`` (MySQL's diagnostics-area rule: attributes not SET are
  inherited from the condition being handled).  RESIGNAL outside a
  handler still refuses (illegal in MySQL too).
* ``DECLARE CONTINUE HANDLER FOR SQLEXCEPTION <action>``
  (resume-after-error) — every raise-capable statement in the
  declaring block (and its nested blocks) is wrapped in its own
  ``BEGIN … EXCEPTION WHEN others THEN <action>; END`` sub-block.
  A plpgsql sub-block with an EXCEPTION clause is a subtransaction
  that rolls back only the failing statement's work — the same
  statement-level atomicity MySQL gives the failing statement before
  running a CONTINUE handler — and control resumes after the
  sub-block, i.e. at the next statement, which is exactly MySQL's
  CONTINUE.  An error inside a condition (``WHILE``/``IF``/``CASE``
  heads) aborts the whole compound and resumes after it, so
  condition-bearing compounds are wrapped as a unit on top of their
  individually-wrapped bodies.

Handler dispatch across scopes follows MySQL's rule (innermost scope
first, most-specific within a scope).  plpgsql reproduces it for free
when handlers stay in their blocks — with one exception the translator
refuses rather than mistranslates: a CONTINUE handler whose
per-statement wrap would intercept an error that MySQL would give to a
same-or-inner-scope EXIT handler (the wrap sits closer to the
statement than the block's EXCEPTION clause, inverting precedence).

Also handled: MySQL's multi-assignment ``SET a = 1, b = a`` splits —
paren-aware, at the top level only — into sequential plpgsql
assignments (``a := 1; b := a;``; MySQL evaluates left-to-right too),
comma-list declarations ``DECLARE a, b INT DEFAULT 0`` become one
declaration per name, and body DML (round 8) — ``INSERT`` / ``UPDATE``
/ ``DELETE`` in MODIFIES SQL DATA functions pass through with the
expression rewrite applied (plpgsql runs plain SQL natively;
``REPLACE INTO`` refuses — see :class:`Dml`).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class ProcParseError(ValueError):
    """Body construct outside the procedural subset."""


# --------------------------------------------------------------------------
# Statement tree
# --------------------------------------------------------------------------
@dataclass
class Assign:
    var: str
    expr: str                        # PG-dialect expression


@dataclass
class RowCountInto:
    """``SET v = ROW_COUNT();`` → ``GET DIAGNOSTICS v = ROW_COUNT;``
    (reference reRowCountAssign, sync_functions.go:553)."""

    var: str


@dataclass
class SelectInto:
    select_sql: str                  # PG dialect, INTO removed
    into_vars: list[str]
    #: round 9: MySQL's NOT FOUND handler fires on a ZERO-ROW SELECT
    #: INTO too (not just FETCH past-end); plpgsql's SELECT INTO sets
    #: FOUND instead of raising, so the in-scope handler action emits
    #: in an ``IF NOT FOUND THEN … END IF;`` arm — same shape as Fetch.
    #: Known divergence: on zero rows MySQL leaves the INTO variables
    #: UNCHANGED while plpgsql nulls them — handler bodies that set a
    #: flag (the universal idiom) behave identically; bodies relying on
    #: the stale value would need a temp-var rewrite.
    on_empty: list | None = None


@dataclass
class Dml:
    """``INSERT`` / ``UPDATE`` / ``DELETE`` inside a MODIFIES SQL DATA
    body (round 8) — plpgsql runs plain SQL statements natively, so the
    translation is the expression rewrite (MySQL function spellings →
    PG) and verbatim emission. Raise-capable, so the CONTINUE-handler
    wrap treats it like any other statement. ``REPLACE INTO`` refuses:
    its delete-then-insert semantics (fired triggers, FK cascades)
    differ from ``INSERT … ON CONFLICT`` in observable ways."""

    sql: str                         # PG dialect


@dataclass
class Return:
    expr: str | None                 # None = bare RETURN (procedures)


@dataclass
class If:
    #: (condition, statements) per branch; final branch cond None = ELSE
    branches: list[tuple[str | None, list]]


@dataclass
class Loop:
    body: list
    label: str | None = None


@dataclass
class RepeatUntil:
    body: list
    until: str                       # exit condition (PG dialect)
    label: str | None = None


@dataclass
class While:
    cond: str
    body: list
    label: str | None = None


@dataclass
class Leave:
    label: str | None = None


@dataclass
class Iterate:
    label: str | None = None


@dataclass
class OpenCursor:
    name: str
    select_sql: str                  # attached from the declaration


@dataclass
class Fetch:
    cursor: str
    into_vars: list[str]
    #: the innermost in-scope NOT FOUND handler's action statements
    #: (``None`` = no handler in scope); emitted inside
    #: ``IF NOT FOUND THEN … END IF;`` after the FETCH
    on_empty: list | None = None


@dataclass
class CloseCursor:
    name: str


@dataclass
class ResultSetSelect:
    """A bare ``SELECT`` (no INTO) in a PROCEDURE body — MySQL streams
    it to the client as a result set. plpgsql's native idiom (round 9):
    the builder appends one ``INOUT refcursor`` parameter per result
    set in document order (``p_resultset``, ``p_resultset2``, …) and
    this node emits ``OPEN <param> FOR <select>;`` — the caller does
    ``CALL proc(…, 'c1', 'c2'); FETCH ALL FROM c1; …``.

    Round 12: the cursor-accumulate shape — ONE variables-only SELECT
    inside a loop (``SELECT v_a, v_b;`` after a FETCH) — translates
    instead of refusing: the builder sets ``accumulate_into`` and the
    node emits ``INSERT INTO <temp> <select>;`` per iteration, with a
    single ``OPEN p_resultset FOR SELECT * FROM <temp>`` appended at
    the body's end (MySQL's N one-row result sets arrive as ONE
    result set with the same rows in the same order — the standard
    migration rewrite; the per-iteration framing itself has no
    plpgsql analog). Remaining refusals (builder-side, via
    :func:`collect_resultsets`): a non-conforming in-loop SELECT
    (expressions / FROM / undeclared names), and multiple result sets
    not all at the body's top level (fixed parameter positions cannot
    express an arm-dependent sequence)."""

    select_sql: str                  # PG dialect
    param: str = "p_resultset"
    #: set by the builder's cursor-accumulate translation: emit
    #: ``INSERT INTO <this> <select>`` instead of an OPEN
    accumulate_into: str | None = None


@dataclass
class Block:
    """Nested ``BEGIN…END`` compound with its OWN plpgsql DECLARE
    section and EXCEPTION clauses (round 8) — block-entry DEFAULT
    re-initialization and block-scoped handlers are plpgsql natives,
    so keeping declarations in their block preserves MySQL semantics
    that round 7's scope-lifting lost."""

    body: list
    label: str | None = None
    declares: list = field(default_factory=list)   # (name, pg decl)
    #: EXIT handlers declared IN this block → this block's EXCEPTION
    #: clauses, specific-SQLSTATE-first
    exc_clauses: list = field(default_factory=list)


@dataclass
class CaseStmt:
    """CASE *statement* (searched when ``subject`` is None, else value
    form); final branch with cond None = ELSE. plpgsql raises
    CASE_NOT_FOUND when no branch matches and there is no ELSE — the
    same runtime contract as MySQL's "Case not found" error."""

    subject: str | None
    branches: list[tuple[str | None, list]]


@dataclass
class Signal:
    """``SIGNAL SQLSTATE '45000' [SET MESSAGE_TEXT = expr]`` → ``RAISE
    EXCEPTION USING ERRCODE = '45000'[, MESSAGE = expr]`` — the
    validation-raise idiom real MySQL functions use (the reference has
    no SIGNAL pass at all; bodies containing it hit its regex fallback
    and emit broken plpgsql)."""

    errcode: str                     # PG string literal, e.g. "'45000'"
    message: str | None              # PG expression (already rewritten)
    #: MYSQL_ERRNO has no PG analog; it is preserved losslessly in the
    #: error's HINT field instead of being silently dropped
    errno: str | None = None         # PG expression
    #: RAISE level (round 9): MySQL ``SIGNAL SQLSTATE '01xxx'`` adds a
    #: WARNING to the diagnostics area and execution CONTINUES — which
    #: is exactly plpgsql's ``RAISE WARNING``; every other class is an
    #: EXCEPTION in both engines
    level: str = "EXCEPTION"


@dataclass
class DiagnosticsInto:
    """``GET [CURRENT|STACKED] DIAGNOSTICS CONDITION 1 var = item, …``
    inside a handler action (round 9) → plpgsql ``GET STACKED
    DIAGNOSTICS var = item, …`` — the handler-introspection idiom real
    error-logging handlers use. Items limited to the ones both engines
    expose (MESSAGE_TEXT, RETURNED_SQLSTATE); MYSQL_ERRNO has no PG
    analog and refuses. Outside a handler the stacked area is empty in
    both engines but PG ERRORS where MySQL returns blanks — refuse
    rather than emit a statement that cannot run."""

    items: list                      # [(var, pg diagnostics item)]


@dataclass
class Resignal:
    """Bare ``RESIGNAL;`` inside a handler action → plpgsql ``RAISE;``
    (re-raise the condition being handled — the exact MySQL semantics;
    round 8).  The attribute-modifying forms (round 9) build
    :class:`Signal` nodes instead: ``RESIGNAL SET …`` with ``ERRCODE =
    SQLSTATE`` (same condition, new attributes), ``RESIGNAL SQLSTATE
    'xxxxx' [SET …]`` with the new code and ``SQLERRM`` as the
    inherited default message."""


@dataclass
class TryWrap:
    """One statement (or condition-bearing compound) guarded by the
    block's CONTINUE handlers: emitted as a ``BEGIN … EXCEPTION WHEN
    <cond1> THEN <action1> [WHEN <cond2> THEN <action2> …] END;``
    sub-block (a subtransaction — plpgsql's statement-level
    resume-after-error shape). Each clause cond is ``others`` for
    SQLEXCEPTION or a specific ``SQLSTATE 'xxxxx'``; clauses are ordered
    specific-first so plpgsql's first-match dispatch reproduces MySQL's
    most-specific-handler-wins precedence."""

    body: list
    clauses: list                    # [(cond, action statements), …]


@dataclass
class ProceduralBody:
    declares: list[tuple[str, str]]  # (name, pg type [:= default])
    statements: list
    #: EXIT handlers → the function block's EXCEPTION clauses, ordered
    #: specific-SQLSTATE-first (empty = no EXIT handler). Each entry is
    #: (cond, action statements) with cond ``others`` or
    #: ``SQLSTATE 'xxxxx'``.
    exc_clauses: list = field(default_factory=list)


def collect_resultsets(stmts: list, in_loop: bool = False) -> tuple:
    """(:class:`ResultSetSelect` nodes in document order, any-in-loop
    flag) for a statement tree. The builder assigns one ``INOUT
    refcursor`` parameter per node in this order (``p_resultset``,
    ``p_resultset2``, …) — the plpgsql idiom for MySQL procedures that
    stream several result sets. A node inside a LOOP flags True: MySQL
    streams one result set PER ITERATION there, while a refcursor OPENs
    once (the second OPEN raises) — the builder refuses those. Branch
    arms of IF/CASE are collected too; with a SINGLE node that is fine
    (zero-or-one result set, like MySQL), but the builder refuses
    MULTIPLE nodes unless all sit at the body's top level — fixed
    parameter positions cannot express arm-dependent result-set
    sequences."""
    out: list = []
    flag = False
    for st in stmts:
        if isinstance(st, ResultSetSelect):
            out.append(st)
            flag = flag or in_loop
        elif isinstance(st, (Loop, RepeatUntil, While, Block, TryWrap)):
            inner_loop = in_loop or isinstance(
                st, (Loop, RepeatUntil, While)
            )
            o, f = collect_resultsets(st.body, inner_loop)
            out += o
            flag = flag or f
            for _, action in getattr(st, "clauses", []) or []:
                o, f = collect_resultsets(action, inner_loop)
                out += o
                flag = flag or f
            for _, action in getattr(st, "exc_clauses", []) or []:
                o, f = collect_resultsets(action, inner_loop)
                out += o
                flag = flag or f
        elif isinstance(st, (If, CaseStmt)):
            for _, b in st.branches:
                o, f = collect_resultsets(b, in_loop)
                out += o
                flag = flag or f
        elif isinstance(st, Fetch) and st.on_empty:
            o, f = collect_resultsets(st.on_empty, in_loop)
            out += o
            flag = flag or f
    return out, flag


# --------------------------------------------------------------------------
# Emitter
# --------------------------------------------------------------------------
def emit_statements(stmts: list, indent: int = 1) -> str:
    pad = "    " * indent
    out: list[str] = []
    for st in stmts:
        if isinstance(st, Assign):
            out.append(f"{pad}{st.var} := {st.expr};")
        elif isinstance(st, RowCountInto):
            out.append(f"{pad}GET DIAGNOSTICS {st.var} = ROW_COUNT;")
        elif isinstance(st, SelectInto):
            out.append(
                f"{pad}{st.select_sql}\n{pad}INTO "
                + ", ".join(st.into_vars) + ";"
            )
            if st.on_empty is not None:
                if len(st.on_empty) == 1 and isinstance(
                    st.on_empty[0], Assign
                ):
                    a = st.on_empty[0]
                    out.append(
                        f"{pad}IF NOT FOUND THEN "
                        f"{a.var} := {a.expr}; END IF;"
                    )
                else:
                    out.append(f"{pad}IF NOT FOUND THEN")
                    out.append(emit_statements(st.on_empty, indent + 1))
                    out.append(f"{pad}END IF;")
        elif isinstance(st, Dml):
            out.append(f"{pad}{st.sql};")
        elif isinstance(st, Return):
            out.append(
                f"{pad}RETURN;" if st.expr is None
                else f"{pad}RETURN {st.expr};"
            )
        elif isinstance(st, If):
            for i, (cond, body) in enumerate(st.branches):
                kw = "IF" if i == 0 else ("ELSIF" if cond else "ELSE")
                head = f"{pad}{kw} {cond} THEN" if cond else f"{pad}{kw}"
                out.append(head)
                out.append(emit_statements(body, indent + 1))
            out.append(f"{pad}END IF;")
        elif isinstance(st, Loop):
            if st.label:
                out.append(f"{pad}<<{st.label}>>")
            out.append(f"{pad}LOOP")
            out.append(emit_statements(st.body, indent + 1))
            out.append(f"{pad}END LOOP{' ' + st.label if st.label else ''};")
        elif isinstance(st, RepeatUntil):
            # reference shape :534-535: REPEAT→LOOP,
            # UNTIL c END REPEAT→EXIT WHEN c; END LOOP;
            if st.label:
                out.append(f"{pad}<<{st.label}>>")
            out.append(f"{pad}LOOP")
            out.append(emit_statements(st.body, indent + 1))
            out.append(f"{pad}    EXIT WHEN {st.until};")
            out.append(f"{pad}END LOOP{' ' + st.label if st.label else ''};")
        elif isinstance(st, While):
            if st.label:
                out.append(f"{pad}<<{st.label}>>")
            out.append(f"{pad}WHILE {st.cond} LOOP")
            out.append(emit_statements(st.body, indent + 1))
            out.append(f"{pad}END LOOP{' ' + st.label if st.label else ''};")
        elif isinstance(st, Leave):
            out.append(f"{pad}EXIT{' ' + st.label if st.label else ''};")
        elif isinstance(st, Iterate):
            out.append(f"{pad}CONTINUE{' ' + st.label if st.label else ''};")
        elif isinstance(st, OpenCursor):
            out.append(f"{pad}OPEN {st.name} FOR {st.select_sql};")
        elif isinstance(st, Fetch):
            into = ", ".join(st.into_vars)
            out.append(f"{pad}FETCH NEXT FROM {st.cursor} INTO {into};")
            if st.on_empty is not None:
                if len(st.on_empty) == 1 and isinstance(
                    st.on_empty[0], Assign
                ):
                    a = st.on_empty[0]
                    out.append(
                        f"{pad}IF NOT FOUND THEN "
                        f"{a.var} := {a.expr}; END IF;"
                    )
                else:
                    out.append(f"{pad}IF NOT FOUND THEN")
                    out.append(emit_statements(st.on_empty, indent + 1))
                    out.append(f"{pad}END IF;")
        elif isinstance(st, CloseCursor):
            out.append(f"{pad}CLOSE {st.name};")
        elif isinstance(st, ResultSetSelect):
            if st.accumulate_into:
                out.append(
                    f"{pad}INSERT INTO {st.accumulate_into} "
                    f"{st.select_sql};"
                )
            else:
                out.append(f"{pad}OPEN {st.param} FOR {st.select_sql};")
        elif isinstance(st, Block):
            if st.label:
                out.append(f"{pad}<<{st.label}>>")
            if st.declares:
                out.append(f"{pad}DECLARE")
                for n, t in st.declares:
                    out.append(f"{pad}    {n} {t};")
            out.append(f"{pad}BEGIN")
            out.append(emit_statements(st.body, indent + 1))
            for k, (cond, action) in enumerate(st.exc_clauses):
                kw = "EXCEPTION WHEN" if k == 0 else "WHEN"
                out.append(f"{pad}{kw} {cond} THEN")
                out.append(emit_statements(action, indent + 1))
            out.append(f"{pad}END{' ' + st.label if st.label else ''};")
        elif isinstance(st, TryWrap):
            out.append(f"{pad}BEGIN")
            out.append(emit_statements(st.body, indent + 1))
            for k, (cond, action) in enumerate(st.clauses):
                kw = "EXCEPTION WHEN" if k == 0 else "WHEN"
                out.append(f"{pad}{kw} {cond} THEN")
                out.append(emit_statements(action, indent + 1))
            out.append(f"{pad}END;")
        elif isinstance(st, Signal):
            using = [f"ERRCODE = {st.errcode}"]
            if st.message is not None:
                using.append(f"MESSAGE = {st.message}")
            if st.errno is not None:
                using.append(
                    f"HINT = 'MYSQL_ERRNO ' || ({st.errno})::text"
                )
            out.append(
                f"{pad}RAISE {st.level} USING " + ", ".join(using) + ";"
            )
        elif isinstance(st, DiagnosticsInto):
            items = ", ".join(f"{v} = {item}" for v, item in st.items)
            out.append(f"{pad}GET STACKED DIAGNOSTICS {items};")
        elif isinstance(st, Resignal):
            out.append(f"{pad}RAISE;")
        elif isinstance(st, CaseStmt):
            out.append(f"{pad}CASE" + (f" {st.subject}" if st.subject else ""))
            for cond, body in st.branches:
                out.append(
                    f"{pad}WHEN {cond} THEN" if cond is not None else f"{pad}ELSE"
                )
                out.append(emit_statements(body, indent + 1))
            out.append(f"{pad}END CASE;")
        else:  # pragma: no cover - parser only builds the nodes above
            raise ProcParseError(f"unknown statement node {st!r}")
    return "\n".join(out)


# --------------------------------------------------------------------------
# Parser
# --------------------------------------------------------------------------
_WS = re.compile(r"\s+")
_LABEL = re.compile(r"(\w+)\s*:\s*(?=LOOP\b|REPEAT\b|WHILE\b|BEGIN\b)", re.I)


def _kw(word: str) -> re.Pattern:
    return re.compile(rf"{word}\b", re.I)


_T_ELSEIF = _kw("ELSEIF")
_T_ELSE = _kw("ELSE")
_T_END_IF = re.compile(r"END\s+IF\b", re.I)
_T_UNTIL = _kw("UNTIL")
_T_END_REPEAT = re.compile(r"END\s+REPEAT\b", re.I)
_T_END_LOOP = re.compile(r"END\s+LOOP\b", re.I)
_T_END_WHILE = re.compile(r"END\s+WHILE\b", re.I)
_T_END_CASE = re.compile(r"END\s+CASE\b", re.I)
#: a bare END (nested-block close) — NOT the END of IF/CASE/loops
_T_END_BLOCK = re.compile(
    r"END\b(?!\s+(?:IF|CASE|LOOP|REPEAT|WHILE)\b)", re.I
)
_T_THEN = _kw("THEN")
_T_WHEN = _kw("WHEN")
_T_DO = _kw("DO")

_RE_HANDLER_HEAD = re.compile(
    r"(CONTINUE|EXIT|UNDO)\s+HANDLER\s+FOR\s+", re.I
)
#: one handler condition: SQLEXCEPTION / SQLWARNING / NOT FOUND /
#: expression-position ROW_COUNT() (the SET path pre-empts the
#: assignment form, so any survivor needs hoisting or refusal)
_RC_EXPR = re.compile(r"ROW_COUNT\s*\(\s*\)", re.I)

#: SQLSTATE [VALUE] '…' (literal possibly masked) / bare errno /
#: a declared condition name
_RE_COND_TOKEN = re.compile(
    r"SQLEXCEPTION\b|SQLWARNING\b|NOT\s+FOUND\b|"
    r"SQLSTATE(?:\s+VALUE)?\s+(?:\x00L\d+\x00|'[^'\n]*')|\d+\b|\w+",
    re.I,
)


#: MySQL errno → the SQLSTATE the EQUIVALENT PostgreSQL error carries at
#: runtime. Both columns are public record (MySQL's Server Error Message
#: Reference; PostgreSQL's Appendix A errcodes). The mapping targets
#: what the handler will actually CATCH once the function runs on
#: PostgreSQL: a MySQL `HANDLER FOR 1062` traps duplicate-key, and on
#: PostgreSQL that same failure raises unique_violation 23505 — so 1062
#: maps to 23505, not to MySQL's own generic 23000. Errnos outside this
#: table refuse (raise-don't-mistranslate); the reference strips ALL
#: handlers wholesale (sync_functions.go:1086).
MYSQL_ERRNO_SQLSTATE = {
    1022: "23505",  # ER_DUP_KEY
    1048: "23502",  # ER_BAD_NULL_ERROR
    1062: "23505",  # ER_DUP_ENTRY
    1146: "42P01",  # ER_NO_SUCH_TABLE
    1205: "55P03",  # ER_LOCK_WAIT_TIMEOUT
    1213: "40P01",  # ER_LOCK_DEADLOCK
    1216: "23503",  # ER_NO_REFERENCED_ROW
    1217: "23503",  # ER_ROW_IS_REFERENCED
    1264: "22003",  # ER_WARN_DATA_OUT_OF_RANGE (strict mode error)
    1292: "22007",  # ER_TRUNCATED_WRONG_VALUE (bad datetime literal)
    1365: "22012",  # ER_DIVISION_BY_ZERO
    1406: "22001",  # ER_DATA_TOO_LONG
    1305: "42883",  # ER_SP_DOES_NOT_EXIST (undefined function/proc)
    1318: "42883",  # ER_SP_WRONG_NO_OF_ARGS
    1329: "02000",  # ER_SP_FETCH_NO_DATA (routes to NOT FOUND class)
    1451: "23503",  # ER_ROW_IS_REFERENCED_2
    1452: "23503",  # ER_NO_REFERENCED_ROW_2
    1526: "23514",  # ER_NO_PARTITION_FOR_GIVEN_VALUE → check_violation
    1690: "22003",  # ER_DATA_OUT_OF_RANGE
    1859: "23505",  # ER_DUP_UNKNOWN_IN_INDEX
    3105: "428C9",  # ER_NON_DEFAULT_VALUE_FOR_GENERATED_COLUMN
    3819: "23514",  # ER_CHECK_CONSTRAINT_VIOLATED
}


@dataclass
class _Scope:
    """One BEGIN…END block's declarations (MySQL requires DECLAREs at
    block start, so each block's scope is complete before its
    statements parse).  Lookups walk the parent chain — the same
    resolution order both MySQL and plpgsql use."""

    parent: "_Scope | None" = None
    declares: list = field(default_factory=list)     # [(name, pg decl)]
    raw_defaults: dict = field(default_factory=dict)  # name → masked default
    cursors: dict = field(default_factory=dict)       # name → PG select
    #: name → (masked SQLSTATE literal, declared-from-bare-errno?) —
    #: the flag gates SIGNAL, which MySQL only allows on
    #: SQLSTATE-defined conditions (ER_SIGNAL_BAD_CONDITION_TYPE)
    conditions: dict = field(default_factory=dict)
    #: NOT FOUND handler: boolean-flag variable (canonical form) and/or
    #: the parsed action statements for the FETCH IF-NOT-FOUND arm
    flag: str | None = None
    not_found_action: list | None = None
    #: [(cond string, action stmts, cond atoms)]
    continue_clauses: list = field(default_factory=list)
    exit_clauses: list = field(default_factory=list)


class _Parser:
    """Recursive descent over the masked body text (literals are already
    ``\\x00L<n>\\x00`` placeholders, so ``;`` and keywords inside strings
    cannot confuse statement boundaries)."""

    def __init__(self, text: str, fname: str, rewrite, pg_type,
                 kind: str = "function", unmask=None):
        self.s = text
        self.i = 0
        self.fname = fname
        self.rewrite_user = rewrite  # MySQL expr (masked) → PG expr
        self.pg_type = pg_type       # MySQL type string → PG type
        self.unmask = unmask         # masked text → raw MySQL (round 9,
        # for statements converted as DDL rather than expressions)
        self.kind = kind             # "function" | "procedure"
        self.scope: _Scope | None = None
        self.in_handler = False      # RESIGNAL legality context
        self._rc_n = 0               # ROW_COUNT() hoist counter

    # -- lexing helpers ----------------------------------------------------
    def _skip_ws(self) -> None:
        while self.i < len(self.s) and self.s[self.i].isspace():
            self.i += 1

    def _at(self, pat: re.Pattern) -> re.Match | None:
        return pat.match(self.s, self.i)

    def _eat(self, pat: re.Pattern, what: str) -> re.Match:
        mo = pat.match(self.s, self.i)
        if not mo:
            ctx = self.s[self.i : self.i + 40]
            raise ProcParseError(
                f"function {self.fname}: expected {what} at {ctx!r}"
            )
        self.i = mo.end()
        return mo

    def _until_kw(self, pat: re.Pattern, what: str) -> str:
        """Text from here to the next occurrence of ``pat`` (consumed),
        CASE-aware: a CASE *expression* inside a control-flow condition
        nests THEN/ELSE/END keywords, so the scan skips balanced
        ``CASE…END`` spans instead of mis-splitting on the first
        keyword hit."""
        i = self.i
        depth = 0
        while True:
            if depth == 0:
                mo = pat.search(self.s, i)
                if not mo:
                    raise ProcParseError(
                        f"function {self.fname}: missing {what}"
                    )
                opener = re.compile(r"\bCASE\b", re.I).search(
                    self.s, i, mo.start()
                )
                if opener is None:
                    chunk = self.s[self.i : mo.start()]
                    self.i = mo.end()
                    return chunk.strip()
                depth = 1
                i = opener.end()
            else:
                mo = re.compile(r"\bCASE\b|\bEND\b", re.I).search(self.s, i)
                if not mo:
                    raise ProcParseError(
                        f"function {self.fname}: unterminated CASE "
                        f"expression while scanning for {what}"
                    )
                depth += 1 if mo.group().upper() == "CASE" else -1
                i = mo.end()

    def _until_semicolon(self) -> str:
        j = self.s.find(";", self.i)
        if j < 0:
            raise ProcParseError(
                f"function {self.fname}: unterminated statement at "
                f"{self.s[self.i:self.i + 40]!r}"
            )
        chunk = self.s[self.i : j]
        self.i = j + 1
        return chunk.strip()

    # -- scope helpers -----------------------------------------------------
    def _scopes(self):
        s = self.scope
        while s is not None:
            yield s
            s = s.parent

    def _lookup_cursor(self, name: str) -> str | None:
        for s in self._scopes():
            if name in s.cursors:
                return s.cursors[name]
        return None

    def _lookup_condition(self, name: str) -> "tuple[str, bool] | None":
        """(masked SQLSTATE literal, errno-declared?) through the scope
        chain — innermost wins, like MySQL and plpgsql both resolve."""
        for s in self._scopes():
            if name in s.conditions:
                return s.conditions[name]
        return None

    def _flags_in_scope(self) -> list[str]:
        return [s.flag for s in self._scopes() if s.flag]

    def _not_found_action(self) -> list | None:
        for s in self._scopes():
            if s.not_found_action is not None:
                return s.not_found_action
        return None

    def _rewrite(self, masked: str) -> str:
        for flag in self._flags_in_scope():
            masked = normalize_flag_comparisons(masked, flag)
        return self.rewrite_user(masked)

    def _hoist_row_count(self, exprs: list) -> tuple[list, list]:
        """PG has no expression-position ``ROW_COUNT()`` — only ``GET
        DIAGNOSTICS v = ROW_COUNT`` (an assignment). An expression
        using it (``IF ROW_COUNT() = 0 THEN …``, an audit INSERT)
        hoists to a synthesized BIGINT read immediately before the
        statement: the observation point is identical, because both
        engines report the statement BEFORE this one and nothing runs
        in between. Loop conditions must NOT use this (they re-observe
        each iteration after body DML) — WHILE refuses; UNTIL lifts via
        a per-iteration GET DIAGNOSTICS when the body ends in the
        observed DML (see the REPEAT parse site). Returns (exprs with
        the call replaced, prelude statements to emit first)."""
        if not any(e and _RC_EXPR.search(e) for e in exprs):
            return exprs, []
        var = f"__rc{self._rc_n}" if self._rc_n else "__rc"
        self._rc_n += 1
        self._declare(var, "BIGINT", None)
        return (
            [_RC_EXPR.sub(var, e) if e else e for e in exprs],
            [RowCountInto(var)],
        )

    def _rewrite_dml_limit(self, raw: str, up: str) -> str:
        """MySQL ``DELETE``/``UPDATE`` bodies may carry ``[ORDER BY …]
        LIMIT n`` (the batch-purge idiom); PostgreSQL DML has neither
        clause, so a verbatim pass-through emits plpgsql that FAILS at
        first execution — exactly the silent mistranslation the C95
        contract forbids. Single-table statements rewrite to the
        standard PG spelling, a ``ctid IN (SELECT ctid … LIMIT n)``
        subquery (row identity by physical id — no PK assumption, same
        rows MySQL would pick under the same ORDER BY). Multi-table /
        JOIN forms refuse rather than guess at PG's different
        USING/FROM semantics."""
        if up.startswith("INSERT "):
            return raw  # INSERT has no LIMIT in either engine
        mo = re.match(
            r"(?is)^(DELETE\s+FROM|UPDATE)\s+(`?\w+`?)"
            r"(.*?)\s+LIMIT\s+(\d+)\s*$",
            raw.strip(),
        )
        if mo is None:
            if re.search(r"(?is)\bLIMIT\s+\d+\s*$", raw):
                raise ProcParseError(
                    f"function {self.fname}: only single-table "
                    "DELETE/UPDATE … [ORDER BY …] LIMIT n translates "
                    f"(PostgreSQL DML has no LIMIT): {raw[:80]!r}"
                )
            return raw
        verb, table, mid, n = mo.groups()

        def _depth0_kw(text: str, pattern: str) -> list[int]:
            """Positions of whitespace-preceded top-level keyword
            matches — a keyword inside a parenthesized subquery is not
            the outer statement's clause."""
            out: list[int] = []
            depth = 0
            low = text.lower()
            for i, ch in enumerate(text):
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                elif depth == 0 and ch in " \t\n" and re.match(
                    pattern, low[i:]
                ):
                    out.append(i)
            return out

        # peel a trailing top-level ORDER BY off the middle (an ORDER
        # BY inside a WHERE subquery is not the DML's)
        order = None
        opos = _depth0_kw(mid, r"\s+order\s+by\s")
        if opos:
            order = re.sub(
                r"(?is)^\s*order\s+by\s+", "", mid[opos[-1]:]
            ).strip()
            mid = mid[:opos[-1]]
        is_delete = verb.upper().startswith("DELETE")
        where = ""
        set_clause = ""
        if is_delete:
            where = mid.strip()
        else:
            stripped = mid.strip()
            if not re.match(r"(?is)^SET\s", stripped):
                raise ProcParseError(
                    f"function {self.fname}: cannot parse UPDATE … "
                    f"LIMIT statement: {raw[:80]!r}"
                )
            # split SET list from WHERE at the first TOP-LEVEL WHERE —
            # a WHERE inside a parenthesized SET subexpression
            # (SET x = (SELECT … WHERE …)) must stay in the SET clause
            wpos = _depth0_kw(stripped, r"\s+where\s")
            if wpos:
                set_clause = stripped[3:wpos[0]].strip()
                where = stripped[wpos[0]:].strip()
            else:
                set_clause = stripped[3:].strip()
        if _depth0_kw(mid, r"\s+(join|using)\s"):
            # top-level only: a JOIN inside a WHERE/SET subquery is
            # still a single-table DML and rewrites fine
            raise ProcParseError(
                f"function {self.fname}: multi-table DML with LIMIT "
                "has no direct PostgreSQL analog — rewrite explicitly"
            )
        if where and not where.upper().startswith("WHERE"):
            raise ProcParseError(
                f"function {self.fname}: unrecognized clause between "
                f"the table and LIMIT in: {raw[:80]!r}"
            )
        inner = f"SELECT ctid FROM {table}"
        if where:
            inner += f" {where}"
        if order:
            inner += f" ORDER BY {order.strip()}"
        inner += f" LIMIT {n}"
        if is_delete:
            return f"DELETE FROM {table} WHERE ctid IN ({inner})"
        return (
            f"UPDATE {table} SET {set_clause} "
            f"WHERE ctid IN ({inner})"
        )

    def _refuse_loop_row_count(self, cond: str, kind: str) -> str:
        if cond and _RC_EXPR.search(cond):
            raise ProcParseError(
                f"function {self.fname}: ROW_COUNT() in a {kind} "
                "condition re-observes every iteration — a hoisted "
                "GET DIAGNOSTICS would freeze it (assign it inside "
                "the loop body instead)"
            )
        return cond

    # -- declarations (block start; MySQL requires them there) -------------
    def _parse_declares(self) -> None:
        while True:
            self._skip_ws()
            mo = self._at(_kw("DECLARE"))
            if not mo:
                return
            self.i = mo.end()
            self._skip_ws()
            hm = self._at(_RE_HANDLER_HEAD)
            if hm:
                self.i = hm.end()
                self._parse_handler(hm.group(1).upper())
                continue
            raw = self._until_semicolon()
            self._parse_decl_rest(raw)

    def _declare(self, name: str, decl: str, raw_default: str | None) -> None:
        if any(n == name for n, _t in self.scope.declares):
            raise ProcParseError(
                f"function {self.fname}: variable {name!r} declared "
                "twice in the same block (MySQL rejects this too)"
            )
        self.scope.declares.append((name, decl))
        self.scope.raw_defaults[name] = raw_default

    def _parse_decl_rest(self, raw: str) -> None:
        cm = re.match(r"(\w+)\s+CURSOR\s+FOR\s+(.+)$", raw, re.I | re.S)
        if cm:
            name = cm.group(1).lower()
            self.scope.cursors[name] = self._rewrite(cm.group(2).strip())
            self._declare(name, "refcursor", None)
            return
        cm = re.match(r"(\w+)\s+CONDITION\s+FOR\s+(.+)$", raw, re.I | re.S)
        if cm:
            name, target = cm.group(1).lower(), cm.group(2).strip()
            tmo = re.fullmatch(
                r"SQLSTATE(?:\s+VALUE)?\s+(\x00L\d+\x00|'[^'\n]*')",
                target, re.I,
            )
            if tmo:
                self.scope.conditions[name] = (tmo.group(1), False)
                return
            emo = re.fullmatch(r"\d+", target)
            if emo and int(target) in MYSQL_ERRNO_SQLSTATE:
                self.scope.conditions[name] = (
                    f"'{MYSQL_ERRNO_SQLSTATE[int(target)]}'", True,
                )
                return
            raise ProcParseError(
                f"function {self.fname}: CONDITION {name!r} declared "
                f"FOR {target!r} — only `CONDITION FOR SQLSTATE "
                "'xxxxx'` or a well-known MySQL errno (the "
                "MYSQL_ERRNO_SQLSTATE table) resolves to a "
                "plpgsql-catchable condition"
            )
        cm = re.match(r"(\w+(?:\s*,\s*\w+)*)\s+(.+)$", raw, re.S)
        if not cm:
            raise ProcParseError(
                f"function {self.fname}: cannot parse DECLARE {raw!r}"
            )
        # MySQL comma lists (`DECLARE a, b INT DEFAULT 0`) share one
        # type and default across every name
        rest = cm.group(2).strip()
        dflt = re.search(r"\bDEFAULT\s+(.+)$", rest, re.I | re.S)
        t = self.pg_type(rest[: dflt.start()].strip() if dflt else rest)
        for var in (v.strip().lower() for v in cm.group(1).split(",")):
            raw_default = dflt.group(1).strip() if dflt else None
            decl = t + (
                " := " + self._rewrite(raw_default) if dflt else ""
            )
            self._declare(var, decl, raw_default)

    def _sqlstate_cond(self, text: str) -> str:
        """``SQLSTATE [VALUE] <lit>`` → validated ``SQLSTATE 'xxxxx'``."""
        lit = self.rewrite_user(
            re.search(r"\x00L\d+\x00|'[^'\n]*'", text).group()
        ).strip()
        if not re.fullmatch(r"'[0-9A-Za-z]{5}'", lit):
            raise ProcParseError(
                f"function {self.fname}: HANDLER SQLSTATE value {lit!r} "
                "is not a 5-character SQLSTATE literal"
            )
        if lit[1:3] == "02":
            # MySQL defines class-02 SQLSTATEs as the NOT FOUND class —
            # a `HANDLER FOR SQLSTATE '02000'` IS a not-found handler
            # (round 8), so it routes to the FETCH-arm machinery rather
            # than an EXCEPTION clause (which cannot trap the class)
            return "NOT FOUND"
        if lit[1:3] in ("00", "01"):
            raise ProcParseError(
                f"function {self.fname}: HANDLER for SQLSTATE class "
                f"{lit[1:3]!r} (success/warning) cannot "
                "be caught by a plpgsql EXCEPTION clause"
            )
        return f"SQLSTATE {lit}"

    def _parse_handler(self, kind: str) -> None:
        if kind == "UNDO":
            raise ProcParseError(
                f"function {self.fname}: UNDO handlers are not supported "
                "by MySQL itself and have no plpgsql analog"
            )
        conds: list[str] = []
        while True:
            self._skip_ws()
            mo = self._eat(_RE_COND_TOKEN, "handler condition")
            conds.append(mo.group())
            self._skip_ws()
            if self.i < len(self.s) and self.s[self.i] == ",":
                self.i += 1
                continue
            break
        # the action is exactly one statement (possibly a BEGIN…END
        # group) — parsed structurally, so nested blocks inside the
        # action are fine; RESIGNAL is legal only in here
        prev = self.in_handler
        self.in_handler = True
        try:
            action = self.parse_statement()
        finally:
            self.in_handler = prev
        action = action if isinstance(action, list) else [action]
        if (
            len(action) == 1
            and isinstance(action[0], Block)
            and not action[0].declares
            and not action[0].exc_clauses
            and not action[0].label
        ):
            # a plain BEGIN…END action group flattens into the clause
            action = action[0].body
        if not action:
            raise ProcParseError(
                f"function {self.fname}: empty {kind} handler action"
            )

        atoms: list[str] = []
        for c in conds:
            cu = re.sub(r"\s+", " ", c.strip()).upper()
            if cu == "SQLEXCEPTION":
                atoms.append("others")
            elif cu == "SQLWARNING":
                raise ProcParseError(
                    f"function {self.fname}: HANDLER FOR SQLWARNING — "
                    "plpgsql EXCEPTION clauses cannot trap warnings"
                )
            elif cu == "NOT FOUND":
                atoms.append("NOT FOUND")
            elif cu.startswith("SQLSTATE"):
                atoms.append(self._sqlstate_cond(c))
            elif re.fullmatch(r"\d+", cu):
                code = MYSQL_ERRNO_SQLSTATE.get(int(cu))
                if code is None:
                    raise ProcParseError(
                        f"function {self.fname}: HANDLER FOR MySQL "
                        f"errno {cu} — outside the well-known errno → "
                        "SQLSTATE table (declare a CONDITION FOR "
                        "SQLSTATE instead)"
                    )
                # through the same validator as literal SQLSTATEs so a
                # class-02 errno (1329 ER_SP_FETCH_NO_DATA) routes to
                # the NOT FOUND machinery — plpgsql EXCEPTION clauses
                # never fire for FETCH-past-end, so a raw SQLSTATE
                # '02000' clause would be a dead arm (silent
                # mistranslation)
                atoms.append(self._sqlstate_cond(f"SQLSTATE '{code}'"))
            else:
                cond = self._lookup_condition(c.strip().lower())
                if cond is None:
                    raise ProcParseError(
                        f"function {self.fname}: HANDLER FOR UNDECLARED "
                        f"condition name {c.strip()!r}"
                    )
                atoms.append(self._sqlstate_cond("SQLSTATE " + cond[0]))

        if "NOT FOUND" in atoms:
            if len(atoms) > 1:
                raise ProcParseError(
                    f"function {self.fname}: NOT FOUND cannot share a "
                    "handler with other conditions here — the FETCH "
                    "IF-NOT-FOUND arm and the EXCEPTION clause are "
                    "different plpgsql mechanisms"
                )
            self._register_not_found(kind, action)
            return
        if "others" in atoms and len(atoms) > 1:
            raise ProcParseError(
                f"function {self.fname}: SQLEXCEPTION combined with "
                "specific conditions in one handler — the SQLSTATEs "
                "are redundant and their precedence is ambiguous"
            )
        cond = " OR ".join(atoms)
        target = (
            self.scope.continue_clauses
            if kind == "CONTINUE"
            else self.scope.exit_clauses
        )
        target.append((cond, action, atoms))

    def _register_not_found(self, kind: str, action: list) -> None:
        if kind != "CONTINUE":
            raise ProcParseError(
                f"function {self.fname}: only CONTINUE HANDLER FOR "
                "NOT FOUND is translatable (an EXIT not-found handler "
                "has no plpgsql analog — SQLSTATE class 02 cannot be "
                "trapped by EXCEPTION clauses)"
            )
        if self.scope.not_found_action is not None:
            raise ProcParseError(
                f"function {self.fname}: multiple handlers for the same "
                "condition (NOT FOUND) in one block"
            )
        if len(action) == 1 and isinstance(action[0], Assign):
            a = action[0]
            lit = _flag_literal(a.expr)
            if lit in ("true", "false"):
                # canonical done-flag: force the variable BOOLEAN
                # (reference :1116-1119) and normalize integer
                # comparisons against it throughout the flag's scope
                self.scope.flag = a.var
                self.scope.not_found_action = [Assign(a.var, lit)]
                self._force_flag_boolean(a.var)
            else:
                # general action (`SET n = n + 1`): emitted verbatim in
                # the FETCH arm; the variable keeps its declared type
                self.scope.not_found_action = [a]
            return
        # round 9: ANY statement list (multi-assignment SET, a
        # BEGIN…END group, LEAVE) — emitted verbatim inside the FETCH's
        # IF NOT FOUND arm. No flag forcing: every assigned variable
        # keeps its declared type, so conditions comparing against it
        # stay consistent.
        self.scope.not_found_action = list(action)

    def _force_flag_boolean(self, var: str) -> None:
        for s in self._scopes():
            for k, (n, _t) in enumerate(s.declares):
                if n == var:
                    raw = s.raw_defaults.get(var)
                    init = _flag_literal(raw) if raw is not None else "false"
                    s.declares[k] = (var, f"BOOLEAN := {init}")
                    return
        raise ProcParseError(
            f"function {self.fname}: NOT FOUND handler flag {var!r} is "
            "not a declared variable"
        )

    def _close_scope(self, body: list) -> tuple[list, list, list]:
        """Validate this block's handlers against enclosing scopes,
        apply its CONTINUE wraps, and return (declares, wrapped body,
        EXCEPTION clauses) — everything the Block/function emitter
        needs.  Precedence guard: MySQL dispatches to the innermost
        scope's matching handler (most-specific within a scope), but an
        ancestor CONTINUE handler's per-statement wrap sits CLOSER to
        the statement than this block's EXCEPTION clause — so any
        overlap between an ancestor (or same-scope ``others``) CONTINUE
        condition and this block's EXIT conditions would invert MySQL's
        dispatch, and refuses instead."""
        sc = self.scope

        seen: set[str] = set()
        for _cond, _a, atoms in sc.continue_clauses + sc.exit_clauses:
            for atom in atoms:
                if atom in seen:
                    raise ProcParseError(
                        f"function {self.fname}: multiple handlers for "
                        f"the same condition ({atom}) in one block "
                        "(MySQL allows one per condition per block)"
                    )
                seen.add(atom)

        def _overlap(c1: str, c2: str) -> bool:
            return c1 == "others" or c2 == "others" or c1 == c2

        for _cond, _a, eatoms in sc.exit_clauses:
            # same-scope: a CONTINUE-others wrap shadows a specific EXIT
            for _c, _aa, catoms in sc.continue_clauses:
                if "others" in catoms and any(e != "others" for e in eatoms):
                    raise ProcParseError(
                        f"function {self.fname}: CONTINUE HANDLER FOR "
                        "SQLEXCEPTION combined with an EXIT handler for "
                        "a specific SQLSTATE — the per-statement wrap "
                        "would shadow the more-specific EXIT handler "
                        "(MySQL dispatches to the specific one)"
                    )
            # ancestor CONTINUE vs this block's EXIT: any overlap would
            # let the (closer) wrap steal what MySQL gives the inner
            # EXIT handler
            anc = sc.parent
            while anc is not None:
                for _c, _aa, catoms in anc.continue_clauses:
                    if any(
                        _overlap(ca, ea) for ca in catoms for ea in eatoms
                    ):
                        raise ProcParseError(
                            f"function {self.fname}: an outer-block "
                            "CONTINUE handler overlaps an inner-block "
                            "EXIT handler — the per-statement wrap "
                            "would shadow the inner handler (MySQL "
                            "dispatches to the innermost scope first)"
                        )
                anc = anc.parent

        # specific-SQLSTATE clauses first (stable within each group) so
        # plpgsql's first-match dispatch = MySQL's most-specific-wins
        cont = [
            (cond, action)
            for cond, action, atoms in sorted(
                sc.continue_clauses, key=lambda h: "others" in h[2]
            )
        ]
        exits = [
            (cond, action)
            for cond, action, atoms in sorted(
                sc.exit_clauses, key=lambda h: "others" in h[2]
            )
        ]
        if cont:
            body = _wrap_continue(body, cont)
        return sc.declares, body, exits

    # -- grammar -----------------------------------------------------------
    def parse_root(self) -> tuple[list, list, list]:
        """The function body itself (outer BEGIN/END already stripped):
        declare section, then statements to EOF."""
        self.scope = _Scope(parent=None)
        self._parse_declares()
        stmts, _ = self.parse_block()
        declares, stmts, exits = self._close_scope(stmts)
        self.scope = None
        return declares, stmts, exits

    def parse_block(self, *terminators: re.Pattern) -> tuple[list, re.Pattern | None]:
        """Statements until one of ``terminators`` (consumed) or EOF."""
        stmts: list = []
        while True:
            self._skip_ws()
            if self.i >= len(self.s):
                if terminators:
                    raise ProcParseError(
                        f"function {self.fname}: unterminated block"
                    )
                return stmts, None
            for t in terminators:
                mo = self._at(t)
                if mo:
                    self.i = mo.end()
                    return stmts, t
            st = self.parse_statement()
            # a multi-assignment SET parses to a list of Assigns
            stmts.extend(st) if isinstance(st, list) else stmts.append(st)

    def parse_statement(self):
        self._skip_ws()
        label = None
        lbl = self._at(_LABEL)
        if lbl:
            label = lbl.group(1).lower()   # kept as plpgsql <<label>>
            self.i = lbl.end()
            self._skip_ws()

        if self._at(_kw("IF")):
            return self._parse_if()
        if self._at(_kw("LOOP")):
            self._eat(_kw("LOOP"), "LOOP")
            body, _ = self.parse_block(_T_END_LOOP)
            self._finish_compound()
            return Loop(body, label)
        if self._at(_kw("REPEAT")):
            self._eat(_kw("REPEAT"), "REPEAT")
            body, term = self.parse_block(_T_UNTIL)
            cond = self._until_kw(_T_END_REPEAT, "END REPEAT")
            self._finish_compound()
            cond_pg = self._rewrite(cond)
            if cond_pg and _RC_EXPR.search(cond_pg):
                # round 11 lift of the batch-purge idiom (`REPEAT
                # DELETE … LIMIT n; UNTIL ROW_COUNT() = 0`): UNTIL
                # evaluates AFTER the body every iteration, so when the
                # body's LAST statement is the DML the condition
                # observes, a per-iteration GET DIAGNOSTICS right after
                # it re-observes at the identical point. Any other
                # last-statement shape keeps the refusal — MySQL's
                # ROW_COUNT() after non-DML is engine-defined noise no
                # single hoist reproduces.
                if body and isinstance(body[-1], Dml):
                    var = f"__rc{self._rc_n}" if self._rc_n else "__rc"
                    self._rc_n += 1
                    self._declare(var, "BIGINT", None)
                    body = body + [RowCountInto(var)]
                    cond_pg = _RC_EXPR.sub(var, cond_pg)
                else:
                    raise ProcParseError(
                        f"function {self.fname}: ROW_COUNT() in an "
                        "UNTIL condition translates only when the loop "
                        "body's last statement is the INSERT/UPDATE/"
                        "DELETE it observes (got "
                        f"{type(body[-1]).__name__ if body else 'empty'}"
                        ") — move the DML last or assign ROW_COUNT() "
                        "inside the body"
                    )
            return RepeatUntil(body, cond_pg, label)
        if self._at(_kw("WHILE")):
            self._eat(_kw("WHILE"), "WHILE")
            cond = self._until_kw(_T_DO, "DO after WHILE condition")
            body, _ = self.parse_block(_T_END_WHILE)
            self._finish_compound()
            return While(
                self._refuse_loop_row_count(self._rewrite(cond), "WHILE"),
                body,
                label,
            )
        if self._at(_kw("BEGIN")):
            # nested compound with its own scope: declare section first
            # (exactly where MySQL requires it), then statements; the
            # block keeps its declarations and EXIT handlers as its own
            # plpgsql DECLARE / EXCEPTION sections
            self._eat(_kw("BEGIN"), "BEGIN")
            self.scope = _Scope(parent=self.scope)
            self._parse_declares()
            body, _ = self.parse_block(_T_END_BLOCK)
            self._finish_compound()
            declares, body, exits = self._close_scope(body)
            self.scope = self.scope.parent
            return Block(body, label, declares, exits)
        if self._at(_kw("CASE")):
            return self._parse_case()

        raw = self._until_semicolon()
        return self._parse_simple(raw)

    def _parse_case(self):
        """CASE statement, both forms: ``CASE WHEN cond THEN stmts …``
        (searched) and ``CASE expr WHEN val THEN stmts …`` (value);
        terminated by ``END CASE``. Branch bodies recurse through
        parse_block, so nesting is structural."""
        self._eat(_kw("CASE"), "CASE")
        subject = self._until_kw(_T_WHEN, "WHEN after CASE")
        subject_pg = self._rewrite(subject) if subject else None
        branches: list[tuple[str | None, list]] = []
        while True:
            cond = self._until_kw(_T_THEN, "THEN after WHEN")
            body, term = self.parse_block(_T_WHEN, _T_ELSE, _T_END_CASE)
            branches.append((self._rewrite(cond), body))
            if term is _T_WHEN:
                continue
            if term is _T_ELSE:
                ebody, _ = self.parse_block(_T_END_CASE)
                branches.append((None, ebody))
            break
        self._finish_compound()
        # CASE evaluates its subject once and its WHEN heads in order
        # with nothing executing between them — one hoist is sound
        flat = [subject_pg] + [c for c, _ in branches]
        hoisted, prelude = self._hoist_row_count(flat)
        if prelude:
            subject_pg = hoisted[0]
            branches = [
                (h, b) for h, (_, b) in zip(hoisted[1:], branches)
            ]
            return prelude + [CaseStmt(subject_pg, branches)]
        return CaseStmt(subject_pg, branches)

    def _finish_compound(self) -> None:
        """Consume the optional trailing label and the ``;`` after
        END LOOP/REPEAT/WHILE/IF (labels are dropped, reference :1085)."""
        self._skip_ws()
        mo = re.compile(r"(\w+)\s*;").match(self.s, self.i)
        if mo:
            self.i = mo.end()
            return
        if self.i < len(self.s) and self.s[self.i] == ";":
            self.i += 1

    def _parse_if(self):
        self._eat(_kw("IF"), "IF")
        branches: list[tuple[str | None, list]] = []
        cond = self._until_kw(_T_THEN, "THEN after IF condition")
        while True:
            body, term = self.parse_block(_T_ELSEIF, _T_ELSE, _T_END_IF)
            branches.append((self._rewrite(cond) if cond else None, body))
            if term is _T_ELSEIF:
                cond = self._until_kw(_T_THEN, "THEN after ELSEIF")
                continue
            if term is _T_ELSE:
                cond = None
                continue
            break
        self._finish_compound()
        # IF/ELSEIF heads evaluate in order with nothing executing
        # between them — one hoist before the IF is sound
        hoisted, prelude = self._hoist_row_count([c for c, _ in branches])
        if prelude:
            return prelude + [
                If([(h, b) for h, (_, b) in zip(hoisted, branches)])
            ]
        return If(branches)

    def _parse_simple(self, raw: str):
        up = raw.upper()
        if up.startswith("SET "):
            # MySQL multi-assignment `SET a = 1, b = a` — split on
            # TOP-LEVEL commas only (literals are masked; parens guard
            # function-call commas) into sequential assignments, the
            # order MySQL itself evaluates them in
            out: list = []
            flags = self._flags_in_scope()
            for piece in _split_top_level(raw[3:]):
                # dotted targets are trigger-row fields (SET NEW.col = …)
                mo = re.match(r"\s*(\w+(?:\.\w+)?)\s*:?=\s*(.+)$", piece,
                              re.S)
                if not mo:
                    raise ProcParseError(
                        f"function {self.fname}: cannot parse SET "
                        f"assignment {piece.strip()!r} in {raw!r}"
                    )
                var = mo.group(1).lower()
                raw_expr = mo.group(2).strip()
                if re.fullmatch(r"ROW_COUNT\s*\(\s*\)", raw_expr, re.I):
                    out.append(RowCountInto(var))
                    continue
                (expr,), prelude = self._hoist_row_count(
                    [self._rewrite(raw_expr)]
                )
                out.extend(prelude)
                if var in flags:
                    expr = _flag_literal(expr)
                out.append(Assign(var, expr))
            return out if len(out) > 1 else out[0]
        if up.startswith(("INSERT ", "UPDATE ", "DELETE ")):
            if re.search(r"(?i)\bON\s+DUPLICATE\s+KEY\s+UPDATE\b", raw):
                # PG's ON CONFLICT DO UPDATE needs an explicit conflict
                # target (the unique key), which the routine builder has
                # no catalog access to — and MySQL fires on ANY unique
                # key. A guessed target would mistranslate; refuse with
                # the rewrite named (same contract as REPLACE INTO).
                raise ProcParseError(
                    f"function {self.fname}: INSERT … ON DUPLICATE KEY "
                    "UPDATE has no catalog-free PostgreSQL analog — "
                    "rewrite as INSERT … ON CONFLICT (<unique cols>) "
                    "DO UPDATE SET … (EXCLUDED.* replaces VALUES())"
                )
            if up.startswith("INSERT IGNORE"):
                # MySQL INSERT IGNORE downgrades EVERY error to a
                # warning (dup keys, but also NOT NULL and FK
                # violations, with value adjustment) — PG's ON CONFLICT
                # DO NOTHING covers only the dup-key class, so a silent
                # swap would change error behavior.
                raise ProcParseError(
                    f"function {self.fname}: INSERT IGNORE ignores all "
                    "error classes (not just duplicate keys) — rewrite "
                    "as INSERT … ON CONFLICT DO NOTHING if dup-key "
                    "skip is the intent"
                )
            raw = self._rewrite_dml_limit(raw, up)
            (sql,), prelude = self._hoist_row_count([self._rewrite(raw)])
            return prelude + [Dml(sql)] if prelude else Dml(sql)
        if up.startswith(("CREATE TEMPORARY TABLE", "DROP TEMPORARY TABLE")):
            return self._temp_table(raw, up)
        if up.startswith("REPLACE "):
            raise ProcParseError(
                f"function {self.fname}: REPLACE INTO has "
                "delete-then-insert semantics (triggers, FK cascades) "
                "that INSERT … ON CONFLICT does not reproduce — "
                "rewrite the body against PostgreSQL upsert explicitly"
            )
        if up.startswith("SELECT"):
            into = re.search(r"\s+INTO\s+([\w\s,]+?)(?=\s+FROM\b|$)", raw, re.I)
            if not into:
                if self.kind == "procedure":
                    # MySQL procedures stream a bare SELECT to the
                    # client as a result set; plpgsql's idiom is an
                    # INOUT refcursor the builder appends (round 9) —
                    # the caller FETCHes from it after CALL
                    return ResultSetSelect(self._rewrite(raw))
                raise ProcParseError(
                    f"function {self.fname}: SELECT without INTO in a "
                    "procedural body"
                )
            vars_ = [v.strip().lower() for v in into.group(1).split(",")]
            sel = raw[: into.start()] + raw[into.end() :]
            (sql,), prelude = self._hoist_row_count(
                [self._rewrite(sel.strip())]
            )
            node = SelectInto(sql, vars_, self._not_found_action())
            return prelude + [node] if prelude else node
        if up.startswith("RETURN"):
            if self.kind == "trigger":
                # MySQL trigger bodies have no RETURN statement at all —
                # one here means the input isn't a MySQL trigger body
                raise ProcParseError(
                    f"function {self.fname}: RETURN inside a trigger "
                    "body (MySQL triggers have no RETURN; the emitter "
                    "adds the plpgsql RETURN NEW/OLD itself)"
                )
            tail = raw[6:].strip()
            if not tail:
                # bare `RETURN;` — early exit, legal in procedures only
                # (MySQL functions must return a value; so must plpgsql)
                if self.kind != "procedure":
                    raise ProcParseError(
                        f"function {self.fname}: RETURN without a value "
                        "in a function body"
                    )
                return Return(None)
            (expr,), prelude = self._hoist_row_count(
                [self._rewrite(tail)]
            )
            return prelude + [Return(expr)] if prelude else Return(expr)
        if up.startswith("CALL "):
            # plpgsql procedures CALL each other natively — passthrough
            # with the expression rewrite, like body DML
            return Dml(self._rewrite(raw))
        mo = re.match(r"LEAVE\s*(\w+)?$", raw, re.I)
        if mo:
            return Leave(mo.group(1).lower() if mo.group(1) else None)
        mo = re.match(r"ITERATE\s*(\w+)?$", raw, re.I)
        if mo:
            return Iterate(mo.group(1).lower() if mo.group(1) else None)
        mo = re.match(r"OPEN\s+(\w+)$", raw, re.I)
        if mo:
            name = mo.group(1).lower()
            sel = self._lookup_cursor(name)
            if sel is None:
                raise ProcParseError(
                    f"function {self.fname}: OPEN of undeclared cursor "
                    f"{name!r}"
                )
            return OpenCursor(name, sel)
        mo = re.match(r"FETCH\s+(?:NEXT\s+FROM\s+)?(\w+)\s+INTO\s+(.+)$",
                      raw, re.I | re.S)
        if mo:
            name = mo.group(1).lower()
            if self._lookup_cursor(name) is None:
                raise ProcParseError(
                    f"function {self.fname}: FETCH from undeclared cursor "
                    f"{name!r}"
                )
            vars_ = [v.strip().lower() for v in mo.group(2).split(",")]
            return Fetch(name, vars_, self._not_found_action())
        mo = re.match(r"CLOSE\s+(\w+)$", raw, re.I)
        if mo:
            return CloseCursor(mo.group(1).lower())
        mo = re.match(
            r"GET\s+(?:CURRENT\s+|STACKED\s+)?DIAGNOSTICS\s+(.+)$",
            raw, re.I | re.S,
        )
        if mo:
            return self._parse_get_diagnostics(mo.group(1).strip())
        mo = re.match(
            r"SIGNAL\s+SQLSTATE\s+(?:VALUE\s+)?(\x00L\d+\x00|'[^'\n]*')"
            r"\s*(?:SET\s+(.+))?$",
            raw, re.I | re.S,
        )
        if mo:
            return self._parse_signal(mo.group(1), mo.group(2))
        mo = re.match(r"RESIGNAL\s*(.*)$", raw, re.I | re.S)
        if mo:
            if not self.in_handler:
                raise ProcParseError(
                    f"function {self.fname}: RESIGNAL outside a handler "
                    "action (illegal in MySQL too; SIGNAL-like "
                    "statements elsewhere are not translatable)"
                )
            rest = mo.group(1).strip()
            if not rest:
                return Resignal()
            # RESIGNAL SQLSTATE 'xxxxx' [SET …] (round 9): raise the
            # NEW condition; attributes not SET are taken from the
            # condition being handled (MySQL's diagnostics-area rule),
            # so the message defaults to plpgsql's SQLERRM — the
            # handler-scope variable holding the original message.
            sm = re.match(
                r"SQLSTATE\s+(?:VALUE\s+)?(\x00L\d+\x00|'[^'\n]*')"
                r"\s*(?:SET\s+(.+))?$",
                rest, re.I | re.S,
            )
            if sm:
                sig = self._parse_signal(sm.group(1), sm.group(2))
                if sig.message is None:
                    sig.message = "SQLERRM"
                return sig
            # RESIGNAL SET MESSAGE_TEXT = … [, MYSQL_ERRNO = …]
            # (round 9): re-raise the SAME condition with modified
            # attributes — ERRCODE = SQLSTATE (the handler-scope
            # variable carrying the code being handled) keeps the
            # condition identity while the message/hint change.
            sm = re.match(r"SET\s+(.+)$", rest, re.I | re.S)
            if sm:
                message, errno = self._parse_signal_items(sm.group(1))
                if message is None:
                    message = "SQLERRM"
                return Signal("SQLSTATE", message, errno)
            raise ProcParseError(
                f"function {self.fname}: unparseable RESIGNAL form "
                f"{raw[:60]!r} (bare, `RESIGNAL SQLSTATE 'xxxxx' "
                "[SET …]` and `RESIGNAL SET …` translate)"
            )
        mo = re.match(r"SIGNAL\s+(\w+)\s*(?:SET\s+(.+))?$", raw, re.I | re.S)
        if mo:
            cond = self._lookup_condition(mo.group(1).lower())
            if cond is None:
                raise ProcParseError(
                    f"function {self.fname}: SIGNAL with UNDECLARED "
                    f"condition name {mo.group(1)!r} (names declared "
                    "`CONDITION FOR SQLSTATE` resolve through the "
                    "scope chain)"
                )
            lit, from_errno = cond
            if from_errno:
                # MySQL itself rejects this (ER_SIGNAL_BAD_CONDITION_TYPE:
                # SIGNAL/RESIGNAL can only use a CONDITION defined with
                # SQLSTATE) — translating it would run code MySQL refuses
                raise ProcParseError(
                    f"function {self.fname}: SIGNAL {mo.group(1)!r} — "
                    "the condition is declared FOR a MySQL errno, and "
                    "MySQL only allows SIGNAL on SQLSTATE-defined "
                    "conditions"
                )
            return self._parse_signal(lit, mo.group(2))
        if re.match(r"SIGNAL\b", raw, re.I):
            raise ProcParseError(
                f"function {self.fname}: only `SIGNAL SQLSTATE 'xxxxx' "
                f"[SET MESSAGE_TEXT = …]` or a declared condition name "
                f"is translatable, got {raw[:60]!r}"
            )
        raise ProcParseError(
            f"function {self.fname}: unsupported statement {raw[:60]!r}"
        )

    def _parse_signal(self, lit_raw: str, items_raw: str | None) -> Signal:
        """``SIGNAL SQLSTATE '45000' SET MESSAGE_TEXT = …[, MYSQL_ERRNO
        = …]`` → RAISE EXCEPTION USING ERRCODE/MESSAGE (errno kept in
        HINT — PG has no errno field). The reference has no SIGNAL pass
        at all (bodies containing it fall into sync_functions.go's
        generic regex path and emit plpgsql that fails at CREATE time)."""
        errcode = self.rewrite_user(lit_raw).strip()
        if not re.fullmatch(r"'[0-9A-Za-z]{5}'", errcode):
            raise ProcParseError(
                f"function {self.fname}: SIGNAL SQLSTATE value "
                f"{errcode!r} is not a 5-character SQLSTATE literal"
            )
        if errcode[1:3] in ("00", "02"):
            raise ProcParseError(
                f"function {self.fname}: SIGNAL SQLSTATE class "
                f"{errcode[1:3]!r} (success/not-found) cannot "
                "be raised as a plpgsql exception"
            )
        message, errno = self._parse_signal_items(items_raw)
        if errcode[1:3] == "01":
            # MySQL: class-01 SIGNAL adds a warning and execution
            # CONTINUES — plpgsql RAISE WARNING has exactly those
            # semantics (round 9; class-01 used to refuse)
            return Signal(errcode, message, errno, level="WARNING")
        return Signal(errcode, message, errno)

    def _temp_table(self, raw: str, up: str):
        """``CREATE TEMPORARY TABLE`` / ``DROP TEMPORARY TABLE`` inside
        a routine body (round 9) — the staging idiom real MySQL
        procedures use constantly. PG temp tables are session-scoped
        like MySQL's, so the statements pass through as body DML after
        the column types run the C86 matrix (one Dml per emitted
        statement: CREATE TEMP TABLE + any per-KEY CREATE INDEX).
        Shapes the converter cannot express (FKs on temp tables,
        unparseable clauses) refuse visibly."""
        if up.startswith("DROP"):
            dm = re.match(
                r"DROP\s+TEMPORARY\s+TABLE\s+(IF\s+EXISTS\s+)?"
                r"`?(\w+)`?\s*$",
                raw, re.I,
            )
            if not dm:
                raise ProcParseError(
                    f"function {self.fname}: unparseable DROP TEMPORARY "
                    f"TABLE {raw[:60]!r} (one table per statement)"
                )
            ine = "IF EXISTS " if dm.group(1) else ""
            return Dml(f"DROP TABLE {ine}{dm.group(2).lower()}")
        if self.unmask is None:
            raise ProcParseError(
                f"function {self.fname}: CREATE TEMPORARY TABLE needs "
                "the literal-unmask seam (builder-driven parses only)"
            )
        from mysql2pg_spark.sources.dumpfile import convert_temp_table_stmt

        try:
            stmts = convert_temp_table_stmt(self.unmask(raw))
        except ValueError as e:
            raise ProcParseError(f"function {self.fname}: {e}") from e
        nodes = [Dml(s) for s in stmts]
        return nodes if len(nodes) > 1 else nodes[0]

    def _parse_get_diagnostics(self, rest: str):
        """``GET DIAGNOSTICS`` statement forms (round 9):

        * statement area — ``GET DIAGNOSTICS v = ROW_COUNT`` → the same
          :class:`RowCountInto` the ``SET v = ROW_COUNT()`` path builds;
        * condition area — ``GET DIAGNOSTICS CONDITION 1 v =
          MESSAGE_TEXT, w = RETURNED_SQLSTATE`` inside a handler →
          ``GET STACKED DIAGNOSTICS`` (plpgsql's handler
          introspection). Condition numbers other than 1 refuse (PG
          exposes only the condition being handled), MYSQL_ERRNO
          refuses (no PG analog), and the condition form outside a
          handler refuses (PG errors there; MySQL returns blanks)."""
        cm = re.match(r"CONDITION\s+(\S+)\s+(.+)$", rest, re.I | re.S)
        if cm:
            if cm.group(1).strip() != "1":
                raise ProcParseError(
                    f"function {self.fname}: GET DIAGNOSTICS CONDITION "
                    f"{cm.group(1)} — plpgsql exposes only the "
                    "condition being handled (CONDITION 1)"
                )
            if not self.in_handler:
                raise ProcParseError(
                    f"function {self.fname}: GET DIAGNOSTICS CONDITION "
                    "outside a handler action — plpgsql's stacked "
                    "diagnostics area exists only inside a handler"
                )
            items: list[tuple[str, str]] = []
            for piece in _split_top_level(cm.group(2)):
                im = re.match(r"\s*(\w+)\s*=\s*(\w+)\s*$", piece)
                if not im:
                    raise ProcParseError(
                        f"function {self.fname}: cannot parse "
                        f"diagnostics item {piece.strip()!r}"
                    )
                var, item = im.group(1).lower(), im.group(2).upper()
                if item not in ("MESSAGE_TEXT", "RETURNED_SQLSTATE"):
                    raise ProcParseError(
                        f"function {self.fname}: diagnostics item "
                        f"{item} has no plpgsql analog (MESSAGE_TEXT "
                        "and RETURNED_SQLSTATE translate)"
                    )
                items.append((var, item))
            return DiagnosticsInto(items)
        im = re.match(r"(\w+)\s*=\s*ROW_COUNT\s*$", rest, re.I)
        if im:
            return RowCountInto(im.group(1).lower())
        raise ProcParseError(
            f"function {self.fname}: unsupported GET DIAGNOSTICS form "
            f"{rest[:50]!r} (v = ROW_COUNT and CONDITION 1 "
            "MESSAGE_TEXT / RETURNED_SQLSTATE translate)"
        )

    def _parse_signal_items(
        self, items_raw: str | None
    ) -> tuple[str | None, str | None]:
        """The ``SET item = expr, …`` list shared by SIGNAL and
        RESIGNAL → (message, errno), either None when absent."""
        message: str | None = None
        errno: str | None = None
        if items_raw:
            for item in _split_top_level(items_raw):
                im = re.match(r"\s*(\w+)\s*=\s*(.+)$", item, re.S)
                if not im:
                    raise ProcParseError(
                        f"function {self.fname}: cannot parse SIGNAL "
                        f"item {item.strip()!r}"
                    )
                key = im.group(1).upper()
                if key == "MESSAGE_TEXT":
                    message = self._rewrite(im.group(2).strip())
                elif key == "MYSQL_ERRNO":
                    errno = self._rewrite(im.group(2).strip())
                else:
                    raise ProcParseError(
                        f"function {self.fname}: SIGNAL item {key} has "
                        "no plpgsql analog (only MESSAGE_TEXT / "
                        "MYSQL_ERRNO translate)"
                    )
        return message, errno


def _split_top_level(text: str) -> list[str]:
    """Split on commas outside parentheses (literals are already masked,
    so string commas cannot appear)."""
    parts: list[str] = []
    depth = 0
    start = 0
    for i, ch in enumerate(text):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(text[start:i])
            start = i + 1
    parts.append(text[start:])
    return parts


def _flag_literal(expr: str) -> str:
    """1/0/TRUE/FALSE assigned to the (boolean-forced) handler flag."""
    v = expr.strip().upper()
    if v in ("1", "TRUE"):
        return "true"
    if v in ("0", "FALSE"):
        return "false"
    return expr


def normalize_flag_comparisons(expr: str, flag: str) -> str:
    """The handler flag is forced BOOLEAN (reference :1116-1119 forces
    ``done`` INT→BOOLEAN) so integer comparisons against it must become
    boolean tests — ``done = 1``→``done``, ``done = 0``→``NOT done``.
    The reference's flat replaces skip this, leaving
    ``boolean = integer`` type errors in its emitted plpgsql."""
    out = re.sub(
        rf"\b{flag}\s*(?:=\s*1|=\s*TRUE|<>\s*0|!=\s*0)\b",
        flag, expr, flags=re.I,
    )
    out = re.sub(
        rf"\b{flag}\s*(?:=\s*0|=\s*FALSE|<>\s*1|!=\s*1)\b",
        f"NOT {flag}", out, flags=re.I,
    )
    return out


def parse_procedural(
    body: str,
    fname: str,
    rewrite_expr,
    pg_type,
    kind: str = "function",
    unmask=None,
) -> ProceduralBody:
    """Masked MySQL body (BEGIN/END stripped) → :class:`ProceduralBody`.

    ``rewrite_expr(masked_text) -> str`` converts expression/SELECT text
    to PG dialect (including unmasking); ``pg_type(mysql_type) -> str``
    is the C86 type matrix.

    Each block's declarations (variables, conditions, cursors,
    handlers) parse inline at block start — MySQL's required position —
    into per-block scopes, so nested blocks keep their own plpgsql
    DECLARE sections (block-entry DEFAULT re-initialization, legal
    shadowing) and their own EXCEPTION clauses (block-scoped handlers).
    """
    p = _Parser(body, fname, rewrite_expr, pg_type, kind=kind,
                unmask=unmask)
    declares, stmts, exit_clauses = p.parse_root()
    if kind == "function" and not any(_has_return(s) for s in stmts):
        raise ProcParseError(f"function {fname}: body has no RETURN")
    return ProceduralBody(declares, stmts, exit_clauses)


def _wrap_continue(stmts: list, clauses: list) -> list:
    """CONTINUE HANDLER FOR SQLEXCEPTION: guard each raise-capable
    statement with its own ``BEGIN … EXCEPTION`` sub-block so execution
    resumes at the NEXT statement — MySQL's CONTINUE semantics, with the
    sub-block subtransaction matching MySQL's statement-level rollback
    of the failing statement. Condition-bearing compounds (IF / CASE /
    WHILE / REPEAT) are additionally wrapped as a unit: an error raised
    by the condition itself aborts the whole compound and resumes after
    it, which is where MySQL resumes too (the CASE wrap also catches
    plpgsql's CASE_NOT_FOUND, mirroring MySQL's handleable "Case not
    found" error). ``LEAVE``/``ITERATE`` cannot raise and must stay
    unwrapped so their loop targeting is untouched (an unlabeled EXIT
    never matches a BEGIN block, but keeping them bare is simplest).
    A statement already guarded by an inner block's handlers (a
    TryWrap) is wrapped AROUND, so the inner clause dispatches first —
    MySQL's innermost-scope-first rule."""
    out: list = []
    for st in stmts:
        if isinstance(st, (Leave, Iterate, RowCountInto, DiagnosticsInto)):
            out.append(st)
        elif isinstance(st, Block):
            out.append(
                Block(_wrap_continue(st.body, clauses), st.label,
                      st.declares, st.exc_clauses)
            )
        elif isinstance(st, Loop):
            out.append(
                Loop(_wrap_continue(st.body, clauses), st.label)
            )
        elif isinstance(st, If):
            out.append(TryWrap(
                [If([(c, _wrap_continue(b, clauses))
                     for c, b in st.branches])],
                clauses,
            ))
        elif isinstance(st, CaseStmt):
            out.append(TryWrap(
                [CaseStmt(st.subject,
                          [(c, _wrap_continue(b, clauses))
                           for c, b in st.branches])],
                clauses,
            ))
        elif isinstance(st, While):
            out.append(TryWrap(
                [While(st.cond, _wrap_continue(st.body, clauses),
                       st.label)],
                clauses,
            ))
        elif isinstance(st, RepeatUntil):
            out.append(TryWrap(
                [RepeatUntil(_wrap_continue(st.body, clauses),
                             st.until, st.label)],
                clauses,
            ))
        else:
            out.append(TryWrap([st], clauses))
    return out


def _has_return(st) -> bool:
    if isinstance(st, Return):
        return True
    if isinstance(st, (If, CaseStmt)):
        return any(_has_return(s) for _, b in st.branches for s in b)
    if isinstance(st, (Loop, While, RepeatUntil, Block, TryWrap)):
        return any(_has_return(s) for s in st.body)
    return False
