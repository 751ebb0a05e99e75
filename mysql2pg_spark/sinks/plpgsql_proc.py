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

Supported statements: ``SET``, ``SELECT … INTO``, ``RETURN``,
``IF/ELSEIF/ELSE``, ``LOOP``, ``REPEAT…UNTIL``, ``WHILE``,
``LEAVE``/``ITERATE`` (labels are KEPT as plpgsql ``<<label>>`` /
``EXIT label`` — the reference strips them at :1085, which silently
retargets a multi-level ``LEAVE outer`` at the inner loop),
``OPEN``/``FETCH``/``CLOSE`` cursors, nested ``BEGIN…END`` blocks
(round 7 — DECLAREs are scope-lifted to the function's DECLARE section
the way the reference's flat pass implicitly does at :1100-1150;
conflicting same-name re-declarations raise instead of silently
shadowing), the CASE *statement* (both searched ``CASE WHEN … THEN
stmts`` and value ``CASE expr WHEN v THEN stmts`` forms → the plpgsql
CASE statement, whose no-match/no-ELSE error matches MySQL's "Case not
found"), and two handler shapes:

* ``DECLARE CONTINUE HANDLER FOR NOT FOUND SET flag = 1`` — the flag
  is forced to BOOLEAN (the reference does the same for ``done``
  variables, :1116-1119) and integer comparisons against it
  (``done = 1``, ``UNTIL done = 1``) are rewritten to boolean form —
  the step the reference's flat replace misses, which leaves
  ``boolean = integer`` type errors in its output.
* ``DECLARE EXIT HANDLER FOR SQLEXCEPTION <action>`` (round 7, the
  second-most-common real-world handler; the reference strips handlers
  wholesale at :1086) — the action (a single ``SET``/``RETURN``
  statement or a ``BEGIN…END`` group) becomes the function block's
  ``EXCEPTION WHEN others THEN`` clause, which is plpgsql's native
  exit-handler semantics: abort the block's remaining statements, run
  the handler.
* ``DECLARE EXIT/CONTINUE HANDLER FOR SQLSTATE 'xxxxx' <action>``
  (round 7) — same shapes as the SQLEXCEPTION forms but with
  ``EXCEPTION WHEN SQLSTATE 'xxxxx' THEN``, exactly as narrow as
  MySQL's handler (round 6 refused these because lifting them to
  ``WHEN others`` would have widened what they catch; emitting the
  specific SQLSTATE removes the widening). Classes 00/01/02
  (success/warning/not-found) still refuse — plpgsql EXCEPTION clauses
  cannot trap them.
* ``DECLARE err CONDITION FOR SQLSTATE 'xxxxx'`` (round 7) — named
  conditions resolve to their SQLSTATE before handler/SIGNAL parsing,
  so ``SIGNAL err`` and ``HANDLER FOR err`` translate through the
  SQLSTATE paths above. A condition declared for a bare MySQL errno
  has no SQLSTATE to map and refuses.
* ``SIGNAL SQLSTATE 'xxxxx' [SET MESSAGE_TEXT = …, MYSQL_ERRNO = …]``
  (round 7) → ``RAISE EXCEPTION USING ERRCODE = 'xxxxx'[, MESSAGE =
  …][, HINT = 'MYSQL_ERRNO …']`` — the validation-raise idiom real
  MySQL functions use; the errno rides in HINT because PG has no errno
  field (dropping it silently would be lossy). The reference has no
  SIGNAL pass at all.
* ``DECLARE CONTINUE HANDLER FOR SQLEXCEPTION <action>`` (round 7,
  resume-after-error) — every raise-capable statement is wrapped in its
  own ``BEGIN … EXCEPTION WHEN others THEN <action>; END`` sub-block.
  A plpgsql sub-block with an EXCEPTION clause is a subtransaction that
  rolls back only the failing statement's work — the same
  statement-level atomicity MySQL gives the failing statement before
  running a CONTINUE handler — and control resumes after the sub-block,
  i.e. at the next statement, which is exactly MySQL's CONTINUE. An
  error inside a condition (``WHILE``/``IF``/``CASE`` heads) aborts the
  whole compound and resumes after it, so condition-bearing compounds
  are wrapped as a unit on top of their individually-wrapped bodies.

Also handled (round 7): MySQL's multi-assignment ``SET a = 1, b = a``
splits — paren-aware, at the top level only — into sequential plpgsql
assignments (``a := 1; b := a;``; MySQL evaluates left-to-right too),
and comma-list declarations ``DECLARE a, b INT DEFAULT 0`` become one
declaration per name. Both previously mis-parsed (the single-var
regexes silently emitted ``a := 1, b = a;`` — invalid plpgsql).
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


@dataclass
class Return:
    expr: str


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
    not_found_flag: str | None       # handler flag to set on exhaustion


@dataclass
class CloseCursor:
    name: str


@dataclass
class Block:
    """Nested ``BEGIN…END`` compound (DECLAREs already scope-lifted)."""

    body: list
    label: str | None = None


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


@dataclass
class TryWrap:
    """One statement (or condition-bearing compound) guarded by the
    function's CONTINUE handlers: emitted as a ``BEGIN … EXCEPTION WHEN
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
        elif isinstance(st, Return):
            out.append(f"{pad}RETURN {st.expr};")
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
            if st.not_found_flag:
                out.append(
                    f"{pad}IF NOT FOUND THEN "
                    f"{st.not_found_flag} := true; END IF;"
                )
        elif isinstance(st, CloseCursor):
            out.append(f"{pad}CLOSE {st.name};")
        elif isinstance(st, Block):
            if st.label:
                out.append(f"{pad}<<{st.label}>>")
            out.append(f"{pad}BEGIN")
            out.append(emit_statements(st.body, indent + 1))
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
                f"{pad}RAISE EXCEPTION USING " + ", ".join(using) + ";"
            )
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


class _Parser:
    """Recursive descent over the masked body text (literals are already
    ``\\x00L<n>\\x00`` placeholders, so ``;`` and keywords inside strings
    cannot confuse statement boundaries)."""

    def __init__(self, text: str, fname: str, rewrite, flag: str | None,
                 cursors: dict[str, str]):
        self.s = text
        self.i = 0
        self.fname = fname
        self.rewrite = rewrite       # MySQL expr (masked) → PG expr
        self.flag = flag             # NOT FOUND handler flag, if any
        self.cursors = cursors       # cursor name → PG select

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
        CASE-aware (round 7): a CASE *expression* inside a control-flow
        condition nests THEN/ELSE/END keywords, so the scan skips
        balanced ``CASE…END`` spans instead of mis-splitting on the
        first keyword hit (round 6 rejected these conditions outright)."""
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

    # -- grammar -----------------------------------------------------------
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
            return RepeatUntil(body, self.rewrite(cond), label)
        if self._at(_kw("WHILE")):
            self._eat(_kw("WHILE"), "WHILE")
            cond = self._until_kw(_T_DO, "DO after WHILE condition")
            body, _ = self.parse_block(_T_END_WHILE)
            self._finish_compound()
            return While(self.rewrite(cond), body, label)
        if self._at(_kw("BEGIN")):
            # nested compound: DECLAREs were scope-lifted by
            # parse_procedural's extraction passes, so only statements
            # remain inside
            self._eat(_kw("BEGIN"), "BEGIN")
            body, _ = self.parse_block(_T_END_BLOCK)
            self._finish_compound()
            return Block(body, label)
        if self._at(_kw("CASE")):
            return self._parse_case()

        raw = self._until_semicolon()
        return self._parse_simple(raw)

    def _parse_case(self) -> CaseStmt:
        """CASE statement, both forms: ``CASE WHEN cond THEN stmts …``
        (searched) and ``CASE expr WHEN val THEN stmts …`` (value);
        terminated by ``END CASE``. Branch bodies recurse through
        parse_block, so nesting is structural."""
        self._eat(_kw("CASE"), "CASE")
        subject = self._until_kw(_T_WHEN, "WHEN after CASE")
        subject_pg = self.rewrite(subject) if subject else None
        branches: list[tuple[str | None, list]] = []
        while True:
            cond = self._until_kw(_T_THEN, "THEN after WHEN")
            body, term = self.parse_block(_T_WHEN, _T_ELSE, _T_END_CASE)
            branches.append((self.rewrite(cond), body))
            if term is _T_WHEN:
                continue
            if term is _T_ELSE:
                ebody, _ = self.parse_block(_T_END_CASE)
                branches.append((None, ebody))
            break
        self._finish_compound()
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

    def _parse_if(self) -> If:
        self._eat(_kw("IF"), "IF")
        branches: list[tuple[str | None, list]] = []
        cond = self._until_kw(_T_THEN, "THEN after IF condition")
        while True:
            body, term = self.parse_block(_T_ELSEIF, _T_ELSE, _T_END_IF)
            branches.append((self.rewrite(cond) if cond else None, body))
            if term is _T_ELSEIF:
                cond = self._until_kw(_T_THEN, "THEN after ELSEIF")
                continue
            if term is _T_ELSE:
                cond = None
                continue
            break
        self._finish_compound()
        return If(branches)

    def _parse_simple(self, raw: str):
        up = raw.upper()
        if up.startswith("SET "):
            # MySQL multi-assignment `SET a = 1, b = a` — split on
            # TOP-LEVEL commas only (literals are masked; parens guard
            # function-call commas) into sequential assignments, the
            # order MySQL itself evaluates them in
            out: list = []
            for piece in _split_top_level(raw[3:]):
                mo = re.match(r"\s*(\w+)\s*:?=\s*(.+)$", piece, re.S)
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
                expr = self.rewrite(raw_expr)
                if self.flag and var == self.flag:
                    expr = _flag_literal(expr)
                out.append(Assign(var, expr))
            return out if len(out) > 1 else out[0]
        if up.startswith("SELECT"):
            into = re.search(r"\s+INTO\s+([\w\s,]+?)(?=\s+FROM\b|$)", raw, re.I)
            if not into:
                raise ProcParseError(
                    f"function {self.fname}: SELECT without INTO in a "
                    "procedural body"
                )
            vars_ = [v.strip().lower() for v in into.group(1).split(",")]
            sel = raw[: into.start()] + raw[into.end() :]
            return SelectInto(self.rewrite(sel.strip()), vars_)
        if up.startswith("RETURN"):
            return Return(self.rewrite(raw[6:].strip()))
        mo = re.match(r"LEAVE\s*(\w+)?$", raw, re.I)
        if mo:
            return Leave(mo.group(1).lower() if mo.group(1) else None)
        mo = re.match(r"ITERATE\s*(\w+)?$", raw, re.I)
        if mo:
            return Iterate(mo.group(1).lower() if mo.group(1) else None)
        mo = re.match(r"OPEN\s+(\w+)$", raw, re.I)
        if mo:
            name = mo.group(1).lower()
            if name not in self.cursors:
                raise ProcParseError(
                    f"function {self.fname}: OPEN of undeclared cursor "
                    f"{name!r}"
                )
            return OpenCursor(name, self.cursors[name])
        mo = re.match(r"FETCH\s+(?:NEXT\s+FROM\s+)?(\w+)\s+INTO\s+(.+)$",
                      raw, re.I | re.S)
        if mo:
            name = mo.group(1).lower()
            if name not in self.cursors:
                raise ProcParseError(
                    f"function {self.fname}: FETCH from undeclared cursor "
                    f"{name!r}"
                )
            vars_ = [v.strip().lower() for v in mo.group(2).split(",")]
            return Fetch(name, vars_, self.flag)
        mo = re.match(r"CLOSE\s+(\w+)$", raw, re.I)
        if mo:
            return CloseCursor(mo.group(1).lower())
        mo = re.match(
            r"SIGNAL\s+SQLSTATE\s+(?:VALUE\s+)?(\x00L\d+\x00|'[^'\n]*')"
            r"\s*(?:SET\s+(.+))?$",
            raw, re.I | re.S,
        )
        if mo:
            return self._parse_signal(mo)
        if re.match(r"(?:RE)?SIGNAL\b", raw, re.I):
            raise ProcParseError(
                f"function {self.fname}: only `SIGNAL SQLSTATE 'xxxxx' "
                f"[SET MESSAGE_TEXT = …]` is translatable, got "
                f"{raw[:60]!r} (RESIGNAL and UNDECLARED condition names "
                "have no plpgsql analog; names declared `CONDITION FOR "
                "SQLSTATE` resolve before parsing)"
            )
        raise ProcParseError(
            f"function {self.fname}: unsupported statement {raw[:60]!r}"
        )

    def _parse_signal(self, mo: re.Match) -> Signal:
        """``SIGNAL SQLSTATE '45000' SET MESSAGE_TEXT = …[, MYSQL_ERRNO
        = …]`` → RAISE EXCEPTION USING ERRCODE/MESSAGE (errno kept in
        HINT — PG has no errno field). The reference has no SIGNAL pass
        at all (bodies containing it fall into sync_functions.go's
        generic regex path and emit plpgsql that fails at CREATE time)."""
        errcode = self.rewrite(mo.group(1)).strip()
        if not re.fullmatch(r"'[0-9A-Za-z]{5}'", errcode):
            raise ProcParseError(
                f"function {self.fname}: SIGNAL SQLSTATE value "
                f"{errcode!r} is not a 5-character SQLSTATE literal"
            )
        if errcode[1:3] in ("00", "01", "02"):
            raise ProcParseError(
                f"function {self.fname}: SIGNAL SQLSTATE class "
                f"{errcode[1:3]!r} (success/warning/not-found) cannot "
                "be raised as a plpgsql exception"
            )
        message: str | None = None
        errno: str | None = None
        if mo.group(2):
            for item in _split_top_level(mo.group(2)):
                im = re.match(r"\s*(\w+)\s*=\s*(.+)$", item, re.S)
                if not im:
                    raise ProcParseError(
                        f"function {self.fname}: cannot parse SIGNAL "
                        f"item {item.strip()!r}"
                    )
                key = im.group(1).upper()
                if key == "MESSAGE_TEXT":
                    message = self.rewrite(im.group(2).strip())
                elif key == "MYSQL_ERRNO":
                    errno = self.rewrite(im.group(2).strip())
                else:
                    raise ProcParseError(
                        f"function {self.fname}: SIGNAL item {key} has "
                        "no plpgsql analog (only MESSAGE_TEXT / "
                        "MYSQL_ERRNO translate)"
                    )
        return Signal(errcode, message, errno)


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


_RE_CURSOR_DECL = re.compile(
    r"DECLARE\s+(\w+)\s+CURSOR\s+FOR\s+([^;]+);", re.I
)
_RE_HANDLER = re.compile(
    r"DECLARE\s+(CONTINUE|EXIT)\s+HANDLER\s+FOR\s+([^;]+?)\s+"
    r"SET\s+(\w+)\s*=\s*(\S+)\s*;",
    re.I,
)
#: EXIT/CONTINUE HANDLER FOR SQLEXCEPTION — or for one specific
#: ``SQLSTATE 'xxxxx'`` (round 7; the literal is masked at this point) —
#: with a single-statement action or a BEGIN…END group. The non-greedy
#: END-scan stops at a bare ``END;`` — nested IF/CASE closers
#: (``END IF;``) don't match it, so they are safely inside; a nested
#: plain block would mis-split and then fail to parse, which raises
#: instead of mistranslating.
_RE_EXC_HANDLER = re.compile(
    r"DECLARE\s+(?P<kind>CONTINUE|EXIT)\s+HANDLER\s+FOR\s+"
    r"(?P<cond>SQLEXCEPTION"
    r"|SQLSTATE(?:\s+VALUE)?\s+(?:\x00L\d+\x00|'[^'\n]*'))\s+"
    r"(?P<action>BEGIN\b.*?\bEND\s*;|[^;]*;)",
    re.I | re.S,
)
#: MySQL allows a comma list of names sharing one type:
#: ``DECLARE a, b INT DEFAULT 0;``
_RE_VAR_DECL = re.compile(
    r"DECLARE\s+(\w+(?:\s*,\s*\w+)*)\s+([^;]+);", re.I
)
#: ``DECLARE err_name CONDITION FOR SQLSTATE 'xxxxx';`` (or a bare
#: MySQL errno, which has no SQLSTATE and refuses) — names resolve to
#: their SQLSTATE before handler/SIGNAL parsing (round 7)
_RE_COND_DECL = re.compile(
    r"DECLARE\s+(\w+)\s+CONDITION\s+FOR\s+([^;]+);", re.I
)


def parse_procedural(
    body: str,
    fname: str,
    rewrite_expr,
    pg_type,
) -> ProceduralBody:
    """Masked MySQL body (BEGIN/END stripped) → :class:`ProceduralBody`.

    ``rewrite_expr(masked_text) -> str`` converts expression/SELECT text
    to PG dialect (including unmasking); ``pg_type(mysql_type) -> str``
    is the C86 type matrix.
    """
    declares: list[tuple[str, str]] = []
    cursors: dict[str, str] = {}
    flag: str | None = None
    #: (kind "EXIT"|"CONTINUE", cond "others"|"SQLSTATE '…'", action raw)
    exc_handlers: list[tuple[str, str, str]] = []

    # -1. named conditions (round 7): `DECLARE err CONDITION FOR
    # SQLSTATE 'xxxxx';` declares an alias real functions then use in
    # `SIGNAL err` / `DECLARE … HANDLER FOR err`. Resolve every use to
    # its SQLSTATE up front so the handler and SIGNAL passes see only
    # the canonical spelling. A condition declared FOR a bare MySQL
    # errno has no SQLSTATE to map (MySQL gives those HY000) — refuse.
    conditions: dict[str, str] = {}

    def _take_cond(mo: re.Match) -> str:
        name = mo.group(1).lower()
        target = mo.group(2).strip()
        tmo = re.fullmatch(
            r"SQLSTATE(?:\s+VALUE)?\s+(\x00L\d+\x00|'[^'\n]*')",
            target, re.I,
        )
        if not tmo:
            raise ProcParseError(
                f"function {fname}: CONDITION {name!r} declared FOR "
                f"{target!r} — only `CONDITION FOR SQLSTATE 'xxxxx'` "
                "resolves to a plpgsql-catchable condition (a bare "
                "MySQL errno has no SQLSTATE)"
            )
        conditions[name] = f"SQLSTATE {tmo.group(1)}"
        return ""

    body = _RE_COND_DECL.sub(_take_cond, body)
    for name, tgt in conditions.items():
        body = re.sub(
            rf"(\bHANDLER\s+FOR\s+){name}\b",
            lambda m, t=tgt: m.group(1) + t, body, flags=re.I,
        )
        body = re.sub(
            rf"(\bSIGNAL\s+){name}\b",
            lambda m, t=tgt: m.group(1) + t, body, flags=re.I,
        )

    # Handlers are BLOCK-scoped in MySQL, but this translator lifts
    # them to function scope (the NOT FOUND flag / the EXCEPTION
    # clause). A handler declared inside a NESTED block would therefore
    # silently widen its scope — raise instead. Detection: every
    # handler declaration must start before the first nested BEGIN
    # that is not itself part of a handler's BEGIN…END action.
    handler_spans = [
        m.span() for m in _RE_EXC_HANDLER.finditer(body)
    ] + [m.span() for m in _RE_HANDLER.finditer(body)]
    first_nested = next(
        (
            m
            for m in re.finditer(r"\bBEGIN\b", body, re.I)
            if not any(s <= m.start() < e for s, e in handler_spans)
        ),
        None,
    )
    if first_nested is not None:
        for s, _e in handler_spans:
            if s > first_nested.start():
                raise ProcParseError(
                    f"function {fname}: HANDLER declared inside a "
                    "nested block — block-scoped handlers cannot be "
                    "lifted to function scope without widening them"
                )

    # 0. EXIT/CONTINUE HANDLER FOR SQLEXCEPTION / SQLSTATE 'xxxxx' →
    # remember (kind, cond, action). EXIT handlers become the block's
    # EXCEPTION clauses (plpgsql's native exit-handler shape); CONTINUE
    # handlers wrap every raise-capable statement in its own EXCEPTION
    # sub-block (see module docstring). Extracted before the
    # canonical-handler pass so the SET form of these handlers isn't
    # mistaken for a malformed NOT FOUND handler. Several handlers with
    # DISTINCT conditions coexist as ordered WHEN clauses
    # (specific-first = MySQL's most-specific-wins precedence, since
    # plpgsql dispatches to the first matching clause).
    def _take_exc(mo: re.Match) -> str:
        kind = mo.group("kind").upper()
        cond_txt = mo.group("cond")
        cond = "others"
        if not re.fullmatch(r"SQLEXCEPTION", cond_txt.strip(), re.I):
            # specific-SQLSTATE handler → EXCEPTION WHEN SQLSTATE '…'
            # (exactly as narrow as MySQL's handler — no widening)
            lit = rewrite_expr(
                re.search(r"\x00L\d+\x00|'[^'\n]*'", cond_txt).group()
            ).strip()
            if not re.fullmatch(r"'[0-9A-Za-z]{5}'", lit):
                raise ProcParseError(
                    f"function {fname}: HANDLER SQLSTATE value {lit!r} "
                    "is not a 5-character SQLSTATE literal"
                )
            if lit[1:3] in ("00", "01", "02"):
                raise ProcParseError(
                    f"function {fname}: HANDLER for SQLSTATE class "
                    f"{lit[1:3]!r} (success/warning/not-found) cannot "
                    "be caught by a plpgsql EXCEPTION clause"
                )
            cond = f"SQLSTATE {lit}"
        action = mo.group("action").strip()
        if re.match(r"BEGIN\b", action, re.I):
            action = re.sub(r"^BEGIN\b", "", action, flags=re.I)
            action = re.sub(r"\bEND\s*;$", "", action, flags=re.I)
        exc_handlers.append((kind, cond, action.strip()))
        return ""

    body = _RE_EXC_HANDLER.sub(_take_exc, body)
    conds = [c for _k, c, _a in exc_handlers]
    if len(set(conds)) != len(conds):
        raise ProcParseError(
            f"function {fname}: multiple handlers for the same "
            "condition (MySQL allows one per condition per block)"
        )
    if any(k == "CONTINUE" and c == "others" for k, c, _a in exc_handlers) \
            and any(k == "EXIT" and c != "others"
                    for k, c, _a in exc_handlers):
        # a CONTINUE others sub-block would catch the specific error
        # BEFORE the block-level EXIT clause could, inverting MySQL's
        # most-specific-wins precedence — refuse instead of reordering
        raise ProcParseError(
            f"function {fname}: CONTINUE HANDLER FOR SQLEXCEPTION "
            "combined with an EXIT handler for a specific SQLSTATE — "
            "the per-statement wrap would shadow the more-specific "
            "EXIT handler (MySQL dispatches to the specific one)"
        )

    # 1. NOT FOUND handler → boolean flag (reference removes handlers at
    # :1086 and leans on the done-flag FETCH rewrite; same model here,
    # but only the canonical pattern is accepted — anything else raises)
    def _take_handler(mo: re.Match) -> str:
        nonlocal flag
        kind, cond, var = mo.group(1).upper(), mo.group(2), mo.group(3)
        if kind != "CONTINUE" or not re.fullmatch(
            r"NOT\s+FOUND", cond.strip(), re.I
        ):
            raise ProcParseError(
                f"function {fname}: only `DECLARE CONTINUE HANDLER FOR "
                f"NOT FOUND SET flag = 1` is translatable, got "
                f"{kind} HANDLER FOR {cond.strip()!r}"
            )
        flag = var.lower()
        return ""

    body = _RE_HANDLER.sub(_take_handler, body)
    if re.search(r"\bHANDLER\b", body, re.I):
        raise ProcParseError(
            f"function {fname}: HANDLER outside the canonical "
            "NOT FOUND SET-flag pattern"
        )

    # 2. cursor declarations → refcursor + remembered select (:1044-1060)
    def _take_cursor(mo: re.Match) -> str:
        name = mo.group(1).lower()
        cursors[name] = rewrite_expr(mo.group(2).strip())
        declares.append((name, "refcursor"))
        return ""

    body = _RE_CURSOR_DECL.sub(_take_cursor, body)

    # 3. plain variable declarations (flag forced BOOLEAN, :1116-1119);
    # a comma list (`DECLARE a, b INT DEFAULT 0`) shares one type and
    # default across every name, so it expands to one declare per name
    def _take_var(mo: re.Match) -> str:
        rest = mo.group(2).strip()
        dflt = re.search(r"\bDEFAULT\s+(.+)$", rest, re.I | re.S)
        for var in (v.strip().lower() for v in mo.group(1).split(",")):
            if flag and var == flag:
                init = (
                    _flag_literal(dflt.group(1).strip()) if dflt else "false"
                )
                declares.append((var, f"BOOLEAN := {init}"))
                continue
            t = pg_type(rest[: dflt.start()].strip() if dflt else rest)
            if dflt:
                t += " := " + rewrite_expr(dflt.group(1).strip())
            declares.append((var, t))
        return ""

    body = _RE_VAR_DECL.sub(_take_var, body)

    # scope-lifted declarations (nested blocks lose their scoping in a
    # single flat DECLARE section): identical re-declarations dedupe,
    # conflicting ones raise — lifting a shadow with a DIFFERENT type
    # would silently change semantics
    seen: dict[str, str] = {}
    for n, t in declares:
        if n in seen and seen[n] != t:
            raise ProcParseError(
                f"function {fname}: variable {n!r} re-declared with a "
                f"different type across block scopes ({seen[n]!r} vs "
                f"{t!r}) — scope-lifting cannot preserve shadowing"
            )
        seen.setdefault(n, t)
    declares = list(seen.items())

    def _rewrite(masked: str) -> str:
        if flag:
            masked = normalize_flag_comparisons(masked, flag)
        return rewrite_expr(masked)

    p = _Parser(body, fname, _rewrite, flag, cursors)
    stmts, _ = p.parse_block()
    if not any(_has_return(s) for s in stmts):
        raise ProcParseError(f"function {fname}: body has no RETURN")

    continue_clauses: list = []
    exit_clauses: list = []
    # specific-SQLSTATE clauses first (stable within each group) so
    # plpgsql's first-match dispatch = MySQL's most-specific-wins
    for kind, cond, action_raw in sorted(
        exc_handlers, key=lambda h: h[1] == "others"
    ):
        sub = _Parser(action_raw, fname, _rewrite, flag, cursors)
        action_stmts, _ = sub.parse_block()
        if not action_stmts:
            raise ProcParseError(
                f"function {fname}: empty {kind} handler action"
            )
        (continue_clauses if kind == "CONTINUE"
         else exit_clauses).append((cond, action_stmts))
    if continue_clauses:
        # resume-after-error: per-statement EXCEPTION sub-blocks
        # instead of one block-level clause
        stmts = _wrap_continue(stmts, continue_clauses)
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
    never matches a BEGIN block, but keeping them bare is simplest)."""
    out: list = []
    for st in stmts:
        if isinstance(st, (Leave, Iterate, RowCountInto)):
            out.append(st)
        elif isinstance(st, Block):
            out.append(
                Block(_wrap_continue(st.body, clauses), st.label)
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
