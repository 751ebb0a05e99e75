"""Structural validator for emitted plpgsql bodies — the closest thing
to a real PG grammar available in this sandbox.

The C95 translator emits plpgsql no PostgreSQL has ever parsed here
(pglast / libpg_query are not installable), and ``schema/ddl_lint.py``
checks only script-level structure (statement heads, balanced parens /
quotes / dollar tags). This module goes one level deeper: it tokenizes
each ``$$``-quoted body and recursive-descent checks the things a
plpgsql parser would reject first —

* DECLARE section shape (each declaration ``;``-terminated, body
  starts at ``BEGIN``);
* BEGIN / EXCEPTION / END block nesting, including nested sub-blocks
  (the CONTINUE-handler translation emits one per statement);
* IF / ELSIF / ELSE / END IF pairing, with CASE *expressions* inside
  conditions handled (their WHEN/THEN/END must not terminate the IF
  condition scan);
* LOOP / WHILE / FOR / FOREACH … END LOOP pairing and ``<<label>>`` /
  ``END LOOP label`` agreement;
* CASE *statement* WHEN … THEN … END CASE pairing;
* EXCEPTION sections: ``WHEN cond THEN`` arms only, nothing between
  ``EXCEPTION`` and the first ``WHEN``;
* every plain statement ``;``-terminated (a swapped / dropped
  semicolon shifts a terminator into an expression and surfaces as an
  unexpected-token or unexpected-EOF problem).

It validates STRUCTURE, not SQL semantics: the text of conditions,
expressions and embedded SQL statements is skipped token-wise, exactly
like plpgsql itself treats embedded SQL as opaque until execution.

Reference parity note: the reference pipes its translated functions to
a live ``psql`` and reads the error stream (sync_functions.go); this
validator is the offline stand-in, used by the golden suite and by
``python -m mysql2pg_spark --mode pgddl --check``.
"""

from __future__ import annotations

import re

__all__ = [
    "tokenize",
    "check_plpgsql_body",
    "check_cron_schedule",
    "check_script",
]

_WORD = re.compile(r"[A-Za-z_][A-Za-z0-9_$]*")
_NUM = re.compile(r"\d+(?:\.\d*)?(?:[eE][-+]?\d+)?")
_DOLLAR_TAG = re.compile(r"\$[A-Za-z_]\w*\$|\$\$")

#: keywords that OPEN a construct when they start a statement
_LOOP_HEADS = ("WHILE", "FOR", "FOREACH")


class PlpgsqlProblem(Exception):
    """One structural violation; .args[0] is the message."""


def tokenize(body: str) -> list[str]:
    """plpgsql body text → structural tokens. String literals become
    the single token ``'x'`` (contents dropped — they are opaque to
    structure), quoted identifiers ``"x"``, inner dollar-quoted
    strings ``$s$``; comments vanish; keywords/identifiers are
    UPPERCASED words; everything else is single-char punctuation
    except the multi-char ``<<  >>  :=  ..``."""
    toks: list[str] = []
    i, n = 0, len(body)
    while i < n:
        ch = body[i]
        if ch.isspace():
            i += 1
            continue
        if body.startswith("--", i):
            j = body.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if body.startswith("/*", i):
            depth, i = 1, i + 2
            while i < n and depth:
                if body.startswith("/*", i):
                    depth += 1
                    i += 2
                elif body.startswith("*/", i):
                    depth -= 1
                    i += 2
                else:
                    i += 1
            if depth:
                raise PlpgsqlProblem("unterminated /* comment")
            continue
        if ch == "'":
            j = i + 1
            while j < n:
                if body[j] == "'":
                    if j + 1 < n and body[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            else:
                raise PlpgsqlProblem("unterminated string literal")
            if j >= n:
                raise PlpgsqlProblem("unterminated string literal")
            toks.append("'x'")
            i = j + 1
            continue
        if ch == '"':
            j = body.find('"', i + 1)
            if j < 0:
                raise PlpgsqlProblem("unterminated quoted identifier")
            toks.append('"x"')
            i = j + 1
            continue
        mo = _DOLLAR_TAG.match(body, i)
        if mo:
            tag = mo.group(0)
            j = body.find(tag, mo.end())
            if j < 0:
                raise PlpgsqlProblem(
                    f"unterminated dollar-quoted string {tag}"
                )
            toks.append("$s$")
            i = j + len(tag)
            continue
        for two in ("<<", ">>", ":=", ".."):
            if body.startswith(two, i):
                toks.append(two)
                i += 2
                break
        else:
            mo = _WORD.match(body, i)
            if mo:
                toks.append(mo.group(0).upper())
                i = mo.end()
                continue
            mo = _NUM.match(body, i)
            if mo:
                toks.append("0")
                i = mo.end()
                continue
            toks.append(ch)
            i += 1
    return toks


class _Parser:
    def __init__(self, toks: list[str]):
        self.t = toks
        self.i = 0

    # -- token helpers -----------------------------------------------------

    def peek(self) -> str | None:
        return self.t[self.i] if self.i < len(self.t) else None

    def next(self) -> str:
        if self.i >= len(self.t):
            raise PlpgsqlProblem("unexpected end of body")
        tok = self.t[self.i]
        self.i += 1
        return tok

    def expect(self, want: str, ctx: str) -> None:
        got = self.peek()
        if got != want:
            raise PlpgsqlProblem(
                f"expected {want!r} {ctx}, found "
                f"{'end of body' if got is None else got!r}"
            )
        self.i += 1

    # -- expression scans ----------------------------------------------------

    def scan_until(self, stops: tuple[str, ...], ctx: str) -> str:
        """Consume expression tokens until one of ``stops`` appears
        OUTSIDE any CASE-expression / parenthesis nesting; returns the
        stop token (consumed). A CASE inside an expression opens a
        WHEN/THEN/ELSE/END region that must not terminate the scan —
        this is exactly the `IF CASE … THEN … END THEN` shape the
        round-7 translator emits."""
        case_depth = 0
        paren_depth = 0
        while True:
            tok = self.peek()
            if tok is None:
                raise PlpgsqlProblem(
                    f"end of body while scanning {ctx} "
                    f"(expected one of {stops})"
                )
            if case_depth == 0 and paren_depth == 0 and tok in stops:
                self.i += 1
                return tok
            if tok == "(":
                paren_depth += 1
            elif tok == ")":
                if paren_depth == 0:
                    raise PlpgsqlProblem(
                        f"unbalanced ')' while scanning {ctx}"
                    )
                paren_depth -= 1
            elif tok == "CASE":
                case_depth += 1
            elif tok == "END":
                if case_depth == 0:
                    raise PlpgsqlProblem(
                        f"unexpected END while scanning {ctx} "
                        f"(expected one of {stops}) — missing ';'?"
                    )
                case_depth -= 1
            elif tok == ";" and paren_depth == 0 and case_depth == 0:
                raise PlpgsqlProblem(
                    f"unexpected ';' while scanning {ctx} "
                    f"(expected one of {stops})"
                )
            self.i += 1

    def scan_statement_tail(self, ctx: str, assignment: bool = False) -> None:
        """Consume one plain (non-control-flow) statement up to its
        terminating ``;``. Embedded SQL is opaque; CASE expressions and
        parens/brackets nest; a control-flow END arriving before the
        ``;`` means a semicolon was dropped. In ``assignment`` mode
        (``target := expr``) two extra rules catch swapped/dropped
        separators a blind scan would swallow: plpgsql assignments
        allow neither a nesting-depth-0 comma nor a second ``:=``."""
        case_depth = 0
        depth = 0  # ( ) and [ ] nesting
        assigns = 0
        while True:
            tok = self.peek()
            if tok is None:
                raise PlpgsqlProblem(
                    f"statement in {ctx} not terminated by ';'"
                )
            if tok == ";" and case_depth == 0:
                self.i += 1
                return
            if tok in ("(", "["):
                depth += 1
            elif tok in (")", "]"):
                depth -= 1
            elif tok == "CASE":
                case_depth += 1
            elif tok == "END":
                if case_depth == 0:
                    raise PlpgsqlProblem(
                        f"unexpected END inside statement in {ctx} "
                        "— missing ';'?"
                    )
                # a CASE-expression close is a bare END; `END CASE` /
                # `END IF` here means a whole CASE/IF *statement* got
                # swallowed into this scan — a separator is missing
                nxt = (
                    self.t[self.i + 1] if self.i + 1 < len(self.t)
                    else None
                )
                if nxt in ("CASE", "IF"):
                    raise PlpgsqlProblem(
                        f"END {nxt} inside statement in {ctx} "
                        "— missing ';'?"
                    )
                case_depth -= 1
            elif tok in ("BEGIN", "DECLARE", "ELSIF"):
                # NOT "EXCEPTION": `RAISE EXCEPTION USING …;` is a
                # plain statement carrying the keyword mid-statement
                if case_depth == 0:
                    raise PlpgsqlProblem(
                        f"unexpected {tok} inside statement in {ctx} "
                        "— missing ';'?"
                    )
            elif assignment and depth == 0 and case_depth == 0:
                if tok == ",":
                    raise PlpgsqlProblem(
                        f"top-level ',' in an assignment in {ctx} "
                        "— ';' swapped for ','?"
                    )
                if tok == ":=":
                    assigns += 1
                    if assigns > 1:
                        raise PlpgsqlProblem(
                            f"second ':=' in one assignment in {ctx} "
                            "— missing ';'?"
                        )
            self.i += 1

    # -- grammar -------------------------------------------------------------

    def parse_body(self) -> None:
        """Whole function body: [DECLARE decls] BEGIN … END [;]"""
        self.parse_block("function body")
        if self.peek() == ";":
            self.i += 1
        if self.peek() is not None:
            raise PlpgsqlProblem(
                f"trailing tokens after final END: {self.peek()!r}"
            )

    def parse_block(self, ctx: str) -> None:
        """[DECLARE decls] BEGIN stmts [EXCEPTION arms] END [label]"""
        if self.peek() == "DECLARE":
            self.i += 1
            while self.peek() != "BEGIN":
                tok = self.peek()
                if tok is None:
                    raise PlpgsqlProblem(
                        f"DECLARE section of {ctx} never reaches BEGIN"
                    )
                if tok == ";":
                    raise PlpgsqlProblem(
                        f"empty declaration (stray ';') in {ctx}"
                    )
                self.scan_statement_tail(f"DECLARE section of {ctx}")
        self.expect("BEGIN", f"to open {ctx}")
        term = self.parse_statements(("END", "EXCEPTION"), ctx)
        if term == "EXCEPTION":
            self.parse_exception_arms(ctx)
        # END [label] — the label is word-like; ';' is consumed by the
        # caller (block-as-statement) or parse_body (outer block)
        nxt = self.peek()
        if nxt is not None and nxt not in (";",) and _WORD.fullmatch(
            nxt.lower()
        ) and nxt not in ("IF", "LOOP", "CASE"):
            self.i += 1  # END label

    def parse_exception_arms(self, ctx: str) -> None:
        """EXCEPTION WHEN cond THEN stmts [WHEN …]* (ends at END)."""
        first = True
        while True:
            tok = self.peek()
            if tok == "END":
                if first:
                    raise PlpgsqlProblem(
                        f"EXCEPTION section of {ctx} has no WHEN arm"
                    )
                self.i += 1
                return
            self.expect("WHEN", f"in EXCEPTION section of {ctx}")
            first = False
            self.scan_until(("THEN",), f"EXCEPTION condition in {ctx}")
            term = self.parse_statements(
                ("WHEN", "END"), f"EXCEPTION arm of {ctx}"
            )
            self.i -= 1  # re-dispatch WHEN/END in the loop

    def parse_statements(
        self, terminators: tuple[str, ...], ctx: str
    ) -> str:
        """Statement list until one of ``terminators`` appears at
        statement-start position; returns the terminator (consumed)."""
        while True:
            tok = self.peek()
            if tok is None:
                raise PlpgsqlProblem(
                    f"end of body inside {ctx} "
                    f"(expected one of {terminators})"
                )
            if tok in terminators:
                self.i += 1
                return tok
            self.parse_one_statement(ctx)

    def parse_one_statement(self, ctx: str) -> None:
        tok = self.peek()
        if tok == "<<":
            self.i += 1
            label = self.next()
            if not _WORD.fullmatch(label.lower()):
                raise PlpgsqlProblem(f"bad loop label {label!r}")
            self.expect(">>", "to close loop label")
            nxt = self.peek()
            if nxt not in ("LOOP", "FOR", "FOREACH", "WHILE", "BEGIN"):
                raise PlpgsqlProblem(
                    f"<<label>> must precede a loop or block, found "
                    f"{nxt!r}"
                )
            return
        if tok == "IF":
            self.i += 1
            self.scan_until(("THEN",), "IF condition")
            while True:
                term = self.parse_statements(
                    ("ELSIF", "ELSE", "END"), "IF branch"
                )
                if term == "ELSIF":
                    self.scan_until(("THEN",), "ELSIF condition")
                    continue
                if term == "ELSE":
                    term = self.parse_statements(("END",), "ELSE branch")
                self.expect("IF", "after END closing an IF")
                self.expect(";", "after END IF")
                return
        if tok == "LOOP":
            self.i += 1
            self.parse_statements(("END",), "LOOP body")
            self._close_loop()
            return
        if tok in _LOOP_HEADS:
            self.i += 1
            self.scan_until(("LOOP",), f"{tok} header")
            self.parse_statements(("END",), f"{tok} body")
            self._close_loop()
            return
        if tok == "CASE":
            self.i += 1
            # optional selector expression, then WHEN arms
            self.scan_until(("WHEN",), "CASE selector")
            while True:
                self.scan_until(("THEN",), "CASE WHEN condition")
                term = self.parse_statements(
                    ("WHEN", "ELSE", "END"), "CASE arm"
                )
                if term == "WHEN":
                    continue
                if term == "ELSE":
                    term = self.parse_statements(
                        ("END",), "CASE ELSE arm"
                    )
                self.expect("CASE", "after END closing a CASE statement")
                self.expect(";", "after END CASE")
                return
        if tok in ("BEGIN", "DECLARE"):
            self.parse_block("nested block")
            self.expect(";", "after END of a nested block")
            return
        if tok == ";":
            raise PlpgsqlProblem(f"empty statement (stray ';') in {ctx}")
        if tok in ("ELSE", "WHEN", "THEN", "ELSIF"):
            # pure structure keywords (all reserved — never identifiers)
            # cannot start a statement; an orphan here means its
            # IF/CASE is gone or a separator shifted
            raise PlpgsqlProblem(
                f"unexpected {tok} at statement start in {ctx}"
            )
        # plain statement (SQL, assignment, RAISE, RETURN, OPEN, …) —
        # assignment mode when the head is `name := …` or
        # `qual.name := …` (the two shapes the translator emits)
        is_assign = (
            self.i + 1 < len(self.t) and self.t[self.i + 1] == ":="
        ) or (
            self.i + 3 < len(self.t)
            and self.t[self.i + 1] == "."
            and self.t[self.i + 3] == ":="
        )
        self.scan_statement_tail(ctx, assignment=is_assign)

    def _close_loop(self) -> None:
        self.expect("LOOP", "after END closing a loop")
        nxt = self.peek()
        if nxt is not None and nxt != ";" and _WORD.fullmatch(nxt.lower()):
            self.i += 1  # END LOOP label
        self.expect(";", "after END LOOP")


def check_plpgsql_body(body: str) -> list[str]:
    """Problems in ONE $$-quoted plpgsql body ([] = structurally OK)."""
    try:
        _Parser(tokenize(body)).parse_body()
    except PlpgsqlProblem as e:
        return [str(e)]
    return []


_FN_STMT = re.compile(
    r"(?is)^\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:FUNCTION|PROCEDURE)\s+"
    r"(\S+?)\s*\("
)

_CRON_STMT = re.compile(
    r"(?is)^\s*SELECT\s+cron\.(?:schedule|unschedule)\b"
)
_CRON_SHAPE = re.compile(
    r"(?is)^\s*SELECT\s+cron\.schedule\s*\(\s*"
    r"'(?P<name>(?:[^']|'')+)'\s*,\s*"
    r"'(?P<sched>[^']+)'\s*,\s*"
    r"\$(?P<tag>\w*)\$(?P<cmd>.*)\$(?P=tag)\$\s*\)\s*$"
)
_DO_BODY = re.compile(r"(?is)^DO\s+\$(\w*)\$(.*)\$\1\$\s*$")

# Tokens that matter while scanning for a guard's statement-level THEN:
# quoted strings (skipped whole, '' escapes included) and the CASE/END/
# THEN keywords that track nesting.
_GUARD_TOK = re.compile(r"(?is)'(?:[^']|'')*'|\b(CASE|END|THEN)\b")


def _strip_line_comments(s: str) -> str:
    """Drop ``--`` line comments, quote-aware (a ``--`` inside a string
    literal is data, not a comment)."""
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "'":
            j = s.find("'", i + 1)
            j = n - 1 if j < 0 else j
            out.append(s[i:j + 1])
            i = j + 1
            continue
        if s.startswith("--", i):
            j = s.find("\n", i)
            i = n if j < 0 else j
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _if_guards(body: str) -> list[str]:
    """The guard expression of every IF/ELSIF statement in a plpgsql
    body, each scanned to its MATCHING statement-level THEN: THEN
    keywords inside a nested CASE expression and ' THEN ' inside string
    literals are skipped (ADVICE r14 — the previous non-greedy regex
    stopped at the FIRST 'THEN' and would truncate such guards into
    false expression-grammar positives). Line comments are stripped
    first and the END-IF terminator check is word-bounded (review r15:
    ``-- … period END\\nIF x THEN`` suppressed a genuine guard)."""
    body = _strip_line_comments(body)
    guards: list[str] = []
    for m in re.finditer(r"(?is)\b(?:IF|ELSIF)\b", body):
        if re.search(r"(?is)\bEND\s*$", body[: m.start()]):
            continue  # END IF terminator, not a guard opener
        depth = 0
        for t in _GUARD_TOK.finditer(body, m.end()):
            kw = (t.group(1) or "").upper()
            if kw == "CASE":
                depth += 1
            elif kw == "END":
                depth = max(0, depth - 1)
            elif kw == "THEN" and depth == 0:
                guards.append(body[m.end(): t.start()].strip())
                break
    return guards
#: statement heads an emitted cron command may start with (the event
#: translator's DML subset plus CALL for synthesized procedures)
_CRON_CMD_HEAD = re.compile(
    r"(?is)^(INSERT|UPDATE|DELETE|TRUNCATE|CALL|SELECT)\b"
)
#: cron field ranges: minute hour day-of-month month day-of-week
_CRON_RANGES = ((0, 59), (0, 23), (1, 31), (1, 12), (0, 6))


def check_cron_schedule(stmt: str) -> list[str]:
    """Structural gate for one emitted ``SELECT cron.schedule(…)``
    statement (round 13 — the pg_cron emulations were the least-
    validated text in the repo): the canonical 3-argument shape with a
    tag-matched dollar-quoted command, an in-range 5-field cron entry
    (or pg_cron ``'n seconds'`` interval), and a command that is either
    a whitelisted single statement or a ``DO`` block whose plpgsql body
    passes the full structural grammar."""
    mo = _CRON_SHAPE.match(stmt)
    if mo is None:
        return [
            "cron.schedule statement does not match the canonical "
            f"3-arg dollar-quoted shape: {stmt[:90]!r}"
        ]
    return _cron_call_problems(
        mo.group("name"), mo.group("sched"), mo.group("cmd")
    )


def _cron_call_problems(name: str, sched: str, cmd: str) -> list[str]:
    """Shared validation for one ``cron.schedule(name, sched, cmd)``
    call — used by the standalone ``SELECT`` form and by calls found
    inside a DISABLE'd event's atomic ``DO`` block (round 14)."""
    problems: list[str] = []
    sched = sched.strip()
    smo = re.fullmatch(r"(\d+)\s+seconds", sched)
    if smo:
        if not 1 <= int(smo.group(1)) <= 59:
            problems.append(
                f"{name}: interval {sched!r} outside pg_cron's 1-59 s"
            )
    else:
        fields = sched.split()
        if len(fields) != 5:
            problems.append(
                f"{name}: schedule {sched!r} is neither 5 cron fields "
                "nor an 'n seconds' interval"
            )
        else:
            for f, (lo, hi) in zip(fields, _CRON_RANGES):
                if f == "*":
                    continue
                if f.startswith("*/") and f[2:].isdigit():
                    if not 1 <= int(f[2:]) <= hi:
                        problems.append(
                            f"{name}: step {f!r} outside 1-{hi}"
                        )
                elif f.isdigit():
                    if not lo <= int(f) <= hi:
                        problems.append(
                            f"{name}: field {f!r} outside {lo}-{hi}"
                        )
                else:
                    problems.append(
                        f"{name}: malformed cron field {f!r}"
                    )
    cmd = cmd.strip()
    dmo = _DO_BODY.match(cmd)
    if dmo:
        for p in check_plpgsql_body(dmo.group(2)):
            problems.append(f"{name} (DO block): {p}")
        # round 14: the IF guards inside the emulation DO blocks are
        # generated EXPRESSION text (period-elapsed arithmetic, start
        # gates, month-end rolls) — parse each with the real expression
        # grammar, not just the statement-level structural check
        from mysql2pg_spark.schema.ddl_lint import check_expression

        for guard in _if_guards(dmo.group(2)):
            for p in check_expression(guard):
                problems.append(f"{name} (DO-block guard): {p}")
    elif not _CRON_CMD_HEAD.match(cmd):
        problems.append(
            f"{name}: command head outside the emitted subset: "
            f"{cmd[:60]!r}"
        )
    return problems


def check_script(text: str) -> list[str]:
    """Validate every plpgsql routine in a DDL script: each
    ``CREATE [OR REPLACE] FUNCTION/PROCEDURE … AS $$ body $$`` whose
    language is plpgsql gets a full structural check; problems carry
    the routine name. ``SELECT cron.schedule(…)`` statements get the
    cron gate, including their inner DO-block bodies (round 13).
    SQL-language and body-less statements pass through untouched."""
    problems: list[str] = []
    # split on the ddl_lint statement splitter so $$ bodies stay whole
    from mysql2pg_spark.schema.ddl_lint import split_statements

    for stmt in split_statements(text):
        if _CRON_STMT.match(stmt):
            if re.match(r"(?is)^\s*SELECT\s+cron\.schedule\b", stmt):
                problems.extend(check_cron_schedule(stmt))
            continue
        dmo = re.match(r"(?is)^\s*DO\s+\$(\w*)\$(.*)\$\1\$\s*$", stmt)
        if dmo:
            # round 14: a DISABLE'd event's atomic schedule-and-
            # deactivate block — structural body check PLUS the same
            # cron gate on every schedule call found inside it
            body = dmo.group(2)
            for p in check_plpgsql_body(body):
                problems.append(f"DO statement: {p}")
            calls = list(re.finditer(
                r"(?is)\bcron\.schedule\s*\(\s*"
                r"'(?P<name>(?:[^']|'')+)'\s*,\s*"
                r"'(?P<sched>[^']+)'\s*,\s*"
                r"\$(?P<tag>\w*)\$(?P<cmd>.*?)\$(?P=tag)\$\s*\)",
                body,
            ))
            if not calls:
                problems.append(
                    "DO statement without a cron.schedule call: "
                    f"{stmt[:80]!r}"
                )
            for cm in calls:
                problems.extend(_cron_call_problems(
                    cm.group("name"), cm.group("sched"), cm.group("cmd")
                ))
            continue
        mo = _FN_STMT.match(stmt)
        if not mo:
            continue
        if not re.search(r"(?i)LANGUAGE\s+plpgsql", stmt):
            continue
        name = mo.group(1)
        # tag-matched, non-greedy, anchored on AS (ADVICE r10): the
        # body is THE dollar-quoted string after AS with its own
        # closing tag — a second dollar string elsewhere in the
        # statement or a tagged quote ($fn$…$fn$) extracts correctly
        # instead of greedy-first-$$-to-last-$$ swallowing both
        bmo = re.search(r"(?is)\bAS\s+\$(\w*)\$(.*?)\$\1\$", stmt)
        if not bmo:
            if re.search(r"\$\w*\$", stmt):
                problems.append(
                    f"{name}: unterminated or non-AS-anchored "
                    "dollar-quoted body on a plpgsql routine"
                )
            else:
                problems.append(
                    f"{name}: no dollar-quoted body on a plpgsql routine"
                )
            continue
        for p in check_plpgsql_body(bmo.group(2)):
            problems.append(f"{name}: {p}")
    return problems
