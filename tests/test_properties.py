"""Property-based tests (hypothesis) for the pure text-processing layers:
the transpiler's masking must be a lossless inverse, structural splitting
must preserve content, and the format converter must never crash and must
always produce balanced quoting."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from mysql2pg_spark.dialect.transpile import (
    mask_literals,
    split_top_level,
    transpile_mysql,
    unmask_literals,
)
from mysql2pg_spark.functions.datetime_fmt import mysql_format_to_spark

sql_text = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",), blacklist_characters="\x00\x01\x02"
    ),
    max_size=200,
)


@given(sql_text)
@settings(max_examples=300, deadline=None)
def test_mask_unmask_is_identity(s):
    masked, lits = mask_literals(s)
    assert unmask_literals(masked, lits) == s


@given(sql_text)
@settings(max_examples=300, deadline=None)
def test_masked_text_has_no_quotes_outside_terminal(s):
    masked, lits = mask_literals(s)
    # only an unterminated trailing literal may remain quoted
    assert masked.count("'") == 0 or (lits and not lits[-1].endswith("'")) or (
        lits and len(lits[-1]) == 1
    )


@given(st.lists(st.text(alphabet="ab(),", max_size=10), max_size=6))
@settings(max_examples=200, deadline=None)
def test_split_preserves_content_for_balanced_args(parts):
    # build balanced arguments (wrap each part's parens away)
    clean = [p.replace("(", "").replace(")", "").replace(",", "") or "x" for p in parts]
    joined = ", ".join(clean)
    assert split_top_level(joined) == (clean if clean else [])


@given(st.text(max_size=60))
@settings(max_examples=300, deadline=None)
def test_format_converter_total_and_balanced(fmt):
    out = mysql_format_to_spark(fmt)
    assert isinstance(out, str)
    # single quotes always balanced (escaped '' counts as two)
    assert out.count("'") % 2 == 0


@given(sql_text)
@settings(max_examples=200, deadline=None)
def test_transpiler_never_crashes_or_leaks_sentinels(s):
    out = transpile_mysql(s)
    assert "\x00" not in out
    assert "\x02" not in out


@given(
    st.text(max_size=60),
    st.sampled_from(["$", "$.k", "$.arr[0]", "$.missing", "bad", "$[1]"]),
    st.one_of(st.none(), st.text(max_size=20)),
    st.sampled_from(
        ["set", "insert", "replace", "remove", "array_append", "array_insert"]
    ),
)
@settings(max_examples=300, deadline=None)
def test_json_mutate_total_and_wellformed(doc, path, val, op):
    """_json_mutate_one never raises on arbitrary input, and whatever it
    returns is either None, the original text (no-op), or valid JSON."""
    import json

    from mysql2pg_spark.functions.mysql_compat import _json_mutate_one

    out = _json_mutate_one(op, doc, path, val)
    if out is None or out == doc:
        return
    json.loads(out)  # mutated output must be well-formed


# --------------------------------------------------------------------------
# Dump tokenizer: rendering arbitrary values as a mysqldump VALUES blob
# and parsing back must be the identity (NULLs, quotes, parens, escapes).
# --------------------------------------------------------------------------
def _render_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, bytes):
        # the three spellings mysqldump/clients emit for binary data;
        # pick deterministically by content so examples stay shrinkable
        h = v.hex()
        style = len(v) % 3
        if style == 0:
            return "0x" + h.upper()
        if style == 1:
            return f"X'{h}'"
        return "x'" + h + "'"
    esc = (
        v.replace("\\", "\\\\")
        .replace("'", "\\'")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
        .replace("\x00", "\\0")
        .replace("\x1a", "\\Z")
    )
    return f"'{esc}'"


_cell = st.one_of(
    st.none(),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.text(max_size=30),
    st.binary(max_size=20),
)


@given(st.lists(st.lists(_cell, min_size=1, max_size=5), min_size=1, max_size=5))
@settings(max_examples=300, deadline=None)
def test_dump_tokenizer_roundtrip(rows):
    from mysql2pg_spark.sources.dumpfile import split_tuples

    # every tuple in one blob must have the same arity for SQL validity;
    # pad to the widest
    width = max(len(r) for r in rows)
    rows = [r + [None] * (width - len(r)) for r in rows]
    blob = ",".join(
        "(" + ",".join(_render_cell(c) for c in r) + ")" for r in rows
    )
    parsed = split_tuples(blob)
    expected = [
        [
            None
            if c is None
            else c
            if isinstance(c, bytes)
            else str(c)
            for c in r
        ]
        for r in rows
    ]
    # unquoted empty-string renders as '' (quoted) and survives; but an
    # all-whitespace INTEGER cell cannot occur. Compare directly:
    assert parsed == expected


# --------------------------------------------------------------------------
# C95 procedural parser round-trip (round 6): a randomly generated
# statement tree, rendered to MySQL body text, must parse back to the
# SAME tree — the property that separates a grammar from regex surgery.
# --------------------------------------------------------------------------
from mysql2pg_spark.sinks import plpgsql_proc as P  # noqa: E402


def _names(prefix):
    return st.sampled_from([f"{prefix}{i}" for i in range(1, 4)])


_EXPR = st.sampled_from(
    ["v1 + 1", "v2 - v1", "42", "v1 * 2 + v2"]
)
_COND = st.sampled_from(
    ["v1 < 10", "v2 >= v1", "v1 <> 0", "v1 = 5 AND v2 < 3"]
)


def _simple_stmt(label):
    opts = [
        st.builds(P.Assign, _names("v"), _EXPR),
        st.builds(P.Return, _EXPR),
        # round 8: body DML passes through the statement tree verbatim
        st.builds(
            P.Dml,
            st.sampled_from([
                "INSERT INTO t1(c) VALUES (v1)",
                "UPDATE t1 SET c = v1 WHERE id = v2",
                "DELETE FROM t1 WHERE id = v1",
            ]),
        ),
        # round 7: SIGNAL (errcode kept comma-free/quote-free so the
        # unmasked fuzz render survives _split_top_level)
        st.builds(
            P.Signal,
            st.sampled_from(["'45000'", "'45001'"]),
            st.one_of(st.none(), st.just("'boom'")),
            st.one_of(st.none(), st.just("1644")),
        ),
    ]
    if label is not None:
        opts += [st.just(P.Leave(label)), st.just(P.Iterate(label))]
    return st.one_of(*opts)


def _stmts(depth, label):
    """Statement-list strategy; compound statements recurse with a
    fresh label for their own bodies."""
    if depth <= 0:
        return st.lists(_simple_stmt(label), min_size=1, max_size=3)

    sub = st.deferred(lambda: _stmts(depth - 1, label))

    def loop_body(lbl):
        return _stmts(depth - 1, lbl)

    compound = st.one_of(
        st.builds(
            P.If,
            st.lists(
                st.tuples(_COND, sub), min_size=1, max_size=2
            ).flatmap(
                lambda brs: st.one_of(
                    st.just([(c, b) for c, b in brs]),
                    sub.map(
                        lambda els: [(c, b) for c, b in brs]
                        + [(None, els)]
                    ),
                )
            ),
        ),
        st.builds(P.Loop, loop_body("w1"), st.just("w1")),
        st.builds(P.RepeatUntil, loop_body("r1"), _COND, st.just("r1")),
        st.builds(P.While, _COND, loop_body("h1"), st.just("h1")),
        # round 7: nested BEGIN blocks (optionally labeled) and CASE
        # statements (searched and value forms, optional ELSE)
        st.builds(P.Block, sub, st.one_of(st.none(), st.just("b1"))),
        st.builds(
            P.CaseStmt,
            st.one_of(st.none(), st.just("v1")),
            st.lists(
                st.tuples(_COND, sub), min_size=1, max_size=2
            ).flatmap(
                lambda brs: st.one_of(
                    st.just(list(brs)),
                    sub.map(lambda els: list(brs) + [(None, els)]),
                )
            ),
        ),
    )
    return st.lists(
        st.one_of(_simple_stmt(label), compound), min_size=1, max_size=3
    )


def _render(stmts, indent=1):
    """Statement tree → MySQL body text (the inverse of the parser)."""
    pad = "  " * indent
    out = []
    for s in stmts:
        if isinstance(s, P.Assign):
            out.append(f"{pad}SET {s.var} = {s.expr};")
        elif isinstance(s, P.Return):
            out.append(f"{pad}RETURN {s.expr};")
        elif isinstance(s, P.Dml):
            out.append(f"{pad}{s.sql};")
        elif isinstance(s, P.Signal):
            items = []
            if s.message is not None:
                items.append(f"MESSAGE_TEXT = {s.message}")
            if s.errno is not None:
                items.append(f"MYSQL_ERRNO = {s.errno}")
            tail = (" SET " + ", ".join(items)) if items else ""
            out.append(f"{pad}SIGNAL SQLSTATE {s.errcode}{tail};")
        elif isinstance(s, P.Leave):
            out.append(f"{pad}LEAVE {s.label};")
        elif isinstance(s, P.Iterate):
            out.append(f"{pad}ITERATE {s.label};")
        elif isinstance(s, P.If):
            for i, (cond, body) in enumerate(s.branches):
                kw = (
                    "IF" if i == 0 else ("ELSEIF" if cond else "ELSE")
                )
                head = f"{pad}{kw} {cond} THEN" if cond else f"{pad}{kw}"
                out.append(head)
                out.append(_render(body, indent + 1))
            out.append(f"{pad}END IF;")
        elif isinstance(s, P.Loop):
            out.append(f"{pad}{s.label}: LOOP")
            out.append(_render(s.body, indent + 1))
            out.append(f"{pad}END LOOP {s.label};")
        elif isinstance(s, P.RepeatUntil):
            out.append(f"{pad}{s.label}: REPEAT")
            out.append(_render(s.body, indent + 1))
            out.append(f"{pad}UNTIL {s.until} END REPEAT {s.label};")
        elif isinstance(s, P.While):
            out.append(f"{pad}{s.label}: WHILE {s.cond} DO")
            out.append(_render(s.body, indent + 1))
            out.append(f"{pad}END WHILE {s.label};")
        elif isinstance(s, P.Block):
            out.append(f"{pad}{s.label}: BEGIN" if s.label else f"{pad}BEGIN")
            out.append(_render(s.body, indent + 1))
            out.append(f"{pad}END {s.label};" if s.label else f"{pad}END;")
        elif isinstance(s, P.CaseStmt):
            out.append(
                f"{pad}CASE {s.subject}" if s.subject else f"{pad}CASE"
            )
            for cond, body in s.branches:
                out.append(
                    f"{pad}WHEN {cond} THEN"
                    if cond is not None
                    else f"{pad}ELSE"
                )
                out.append(_render(body, indent + 1))
            out.append(f"{pad}END CASE;")
    return "\n".join(out)


@given(_stmts(depth=2, label=None))
@settings(max_examples=150, deadline=None)
def test_procedural_parser_roundtrip(tree):
    tree = list(tree) + [P.Return("v1")]  # body must return
    body = _render(tree)
    parsed = P.parse_procedural(
        body, "fuzz", lambda masked: masked.strip(), lambda t: "INTEGER"
    )
    assert parsed.statements == tree, f"\nBODY:\n{body}"
    # and the emitter prints balanced plpgsql for whatever was parsed
    out = P.emit_statements(parsed.statements)
    assert out.count("IF ") + out.count("IF\n") >= out.count("END IF;")
    assert out.count("LOOP") % 2 == 0 or "WHILE" in out
    # round 10: the structural plpgsql grammar accepts every emission
    from mysql2pg_spark.schema.plpgsql_check import check_plpgsql_body

    assert check_plpgsql_body("BEGIN\n" + out + "\nEND") == [], (
        f"\nEMITTED:\n{out}"
    )


# round 7: multi-assignment SET — `SET a = e1, b = e2, …;` must parse to
# the SAME sequential Assigns as separate SET statements, including
# expressions whose call arguments contain commas (the paren-aware split)
_EXPR_COMMA = st.sampled_from(
    ["v1 + 1", "GREATEST(v1, 2)", "COALESCE(v2, v1, 0)", "42"]
)


@given(
    st.lists(
        st.tuples(_names("v"), _EXPR_COMMA), min_size=1, max_size=4
    )
)
@settings(max_examples=100, deadline=None)
def test_multi_assignment_set_splits_sequentially(pairs):
    joined = "SET " + ", ".join(f"{v} = {e}" for v, e in pairs) + ";"
    body = f"{joined}\nRETURN v1;"
    parsed = P.parse_procedural(
        body, "fuzz_ma", lambda masked: masked.strip(), lambda t: "INTEGER"
    )
    expect = [P.Assign(v, e) for v, e in pairs] + [P.Return("v1")]
    assert parsed.statements == expect, f"\nBODY:\n{body}"


# round 7: CONTINUE HANDLER FOR SQLEXCEPTION — for any tree, parsing the
# body with the handler declared must yield exactly the per-statement
# TryWrap transform of parsing the body without it (the wrap never
# reorders, drops, or duplicates statements)
@given(_stmts(depth=2, label=None))
@settings(max_examples=100, deadline=None)
def test_continue_handler_wraps_every_statement(tree):
    tree = list(tree) + [P.Return("v1")]
    body = _render(tree)
    handler = (
        "DECLARE CONTINUE HANDLER FOR SQLEXCEPTION SET err = err + 1;\n"
    )
    parsed = P.parse_procedural(
        handler + body, "fuzz_ch",
        lambda masked: masked.strip(), lambda t: "INTEGER",
    )
    action = [P.Assign("err", "err + 1")]
    assert parsed.statements == P._wrap_continue(tree, [("others", action)])
    assert parsed.exc_clauses == []
    # one EXCEPTION clause per TryWrap (plain nested Blocks also emit
    # BEGIN, so count wraps, not BEGINs)
    def _count_wraps(stmts):
        n = 0
        for s in stmts:
            if isinstance(s, P.TryWrap):
                n += 1 + _count_wraps(s.body)
            elif isinstance(s, (P.Block, P.Loop, P.While, P.RepeatUntil)):
                n += _count_wraps(s.body)
            elif isinstance(s, (P.If, P.CaseStmt)):
                n += sum(_count_wraps(b) for _, b in s.branches)
        return n

    out = P.emit_statements(parsed.statements)
    assert out.count("EXCEPTION WHEN others THEN") == _count_wraps(
        parsed.statements
    )


# round 8: block-scoped declarations — for any tree, wrapping it in a
# nested BEGIN block that declares its own variable (with DEFAULT) and
# its own EXIT handler must parse to a Block node carrying exactly that
# declare and that EXCEPTION clause, with the inner body unchanged
# (handlers/declares attach to their OWN block, never lift to function
# scope)
@given(_stmts(depth=2, label=None))
@settings(max_examples=100, deadline=None)
def test_nested_block_owns_declares_and_handlers(tree):
    tree = list(tree)
    inner = _render(tree, indent=2)
    body = (
        "BEGIN\n"
        "  DECLARE nb1 INT DEFAULT 7;\n"
        "  DECLARE EXIT HANDLER FOR SQLEXCEPTION SET nb1 = 0;\n"
        f"{inner}\n"
        "END;\n"
        "RETURN v1;"
    )
    parsed = P.parse_procedural(
        body, "fuzz_nb", lambda masked: masked.strip(), lambda t: "INTEGER"
    )
    # function scope holds nothing from the nested block
    assert parsed.declares == []
    assert parsed.exc_clauses == []
    blk, ret = parsed.statements
    assert isinstance(blk, P.Block) and isinstance(ret, P.Return)
    assert blk.declares == [("nb1", "INTEGER := 7")]
    assert blk.exc_clauses == [("others", [P.Assign("nb1", "0")])]
    assert blk.body == tree
    # the emitted plpgsql keeps the declaration and clause inside the
    # nested block's own DECLARE/EXCEPTION sections
    out = P.emit_statements(parsed.statements)
    assert out.index("DECLARE") < out.index("nb1 INTEGER := 7;")
    assert out.index("EXCEPTION WHEN others THEN") < out.rindex("END;")


# round 9: @user variables — whatever mix of @var assignments and reads
# the body carries, the builder either translates (no '@' survives into
# the emitted plpgsql; every distinct var gets exactly one uv_ DECLARE)
# or refuses loudly — never emits plpgsql containing a MySQL @var.
_UV_NAMES = st.sampled_from(["t1", "total", "msg", "n2"])
_UV_EXPRS = st.sampled_from(
    ["1", "42", "2.5", "'tag'", "@t1 + 1", "@total * 2",
     "CONCAT(@msg, 'x')", "v1 + @n2", "NULL"]
)


@given(
    st.lists(st.tuples(_UV_NAMES, _UV_EXPRS), min_size=1, max_size=5),
    st.sampled_from(["@t1", "@total", "v1", "42"]),
)
@settings(max_examples=120, deadline=None)
def test_uservar_rewrite_total(assigns, ret):
    from mysql2pg_spark.sinks.plpgsql import emit_plpgsql
    from mysql2pg_spark.sinks.plpgsql_builder import (
        UnsupportedFunctionError,
        build_spec_from_mysql,
    )

    body = "DECLARE v1 INT DEFAULT 0;\n" + "\n".join(
        f"SET {v_} = {e};" for v_, e in ((f"@{v}", e) for v, e in assigns)
    ) + f"\nRETURN {ret};"
    ddl = ("CREATE FUNCTION fz(x INT) RETURNS INT NO SQL BEGIN\n"
           + body + "\nEND")
    try:
        out = emit_plpgsql(build_spec_from_mysql(ddl))
    except UnsupportedFunctionError:
        return  # loud refusal is always acceptable
    assert "@" not in out
    seen = {v for v, _ in assigns} | (
        {ret[1:]} if ret.startswith("@") else set()
    )
    import re as _re

    for v in seen:
        # exactly one synthesized DECLARE per distinct @var
        assert len(
            _re.findall(rf"uv_{v} \S+ := NULL;", out)
        ) == 1, out
    # round 10: every emitted function passes the structural grammar
    from mysql2pg_spark.schema.plpgsql_check import check_script

    assert check_script(out) == [], out
