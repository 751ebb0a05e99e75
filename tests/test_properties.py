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
