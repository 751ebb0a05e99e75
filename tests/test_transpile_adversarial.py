"""Adversarial property tests for the transpiler (SURVEY §2.C grammar).

The reference's regex chain broke exactly on nested calls with
quoted literals containing ``),(`` and friends (sync_functions.go:430-465
carries hardcoded patches for those cases). Here hypothesis generates
random expression TREES over the C12-C33 string/conditional subset,
renders them in MySQL spelling, and checks the transpiled output by
EXECUTION, not text comparison:

- Spark executes ``transpile_mysql`` output; the result must equal the
  ground truth computed directly from the tree in Python (MySQL
  semantics, implemented independently of the transpiler);
- DuckDB executes ``transpile_mysql_ansi`` output for the ANSI-safe
  subset (the sink-side CREATE VIEW path) against the same ground
  truth.

Trees are constant expressions, so each example is a sub-100ms
``SELECT``; literals draw from an alphabet heavy in ``),(``, quotes,
commas and parens — the tokens that break naive splitting.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mysql2pg_spark.dialect.transpile import (
    transpile_mysql,
    transpile_mysql_ansi,
)

# ASCII-only (locale-stable upper/lower), no backslashes (renderer uses
# '' doubling), rich in structural characters.
_ALPHABET = "ab C),(',%_.9-"

_text = st.text(alphabet=_ALPHABET, max_size=12)


def _leaf():
    return _text.map(lambda s: ("lit", s))


def _node(children):
    return st.one_of(
        st.tuples(st.just("concat"), st.lists(children, min_size=2, max_size=3)),
        st.tuples(st.just("if"), st.booleans(), children, children),
        st.tuples(st.just("ifnull_null"), children),
        st.tuples(st.just("upper"), children),
        st.tuples(st.just("lower"), children),
        st.tuples(st.just("reverse"), children),
        st.tuples(st.just("trim"), children),
        st.tuples(
            st.just("replace"),
            children,
            st.text(alphabet=_ALPHABET, min_size=1, max_size=3),
            st.text(alphabet=_ALPHABET, max_size=3),
        ),
        st.tuples(
            st.just("ssi"),
            children,
            st.sampled_from([",", "),(", "a", "%"]),
            st.integers(min_value=-3, max_value=3),
        ),
    )


_tree = st.recursive(_leaf(), _node, max_leaves=8)
# the ANSI/DuckDB-safe subset: no IF(), no SUBSTRING_INDEX
_ANSI_OPS = {"lit", "concat", "ifnull_null", "upper", "lower", "reverse",
             "trim", "replace"}


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _render(t) -> str:
    """Tree → MySQL spelling."""
    op = t[0]
    if op == "lit":
        return _q(t[1])
    if op == "concat":
        return "CONCAT(" + ", ".join(_render(c) for c in t[1]) + ")"
    if op == "if":
        cond = "1<2" if t[1] else "2<1"
        return f"IF({cond}, {_render(t[2])}, {_render(t[3])})"
    if op == "ifnull_null":
        return f"IFNULL(NULL, {_render(t[1])})"
    if op in ("upper", "lower", "reverse", "trim"):
        return f"{op.upper()}({_render(t[1])})"
    if op == "replace":
        return f"REPLACE({_render(t[1])}, {_q(t[2])}, {_q(t[3])})"
    if op == "ssi":
        return f"SUBSTRING_INDEX({_render(t[1])}, {_q(t[2])}, {t[3]})"
    raise AssertionError(op)


def _eval(t) -> str:
    """Tree → expected value under MySQL semantics (independent impl)."""
    op = t[0]
    if op == "lit":
        return t[1]
    if op == "concat":
        return "".join(_eval(c) for c in t[1])
    if op == "if":
        return _eval(t[2]) if t[1] else _eval(t[3])
    if op == "ifnull_null":
        return _eval(t[1])
    if op == "upper":
        return _eval(t[1]).upper()
    if op == "lower":
        return _eval(t[1]).lower()
    if op == "reverse":
        return _eval(t[1])[::-1]
    if op == "trim":
        return _eval(t[1]).strip(" ")  # MySQL TRIM strips spaces only
    if op == "replace":
        return _eval(t[1]).replace(t[2], t[3])
    if op == "ssi":
        s, d, n = _eval(t[1]), t[2], t[3]
        if n == 0:
            return ""
        parts = s.split(d)
        if n > 0:
            return d.join(parts[:n]) if n < len(parts) else s
        return d.join(parts[n:]) if -n < len(parts) else s
    raise AssertionError(op)


def _ops(t) -> set:
    out = {t[0]}
    for c in t[1:]:
        if isinstance(c, tuple):
            out |= _ops(c)
        elif isinstance(c, list):
            for x in c:
                out |= _ops(x)
    return out


@given(_tree)
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_transpiled_tree_executes_to_mysql_semantics(spark, t):
    sql = transpile_mysql(f"SELECT {_render(t)} AS v")
    got = spark.sql(sql).collect()[0].v
    assert got == _eval(t), sql


@given(_tree.filter(lambda t: _ops(t) <= _ANSI_OPS))
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ansi_rendering_executes_in_duckdb(t):
    sql = transpile_mysql_ansi(f"SELECT {_render(t)} AS v")
    got = duckdb.sql(sql).fetchone()[0]
    assert got == _eval(t), sql


def test_known_regex_breakers(spark):
    """The exact shapes the reference patched by hand: nested calls whose
    literals contain tuple separators and unbalanced-looking parens."""
    cases = [
        ("SELECT CONCAT('),(', UPPER('a),(b')) AS v", "),(A),(B"),
        ("SELECT IF(1<2, CONCAT('(', ')('), 'x') AS v", "()("),
        ("SELECT REPLACE(CONCAT('a,b),(c', 'd'), '),(', '|') AS v", "a,b|cd"),
        ("SELECT SUBSTRING_INDEX('x),(y),(z', '),(', 2) AS v", "x),(y"),
        ("SELECT IFNULL(NULL, LOWER('A''B')) AS v", "a'b"),
    ]
    for sql, want in cases:
        got = spark.sql(transpile_mysql(sql)).collect()[0].v
        assert got == want, sql
