"""Golden PG DDL for the reference corpus (round-6 ask #6).

No PG grammar (pglast/libpg_query) is installable in this sandbox, so
the PG-only spellings — SERIAL/IDENTITY, COMMENT ON, GRANT/ROLE,
CREATE OR REPLACE FUNCTION … $$ plpgsql — are validated two ways:

1. byte-diff against the committed golden file
   (``tests/golden/corpus_pg_ddl.sql``): any change to the emitted PG
   DDL becomes a reviewable diff, never a silent drift;
2. a structural lint of every statement: whitelisted statement heads,
   balanced parens outside string literals, balanced quotes/dollar
   tags, and zero MySQL-isms (backticks, AUTO_INCREMENT, ENGINE=,
   unsigned) or masking sentinels.

The golden already caught one real bug at introduction: the dump
parser read ``AUTO_INCREMENT`` inside a ``--`` line comment and
emitted SERIAL for two plain columns (case_11).
"""

from __future__ import annotations

import os
import re

GOLDEN = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "golden", "corpus_pg_ddl.sql"
)

# splitting / masking / head whitelist / MySQL-ism scan live in the
# reusable lint module so the CLI's `--mode pgddl --check` gates on the
# SAME checks (one source of truth)
from mysql2pg_spark.schema.ddl_lint import (  # noqa: E402
    MYSQL_ISMS as _MYSQL_ISMS,
    STATEMENT_HEADS as _STATEMENT_HEADS,
    lint_ddl,
    mask_bodies as _masked,
    split_statements as _statements,
)


def test_golden_corpus_ddl_matches_regeneration(spark):
    from tools.dump_corpus_ddl import corpus_pg_ddl_text

    regenerated = corpus_pg_ddl_text(spark)
    committed = open(GOLDEN).read()
    assert regenerated == committed, (
        "emitted PG DDL drifted from the golden corpus — review the "
        "diff and regenerate with `python tools/dump_corpus_ddl.py`"
    )


def test_golden_corpus_ddl_structure():
    text = open(GOLDEN).read()
    assert lint_ddl(text) == []
    stmts = _statements(text)
    # the whole corpus is present: 61 tables, 100+ indexes, 10 views
    # (9 CREATE + case08's absence), 3 functions, roles + grants
    assert len(stmts) > 180, len(stmts)
    heads = {h: 0 for h in _STATEMENT_HEADS}
    for stmt in stmts:
        up = stmt.upper()
        head = next((h for h in _STATEMENT_HEADS if up.startswith(h)), None)
        assert head is not None, f"unexpected statement head: {stmt[:80]!r}"
        heads[head] += 1
        m = _masked(stmt)
        assert m.count("(") == m.count(")"), stmt[:120]
        assert m.count("'") % 2 == 0, stmt[:120]
        assert stmt.count("$$") % 2 == 0, stmt[:120]
        for bad in _MYSQL_ISMS:
            assert bad not in m.upper(), (bad, stmt[:120])
    assert heads["CREATE TABLE"] >= 55
    assert heads["CREATE INDEX"] + heads["CREATE UNIQUE INDEX"] >= 100
    assert heads["CREATE OR REPLACE VIEW"] >= 9
    assert heads["CREATE OR REPLACE FUNCTION"] == 3
    assert heads["CREATE ROLE"] == 2
    assert heads["GRANT "] >= 6
    # serial sugar appears ONLY for genuine AUTO_INCREMENT columns
    assert text.count("SERIAL") == 2
