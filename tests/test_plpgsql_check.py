"""Structural plpgsql grammar check (round 10): the emitted bodies
have never met a real PostgreSQL parser in this sandbox, so
schema/plpgsql_check.py is the stand-in — these tests prove it (a)
accepts every golden the C95 translator emits and (b) REJECTS seeded
mutations a real parser would reject (dropped END, swapped semicolon,
dangling THEN), i.e. the gate has teeth."""

from __future__ import annotations

import os
import re

import pytest

from mysql2pg_spark.schema.plpgsql_check import (
    check_plpgsql_body,
    check_script,
)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _golden(name: str) -> str:
    with open(os.path.join(GOLDEN_DIR, name)) as fh:
        return fh.read()


def test_golden_scripts_pass():
    assert check_script(_golden("corpus_functions_pg.sql")) == []
    assert check_script(_golden("corpus_pg_ddl.sql")) == []


def test_inline_goldens_from_proc_suite_pass():
    """Every inline golden the C95 test suite pins (procedures with
    refcursors, @var locals, loops, handlers) parses structurally."""
    import tests.test_schema as ts

    checked = 0
    for attr in dir(ts):
        if attr.endswith("GOLDEN") and isinstance(getattr(ts, attr), str):
            text = getattr(ts, attr)
            if "$$" not in text:
                continue
            assert check_script(text) == [], attr
            checked += 1
    assert checked >= 3  # the suite carries several $$ goldens


COMPLEX_BODY = """
DECLARE
    uv_total NUMERIC := NULL;
    done BOOLEAN := false;
    v DECIMAL(18,2);
    cur refcursor;
BEGIN
    uv_total := 0;
    OPEN cur FOR SELECT o_totalprice FROM orders WHERE ok = 1;
    <<read_loop>>
    LOOP
        FETCH NEXT FROM cur INTO v;
        IF NOT FOUND THEN done := true; END IF;
        IF done THEN
            EXIT read_loop;
        END IF;
        uv_total := uv_total + v;
    END LOOP read_loop;
    CLOSE cur;
    CASE
        WHEN uv_total > 100 THEN
            uv_total := uv_total * 0.9;
        WHEN uv_total > 10 THEN
            uv_total := uv_total * 0.95;
        ELSE
            uv_total := uv_total;
    END CASE;
    WHILE done LOOP
        done := false;
    END LOOP;
    FOR i IN 1..3 LOOP
        uv_total := uv_total + i;
    END LOOP;
    IF CASE WHEN done THEN 1 ELSE 0 END = 1 THEN
        uv_total := 0;
    ELSIF uv_total < 0 THEN
        uv_total := -uv_total;
    ELSE
        uv_total := uv_total + 1;
    END IF;
    BEGIN
        uv_total := uv_total / 0;
    EXCEPTION WHEN others THEN
        uv_total := NULL;
    END;
    RAISE EXCEPTION USING ERRCODE = 'P0001',
        MESSAGE = 'no -- comment here', HINT = 'h';
    RETURN uv_total; -- trailing comment
END
"""


def test_complex_body_accepted():
    assert check_plpgsql_body(COMPLEX_BODY) == []


@pytest.mark.parametrize(
    "mutate, why",
    [
        # drop the END IF; of the first IF
        (lambda b: b.replace(
            "IF NOT FOUND THEN done := true; END IF;",
            "IF NOT FOUND THEN done := true;", 1), "dropped END IF"),
        # drop an END LOOP
        (lambda b: b.replace("    END LOOP read_loop;\n", "", 1),
         "dropped END LOOP"),
        # swap a semicolon for a comma
        (lambda b: b.replace("uv_total := 0;", "uv_total := 0,", 1),
         "semicolon swapped for comma"),
        # drop a statement's semicolon entirely
        (lambda b: b.replace("CLOSE cur;", "CLOSE cur", 1),
         "dropped statement semicolon"),
        # END CASE -> END (expression-style close on a statement CASE)
        (lambda b: b.replace("END CASE;", "END;", 1),
         "END CASE mangled"),
        # orphan ELSE (no IF)
        (lambda b: b.replace("RETURN uv_total;",
                             "ELSE RETURN uv_total;", 1),
         "orphan ELSE"),
        # EXCEPTION with no WHEN arm
        (lambda b: b.replace(
            "EXCEPTION WHEN others THEN\n        uv_total := NULL;",
            "EXCEPTION", 1), "empty EXCEPTION section"),
        # dangling THEN in a condition (drop the comparison's THEN)
        (lambda b: b.replace("ELSIF uv_total < 0 THEN",
                             "ELSIF uv_total < 0", 1),
         "dropped THEN"),
        # last declaration bleeding into BEGIN (dropped ';')
        (lambda b: b.replace("cur refcursor;", "cur refcursor", 1),
         "dropped declaration semicolon"),
        # trailing garbage after the final END
        (lambda b: b + "\nSELECT 1;", "trailing tokens"),
        # unterminated string literal
        (lambda b: b.replace("HINT = 'h'", "HINT = 'h", 1),
         "unterminated string"),
    ],
)
def test_seeded_mutations_rejected(mutate, why):
    broken = mutate(COMPLEX_BODY)
    assert broken != COMPLEX_BODY, f"mutation not applied: {why}"
    assert check_plpgsql_body(broken) != [], why


def test_mutated_golden_script_rejected():
    """Dropping one END from a real emitted golden must flag the
    routine by name."""
    text = _golden("corpus_functions_pg.sql")
    broken = text.replace("END;\n$$ LANGUAGE plpgsql;",
                          "\n$$ LANGUAGE plpgsql;", 1)
    assert broken != text
    probs = check_script(broken)
    assert probs and any("get_joined_data" in p for p in probs)


def test_lint_ddl_carries_plpgsql_problems():
    """The CLI --check surface (lint_ddl) now includes the grammar
    check, so a structurally broken routine fails the same gate."""
    from mysql2pg_spark.schema.ddl_lint import lint_ddl

    good = (
        "CREATE OR REPLACE FUNCTION f(x integer)\nRETURNS integer\n"
        "STABLE AS $$\nBEGIN\n    RETURN x + 1;\nEND;\n"
        "$$ LANGUAGE plpgsql"
    )
    assert lint_ddl(good) == []
    bad = good.replace("END;", "", 1)
    assert any("f" in p for p in lint_ddl(bad))


def test_sql_language_functions_skipped():
    """LANGUAGE sql bodies are not plpgsql — no false positives."""
    txt = (
        "CREATE OR REPLACE FUNCTION f(x integer) RETURNS integer\n"
        "AS $$ SELECT x + 1 $$ LANGUAGE sql"
    )
    assert check_script(txt) == []


def test_tagged_dollar_quote_body_checked():
    """ADVICE r10: a tagged-quote emission ($fn$…$fn$) must extract and
    check the body instead of reporting 'no $$ body'."""
    good = (
        "CREATE OR REPLACE FUNCTION f(x integer) RETURNS integer\n"
        "AS $fn$\nBEGIN\n    RETURN x + 1;\nEND;\n$fn$ LANGUAGE plpgsql"
    )
    assert check_script(good) == []
    bad = good.replace("END;", "", 1)
    assert any("f" in p for p in check_script(bad))


def test_second_dollar_string_does_not_swallow_body():
    """Tag-matched non-greedy extraction anchored on AS: a second
    dollar-quoted string AFTER the body (e.g. in a COMMENT statement
    sharing the script) must not merge into the body via a greedy
    first-$$-to-last-$$ match."""
    txt = (
        "CREATE OR REPLACE FUNCTION f(x integer) RETURNS integer\n"
        "AS $$\nBEGIN\n    RETURN x + 1;\nEND;\n$$ LANGUAGE plpgsql;\n"
        "COMMENT ON FUNCTION f(integer) IS 'adds one';\n"
        "CREATE OR REPLACE FUNCTION g(y integer) RETURNS integer\n"
        "AS $$\nBEGIN\n    RETURN y - 1;\nEND;\n$$ LANGUAGE plpgsql;\n"
    )
    assert check_script(txt) == []
    # break only g: the problem names g, and f stays green — proof the
    # two bodies were extracted independently
    broken = txt.replace("RETURN y - 1;", "RETURN y - 1", 1)
    probs = check_script(broken)
    assert probs and all("g" in p for p in probs)


def test_unterminated_dollar_body_reported_explicitly():
    txt = (
        "CREATE OR REPLACE FUNCTION f(x integer) RETURNS integer\n"
        "AS $fn$\nBEGIN\n    RETURN x + 1;\nEND;\n$$ LANGUAGE plpgsql"
    )
    probs = check_script(txt)
    assert probs and "unterminated" in probs[0]


def test_split_statements_respects_tagged_quotes():
    """The ddl_lint splitter must not cut a $tag$ body at its inner
    semicolons (it previously recognized only bare $$)."""
    from mysql2pg_spark.schema.ddl_lint import split_statements

    txt = (
        "CREATE FUNCTION f() RETURNS integer AS $fn$\n"
        "BEGIN\n    RETURN 1;\nEND;\n$fn$ LANGUAGE plpgsql;\n"
        "SELECT 2;\n"
    )
    stmts = split_statements(txt)
    assert len(stmts) == 2
    assert "RETURN 1;" in stmts[0] and stmts[1] == "SELECT 2"


def test_mask_bodies_handles_tagged_quotes():
    """review r11: the lint's mask must cover $tag$ bodies like the
    splitter does — an unmasked tagged body's apostrophes and keywords
    would false-flag the balance/MySQL-ism scans."""
    from mysql2pg_spark.schema.ddl_lint import lint_ddl

    txt = (
        "CREATE OR REPLACE FUNCTION f(x integer)\nRETURNS integer\n"
        "STABLE AS $fn$\nBEGIN\n    RETURN IFNULL_LEN(x);\nEND;\n"
        "$fn$ LANGUAGE plpgsql"
    )
    # IFNULL_LEN is a (fake) identifier containing the MySQL-ism token
    # IFNULL; with the body masked the scan must not see it
    assert lint_ddl(txt) == []


# ---- round 13: grammar gate for the partition + pg_cron DDL families ----


def test_cron_schedule_gate_accepts_emitted_shapes():
    from mysql2pg_spark.schema.events import event_actions
    from mysql2pg_spark.schema.plpgsql_check import check_cron_schedule

    for sql in [
        "CREATE EVENT e ON SCHEDULE EVERY 1 DAY "
        "STARTS '2024-01-01 03:30:00' DO DELETE FROM t WHERE x < NOW()",
        "CREATE EVENT o ON SCHEDULE AT '2030-06-01 12:30:00' "
        "DO SELECT purge_fn()",
        "CREATE EVENT w ON SCHEDULE EVERY 1 HOUR "
        "ENDS '2026-06-01 00:00:00' DO DELETE FROM t",
        "CREATE EVENT s ON SCHEDULE EVERY 30 SECOND DO DELETE FROM t",
    ]:
        for kind, payload in event_actions(sql):
            if kind == "ddl" and payload.startswith("SELECT cron.schedule"):
                assert check_cron_schedule(payload) == [], payload


def test_cron_schedule_gate_rejects_seeded_errors():
    from mysql2pg_spark.schema.plpgsql_check import check_cron_schedule

    # out-of-range hour field
    bad = ("SELECT cron.schedule('j', '0 25 * * *', $evt$DELETE FROM "
           "t$evt$)")
    assert any("outside" in p for p in check_cron_schedule(bad))
    # four fields
    bad = "SELECT cron.schedule('j', '0 0 * *', $evt$DELETE FROM t$evt$)"
    assert any("5 cron fields" in p for p in check_cron_schedule(bad))
    # interval above pg_cron's cap
    bad = "SELECT cron.schedule('j', '90 seconds', $evt$DELETE FROM t$evt$)"
    assert any("1-59" in p for p in check_cron_schedule(bad))
    # mismatched dollar tags = not the canonical shape
    bad = "SELECT cron.schedule('j', '0 0 * * *', $evt$DELETE$tve$)"
    assert any("canonical" in p for p in check_cron_schedule(bad))
    # command head outside the emitted subset
    bad = ("SELECT cron.schedule('j', '0 0 * * *', "
           "$evt$DROP TABLE t$evt$)")
    assert any("command head" in p for p in check_cron_schedule(bad))
    # DO block with a seeded plpgsql structure error (missing END IF)
    bad = ("SELECT cron.schedule('j', '0 0 * * *', $evt$DO $do$ BEGIN "
           "IF now() >= TIMESTAMP '2030-01-01' THEN PERFORM f(); "
           "END $do$$evt$)")
    assert any("DO block" in p for p in check_cron_schedule(bad))


def test_check_script_digs_into_cron_do_blocks():
    """check_script (used by the events golden) now validates the
    year/daily-guard DO emulations' plpgsql bodies — a seeded
    separator error inside the dollar-quoted command is caught."""
    from mysql2pg_spark.schema.plpgsql_check import check_script

    good = ("SELECT cron.schedule('once', '30 12 * * *', $evt$DO $do$ "
            "BEGIN IF now() >= TIMESTAMP '2030-06-01 12:30:00' THEN "
            "DELETE FROM t; PERFORM cron.unschedule('once'); "
            "END IF; END $do$$evt$);\n")
    assert check_script(good) == []
    # dropped ';' after END IF — the separator class a typo'd emitter
    # would produce
    bad = good.replace("END IF; END", "END IF END")
    assert any("DO block" in p for p in check_script(bad))
    # out-of-range schedule field is caught at the script level too
    bad = good.replace("'30 12 * * *'", "'30 12 32 * *'")
    assert any("outside" in p for p in check_script(bad))


def test_partition_ddl_gate():
    from mysql2pg_spark.schema.ddl_lint import (
        check_partition_child,
        lint_ddl,
    )

    # emitted shapes pass
    for ddl in [
        "CREATE TABLE IF NOT EXISTS t_p0 PARTITION OF t "
        "FOR VALUES FROM (MINVALUE) TO (10)",
        "CREATE TABLE IF NOT EXISTS t_pa PARTITION OF t "
        "FOR VALUES IN ('east', 'west')",
        "CREATE TABLE IF NOT EXISTS t_s0 PARTITION OF t_p0 "
        "FOR VALUES WITH (MODULUS 12, REMAINDER 0)",
        "CREATE TABLE IF NOT EXISTS t_p1 PARTITION OF t "
        "FOR VALUES FROM (10) TO (MAXVALUE) "
        "PARTITION BY HASH ((TO_DAYS(purchased)))",
    ]:
        assert check_partition_child(ddl) == [], ddl
    # seeded errors reject
    assert any(
        "REMAINDER >= MODULUS" in p
        for p in check_partition_child(
            "CREATE TABLE t_s9 PARTITION OF t_p0 "
            "FOR VALUES WITH (MODULUS 4, REMAINDER 4)"
        )
    )
    assert any(
        "arity mismatch" in p
        for p in check_partition_child(
            "CREATE TABLE t_p0 PARTITION OF t "
            "FOR VALUES FROM (MINVALUE, MINVALUE) TO (10)"
        )
    )
    assert any(
        "canonical" in p
        for p in check_partition_child(
            "CREATE TABLE t_p0 PARTITION OF t FOR VALUES LESS THAN (10)"
        )
    )
    # lint_ddl routes child statements through the gate and checks
    # the parent clause is statement-final
    bad_script = (
        "CREATE TABLE t (\n  id INTEGER\n) PARTITION BY RANGE (id);\n"
        "CREATE TABLE t_p0 PARTITION OF t FOR VALUES LESS THAN (10);\n"
    )
    assert any("canonical" in p for p in lint_ddl(bad_script))
    good_script = (
        "CREATE TABLE t (\n  id INTEGER\n) PARTITION BY RANGE (id);\n"
        "CREATE TABLE t_p0 PARTITION OF t "
        "FOR VALUES FROM (MINVALUE) TO (10);\n"
    )
    assert lint_ddl(good_script) == []


def test_expression_grammar_accepts_emitted_shapes():
    """Round 14 (VERDICT r13 ask #6): every CHECK-body and DO-block
    guard shape the emitters produce parses under the real expression
    grammar — not just paren balancing."""
    from mysql2pg_spark.schema.ddl_lint import check_expression

    for expr in [
        "age > 18",
        "e1 IN ('a', 'b', 'c')",
        "string_to_array(s1, ',') <@ ARRAY['x', 'y', 'z']::text[]",
        "now() >= TIMESTAMP '2024-01-01 00:00:00' - interval '1 minute'",
        "floor(extract(epoch from now()) / 60)::bigint % 7 = 0",
        "round(extract(epoch from now() - TIMESTAMP "
        "'2024-03-01 04:30:00') / 86400)::bigint % 2 = 0 "
        "AND now() >= TIMESTAMP '2024-03-01 04:30:00' "
        "- interval '1 minute'",
        "extract(day from now())::int = least(31, extract(day from "
        "(date_trunc('month', now()) + interval '1 month' "
        "- interval '1 day'))::int)",
        "((extract(year from now())::int * 12 + "
        "extract(month from now())::int) - 24289) % 5 = 0",
        "a IS NOT NULL AND b BETWEEN 1 AND 10",
        "CASE WHEN x > 0 THEN 'p' ELSE 'n' END = 'p'",
        "price NOT IN (1, 2) OR name LIKE 'a%'",
        "c IS DISTINCT FROM 0",
        "arr[1] = 2",
    ]:
        assert check_expression(expr) == [], expr


def test_expression_grammar_rejects_seeded_typos():
    from mysql2pg_spark.schema.ddl_lint import check_expression

    for expr in [
        "age > > 18",                        # doubled operator
        "extract(epoch now())",              # missing FROM
        "e1 IN ('a', 'b',)",                 # trailing comma
        "floor(extract(epoch from now() / 60",  # unclosed calls
        "a AND AND b",                       # doubled conjunction
        "x = 1 ORDER",                       # trailing garbage
        "ARRAY['x' 'y']",                    # missing comma
        "a::  = 1",                          # cast without a type
        "CASE WHEN x THEN END",              # empty THEN branch
        "age >< 18",                         # operator soup
        "(a = 1))",                          # extra close paren
        "",                                  # empty
    ]:
        assert check_expression(expr), expr


def test_check_bodies_linted_by_expression_grammar():
    from mysql2pg_spark.schema.ddl_lint import lint_ddl

    good = "ALTER TABLE t ADD CONSTRAINT c CHECK (age > 18);"
    assert lint_ddl(good) == []
    bad = "ALTER TABLE t ADD CONSTRAINT c CHECK (age > > 18);"
    assert any("CHECK body" in p for p in lint_ddl(bad))


def test_atomic_disable_do_block_gated():
    """The round-14 DISABLE'd-event DO statement gets (a) the plpgsql
    body check, (b) the cron gate on every schedule call inside it,
    and (c) the expression grammar on its inner DO-block guards —
    seeded errors in each layer are rejected; the golden is clean."""
    import os

    from mysql2pg_spark.schema.ddl_lint import lint_ddl
    from mysql2pg_spark.schema.plpgsql_check import check_script

    golden = os.path.join(
        os.path.dirname(__file__), "golden", "events_pg.sql"
    )
    text = open(golden).read()
    assert "DO $do1$ BEGIN PERFORM cron.schedule(" in text
    assert check_script(text) == []
    assert lint_ddl(text) == []
    # seeded: guard typo inside the scheduled command's DO block
    probs = check_script(text.replace("% 2 = 0", "% 2 = = 0"))
    assert any("DO-block guard" in p for p in probs), probs[:3]
    # seeded: out-of-range cron field inside the atomic DO block
    probs = check_script(text.replace("'30 4 * * *'", "'30 99 * * *'"))
    assert any("outside 0-23" in p for p in probs), probs[:3]
    # a bare DO statement that schedules nothing is not in the grammar
    probs = check_script("DO $x$ BEGIN PERFORM 1; END $x$;")
    assert any("without a cron.schedule" in p for p in probs), probs
    assert any(
        "without a cron.schedule" in p
        for p in lint_ddl("DO $x$ BEGIN PERFORM 1; END $x$;")
    )


def test_multi_constraint_alter_lints_each_check_body():
    """ADVICE r14 (ddl_lint): a multi-action ALTER with two ADD
    CONSTRAINT ... CHECK actions must lint each body independently —
    the old greedy regex captured across both and raised a false
    expression-grammar problem on valid DDL."""
    from mysql2pg_spark.schema.ddl_lint import lint_ddl

    multi = (
        "ALTER TABLE t ADD CONSTRAINT a CHECK (x > 1), "
        "ADD CONSTRAINT b CHECK (y < 2);"
    )
    assert lint_ddl(multi) == []
    # a seeded typo in the SECOND body is still caught
    bad = (
        "ALTER TABLE t ADD CONSTRAINT a CHECK (x > 1), "
        "ADD CONSTRAINT b CHECK (y < < 2);"
    )
    assert any("CHECK body" in p for p in lint_ddl(bad))
    # parens inside a string literal don't derail the balanced scan
    lit = "ALTER TABLE t ADD CONSTRAINT a CHECK (s IN (':-)', 'b'));"
    assert lint_ddl(lit) == []


def test_if_guard_extraction_handles_case_then_and_strings():
    """ADVICE r14 (plpgsql_check): the DO-block guard extractor must
    scan to the MATCHING statement-level THEN — a CASE ... THEN inside
    the guard or a ' THEN ' inside a string literal must not truncate
    the extracted expression."""
    from mysql2pg_spark.schema.plpgsql_check import _if_guards

    body = """
BEGIN
  IF CASE WHEN a > 1 THEN 1 ELSE 0 END = 1 THEN
    PERFORM 1;
  END IF;
  IF note = 'x THEN y' AND b < 2 THEN
    PERFORM 2;
  ELSIF b >= 2 THEN
    PERFORM 3;
  END IF;
END
"""
    guards = _if_guards(body)
    assert guards[0] == "CASE WHEN a > 1 THEN 1 ELSE 0 END = 1"
    assert guards[1] == "note = 'x THEN y' AND b < 2"
    assert guards[2] == "b >= 2"
    assert len(guards) == 3  # the END IFs are not guard openers


def test_if_guard_not_suppressed_by_comment_ending_in_end():
    """Review r15: a line comment (or identifier) ending in 'END'
    before IF must not be mistaken for an END IF terminator; and
    '--' inside a string literal is data, not a comment."""
    from mysql2pg_spark.schema.plpgsql_check import _if_guards

    body = """
BEGIN
  -- reset at period END
  IF a > 1 THEN PERFORM 1; END IF;
  IF note = 'a--b' AND c < 2 THEN PERFORM 2; END IF;
END
"""
    guards = _if_guards(body)
    assert guards == ["a > 1", "note = 'a--b' AND c < 2"]
