"""CREATE EVENT → pg_cron translation (schema/events.py, rounds 12-13).

The reference never scans events (a migrated database silently loses
every scheduled job); this engine translates the cron-expressible
subset and NAMES every refusal with the parsed schedule.
``spec_actions`` is the single decision surface (round 13 — the old
cron-only translator whose AT/ENDS refusals contradicted the
emulations layered above it is gone).
"""

from __future__ import annotations

import pytest

from mysql2pg_spark.schema.events import (
    EventSpec,
    event_actions,
    parse_event,
    spec_actions,
)


def _ev(sql: str) -> EventSpec:
    spec = parse_event(sql)
    assert spec is not None, sql
    return spec


def _plan1(spec: EventSpec):
    """(ddl, skip, note) view of a single-job plan — for events whose
    plan is one schedule DDL (or one skip) plus at most one note."""
    acts = spec_actions(spec)
    ddls = [p for k, p in acts if k == "ddl"]
    skips = [p for k, p in acts if k == "skip"]
    notes = [p for k, p in acts if k == "note"]
    assert len(ddls) <= 1 and len(skips) <= 1 and len(notes) <= 1, acts
    assert bool(ddls) != bool(skips), acts
    return (
        ddls[0] if ddls else None,
        skips[0] if skips else None,
        notes[0] if notes else None,
    )


# ---------------------------------------------------------------- parse


def test_parse_full_clause_space():
    spec = _ev(
        "CREATE DEFINER=`root`@`localhost` EVENT IF NOT EXISTS `purge` "
        "ON SCHEDULE EVERY 1 DAY STARTS '2024-01-01 03:30:00' "
        "ON COMPLETION NOT PRESERVE ENABLE COMMENT 'it''s nightly' "
        "DO DELETE FROM t WHERE d < NOW()"
    )
    assert spec.name == "purge"
    assert spec.schedule_kind == "every"
    assert (spec.interval_n, spec.interval_unit) == (1, "day")
    assert spec.starts == "'2024-01-01 03:30:00'"
    assert spec.ends is None
    assert spec.enabled
    assert spec.comment == "it's nightly"
    assert spec.body == "DELETE FROM t WHERE d < NOW()"


def test_parse_at_and_disable_and_conditional_comments():
    spec = _ev(
        "/*!50106 CREATE*/ /*!50117 DEFINER=`root`@`localhost`*/ "
        "/*!50106 EVENT `once` ON SCHEDULE AT '2030-06-01 12:00:00' "
        "DISABLE DO UPDATE t SET x = 1 */"
    )
    assert spec.schedule_kind == "at"
    assert spec.at_ts == "'2030-06-01 12:00:00'"
    assert not spec.enabled


def test_parse_ends_clause():
    spec = _ev(
        "CREATE EVENT e ON SCHEDULE EVERY 1 HOUR "
        "STARTS '2024-01-01 00:00:00' ENDS '2025-01-01 00:00:00' "
        "DO DELETE FROM t"
    )
    assert spec.ends == "'2025-01-01 00:00:00'"


def test_parse_rejects_non_event():
    assert parse_event("CREATE TABLE t (a INT)") is None
    assert parse_event("CREATE EVENT broken ON SCHEDULE DO x") is None


# ------------------------------------------------------- cron schedules


@pytest.mark.parametrize(
    "every,starts,expect",
    [
        ("1 MINUTE", None, "* * * * *"),
        ("15 MINUTE", None, "*/15 * * * *"),
        ("1 HOUR", "'2024-01-01 00:45:00'", "45 * * * *"),
        ("6 HOUR", None, "0 */6 * * *"),
        ("1 DAY", "'2024-01-01 03:30:00'", "30 3 * * *"),
        ("1 WEEK", "'2024-01-01 08:00:00'", "0 8 * * 1"),  # Mon
        ("1 MONTH", "'2024-03-15 00:00:00'", "0 0 15 * *"),
        ("1 QUARTER", None, "0 0 1 */3 *"),
        ("1 YEAR", "'2024-07-04 09:00:00'", "0 9 4 7 *"),
        ("30 SECOND", None, "30 seconds"),
    ],
)
def test_cron_expressible_cadences(every, starts, expect):
    sql = f"CREATE EVENT e ON SCHEDULE EVERY {every} "
    if starts:
        sql += f"STARTS {starts} "
    sql += "DO DELETE FROM t"
    ddl, skip, _note = _plan1(_ev(sql))
    assert skip is None
    assert f"'{expect}'" in ddl


@pytest.mark.parametrize(
    "every,sched,period_frag",
    [
        ("7 MINUTE", "* * * * *", "/ 60)"),      # hour boundary
        ("5 HOUR", "0 * * * *", "/ 3600)"),      # day boundary
        ("2 DAY", "0 0 * * *", "/ 86400)"),
        ("2 WEEK", "0 0 * * 0", "/ 604800)"),
        ("5 MONTH", "0 0 1 * *", "* 12 +"),       # calendar index
        ("3 YEAR", "0 0 1 1 *", "::int) % 3 = 0"),
    ],
)
def test_non_divisor_cadences_emulate_via_period_guard(
    every, sched, period_frag
):
    """Round 13: cadences the divisor rule cannot map directly emulate
    as a finest-grain cron job whose DO block no-ops unless an
    integral multiple of the period has elapsed. Without a literal
    STARTS the guard anchors at the epoch/calendar index and the note
    names the phase divergence."""
    ddl, skip, note = _plan1(
        _ev(f"CREATE EVENT e ON SCHEDULE EVERY {every} DO DELETE FROM t")
    )
    assert skip is None
    assert f"'{sched}'" in ddl
    assert "DO $do$ BEGIN IF " in ddl and "END IF; END $do$" in ddl
    assert period_frag in ddl
    assert "DELETE FROM t" in ddl
    assert note is not None and "integral multiple" in note
    assert "phase may shift" in note  # no STARTS → anchor divergence


def test_nondivisor_cadence_with_literal_starts_is_anchor_exact():
    """With a literal STARTS the guard measures elapsed periods FROM
    the anchor — MySQL's cadence exactly: the schedule carries the
    STARTS sub-period fields, the guard embeds the anchor timestamp,
    and a pre-anchor early match is blocked by the >= conjunct."""
    ddl, skip, note = _plan1(_ev(
        "CREATE EVENT e ON SCHEDULE EVERY 2 DAY "
        "STARTS '2024-01-05 03:30:00' DO DELETE FROM t"
    ))
    assert skip is None
    assert "'30 3 * * *'" in ddl
    assert (
        "round(extract(epoch from now() - TIMESTAMP "
        "'2024-01-05 03:30:00') / 86400)::bigint % 2 = 0" in ddl
    )
    assert (
        "now() >= TIMESTAMP '2024-01-05 03:30:00' "
        "- interval '59 seconds'" in ddl
    )
    assert note is not None and "anchored exactly at STARTS" in note
    assert "phase may shift" not in note


def test_subminute_nondivisor_seconds_still_refuse():
    """EVERY 90 SECOND cannot be emulated — cron fires at most once a
    minute, so no guard placement can hit a :30 offset."""
    ddl, skip, _ = _plan1(
        _ev("CREATE EVENT e ON SCHEDULE EVERY 90 SECOND DO DELETE FROM t")
    )
    assert ddl is None
    assert "59 s" in skip


def test_disabled_event_schedules_inactive():
    """Round 14: a DISABLE'd event keeps its definition in MySQL — the
    plan schedules the job AND flips pg_cron's active bit off
    (cron.job.active IS MySQL's ENABLE/DISABLE bit) in ONE DO block.
    Round 13 emitted the UPDATE as a separate autocommitted statement,
    leaving a window in which pg_cron could observe — and fire — the
    active row; the single-transaction DO block closes it."""
    dis = _ev(
        "CREATE EVENT e ON SCHEDULE EVERY 1 DAY DISABLE DO DELETE FROM t"
    )
    acts = spec_actions(dis)
    kinds = [k for k, _ in acts]
    assert kinds.count("ddl") == 1 and "skip" not in kinds
    (ddl,) = [p for k, p in acts if k == "ddl"]
    assert ddl.startswith("DO $")
    assert "PERFORM cron.schedule('e'" in ddl
    assert (
        "UPDATE cron.job SET active = false WHERE jobname IN ('e');" in ddl
    )
    # schedule precedes the deactivation inside the same block
    assert ddl.index("PERFORM cron.schedule") < ddl.index("UPDATE cron.job")
    notes = [p for k, p in acts if k == "note"]
    assert any("DISABLE" in p and "INACTIVE" in p for p in notes)
    assert any("one DO block" in p for p in notes)
    # a DISABLE'd event whose body refuses keeps the body refusal
    acts = spec_actions(_ev(
        "CREATE EVENT e2 ON SCHEDULE EVERY 1 DAY DISABLE "
        "DO REPLACE INTO t VALUES (1)"
    ))
    assert [k for k, _ in acts] == ["skip"]
    assert "REPLACE INTO" in acts[0][1]


def test_disabled_ends_event_deactivates_main_but_not_remover():
    """DISABLE + literal ENDS: only the MAIN job deactivates — the
    _ends remover is an emulation artifact that stays active, so the
    schedule still expires at ENDS (MySQL expires disabled events too)
    and a later manual re-enable keeps its ENDS bound. The re-enable
    advice names the exact jobs (review r13: the bare statement would
    have activated every pg_cron job on the instance)."""
    acts = spec_actions(_ev(
        "CREATE EVENT w ON SCHEDULE EVERY 1 HOUR "
        "STARTS '2030-01-01 00:15:00' ENDS '2031-01-01 00:00:00' "
        "DISABLE DO DELETE FROM t"
    ))
    ddls = [p for k, p in acts if k == "ddl"]
    # main job: scheduled + deactivated atomically in one DO block
    combined = [p for p in ddls if "UPDATE cron.job SET active" in p]
    assert len(combined) == 1 and combined[0].startswith("DO $")
    assert "PERFORM cron.schedule('w'" in combined[0]
    assert "WHERE jobname IN ('w');" in combined[0]
    # the _ends remover stays a plain ACTIVE schedule, outside the block
    removers = [p for p in ddls if "cron.schedule('w_ends'" in p]
    assert len(removers) == 1
    assert removers[0].startswith("SELECT cron.schedule('w_ends'")
    (note,) = [p for k, p in acts if k == "note" and "INACTIVE" in p]
    assert "WHERE jobname IN ('w')" in note


def test_nonliteral_schedules_refuse():
    # non-literal AT expression: named skip (no exact guard time)
    acts = event_actions(
        "CREATE EVENT ox ON SCHEDULE AT CURRENT_TIMESTAMP + "
        "INTERVAL 1 DAY DO DELETE FROM t"
    )
    assert [k for k, _ in acts] == ["skip"]
    assert "literal timestamp" in acts[0][1]
    # non-literal ENDS: named skip
    acts = event_actions(
        "CREATE EVENT w2 ON SCHEDULE EVERY 1 HOUR "
        "ENDS CURRENT_TIMESTAMP + INTERVAL 1 DAY DO DELETE FROM t"
    )
    assert [k for k, _ in acts] == ["skip"]
    assert "cron.unschedule" in acts[0][1]


def test_non_dml_body_refuses():
    spec = _ev(
        "CREATE EVENT e ON SCHEDULE EVERY 1 DAY DO ALTER TABLE t ADD c INT"
    )
    ddl, skip, _ = _plan1(spec)
    assert ddl is None and "translatable DML subset" in skip


def test_upsert_forms_refuse_by_name():
    """ADVICE r12: REPLACE INTO / INSERT IGNORE / ON DUPLICATE KEY
    UPDATE have no faithful catalog-free PG analog — the event path
    refuses them with the same wording contract as the plpgsql builder
    instead of emitting untranslated MySQL into a pg_cron job."""
    cases = [
        ("DO REPLACE INTO t (a) VALUES (1)", "REPLACE INTO"),
        ("DO INSERT IGNORE INTO t (a) VALUES (1)", "INSERT IGNORE"),
        (
            "DO INSERT INTO t (a) VALUES (1) ON DUPLICATE KEY UPDATE a=2",
            "ON DUPLICATE KEY",
        ),
    ]
    for body, frag in cases:
        acts = event_actions(
            f"CREATE EVENT e ON SCHEDULE EVERY 1 DAY {body}"
        )
        assert [k for k, _ in acts] == ["skip"], (body, acts)
        assert frag in acts[0][1]
    # …but the form inside a string literal is NOT a refusal trigger
    acts = event_actions(
        "CREATE EVENT e ON SCHEDULE EVERY 1 DAY "
        "DO INSERT INTO log (msg) VALUES ('use ON DUPLICATE KEY here')"
    )
    assert acts[0][0] == "ddl"


def test_user_var_and_dml_limit_bodies_ride_the_procedure_path():
    """ADVICE r12 follow-through: a single statement carrying @vars or
    a DML-level LIMIT — exactly the forms the plpgsql machinery owns —
    wraps as a compound body and migrates via a synthesized procedure
    instead of emitting untranslated MySQL."""
    acts = event_actions(
        "CREATE EVENT e ON SCHEDULE EVERY 1 DAY DO "
        "INSERT INTO log (msg, at) VALUES (IFNULL(@m, 'x'), NOW())"
    )
    kinds = [k for k, _ in acts]
    assert kinds[:2] == ["ddl", "ddl"]
    assert "CREATE OR REPLACE PROCEDURE e_evt_job()" in acts[0][1]
    assert "COALESCE(uv_m, 'x')" in acts[0][1]
    assert "CALL e_evt_job()" in acts[1][1]
    acts = event_actions(
        "CREATE EVENT d ON SCHEDULE EVERY 1 DAY DO "
        "DELETE FROM t WHERE x < NOW() LIMIT 100"
    )
    assert [k for k, _ in acts][:2] == ["ddl", "ddl"]
    assert "ctid IN (SELECT ctid FROM t" in acts[0][1]
    assert "LIMIT 100" in acts[0][1]
    # a LIMIT inside a subquery is valid PG — stays on the direct path
    acts = event_actions(
        "CREATE EVENT s ON SCHEDULE EVERY 1 DAY DO "
        "DELETE FROM t WHERE id IN (SELECT id FROM old LIMIT 5)"
    )
    assert acts[0][0] == "ddl" and "cron.schedule" in acts[0][1]


# ------------------------------------------------------ body + phase


def test_body_rewritten_to_pg_dialect():
    spec = _ev(
        "CREATE EVENT e ON SCHEDULE EVERY 1 DAY DO "
        "INSERT INTO log (msg, at) VALUES (IFNULL(m, 'x'), NOW())"
    )
    ddl, skip, _ = _plan1(spec)
    assert skip is None
    assert "COALESCE(" in ddl and "CURRENT_TIMESTAMP" in ddl
    assert ddl.startswith("SELECT cron.schedule('e', '0 0 * * *', $evt$")
    assert ddl.endswith("$evt$)")


def test_nonliteral_starts_emits_phase_note():
    spec = _ev(
        "CREATE EVENT e ON SCHEDULE EVERY 1 DAY "
        "STARTS CURRENT_TIMESTAMP + INTERVAL 1 HOUR DO DELETE FROM t"
    )
    ddl, skip, note = _plan1(spec)
    assert skip is None
    assert "'0 0 * * *'" in ddl  # boundary anchor
    assert note is not None and "phase" in note


def test_absent_starts_emits_phase_note():
    """ADVICE r12: with no STARTS clause MySQL anchors EVERY cadences
    at event CREATION time (EVERY 1 HOUR created at :45 fires at :45),
    so the boundary-anchored cron entry carries the bounded
    phase-shift note."""
    spec = _ev("CREATE EVENT e ON SCHEDULE EVERY 1 HOUR DO DELETE FROM t")
    ddl, skip, note = _plan1(spec)
    assert skip is None and "'0 * * * *'" in ddl
    assert note is not None and "creation time" in note
    # EVERY 1 MINUTE has no sub-period phase: no note
    spec = _ev("CREATE EVENT m ON SCHEDULE EVERY 1 MINUTE DO DELETE FROM t")
    ddl, skip, note = _plan1(spec)
    assert skip is None and note is None
    # seconds intervals likewise
    spec = _ev("CREATE EVENT s ON SCHEDULE EVERY 30 SECOND DO DELETE FROM t")
    ddl, skip, note = _plan1(spec)
    assert skip is None and note is None


def test_literal_starts_start_gated_deterministically():
    """Round 14: a phase-exact direct entry with a literal STARTS keeps
    its cron schedule but gains a start gate in the DO block — the
    same DDL whether STARTS is past or future (round 13 compared
    against the wall clock at plan time, so the plan depended on when
    the migration ran and a future-STARTS 'n seconds' interval fired
    years early with no note)."""
    spec = _ev(
        "CREATE EVENT e ON SCHEDULE EVERY 1 DAY "
        "STARTS '2024-01-01 02:00:00' DO DELETE FROM t"
    )
    ddl, skip, note = _plan1(spec)
    assert skip is None
    assert "'0 2 * * *'" in ddl
    assert (
        "IF now() >= TIMESTAMP '2024-01-01 02:00:00' "
        "- interval '59 seconds' THEN" in ddl
    )
    assert note is not None and "start gate" in note
    # a FUTURE literal STARTS produces the IDENTICAL plan shape — only
    # the embedded timestamp differs (deterministic, review r14)
    fut = _ev(
        "CREATE EVENT e ON SCHEDULE EVERY 1 DAY "
        "STARTS '2099-01-01 02:00:00' DO DELETE FROM t"
    )
    fddl, fskip, fnote = _plan1(fut)
    assert fskip is None
    assert fddl == ddl.replace("2024-01-01", "2099-01-01")
    # sub-minute interval schedule: the start gate closes the round-13
    # silent early-start (the cadence anchor itself is registration
    # time — pg_cron intervals can't anchor — and the note says so)
    sec = _ev(
        "CREATE EVENT s ON SCHEDULE EVERY 30 SECOND "
        "STARTS '2099-01-01 02:00:00' DO DELETE FROM t"
    )
    sddl, sskip, snote = _plan1(sec)
    assert sskip is None
    assert "'30 seconds'" in sddl
    assert "IF now() >= TIMESTAMP '2099-01-01 02:00:00'" in sddl
    assert snote is not None and "registration" in snote


def test_quoted_event_name_escapes():
    """ADVICE r12: a backtick-quoted event name containing an
    apostrophe must not break (or inject into) the single-quoted job
    name in cron.schedule/cron.unschedule."""
    acts = event_actions(
        "CREATE EVENT `it's nightly` ON SCHEDULE EVERY 1 DAY "
        "STARTS '2024-01-01 00:00:00' DO DELETE FROM t"
    )
    assert acts[0][0] == "ddl"
    assert "cron.schedule('it''s nightly'" in acts[0][1]
    # one-shot path: the self-unschedule inside the DO block escapes too
    acts = event_actions(
        "CREATE EVENT `o'neil` ON SCHEDULE AT '2030-06-01 12:30:00' "
        "DO DELETE FROM t"
    )
    assert acts[0][0] == "ddl"
    assert "cron.schedule('o''neil'" in acts[0][1]
    assert "cron.unschedule('o''neil')" in acts[0][1]


def test_duckdb_seam_skips_cron_ddl_visibly():
    from mysql2pg_spark.sinks.ddl import adapt_ddl

    ddl, _, _ = _plan1(
        _ev("CREATE EVENT e ON SCHEDULE EVERY 1 DAY DO DELETE FROM t")
    )
    assert adapt_ddl(ddl, "postgres") == ddl
    assert adapt_ddl(ddl, "duckdb") is None


def test_event_plan_golden_pinned():
    """Byte-diff the fixture corpus' six events against the reviewed
    golden (tests/golden/events_pg.sql) — any change to the emitted
    pg_cron / synthesized-procedure DDL or refusal text shows up as a
    reviewable diff. Regenerate with the same loop below."""
    import os

    from tools.make_mysqldump import EVENTS

    lines = []
    for raw in EVENTS:
        name = parse_event(raw).name.lower()
        for kind, payload in event_actions(raw):
            if kind == "ddl":
                lines.append(payload.rstrip(";") + ";")
            else:
                lines.append(f"-- {kind.upper()} [{name}]: {payload}")
    text = "\n".join(lines) + "\n"
    golden = os.path.join(
        os.path.dirname(__file__), "golden", "events_pg.sql"
    )
    assert text == open(golden).read()
    # every emitted statement passes the structural plpgsql gate
    from mysql2pg_spark.schema.plpgsql_check import check_script

    assert check_script(text) == []


def test_compound_body_migrates_via_synthesized_procedure():
    """Round 12b: a cron-expressible compound event becomes TWO DDLs —
    the plpgsql procedure (full routine machinery: @vars, handlers, …)
    and the scheduled CALL; untranslatable bodies keep a named skip
    carrying the inner plpgsql reason."""
    acts = event_actions(
        "CREATE EVENT n ON SCHEDULE EVERY 1 DAY DO BEGIN "
        "DELETE FROM a WHERE x < NOW(); "
        "SET @m = IFNULL(@m, 0) + 1; END"
    )
    kinds = [k for k, _ in acts]
    assert kinds[:2] == ["ddl", "ddl"]
    assert "CREATE OR REPLACE PROCEDURE n_evt_job()" in acts[0][1]
    assert "CURRENT_TIMESTAMP" in acts[0][1]
    assert acts[1][1] == (
        "SELECT cron.schedule('n', '0 0 * * *', "
        "$evt$CALL n_evt_job()$evt$)"
    )
    # non-divisor cadence + compound body compose: the procedure is
    # synthesized AND the CALL rides the period guard (round 13)
    acts = event_actions(
        "CREATE EVENT n ON SCHEDULE EVERY 7 MINUTE DO BEGIN "
        "DELETE FROM a; END"
    )
    kinds = [k for k, _ in acts]
    assert kinds[:2] == ["ddl", "ddl"] and "skip" not in kinds
    assert "CREATE OR REPLACE PROCEDURE n_evt_job()" in acts[0][1]
    assert "'* * * * *'" in acts[1][1]
    assert "IF floor(extract(epoch from now()) / 60)::bigint % 7 = 0 " \
           "THEN CALL n_evt_job(); END IF;" in acts[1][1]
    # untranslatable body: named skip carrying the inner reason
    acts = event_actions(
        "CREATE EVENT n ON SCHEDULE EVERY 1 DAY DO BEGIN "
        "SET @x = @@sql_mode; END"
    )
    assert [k for k, _ in acts] == ["skip"]
    assert "does not translate to plpgsql" in acts[0][1]
    assert "@@system" in acts[0][1]


def test_every_cadence_property():
    """Property: for EVERY n unit over the whole supported grid, the
    translator either emits a structurally valid pg_cron schedule (5
    in-range cron fields, or an 'n seconds' interval) or a named skip —
    never an out-of-range field, never both, never neither."""
    import re as _re

    units = ["SECOND", "MINUTE", "HOUR", "DAY", "WEEK", "MONTH",
             "QUARTER", "YEAR"]
    ranges = [(0, 59), (0, 23), (1, 31), (1, 12), (0, 6)]
    for unit in units:
        for n in list(range(1, 26)) + [30, 45, 59, 60, 90]:
            spec = _ev(
                f"CREATE EVENT e ON SCHEDULE EVERY {n} {unit} "
                "DO DELETE FROM t"
            )
            ddl, skip, _ = _plan1(spec)
            assert (ddl is None) != (skip is None), (n, unit)
            if ddl is None:
                assert "e" in skip and str(n) in skip
                continue
            m = _re.search(r"cron\.schedule\('e', '([^']+)'", ddl)
            sched = m.group(1)
            if sched.endswith(" seconds"):
                assert unit == "SECOND" and 1 <= n <= 59
                continue
            fields = sched.split()
            assert len(fields) == 5, sched
            for f, (lo, hi) in zip(fields, ranges):
                if f == "*":
                    continue
                if f.startswith("*/"):
                    step = int(f[2:])
                    assert lo <= step <= hi, sched
                else:
                    assert lo <= int(f) <= hi, sched


def test_literal_starts_phase_property():
    """Property: a literal STARTS timestamp always lands its sub-period
    fields in range for every unit that consumes them."""
    import re as _re

    for unit, starts in [
        ("HOUR", "'2024-12-31 23:59:59'"),
        ("DAY", "'2024-02-29 00:00:00'"),
        ("WEEK", "'2024-01-07 12:30:00'"),   # a Sunday
        ("MONTH", "'2024-01-31 06:15:00'"),
        ("YEAR", "'2024-12-31 23:59:00'"),
    ]:
        spec = _ev(
            f"CREATE EVENT e ON SCHEDULE EVERY 1 {unit} STARTS {starts} "
            "DO DELETE FROM t"
        )
        ddl, skip, note = _plan1(spec)
        # every literal STARTS carries a note now (start gate or
        # month-end divergence) — round 14 determinism
        assert skip is None
        assert note is not None and (
            "start gate" in note or "month-end" in note
        )
        sched = _re.search(r"'([\d* /]+)'", ddl).group(1)
        mi, hh, dom, mon, dow = sched.split()
        for f, lo, hi in [(mi, 0, 59), (hh, 0, 23)]:
            if f != "*":
                assert lo <= int(f) <= hi
        if dom != "*":
            assert 1 <= int(dom) <= 31
        if mon != "*":
            assert 1 <= int(mon) <= 12
        if dow != "*":
            assert 0 <= int(dow) <= 6


def test_full_period_cadences_promote():
    """EVERY 60 MINUTE is hourly ('*/60' is not a valid cron step),
    EVERY 24 HOUR daily, EVERY 7 DAY weekly, EVERY 12 MONTH yearly,
    EVERY 3600 SECOND hourly — promotion preserves the STARTS phase of
    the promoted unit and names both spellings in refusals."""
    for every, starts, expect in [
        ("60 MINUTE", "'2024-01-01 00:45:00'", "45 * * * *"),
        ("24 HOUR", "'2024-01-01 06:30:00'", "30 6 * * *"),
        ("7 DAY", "'2024-01-01 08:00:00'", "0 8 * * 1"),
        ("12 MONTH", "'2024-03-15 00:00:00'", "0 0 15 3 *"),
        ("3600 SECOND", None, "0 * * * *"),
        ("120 SECOND", None, "*/2 * * * *"),
    ]:
        sql = f"CREATE EVENT e ON SCHEDULE EVERY {every} "
        if starts:
            sql += f"STARTS {starts} "
        ddl, skip, _ = _plan1(_ev(sql + "DO DELETE FROM t"))
        assert skip is None, (every, skip)
        assert f"'{expect}'" in ddl, (every, ddl)
    # promoted guarded emulations carry BOTH spellings in the note
    ddl, skip, note = _plan1(
        _ev("CREATE EVENT e ON SCHEDULE EVERY 48 HOUR DO DELETE FROM t")
    )
    assert skip is None
    assert "'0 0 * * *'" in ddl and "/ 86400)::bigint % 2 = 0" in ddl
    assert "EVERY 48 HOUR" in note and "EVERY 2 DAY" in note


def test_one_shot_at_emulates_via_self_unschedule():
    """A literal AT one-shot becomes a DAILY cron entry whose command
    no-ops until the target timestamp, then runs the body once and
    self-unschedules (pg_cron's documented one-shot idiom). Round 13:
    the guard entry is DAILY — under the round-12 yearly month/day
    match a server down at the matching minute delayed the one-shot a
    full YEAR; now at most a day."""
    acts = event_actions(
        "CREATE EVENT once ON SCHEDULE AT '2030-06-01 12:30:00' "
        "DO DELETE FROM t WHERE x = 1"
    )
    assert [k for k, _ in acts] == ["ddl", "note"]
    assert acts[0][1] == (
        "SELECT cron.schedule('once', '30 12 * * *', "
        "$evt$DO $do$ BEGIN "
        "IF now() >= TIMESTAMP '2030-06-01 12:30:00' THEN "
        "DELETE FROM t WHERE x = 1; "
        "PERFORM cron.unschedule('once'); "
        "END IF; END $do$$evt$)"
    )
    assert "self-unschedule" in acts[1][1] and "daily" in acts[1][1]
    # compound one-shot: synthesized procedure + CALL-and-unschedule
    acts = event_actions(
        "CREATE EVENT oc ON SCHEDULE AT '2030-06-01 12:30:00' "
        "DO BEGIN DELETE FROM a; DELETE FROM b; END"
    )
    assert [k for k, _ in acts] == ["ddl", "ddl", "note"]
    assert "CREATE OR REPLACE PROCEDURE oc_evt_job()" in acts[0][1]
    assert "CALL oc_evt_job(); PERFORM cron.unschedule('oc')" in acts[1][1]
    assert "TIMESTAMP '2030-06-01 12:30:00'" in acts[1][1]
    # DISABLE'd one-shot: scheduled INACTIVE (round 13) — the guarded
    # job exists but pg_cron never runs it until re-enabled
    acts = event_actions(
        "CREATE EVENT od ON SCHEDULE AT '2030-06-01 12:30:00' DISABLE "
        "DO DELETE FROM t"
    )
    (ddl,) = [p for k, p in acts if k == "ddl"]
    assert ddl.startswith("DO $")
    assert "PERFORM cron.schedule('od'" in ddl
    assert (
        "UPDATE cron.job SET active = false WHERE jobname IN ('od');"
        in ddl
    )


def test_one_shot_catchup_bounded_to_a_day():
    """The ask made explicit: the schedule field (daily match at the
    target's minute/hour) and the guard inequality (now() >= ts - tol)
    together bound a missed firing's delay to one day — the next match
    after the target minute is exactly 24 h later and the guard stays
    true from the target time onward."""
    import re as _re

    acts = event_actions(
        "CREATE EVENT once ON SCHEDULE AT '2030-06-01 12:30:00' "
        "DO DELETE FROM t"
    )
    ddl = acts[0][1]
    mo = _re.search(r"cron\.schedule\('once', '([^']+)'", ddl)
    mi, hh, dom, mon, dow = mo.group(1).split()
    # DAILY: day-of-month / month / day-of-week all wildcards
    assert (dom, mon, dow) == ("*", "*", "*")
    assert (mi, hh) == ("30", "12")
    # guard is monotone in now(): once true it stays true, so the
    # first match at-or-after the timestamp fires
    assert "IF now() >= TIMESTAMP '2030-06-01 12:30:00'" in ddl
    # ENDS remover rides the same daily bound
    acts = event_actions(
        "CREATE EVENT w ON SCHEDULE EVERY 1 HOUR "
        "ENDS '2026-06-01 00:00:00' DO DELETE FROM t"
    )
    remover = [p for k, p in acts if k == "ddl"][-1]
    mo = _re.search(r"cron\.schedule\('w_ends', '([^']+)'", remover)
    assert mo.group(1).split()[2:] == ["*", "*", "*"]


def test_literal_ends_emulates_via_remover_job():
    """EVERY … ENDS '<literal ts>' plans the event without its ENDS,
    then appends a self-unscheduling remover that drops BOTH jobs at
    the first daily match at-or-after the ENDS time."""
    acts = event_actions(
        "CREATE EVENT win ON SCHEDULE EVERY 1 HOUR "
        "STARTS '2026-01-01 00:15:00' ENDS '2026-06-01 00:00:00' "
        "DO DELETE FROM t WHERE stale = 1"
    )
    # r14: the literal STARTS adds a start-gate note after the main ddl
    assert [k for k, _ in acts] == ["ddl", "note", "ddl", "note"]
    assert "'15 * * * *'" in acts[0][1]
    assert "start gate" in acts[1][1]
    assert acts[2][1] == (
        "SELECT cron.schedule('win_ends', '0 0 * * *', "
        "$evt$DO $do$ BEGIN "
        "IF now() >= TIMESTAMP '2026-06-01 00:00:00' THEN "
        "PERFORM cron.unschedule('win'); "
        "PERFORM cron.unschedule('win_ends'); "
        "END IF; END $do$$evt$)"
    )
    assert "ENDS" in acts[3][1] and "at most a day" in acts[3][1]
    # compound body + ENDS composes with the procedure synthesis
    acts = event_actions(
        "CREATE EVENT wc ON SCHEDULE EVERY 1 DAY "
        "ENDS '2027-01-01 00:00:00' "
        "DO BEGIN DELETE FROM a; DELETE FROM b; END"
    )
    kinds = [k for k, _ in acts]
    assert kinds.count("ddl") == 3
    ddls = [p for k, p in acts if k == "ddl"]
    assert "CREATE OR REPLACE PROCEDURE wc_evt_job()" in ddls[0]
    assert "cron.unschedule('wc_ends')" in ddls[2]


def test_comment_literal_does_not_corrupt_parse():
    """Review r12: the clause scan runs on literal-masked text — a
    COMMENT containing 'do'/'disable' must not split the body early or
    flip the status."""
    spec = _ev(
        "CREATE EVENT e ON SCHEDULE EVERY 1 DAY "
        "COMMENT 'you should do UPDATE stats weekly, never disable' "
        "DO UPDATE t SET n = n + 1"
    )
    assert spec.enabled
    assert spec.body == "UPDATE t SET n = n + 1"
    assert spec.comment == (
        "you should do UPDATE stats weekly, never disable"
    )
    ddl, skip, _ = _plan1(spec)
    assert skip is None and "UPDATE t SET n = n + 1" in ddl
    # a quoted 'DO' inside the body's own literals is also safe
    spec = _ev(
        "CREATE EVENT e2 ON SCHEDULE EVERY 1 DAY "
        "DO INSERT INTO log (msg) VALUES ('to do: disable nothing')"
    )
    assert spec.enabled
    assert "'to do: disable nothing'" in spec.body


def test_select_body_one_shot_uses_perform():
    """Review r12b: inside the guarded DO block a bare SELECT is
    invalid plpgsql ('query has no destination') — it becomes
    PERFORM."""
    acts = event_actions(
        "CREATE EVENT s ON SCHEDULE AT '2030-06-01 12:30:00' "
        "DO SELECT purge_fn()"
    )
    assert acts[0][0] == "ddl"
    assert "THEN PERFORM purge_fn();" in acts[0][1]
    assert "THEN SELECT" not in acts[0][1]


def test_dollar_tag_collision_avoided():
    """Review r12b: a body literal containing $evt$/$do$ must not
    terminate the dollar quote early."""
    acts = event_actions(
        "CREATE EVENT e ON SCHEDULE EVERY 1 DAY "
        "DO DELETE FROM t WHERE note = 'x$evt$y'"
    )
    assert acts[0][0] == "ddl"
    assert "$evt1$" in acts[0][1] and acts[0][1].count("$evt1$") == 2
    acts = event_actions(
        "CREATE EVENT o ON SCHEDULE AT '2030-01-01 00:00:00' "
        "DO DELETE FROM t WHERE note = 'a$do$b'"
    )
    assert acts[0][0] == "ddl"
    assert "DO $do1$ BEGIN" in acts[0][1]
    assert acts[0][1].rstrip(")").endswith("$do1$$evt$")


def test_backslash_escaped_quotes_parse():
    """Review r12b: MySQL \\'-escapes normalize to '' doubling before
    masking — a COMMENT 'can\\'t stop' must not swallow the DO
    keyword."""
    spec = _ev(
        "CREATE EVENT e ON SCHEDULE EVERY 1 DAY "
        "COMMENT 'can\\'t stop' DO DELETE FROM t WHERE x = 1"
    )
    assert spec.enabled
    assert spec.comment == "can't stop"
    assert spec.body == "DELETE FROM t WHERE x = 1"


def test_backtick_inside_literal_does_not_open_identifier():
    """Round 13: the backtick-identifier mask is quote-state-aware — a
    body with TWO literals each containing a backtick must not fuse
    them into one bogus identifier span."""
    spec = _ev(
        "CREATE EVENT e ON SCHEDULE EVERY 1 DAY DO "
        "INSERT INTO log (a, b) VALUES ('x`y', 'p`q')"
    )
    assert spec.body == "INSERT INTO log (a, b) VALUES ('x`y', 'p`q')"
    ddl, skip, _ = _plan1(spec)
    assert skip is None and "'x`y', 'p`q'" in ddl
    # …and the quoted-name case still parses alongside body literals
    spec = _ev(
        "CREATE EVENT `it's` ON SCHEDULE EVERY 1 DAY "
        "DO DELETE FROM t WHERE note = 'a`b'"
    )
    assert spec.name == "it's"
    assert spec.body == "DELETE FROM t WHERE note = 'a`b'"


def test_month_end_dom_rolls_exactly():
    """cron day-of-month 29-31 skips short months; MySQL computes each
    firing as STARTS + k*interval, rolling to month-end. Review r13:
    such schedules reroute through the guarded emulation, whose day
    guard fires on LEAST(dom, last-day-of-month) — MySQL's roll
    exactly, instead of losing short-month firings."""
    acts = spec_actions(_ev(
        "CREATE EVENT me ON SCHEDULE EVERY 1 MONTH "
        "STARTS '2024-01-31 02:00:00' DO DELETE FROM t"
    ))
    assert [k for k, _ in acts] == ["ddl", "note"]
    ddl = acts[0][1]
    assert "'0 2 * * *'" in ddl          # daily schedule, guarded
    assert "least(31," in ddl
    assert "date_trunc('month', now()) + interval '1 month' "\
           "- interval '1 day'" in ddl
    assert "month-end" in acts[1][1]
    # a non-divisor month cadence composes the month-index guard with
    # the day guard — EVERY 5 MONTH STARTS Jan 31 must not lose the
    # short on-cadence months (Jun/Nov/Apr/Sep/Feb)
    acts = spec_actions(_ev(
        "CREATE EVENT m5 ON SCHEDULE EVERY 5 MONTH "
        "STARTS '2024-01-31 09:15:00' DO DELETE FROM t"
    ))
    ddl = acts[0][1]
    assert "'15 9 * * *'" in ddl
    assert "% 5 = 0" in ddl and "least(31," in ddl
    # year grain adds the month equality to the day guard
    acts = spec_actions(_ev(
        "CREATE EVENT y ON SCHEDULE EVERY 1 YEAR "
        "STARTS '2024-02-29 00:00:00' DO DELETE FROM t"
    ))
    ddl = acts[0][1]
    assert "'0 0 * * *'" in ddl
    assert "extract(month from now())::int = 2" in ddl
    assert "least(29," in ddl
    # day 28 and wildcard dom schedules stay direct cron entries
    # (start-gated in the DO block since round 14, with a note)
    acts = spec_actions(_ev(
        "CREATE EVENT ok ON SCHEDULE EVERY 1 MONTH "
        "STARTS '2024-01-28 02:00:00' DO DELETE FROM t"
    ))
    assert [k for k, _ in acts] == ["ddl", "note"]
    assert "'0 2 28 * *'" in acts[0][1]
    assert "least(" not in acts[0][1] and "start gate" in acts[1][1]
    acts = spec_actions(_ev(
        "CREATE EVENT d ON SCHEDULE EVERY 1 DAY "
        "STARTS '2024-01-31 02:00:00' DO DELETE FROM t"
    ))
    assert [k for k, _ in acts] == ["ddl", "note"]
    assert "least(" not in acts[0][1]


def test_on_completion_preserve_deactivates_instead_of_unscheduling():
    """Round 13: MySQL keeps a completed event's definition, DISABLED,
    under ON COMPLETION PRESERVE — the emulation deactivates the job
    (active = false) instead of cron.unschedule'ing it. NOT PRESERVE
    (the MySQL default) keeps the removal behavior."""
    acts = spec_actions(_ev(
        "CREATE EVENT keepme ON SCHEDULE AT '2030-06-01 12:30:00' "
        "ON COMPLETION PRESERVE ENABLE DO DELETE FROM t"
    ))
    (ddl,) = [p for k, p in acts if k == "ddl"]
    assert (
        "UPDATE cron.job SET active = false "
        "WHERE jobname = 'keepme'" in ddl
    )
    assert "cron.unschedule" not in ddl
    (note,) = [p for k, p in acts if k == "note"]
    assert "PRESERVE" in note
    # the default (NOT PRESERVE / absent): self-unschedule
    acts = spec_actions(_ev(
        "CREATE EVENT dropme ON SCHEDULE AT '2030-06-01 12:30:00' "
        "ON COMPLETION NOT PRESERVE DO DELETE FROM t"
    ))
    (ddl,) = [p for k, p in acts if k == "ddl"]
    assert "PERFORM cron.unschedule('dropme')" in ddl
    # ENDS + PRESERVE: main job deactivates, the remover artifact
    # still unschedules itself
    acts = spec_actions(_ev(
        "CREATE EVENT w ON SCHEDULE EVERY 1 HOUR "
        "STARTS '2030-01-01 00:15:00' ENDS '2031-01-01 00:00:00' "
        "ON COMPLETION PRESERVE DO DELETE FROM t"
    ))
    remover = [p for k, p in acts if k == "ddl" and "_ends" in p][0]
    assert (
        "UPDATE cron.job SET active = false WHERE jobname = 'w'"
        in remover
    )
    assert "PERFORM cron.unschedule('w_ends')" in remover


def test_misaligned_literal_starts_reroutes_to_anchored_guard():
    """Review r13: a divisor cadence whose literal STARTS is misaligned
    with cron's boundary anchor (EVERY 6 HOUR STARTS 02:00 → cron */6
    fires 0/6/12/18, MySQL 2/8/14/20) is off on EVERY firing — the
    plan reroutes through the STARTS-anchored guard, which reproduces
    MySQL's cadence exactly."""
    ddl, skip, note = _plan1(_ev(
        "CREATE EVENT h6 ON SCHEDULE EVERY 6 HOUR "
        "STARTS '2024-01-01 02:00:00' DO DELETE FROM t"
    ))
    assert skip is None
    assert "'0 * * * *'" in ddl       # hourly match, guard decides
    assert "/ 3600)::bigint % 6 = 0" in ddl
    assert "TIMESTAMP '2024-01-01 02:00:00'" in ddl
    assert "anchored exactly at STARTS" in note
    # an ALIGNED literal STARTS keeps the direct cron entry — only the
    # start gate wraps the body (r14: no period-elapsed arithmetic)
    ddl, skip, note = _plan1(_ev(
        "CREATE EVENT h6a ON SCHEDULE EVERY 6 HOUR "
        "STARTS '2024-01-01 06:30:00' DO DELETE FROM t"
    ))
    assert skip is None and note is not None and "start gate" in note
    assert "'30 */6 * * *'" in ddl
    assert "% 6 = 0" not in ddl
    assert "IF now() >= TIMESTAMP '2024-01-01 06:30:00'" in ddl
    # misaligned minute cadence reroutes too
    ddl, skip, note = _plan1(_ev(
        "CREATE EVENT m15 ON SCHEDULE EVERY 15 MINUTE "
        "STARTS '2024-01-01 00:07:00' DO DELETE FROM t"
    ))
    assert skip is None
    assert "'* * * * *'" in ddl and "/ 60)::bigint % 15 = 0" in ddl
    # no STARTS: boundary-anchored direct entry + phase note unchanged
    ddl, skip, note = _plan1(_ev(
        "CREATE EVENT h6n ON SCHEDULE EVERY 6 HOUR DO DELETE FROM t"
    ))
    assert "'0 */6 * * *'" in ddl
    assert note is not None and "creation time" in note
