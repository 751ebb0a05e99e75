"""MySQL ``CREATE EVENT`` → pg_cron schedule translation (C-plane
closure, round 12).

The reference ignores events entirely (its scan loop never reads
``information_schema.EVENTS``; a migrated database silently loses every
scheduled job). Round 9 taught this engine to *inventory* dump-carried
events as named skips; this module closes the gap for the translatable
subset: an event whose cadence is exactly expressible as a cron entry
(or a pg_cron seconds interval) and whose body is a single DML/CALL
statement becomes

    SELECT cron.schedule('<name>', '<schedule>', $evt$<pg body>$evt$);

ready to execute on a PostgreSQL with the pg_cron extension. Everything
else stays a *named* skip carrying the parsed schedule — the
refuse-don't-mistranslate convention used across the routine plane.

Cron-expressibility rules (MySQL fires on a fixed cadence anchored at
STARTS; cron fires on wall-clock field matches — the two only coincide
when the period divides its parent unit):

- ``EVERY n SECOND``  → pg_cron interval syntax ``'n seconds'`` (1-59).
- ``EVERY n MINUTE``  → ``*/n * * * *`` only when 60 % n == 0 (else the
  hour boundary introduces a short tick: */7 fires 56→0).
- ``EVERY n HOUR``    → ``m */n * * *`` only when 24 % n == 0.
- ``EVERY 1 DAY``     → ``m h * * *``; n>1 is not cron-expressible
  (``*/n`` on day-of-month resets every month).
- ``EVERY 1 WEEK``    → ``m h * * dow``.
- ``EVERY n MONTH``   → ``m h dom */n *`` when 12 % n == 0 (QUARTER =
  3 months rides the same rule).
- ``EVERY 1 YEAR``    → ``m h dom mon *``.
- Full-period cadences promote to the parent unit first (EVERY 60
  MINUTE is hourly — ``*/60`` is not a valid cron step; 24 HOUR → 1
  DAY, 7 DAY → 1 WEEK, 12 MONTH → 1 YEAR, 60 SECOND → 1 MINUTE), so
  e.g. EVERY 48 HOUR refuses as the 2-day cadence it is.
- ``AT ts``           → refused: a one-shot job has no pg_cron analog
  (cron entries recur); run the body manually or via an ad-hoc job.

Phase: cron's anchor is the unit boundary; a literal ``STARTS`` fills
the sub-period fields (minute/hour/dom/dow) so the PG job fires at the
same wall-clock offset. A non-literal STARTS (``CURRENT_TIMESTAMP +
INTERVAL …``) keeps the boundary anchor and the divergence is noted.

Reference parity: net-new surface (no counterpart —
``sync_functions.go`` handles only FUNCTION; events never scanned).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from mysql2pg_spark.sinks.plpgsql_builder import rewrite_mysql_expr_to_pg

__all__ = [
    "EventSpec",
    "event_actions",
    "event_to_pg_cron",
    "parse_event",
]


@dataclass
class EventSpec:
    name: str
    schedule_kind: str           # "every" | "at"
    interval_n: int | None       # EVERY n …
    interval_unit: str | None    # second|minute|hour|day|week|month|
                                 # quarter|year
    at_ts: str | None            # AT '…' raw text
    starts: str | None           # STARTS raw text (literal or expr)
    ends: str | None             # ENDS raw text
    body: str                    # raw MySQL DO-body
    enabled: bool                # ENABLE (default) vs DISABLE[..]
    comment: str | None


_EVENT_RE = re.compile(
    r"""(?isx)
    \bCREATE\s+
    (?:DEFINER\s*=\s*\S+\s+)?
    EVENT\s+ (?:IF\s+NOT\s+EXISTS\s+)?
    (?:`(?P<q>[^`]+)`|(?P<b>\w+)) \s+
    ON\s+SCHEDULE\s+
    (?:
        AT\s+(?P<at>.+?)
      | EVERY\s+(?P<n>\d+)\s+(?P<unit>\w+)
        (?:\s+STARTS\s+(?P<starts>.+?))?
        (?:\s+ENDS\s+(?P<ends>.+?))?
    )
    (?=\s+(?:ON\s+COMPLETION|ENABLE|DISABLE|COMMENT|DO)\b)
    (?P<tail>.*)
    """,
)

_TS_LIT_RE = re.compile(
    r"^'(\d{4})-(\d{2})-(\d{2})(?:[ T](\d{2}):(\d{2})(?::(\d{2}))?)?'$"
)

#: units whose EVERY-n cadence can be exact in cron (see module doc)
_UNITS = (
    "second", "minute", "hour", "day", "week", "month", "quarter", "year",
)


def _strip_cc(text: str) -> str:
    """Unwrap mysqldump /*!NNNNN … */ conditional comments."""
    return re.sub(r"/\*!\d{5}\s?(.*?)\*/", r"\1", text, flags=re.S)


def parse_event(raw: str) -> EventSpec | None:
    """Parse one CREATE EVENT statement (dump spelling tolerated:
    conditional-comment wraps, DEFINER, IF NOT EXISTS, backticks).
    Returns None when the text is not a recognizable CREATE EVENT.

    The clause scan runs on LITERAL-MASKED text (review r12): a
    COMMENT like ``'do not disable'`` must not satisfy the ``DO`` body
    split or the ``DISABLE`` status scan — every captured region
    unmasks before it lands on the spec."""
    from mysql2pg_spark.dialect.transpile import (
        mask_literals,
        normalize_backslash_quotes,
        unmask_literals,
    )

    text = _strip_cc(raw).strip().rstrip(";").strip()
    # MySQL \'-escapes → '' doubling first, or the mask tracks the
    # literal wrong and a COMMENT 'can\'t' swallows the DO keyword
    masked, lits = mask_literals(normalize_backslash_quotes(text))

    def um(s: str | None) -> str | None:
        return unmask_literals(s, lits) if s is not None else None

    mo = _EVENT_RE.search(masked)
    if not mo:
        return None
    tail = mo.group("tail") or ""
    do = re.search(r"(?is)\bDO\b\s+(.*)$", tail)
    if not do:
        return None
    body = um(do.group(1).strip().rstrip(";").strip())
    head = tail[: do.start()]
    enabled = not re.search(r"(?i)\bDISABLE\b", head)
    cmt = re.search(r"(?is)\bCOMMENT\s+(\x00L\d+\x00)", head)
    comment = None
    if cmt:
        lit = um(cmt.group(1))
        if lit and lit.startswith("'") and lit.endswith("'"):
            comment = lit[1:-1].replace("''", "'")
    unit = (mo.group("unit") or "").lower().rstrip("s") or None
    if mo.group("n") is not None and unit not in _UNITS:
        return None  # EVERY n <unknown unit>
    return EventSpec(
        name=mo.group("q") or mo.group("b"),
        schedule_kind="at" if mo.group("at") else "every",
        interval_n=int(mo.group("n")) if mo.group("n") else None,
        interval_unit=unit,
        at_ts=um((mo.group("at") or "").strip()) or None,
        starts=um((mo.group("starts") or "").strip()) or None,
        ends=um((mo.group("ends") or "").strip()) or None,
        body=body,
        enabled=enabled,
        comment=comment,
    )


def _starts_fields(starts: str | None):
    """(minute, hour, dom, mon, dow, literal?) from a STARTS literal;
    boundary defaults (0 0 1 1) when absent or non-literal."""
    if starts:
        mo = _TS_LIT_RE.match(starts.strip())
        if mo:
            import datetime

            y, m, d = int(mo.group(1)), int(mo.group(2)), int(mo.group(3))
            hh = int(mo.group(4) or 0)
            mi = int(mo.group(5) or 0)
            dow = datetime.date(y, m, d).isoweekday() % 7  # cron: 0=Sun
            return mi, hh, d, m, dow, True
        return 0, 0, 1, 1, 0, False
    return 0, 0, 1, 1, 0, True  # no STARTS: boundary anchor is exact


def _cron_schedule(spec: EventSpec) -> tuple[str | None, str | None, bool]:
    """(schedule_string, refusal_reason, phase_exact) for an EVERY
    spec. ``schedule_string`` is a 5-field cron entry or a pg_cron
    ``'n seconds'`` interval."""
    n, unit = spec.interval_n, spec.interval_unit
    mi, hh, dom, mon, dow, lit = _starts_fields(spec.starts)
    orig = f"EVERY {n} {unit.upper()}"
    if n < 1:
        return None, f"{orig}: interval must be positive", lit
    if unit == "quarter":
        n, unit = n * 3, "month"
    # promote full-period cadences to the parent unit: EVERY 60 MINUTE
    # is hourly — '*/60' is not a valid cron step (field max 59), and
    # EVERY 24 HOUR / 12 MONTH / 3600 SECOND ride the same ladder
    while True:
        if unit == "second" and n % 60 == 0:
            n, unit = n // 60, "minute"
        elif unit == "minute" and n % 60 == 0:
            n, unit = n // 60, "hour"
        elif unit == "hour" and n % 24 == 0:
            n, unit = n // 24, "day"
        elif unit == "day" and n % 7 == 0:
            n, unit = n // 7, "week"
        elif unit == "month" and n % 12 == 0:
            n, unit = n // 12, "year"
        else:
            break
    if f"EVERY {n} {unit.upper()}" != orig:
        orig = f"{orig} (= EVERY {n} {unit.upper()})"

    if unit == "second":
        if 1 <= n <= 59:
            return f"{n} seconds", None, True  # interval: no phase
        return None, f"{orig} exceeds pg_cron's 59 s interval", lit
    if unit == "minute":
        if n == 1:
            return "* * * * *", None, True
        if 60 % n == 0:
            return f"*/{n} * * * *", None, lit and mi % n == 0
        return None, (
            f"{orig}: 60 % {n} != 0 — cron's hour boundary "
            "would break the cadence"
        ), lit
    if unit == "hour":
        if n == 1:
            return f"{mi} * * * *", None, lit
        if 24 % n == 0:
            return f"{mi} */{n} * * *", None, lit and hh % n == 0
        return None, (
            f"{orig}: 24 % {n} != 0 — cron's day boundary "
            "would break the cadence"
        ), lit
    if unit == "day":
        if n == 1:
            return f"{mi} {hh} * * *", None, lit
        return None, (
            f"{orig} is not cron-expressible (day-of-month */"
            f"{n} resets at each month boundary)"
        ), lit
    if unit == "week":
        if n == 1:
            return f"{mi} {hh} * * {dow}", None, lit
        return None, f"{orig} is not cron-expressible", lit
    if unit == "month":
        if n == 1:
            return f"{mi} {hh} {dom} * *", None, lit
        if 12 % n == 0:
            return f"{mi} {hh} {dom} */{n} *", None, lit and (mon - 1) % n == 0
        return None, (
            f"{orig}: 12 % {n} != 0 — cron's year boundary "
            "would break the cadence"
        ), lit
    if unit == "year":
        if n == 1:
            return f"{mi} {hh} {dom} {mon} *", None, lit
        return None, f"{orig} is not cron-expressible", lit
    return None, f"unsupported interval unit {unit!r}", lit


#: single-statement body heads the rewriter handles faithfully
_BODY_HEAD_RE = re.compile(
    r"(?is)^\s*(INSERT|UPDATE|DELETE|REPLACE|TRUNCATE|CALL|SELECT)\b"
)


def _fresh_tag(base: str, *texts: str) -> str:
    """A dollar-quote tag not occurring in any of ``texts`` (review
    r12b: a body literal containing ``$evt$``/``$do$`` would terminate
    the quote early and the job would fail to parse at every match)."""
    tag, i = f"${base}$", 0
    while any(tag in t for t in texts):
        i += 1
        tag = f"${base}{i}$"
    return tag


def _plpgsql_stmt(pg_body: str) -> str:
    """One translated body statement as a plpgsql statement: a bare
    SELECT needs PERFORM inside a DO block (review r12b — plpgsql
    rejects 'query has no destination for result data')."""
    return re.sub(r"(?is)^\s*SELECT\b", "PERFORM", pg_body, count=1)


#: guard tolerance for the year-guarded one-shot/ENDS commands: the
#: cron field match happens in cron.timezone while now() compares in
#: the session TimeZone — up to a 14 h skew when they differ. Matches
#: are one YEAR apart, so the tolerance can never pull a firing to the
#: previous year's match (review r12b).
_TZ_TOLERANCE = "interval '14 hours'"


def event_to_pg_cron(spec: EventSpec) -> tuple[str | None, str | None, str | None]:
    """(ddl, skip_reason, note): exactly one of ddl/skip_reason is
    non-None. ``note`` rides along with an emitted ddl when the
    translation carries a bounded, documented divergence (phase)."""
    if not spec.enabled:
        return None, (
            f"CREATE EVENT {spec.name} is DISABLE'd at the source — "
            "scheduling it in pg_cron would enable it; recreate with "
            "cron.schedule + UPDATE cron.job SET active = false if "
            "wanted"
        ), None
    if spec.schedule_kind == "at":
        return None, (
            f"CREATE EVENT {spec.name}: one-shot AT {spec.at_ts} has no "
            "pg_cron analog (cron entries recur) — run the body once "
            "manually"
        ), None
    if spec.ends:
        return None, (
            f"CREATE EVENT {spec.name}: ENDS {spec.ends} has no cron "
            "analog — schedule without it and cron.unschedule at the "
            "end time"
        ), None
    sched, why, phase_exact = _cron_schedule(spec)
    if sched is None:
        return None, f"CREATE EVENT {spec.name}: {why} — not migrated", None
    if re.match(r"(?is)^\s*BEGIN\b", spec.body):
        return None, (
            f"CREATE EVENT {spec.name}: compound BEGIN…END body — "
            "migrate it as a procedure (functions stage) and schedule "
            "cron.schedule('…', 'CALL …'); not auto-migrated"
        ), None
    if not _BODY_HEAD_RE.match(spec.body):
        return None, (
            f"CREATE EVENT {spec.name}: body statement "
            f"{spec.body.split(None, 1)[0] if spec.body else '?'!r} is "
            "outside the translatable DML subset — not migrated"
        ), None
    pg_body = rewrite_mysql_expr_to_pg(spec.body).rstrip(";").strip()
    tag = _fresh_tag("evt", pg_body)
    ddl = (
        f"SELECT cron.schedule('{spec.name.lower()}', '{sched}', "
        f"{tag}{pg_body}{tag})"
    )
    note = None
    if not phase_exact:
        note = (
            f"event {spec.name}: cron anchors at the unit boundary; the "
            f"source STARTS {spec.starts} phase is not representable — "
            "first firing may shift by less than one period"
        )
    return ddl, None, note


def event_actions(raw: str) -> list[tuple[str, str]]:
    """The complete migration plan for one raw ``CREATE EVENT``
    statement: ``[(kind, payload)]`` with kind ``'ddl'`` (payload =
    one executable PG statement) / ``'skip'`` / ``'note'``. This is
    the single decision point both the orchestrator's events stage and
    the golden test consume.

    Beyond :func:`event_to_pg_cron`, a compound ``BEGIN…END`` body
    whose cadence is cron-expressible migrates via a SYNTHESIZED
    procedure (round 12b — the refusal message's own suggestion, now
    automated): the body translates through the full plpgsql
    machinery as ``CREATE OR REPLACE PROCEDURE <event>_evt_job()``,
    and the schedule becomes ``cron.schedule('<event>', '<sched>',
    $evt$CALL <event>_evt_job()$evt$)``. Literal ``AT`` one-shots and
    literal ``ENDS`` clauses emulate via pg_cron's self-unschedule
    idiom (see :func:`_one_shot_plan` / the ENDS block). Bodies the
    plpgsql builder refuses keep a named skip carrying the inner
    reason."""
    spec = parse_event(raw)
    if spec is None:
        mo = re.search(
            r"(?is)\bEVENT\s+(?:IF\s+NOT\s+EXISTS\s+)?(?:`([^`]+)`|(\w+))",
            raw,
        )
        ev_name = (mo.group(1) or mo.group(2)) if mo else "?"
        return [(
            "skip",
            f"CREATE EVENT {ev_name}: unparseable schedule/body — "
            "recreate in pg_cron or pgAgent (source DDL preserved in "
            "the dump); not migrated",
        )]
    return _spec_actions(spec)


def _spec_actions(spec: EventSpec) -> list[tuple[str, str]]:
    from dataclasses import replace as _dc_replace

    # literal ENDS (round 12b): plan the event WITHOUT its ENDS, then
    # append a self-unscheduling one-shot that removes the job at the
    # ENDS wall-clock match — the same pg_cron idiom as AT one-shots
    if (
        spec.enabled
        and spec.schedule_kind == "every"
        and spec.ends
        and _TS_LIT_RE.match(spec.ends.strip())
    ):
        inner = _spec_actions(_dc_replace(spec, ends=None))
        if any(k == "ddl" for k, _ in inner):
            name = spec.name.lower()
            mi, hh, dom, mon, _dow, _lit = _starts_fields(spec.ends)
            # cron has no year field: the remover's month/day entry
            # matches once a YEAR, so the command is year-guarded
            # (review r12 — without it an ENDS in 2028 migrated in
            # 2026 would kill the job two years early)
            cmd = (
                f"DO $do$ BEGIN "
                f"IF now() >= TIMESTAMP {spec.ends} - {_TZ_TOLERANCE} "
                f"THEN PERFORM cron.unschedule('{name}'); "
                f"PERFORM cron.unschedule('{name}_ends'); "
                f"END IF; END $do$"
            )
            inner.append((
                "ddl",
                f"SELECT cron.schedule('{name}_ends', "
                f"'{mi} {hh} {dom} {mon} *', $evt${cmd}$evt$)",
            ))
            inner.append((
                "note",
                f"event {spec.name}: ENDS {spec.ends} emulated via a "
                "second self-unscheduling one-shot (year-guarded DO "
                "block — cron has no year field; the guard carries a "
                "14 h tolerance for cron.timezone vs session TimeZone "
                "skew) that removes the job at the first wall-clock "
                "match at-or-after the ENDS time; a server down at "
                "that minute delays the removal to the next yearly "
                "match",
            ))
        return inner

    ddl, skip_reason, note = event_to_pg_cron(spec)
    out: list[tuple[str, str]] = []
    if (
        ddl is None
        and spec.enabled
        and spec.schedule_kind == "every"
        and not spec.ends
        and re.match(r"(?is)^\s*BEGIN\b", spec.body)
    ):
        job = f"{spec.name.lower()}_evt_job"
        probe, probe_skip, note = event_to_pg_cron(
            _dc_replace(spec, body=f"CALL {job}()")
        )
        if probe is None:
            skip_reason = probe_skip  # cadence itself is the blocker
        else:
            proc_ddl, body_skip = _synth_procedure(spec, job)
            if proc_ddl is None:
                skip_reason = body_skip
            else:
                out.append(("ddl", proc_ddl))
                ddl, skip_reason = probe, None
    if ddl is None and spec.enabled and spec.schedule_kind == "at":
        at_plan = _one_shot_plan(spec)
        if at_plan is not None:
            preludes, ddl, note = at_plan
            out.extend(("ddl", p) for p in preludes)
            skip_reason = None
    if ddl is not None:
        out.append(("ddl", ddl))
        if note:
            out.append(("note", note))
    else:
        out.append(("skip", skip_reason))
    return out


def _synth_procedure(spec: EventSpec, job: str):
    """(procedure DDL, None) for a compound BEGIN…END event body run
    through the full plpgsql routine machinery, or (None, named skip)
    when the builder refuses it."""
    from mysql2pg_spark.sinks.plpgsql import emit_plpgsql
    from mysql2pg_spark.sinks.plpgsql_builder import (
        UnsupportedFunctionError,
        build_spec_from_mysql,
    )

    try:
        pspec = build_spec_from_mysql(
            f"CREATE PROCEDURE {job}() {spec.body}"
        )
    except UnsupportedFunctionError as e:
        return None, (
            f"CREATE EVENT {spec.name}: compound body does not "
            f"translate to plpgsql ({e}) — not migrated"
        )
    return emit_plpgsql(pspec), None


def _one_shot_plan(spec: EventSpec):
    """pg_cron's self-unschedule idiom for ``AT '<literal ts>'``
    (round 12b): an exact-timestamp cron entry whose command runs the
    body and then ``cron.unschedule``s itself — the documented pg_cron
    pattern for one-shot jobs. cron has NO YEAR FIELD, so the command
    is a plpgsql DO block guarded by ``now() >= TIMESTAMP '<ts>'``
    (review r12): the month/day/time entry matches once a YEAR, and
    without the guard a 2030 one-shot migrated in 2026 would fire
    three years early, run once, and never run at the intended
    moment. Returns (prelude DDLs, schedule DDL, divergence note), or
    None when the shape doesn't conform (non-literal AT expression,
    untranslatable body) — the caller keeps the named skip."""
    if not spec.at_ts or not _TS_LIT_RE.match(spec.at_ts.strip()):
        return None
    mi, hh, dom, mon, _dow, _lit = _starts_fields(spec.at_ts)
    name = spec.name.lower()
    preludes: list[str] = []
    if re.match(r"(?is)^\s*BEGIN\b", spec.body):
        job = f"{name}_evt_job"
        proc_ddl, _skip = _synth_procedure(spec, job)
        if proc_ddl is None:
            return None
        preludes.append(proc_ddl)
        pg_body = f"CALL {job}()"
    elif _BODY_HEAD_RE.match(spec.body):
        pg_body = rewrite_mysql_expr_to_pg(spec.body).rstrip(";").strip()
    else:
        return None
    body_stmt = _plpgsql_stmt(pg_body)
    do_tag = _fresh_tag("do", body_stmt)
    cmd = (
        f"DO {do_tag} BEGIN "
        f"IF now() >= TIMESTAMP {spec.at_ts} - {_TZ_TOLERANCE} THEN "
        f"{body_stmt}; PERFORM cron.unschedule('{name}'); "
        f"END IF; END {do_tag}"
    )
    evt_tag = _fresh_tag("evt", cmd)
    ddl = (
        f"SELECT cron.schedule('{name}', "
        f"'{mi} {hh} {dom} {mon} *', {evt_tag}{cmd}{evt_tag})"
    )
    note = (
        f"event {spec.name}: one-shot AT {spec.at_ts} emulated via "
        "pg_cron's self-unschedule idiom (year-guarded DO block — "
        "cron has no year field; the guard carries a 14 h tolerance "
        "for cron.timezone vs session TimeZone skew) — the job fires "
        "at the first wall-clock match at-or-after the timestamp and "
        "removes itself; if the server is down at that minute it "
        "fires at the NEXT yearly match, where MySQL would have "
        "dropped a missed one-shot"
    )
    return preludes, ddl, note
