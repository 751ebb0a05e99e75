"""Shared quote-aware SQL text scanning (round 15).

Three near-identical bespoke balanced-paren scanners had grown in
ddl_lint (CHECK bodies), dumpfile (KEY bodies) and sinks/ddl
(functional key-part splitting) — review finding: a future
escape-handling fix would predictably miss one. This module is the
single implementation. Quote convention: standard SQL single quotes
with '' doubling (the doubling falls out naturally of skip-to-next-
quote scanning: the second quote of a doubled pair opens a new
"literal" that closes at the next quote, so paren counting is never
confused either way). MySQL backslash escapes must be normalized
BEFORE scanning (dialect.transpile.normalize_backslash_quotes), the
repo-wide rule for MySQL-text surfaces.
"""

from __future__ import annotations

import re as _re

_PLAIN_PART_RE = _re.compile(
    r"(?is)^`?([A-Za-z0-9_]+)`?\s*(?:\(\d+\))?\s*(?:ASC|DESC)?$"
)


def balanced_span(s: str, open_idx: int) -> str:
    """Text inside the paren opening at ``s[open_idx]``, by balanced
    scan with single-quoted strings skipped. An unterminated body
    returns the remainder (callers' unbalanced-paren lints report it)."""
    depth, i, n = 0, open_idx, len(s)
    while i < n:
        c = s[i]
        if c == "'":
            j = s.find("'", i + 1)
            if j < 0:
                break
            i = j
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return s[open_idx + 1:i]
        i += 1
    return s[open_idx + 1:]


def split_top_level(spec: str) -> list[str]:
    """Split on depth-0 commas, quote- and paren-aware (a part like
    ``(concat(a, ', ', b))`` stays whole). Empty parts are dropped."""
    parts: list[str] = []
    depth, buf, i, n = 0, [], 0, len(spec)
    while i < n:
        c = spec[i]
        if c == "'":
            j = spec.find("'", i + 1)
            j = n - 1 if j < 0 else j
            buf.append(spec[i:j + 1])
            i = j + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if c == "," and depth == 0:
            if "".join(buf).strip():
                parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(c)
        i += 1
    if "".join(buf).strip():
        parts.append("".join(buf).strip())
    return parts


def plain_index_columns(body: str) -> list[str] | None:
    """Column names when EVERY top-level part of an index key list is a
    plain column reference (optionally backticked, with a prefix length
    and/or ASC/DESC — both dropped, the C93 policy); ``None`` when any
    part is an expression, in which case the caller must keep the WHOLE
    body as the key expression — cherry-picking the plain parts would
    silently reorder/drop key parts (review r15: a mixed
    ``KEY (a, (lower(b)))`` previously migrated as a plain index on
    ``a``, over-constraining a UNIQUE key with no skip surfaced)."""
    cols: list[str] = []
    for part in split_top_level(body):
        m = _PLAIN_PART_RE.match(part)
        if not m:
            return None
        cols.append(m.group(1))
    return cols or None
