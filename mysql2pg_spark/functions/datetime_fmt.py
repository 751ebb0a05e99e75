"""MySQL DATE_FORMAT/STR_TO_DATE token → Spark datetime-pattern mapping.

The reference passes MySQL ``%`` tokens through to PostgreSQL ``to_char``
unconverted — a documented latent bug (SURVEY.md C45,
sync_viewddl.go:91,592). This engine converts correctly.

Spark patterns treat bare letters as pattern fields, so literal alpha
runs in the input format are emitted inside single quotes.
"""

from __future__ import annotations

# MySQL token → Spark SimpleDateFormat-style pattern.
MYSQL_TO_SPARK = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%c": "M",
    "%d": "dd",
    "%e": "d",
    "%H": "HH",
    "%k": "H",
    "%h": "hh",
    "%I": "hh",
    "%l": "h",
    "%i": "mm",  # MySQL %i = minutes
    "%s": "ss",
    "%S": "ss",
    "%f": "SSSSSS",
    "%p": "a",
    "%W": "EEEE",
    "%a": "EEE",
    "%b": "MMM",
    "%M": "MMMM",
    "%j": "DDD",
    "%T": "HH:mm:ss",
    "%r": "hh:mm:ss a",
    "%%": "%",
}

_ALPHA = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")


def mysql_format_to_spark(fmt: str) -> str:
    """Convert a MySQL format string to a Spark datetime pattern.

    >>> mysql_format_to_spark('%Y-%m-%d %H:%i:%s')
    'yyyy-MM-dd HH:mm:ss'
    >>> mysql_format_to_spark('%Y year')
    "yyyy 'year'"
    """
    out: list[str] = []
    literal: list[str] = []

    def flush_literal() -> None:
        if not literal:
            return
        run = "".join(literal)
        if any(ch in _ALPHA for ch in run):
            out.append("'" + run.replace("'", "''") + "'")
        else:
            # non-alpha runs pass through, but a bare quote still needs
            # the Spark-pattern '' escape (found by hypothesis: fmt="'")
            out.append(run.replace("'", "''"))
        literal.clear()

    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            token = fmt[i : i + 2]
            if token in MYSQL_TO_SPARK:
                flush_literal()
                out.append(MYSQL_TO_SPARK[token])
                i += 2
                continue
            # Unknown token: MySQL emits the bare char.
            literal.append(fmt[i + 1])
            i += 2
            continue
        literal.append(fmt[i])
        i += 1
    flush_literal()
    return "".join(out)
