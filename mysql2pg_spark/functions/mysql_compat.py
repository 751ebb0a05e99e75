"""MySQL scalar-function semantics as Spark Column expressions.

One function per row of the reference's translation contract (SURVEY.md
§2.C; citations are to /root/reference file:line). Everything here stays
JVM-side (pyspark.sql.functions — whole-stage codegen) except the JSON
*mutation* family, which has no Spark builtin and is implemented as
Arrow-batched pandas UDFs (the documented slow path).

Where MySQL and Spark semantics differ, the MySQL behavior wins and the
difference is noted (e.g. GREATEST null-propagation, LENGTH = bytes).
"""

from __future__ import annotations

import json as _json
import re as _re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, IntegerType, StringType

from mysql2pg_spark.functions.datetime_fmt import mysql_format_to_spark


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x) if isinstance(x, str) else F.lit(x)


def _lit(x) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


# ===========================================================================
# C.2 — string functions (sync_viewddl.go:1040-1084, sync_functions.go:11-136)
# ===========================================================================


def concat(*cols) -> Column:
    """C12 CONCAT — NULL-propagating, matching MySQL (→ PG ``||`` chain,
    sync_viewddl.go:979-1037). Spark's F.concat is already NULL-propagating."""
    return F.concat(*[_c(c).cast("string") for c in cols])


def concat_ws(sep: str, *cols) -> Column:
    """C13 CONCAT_WS — skips NULLs (→ ARRAY_TO_STRING, sync_functions.go:29)."""
    return F.concat_ws(sep, *[_c(c).cast("string") for c in cols])


def length(c) -> Column:
    """C14 LENGTH — MySQL LENGTH() is *bytes* (→ length(CAST … TEXT)),
    unlike CHAR_LENGTH. Spark equivalent: octet_length."""
    return F.octet_length(_c(c).cast("string"))


def char_length(c) -> Column:
    """C15 CHAR_LENGTH — characters."""
    return F.char_length(_c(c).cast("string"))


def substr(c, pos, length_=None) -> Column:
    """C16 SUBSTR/SUBSTRING — 1-based; negative pos counts from the end
    (same in MySQL, PG, Spark). sync_viewddl.go:229-240."""
    if length_ is None:
        length_ = 2147483647
    return F.substring(_c(c).cast("string"), pos, length_)


def substring_index(c, delim: str, count: int) -> Column:
    """C17 SUBSTRING_INDEX → split_part (sync_viewddl.go:306-312) — Spark
    has the exact builtin."""
    return F.substring_index(_c(c).cast("string"), delim, count)


def locate(sub, s, pos: int = 1) -> Column:
    """C18 LOCATE(sub, s[, pos]) — 1-based, 0 when absent (→ strpos with
    swapped args, sync_viewddl.go:243-248)."""
    return F.locate(sub, _c(s).cast("string"), pos)


def instr(s, sub) -> Column:
    """C19 INSTR(s, sub) — arg order opposite of LOCATE."""
    return F.instr(_c(s).cast("string"), sub)


def replace(s, search, repl) -> Column:
    """C20 REPLACE — literal (not regex) replacement."""
    return F.replace(_c(s).cast("string"), _lit(search), _lit(repl))


def trim(c) -> Column:
    return F.trim(_c(c).cast("string"))


def ltrim(c) -> Column:
    return F.ltrim(_c(c).cast("string"))


def rtrim(c) -> Column:
    return F.rtrim(_c(c).cast("string"))


def upper(c) -> Column:
    return F.upper(_c(c).cast("string"))


def lower(c) -> Column:
    return F.lower(_c(c).cast("string"))


def reverse(c) -> Column:
    return F.reverse(_c(c).cast("string"))


def left(c, n: int) -> Column:
    """C22 LEFT(s, n) — empty string for n ≤ 0 (MySQL semantics)."""
    return F.substring(_c(c).cast("string"), 1, max(n, 0))


def right(c, n: int) -> Column:
    """C22 RIGHT(s, n)."""
    if n <= 0:
        return F.lit("")
    col = _c(c).cast("string")
    return F.when(
        F.length(col) <= n, col
    ).otherwise(F.substring(col, -n, n))


def lpad(c, n: int, pad: str = " ") -> Column:
    """C22 LPAD — MySQL truncates to n when the string is longer."""
    return F.lpad(_c(c).cast("string"), n, pad)


def rpad(c, n: int, pad: str = " ") -> Column:
    return F.rpad(_c(c).cast("string"), n, pad)


def repeat(c, n: int) -> Column:
    return F.repeat(_c(c).cast("string"), n)


def space(n) -> Column:
    """C23 SPACE(n) → repeat(' ', n) (sync_viewddl.go:314-319)."""
    return F.repeat(F.lit(" "), _c(n).cast("int"))


def ascii(c) -> Column:
    return F.ascii(_c(c).cast("string"))


def strcmp(a, b) -> Column:
    """C24 STRCMP → CASE chain (sync_viewddl.go:342-347)."""
    a, b = _c(a).cast("string"), _c(b).cast("string")
    return (
        F.when(a == b, 0).when(a < b, -1).when(a > b, 1).otherwise(F.lit(None))
    ).cast("int")


def hex(c) -> Column:
    """C25 HEX — uppercase hex of the int value or of the string's bytes
    (→ to_hex / encode(bytea), sync_viewddl.go:321-330)."""
    return F.upper(F.hex(_c(c)))


def conv(c, from_base: int, to_base: int) -> Column:
    """C26 CONV(n, f, t) (sync_viewddl.go:332-340) — Spark has the exact
    builtin; result digits are uppercase like MySQL."""
    return F.conv(_c(c).cast("string"), from_base, to_base)


def bin(c) -> Column:
    """C22 BIN(n) = CONV(n, 10, 2)."""
    return F.bin(_c(c).cast("bigint"))


def insert(s, pos, length_, new) -> Column:
    """C27 MySQL INSERT(str, pos, len, newstr) → OVERLAY
    (sync_viewddl.go:477-502). Out-of-range pos returns str unchanged."""
    s_ = _c(s).cast("string")
    res = F.overlay(s_, _lit(new), _lit(pos), _lit(length_))
    return F.when(
        (_lit(pos) < 1) | (_lit(pos) > F.length(s_)), s_
    ).otherwise(res)


def regexp(c, pattern: str) -> Column:
    """C28 `expr REGEXP pattern` → ``~`` (sync_functions.go:21,506)."""
    return _c(c).cast("string").rlike(pattern)


# ===========================================================================
# C.3 — conditional / null (sync_functions.go:823-1037)
# ===========================================================================


def if_(cond, then, else_) -> Column:
    """C30 IF(c,t,e) → CASE WHEN (sync_functions.go:823-907)."""
    return F.when(_c(cond), _lit(then)).otherwise(_lit(else_))


def ifnull(a, b) -> Column:
    """C29 IFNULL → COALESCE (sync_functions.go:911-992)."""
    return F.coalesce(_c(a), _lit(b))


def isnull(c) -> Column:
    """C31 ISNULL(x) → (x IS NULL) (sync_functions.go:996-1037)."""
    return _c(c).isNull()


def nullif(a, b) -> Column:
    """C32 NULLIF — passthrough."""
    return F.nullif(_c(a), _lit(b))


def coalesce(*cols) -> Column:
    """C33 COALESCE — the reference casts every arg to text as a blunt
    type-unification hack (sync_viewddl.go:377-383); Spark's coercion
    rules make that unnecessary, so args pass through typed."""
    return F.coalesce(*[_c(c) for c in cols])


# ===========================================================================
# C.4 — math
# ===========================================================================


def round(c, n: int = 0) -> Column:
    """C34 ROUND(x, n) — MySQL rounds half away from zero for exact
    halves, matching Spark's HALF_UP."""
    return F.round(_c(c), n)


def mod(a, b) -> Column:
    """C35 a % b — result keeps the dividend's sign (MySQL MOD == Spark %
    == PG MOD for integers)."""
    return _c(a) % _lit(b)


def ceiling(c) -> Column:
    """C36 CEILING — Spark returns BIGINT for double input; keep MySQL's
    numeric flavor by casting."""
    return F.ceil(_c(c)).cast("bigint")


def floor(c) -> Column:
    return F.floor(_c(c)).cast("bigint")


def abs(c) -> Column:
    return F.abs(_c(c))


def power(a, b) -> Column:
    return F.pow(_c(a), _lit(b))


def sqrt(c) -> Column:
    return F.sqrt(_c(c))


def exp(c) -> Column:
    return F.exp(_c(c))


def ln(c) -> Column:
    return F.log(_c(c))


def log10(c) -> Column:
    return F.log10(_c(c))


def rand(seed: int | None = None) -> Column:
    """C37 RAND([seed]) — the reference discards the seed
    (sync_viewddl.go:115,839); Spark keeps it, which is strictly better
    for reproducibility."""
    return F.rand(seed) if seed is not None else F.rand()


def greatest(*cols) -> Column:
    """C38 GREATEST — MySQL returns NULL if ANY argument is NULL; Spark
    skips NULLs, so wrap (the parity gap called out in SURVEY §2.C)."""
    cs = [_c(c) for c in cols]
    any_null = cs[0].isNull()
    for c in cs[1:]:
        any_null = any_null | c.isNull()
    return F.when(any_null, F.lit(None)).otherwise(F.greatest(*cs))


def least(*cols) -> Column:
    """C38 LEAST — same NULL semantics as greatest()."""
    cs = [_c(c) for c in cols]
    any_null = cs[0].isNull()
    for c in cs[1:]:
        any_null = any_null | c.isNull()
    return F.when(any_null, F.lit(None)).otherwise(F.least(*cs))


def cast_signed(c) -> Column:
    """C39 CAST(x AS SIGNED) → BIGINT. MySQL *rounds* fractional input
    (CAST(1.6 AS SIGNED) = 2) where Spark's cast truncates — round first."""
    return F.round(_c(c), 0).cast("bigint")


def cast_unsigned(c) -> Column:
    """C39 CAST(x AS UNSIGNED) → BIGINT (Spark has no unsigned; the
    reference maps to BIGINT too, sync_viewddl.go:127-129). Rounds like
    cast_signed."""
    return F.round(_c(c), 0).cast("bigint")


def convert(c, type_name: str) -> Column:
    """C40 CONVERT(x, T) → CAST (sync_viewddl.go:1145-1202)."""
    t = type_name.strip().lower()
    t = {"signed": "bigint", "unsigned": "bigint", "char": "string"}.get(t, t)
    return _c(c).cast(t)


# ===========================================================================
# C.5 — date/time
# ===========================================================================


def now() -> Column:
    """C41 NOW()/SYSDATE() → CURRENT_TIMESTAMP."""
    return F.current_timestamp()


def curdate() -> Column:
    """C42 CURDATE() → current_date."""
    return F.current_date()


def curtime() -> Column:
    """C42 CURTIME() — Spark has no TimeType; HH:mm:ss string."""
    return F.date_format(F.current_timestamp(), "HH:mm:ss")


def unix_timestamp(c=None) -> Column:
    """C43 UNIX_TIMESTAMP([x]) → extract(epoch …) (sync_viewddl.go:571-580).
    Whole seconds (MySQL truncates fractional seconds for the no-arg and
    integer forms)."""
    return F.unix_timestamp() if c is None else F.unix_timestamp(_c(c))


def from_unixtime(c, fmt: str | None = None) -> Column:
    """C44 FROM_UNIXTIME(x[, fmt]) → to_timestamp(x) (sync_viewddl.go:582-591).
    Spark's builtin returns a formatted string in session tz (UTC here)."""
    if fmt is None:
        return F.from_unixtime(_c(c))
    return F.from_unixtime(_c(c), mysql_format_to_spark(fmt))


def date_format(c, mysql_fmt: str) -> Column:
    """C45 DATE_FORMAT(d, '%Y-%m-%d') — the reference forwards MySQL %
    tokens to PG to_char UNCONVERTED (latent bug, sync_viewddl.go:91,592);
    this engine converts the tokens correctly (datetime_fmt.py)."""
    return F.date_format(_c(c), mysql_format_to_spark(mysql_fmt))


def str_to_date(c, mysql_fmt: str) -> Column:
    """C46 STR_TO_DATE(s, fmt) → to_date (sync_viewddl.go:93,593)."""
    spark_fmt = mysql_format_to_spark(mysql_fmt)
    if any(tok in mysql_fmt for tok in ("%H", "%i", "%s", "%T", "%k")):
        return F.to_timestamp(_c(c), spark_fmt)
    return F.to_date(_c(c), spark_fmt)


def datediff(a, b) -> Column:
    """C47 DATEDIFF(a, b) = days(a) - days(b) (→ date_part('day', a-b),
    sync_viewddl.go:95,594)."""
    return F.datediff(_c(a), _c(b))


def timestampdiff(unit: str, a, b) -> Column:
    """C49 TIMESTAMPDIFF(unit, a, b) — b - a in `unit`
    (sync_viewddl.go:597-633; epoch-division per unit)."""
    return F.timestamp_diff(unit.upper(), _c(a), _c(b))


def date_add(c, n: int, unit: str = "DAY") -> Column:
    """C50/C51 DATE_ADD(d, INTERVAL n u) → d + n * interval '1 u'
    (sync_viewddl.go:706-761)."""
    return _c(c) + F.expr(f"INTERVAL {n} {unit.upper()}")


def date_sub(c, n: int, unit: str = "DAY") -> Column:
    return _c(c) - F.expr(f"INTERVAL {n} {unit.upper()}")


def year(c) -> Column:
    """C53 extract-family — cast to BIGINT so results hash-match engines
    whose EXTRACT returns 64-bit (PG/DuckDB)."""
    return F.year(_c(c)).cast("bigint")


def quarter(c) -> Column:
    return F.quarter(_c(c)).cast("bigint")


def month(c) -> Column:
    return F.month(_c(c)).cast("bigint")


def day(c) -> Column:
    return F.dayofmonth(_c(c)).cast("bigint")


dayofmonth = day


def hour(c) -> Column:
    return F.hour(_c(c)).cast("bigint")


def minute(c) -> Column:
    return F.minute(_c(c)).cast("bigint")


def second(c) -> Column:
    return F.second(_c(c)).cast("bigint")


def dayofyear(c) -> Column:
    return F.dayofyear(_c(c)).cast("bigint")


def weekofyear(c) -> Column:
    return F.weekofyear(_c(c)).cast("bigint")


def dayofweek(c) -> Column:
    """C54 DAYOFWEEK — 1 = Sunday (the reference adds 1 to PG's dow,
    sync_viewddl.go:657-663; Spark's builtin is already 1 = Sunday)."""
    return F.dayofweek(_c(c)).cast("bigint")


def last_day(c) -> Column:
    """C55 LAST_DAY → date_trunc + 1 month - 1 day (sync_viewddl.go:665-670);
    Spark builtin."""
    return F.last_day(_c(c))


def to_days(c) -> Column:
    """C56 TO_DAYS(x) — days since year 0 (MySQL's day 1 = 0000-01-01;
    Spark can't represent year 0, so anchor on 0001-01-01 = day 366)."""
    return (F.datediff(_c(c), F.lit("0001-01-01").cast("date")) + 366).cast("bigint")


def time_to_sec(c) -> Column:
    """C57 TIME_TO_SEC('HH:MM:SS') — seconds since midnight; TIME arrives
    as string (no Spark TimeType, SURVEY §1.3)."""
    parts = F.split(_c(c).cast("string"), ":")
    return (
        parts.getItem(0).cast("bigint") * 3600
        + parts.getItem(1).cast("bigint") * 60
        + parts.getItem(2).cast("double").cast("bigint")
    )


def sec_to_time(c) -> Column:
    """C57 SEC_TO_TIME(n) → 'HH:MM:SS' string."""
    n = _c(c).cast("bigint")
    return F.concat_ws(
        ":",
        F.lpad((n / 3600).cast("bigint").cast("string"), 2, "0"),
        F.lpad(((n % 3600) / 60).cast("bigint").cast("string"), 2, "0"),
        F.lpad((n % 60).cast("string"), 2, "0"),
    )


def date(c) -> Column:
    """C59 DATE(x) — date part."""
    return F.to_date(_c(c))


def time(c) -> Column:
    """C59 TIME(x) — time-of-day as string (no Spark TimeType)."""
    return F.date_format(_c(c), "HH:mm:ss")


# ===========================================================================
# C.6 — JSON (sync_viewddl.go:28-45, 389-474)
# ===========================================================================


def json_extract(c, path: str) -> Column:
    """C62 JSON_EXTRACT(j, '$.k') → j -> path. get_json_object returns the
    unquoted scalar (MySQL returns quoted JSON; the common MySQL idiom
    JSON_UNQUOTE(JSON_EXTRACT(...)) is exactly this)."""
    return F.get_json_object(_c(c).cast("string"), path)


def json_unquote(c) -> Column:
    """C64 JSON_UNQUOTE — get_json_object output is already unquoted;
    strip quotes for raw JSON string literals."""
    s = _c(c).cast("string")
    inner = F.regexp_replace(
        s.substr(F.lit(2), F.length(s) - 2), r'\\"', '"'
    )
    return F.when(s.startswith('"') & s.endswith('"'), inner).otherwise(s)


def json_value(c, path: str) -> Column:
    """C63 JSON_VALUE → ->> (string result)."""
    return F.get_json_object(_c(c).cast("string"), path)


def json_valid(c) -> Column:
    """C69 JSON_VALID → parseable check (→ jsonb_typeof IS NOT NULL)."""
    s = _c(c).cast("string")
    return F.when(s.isNull(), F.lit(None).cast(BooleanType())).otherwise(
        F.try_parse_json(s).isNotNull()
    )


def json_keys(c) -> Column:
    """C66 JSON_KEYS(j) → sorted? No — MySQL preserves object order; Spark
    json_object_keys preserves document order too."""
    return F.json_object_keys(_c(c).cast("string"))


def json_length(c) -> Column:
    """C67 JSON_LENGTH — array → element count, object → key count,
    scalar → 1 (CASE on jsonb_typeof in the reference, :417-423)."""
    s = _c(c).cast("string")
    arr_len = F.json_array_length(s)
    obj_len = F.size(F.json_object_keys(s))
    return (
        F.when(s.isNull(), F.lit(None).cast(IntegerType()))
        .when(arr_len.isNotNull(), arr_len)
        .when(F.trim(s).startswith("{"), obj_len)
        .otherwise(F.lit(1))
    ).cast("bigint")


def json_type(c) -> Column:
    """C68 JSON_TYPE → jsonb_typeof equivalent (MySQL type names)."""
    s = F.trim(_c(c).cast("string"))
    return (
        F.when(s.isNull(), F.lit(None).cast(StringType()))
        .when(s.startswith("{"), "OBJECT")
        .when(s.startswith("["), "ARRAY")
        .when(s.startswith('"'), "STRING")
        .when(s.isin("true", "false"), "BOOLEAN")
        .when(s == "null", "NULL")
        .when(s.rlike(r"^-?\d+$"), "INTEGER")
        .when(s.rlike(r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$"), "DOUBLE")
        .otherwise("UNKNOWN")
    )


def json_object(*kv) -> Column:
    """C60 JSON_OBJECT(k1, v1, …) → compact JSON text
    (→ json_build_object, sync_viewddl.go:389)."""
    pairs = []
    for i in range(0, len(kv), 2):
        key = kv[i] if isinstance(kv[i], str) else str(kv[i])
        pairs.append(_c(kv[i + 1]).alias(key))
    return F.to_json(F.struct(*pairs))


def json_array(*vals) -> Column:
    """C61 JSON_ARRAY(…) → json_build_array equivalent."""
    return F.to_json(F.array(*[_c(v) for v in vals]))


def json_contains_path(c, path: str) -> Column:
    """C71 JSON_CONTAINS_PATH(j, 'one', p) → jsonb_path_exists."""
    return F.get_json_object(_c(c).cast("string"), path).isNotNull()


# ---- JSON mutation family: no Spark builtin → Arrow-batched pandas UDFs
# (the reference maps these to jsonb_insert/jsonb_set/… :39-45,452-474).


def _json_mutate_one(op: str, d, p, v):
    """One JSON mutation in MySQL semantics (shared by the Arrow-batched
    column path and the SQL-registered view-compat UDFs). Paths cover the
    family's documented scope: '$', '$.key', and for the C74 array ops
    also '$[i]' / '$.key[i]'."""
    if d is None or p is None:
        return None
    try:
        obj = _json.loads(d)
    except (ValueError, TypeError):
        return None
    try:
        vv = _json.loads(v) if v is not None else None
    except (ValueError, TypeError):
        vv = v

    if op in ("array_append", "array_insert"):
        mo = _re.fullmatch(r"\$(?:\.(\w+))?(?:\[(\d+)\])?", p.strip())
        if not mo:
            return d
        key, idx = mo.group(1), mo.group(2)
        target = obj.get(key) if key is not None and isinstance(obj, dict) else obj
        if op == "array_append":
            if not isinstance(target, list):
                return d
            target.append(vv)
        else:
            if not isinstance(target, list) or idx is None:
                return d
            target.insert(int(idx), vv)
        return _json.dumps(obj, separators=(",", ":"))

    if not p.startswith("$.") or not isinstance(obj, dict):
        return d
    key = p[2:]
    changed = False
    if op == "set":
        obj[key] = vv
        changed = True
    elif op == "insert" and key not in obj:
        obj[key] = vv
        changed = True
    elif op == "replace" and key in obj:
        obj[key] = vv
        changed = True
    elif op == "remove" and key in obj:
        obj.pop(key)
        changed = True
    # MySQL returns the document unchanged (original text) when the
    # operation is a no-op; only re-serialize on mutation.
    return _json.dumps(obj, separators=(",", ":")) if changed else d


def _pandas_json_mutate(op: str):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(StringType())
    def mutate(doc: pd.Series, path: pd.Series, val: pd.Series) -> pd.Series:
        return pd.Series(
            [_json_mutate_one(op, d, p, v) for d, p, v in zip(doc, path, val)],
            dtype="object",
        )

    return mutate


def json_set(doc, path, value) -> Column:
    """C73 JSON_SET → jsonb_set (pandas-UDF slow path; top-level keys)."""
    return _pandas_json_mutate("set")(_c(doc), _lit(path), _lit(value))


def json_insert(doc, path, value) -> Column:
    """C73 JSON_INSERT → jsonb_insert."""
    return _pandas_json_mutate("insert")(_c(doc), _lit(path), _lit(value))


def json_replace(doc, path, value) -> Column:
    """C73 JSON_REPLACE → jsonb_set (create=false)."""
    return _pandas_json_mutate("replace")(_c(doc), _lit(path), _lit(value))


def json_remove(doc, path) -> Column:
    """C73 JSON_REMOVE → jsonb_delete."""
    return _pandas_json_mutate("remove")(_c(doc), _lit(path), F.lit(None))


def json_array_append(doc, path, value) -> Column:
    """C74 JSON_ARRAY_APPEND → arr || json_build_array(v)."""
    return _pandas_json_mutate("array_append")(_c(doc), _lit(path), _lit(value))


def json_array_insert(doc, path, value) -> Column:
    """C74 JSON_ARRAY_INSERT('$.k[i]') → jsonb_insert at position."""
    return _pandas_json_mutate("array_insert")(_c(doc), _lit(path), _lit(value))


def json_merge_patch(doc, patch) -> Column:
    """C75 JSON_MERGE_PATCH → jsonb_merge_patch (RFC 7396: null values in
    the patch delete keys; objects merge recursively)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(StringType())
    def merge(d: pd.Series, p: pd.Series) -> pd.Series:
        def patch_one(base, delta):
            if not isinstance(delta, dict):
                return delta
            if not isinstance(base, dict):
                base = {}
            out = dict(base)
            for k, v in delta.items():
                if v is None:
                    out.pop(k, None)
                else:
                    out[k] = patch_one(out.get(k), v)
            return out

        def one(dv, pv):
            if dv is None or pv is None:
                return None
            try:
                merged = patch_one(_json.loads(dv), _json.loads(pv))
            except (ValueError, TypeError):
                return None
            return _json.dumps(merged, separators=(",", ":"))

        return pd.Series([one(a, b) for a, b in zip(d, p)], dtype="object")

    return merge(_c(doc), _lit(patch))


def _merge_preserve_py(a, b):
    """MySQL JSON_MERGE_PRESERVE: arrays concatenate, objects merge with
    same-key values themselves merge-preserved, scalars wrap to arrays."""
    if isinstance(a, dict) and isinstance(b, dict):
        out = dict(a)
        for k, v in b.items():
            out[k] = _merge_preserve_py(out[k], v) if k in out else v
        return out
    la = a if isinstance(a, list) else [a]
    lb = b if isinstance(b, list) else [b]
    return la + lb


def json_merge_preserve(doc, other) -> Column:
    """C75 JSON_MERGE[_PRESERVE] → jsonb_concat analog (the reference
    maps both spellings to one behavior, sync_viewddl.go:469-474)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(StringType())
    def merge(d: pd.Series, o: pd.Series) -> pd.Series:
        def one(dv, ov):
            if dv is None or ov is None:
                return None
            try:
                merged = _merge_preserve_py(_json.loads(dv), _json.loads(ov))
            except (ValueError, TypeError):
                return None
            return _json.dumps(merged, separators=(",", ":"))

        return pd.Series([one(a, b) for a, b in zip(d, o)], dtype="object")

    return merge(_c(doc), _lit(other))


def json_pretty(c) -> Column:
    """C70 JSON_PRETTY → jsonb_pretty (UDF over json.dumps, per the
    SURVEY mapping)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(StringType())
    def pretty(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            try:
                return _json.dumps(_json.loads(v), indent=2)
            except (ValueError, TypeError):
                return None

        return s.map(one)

    return pretty(_c(c).cast("string"))


def json_depth(c) -> Column:
    """C72 JSON_DEPTH — the reference declares it unsupported and emits
    NULL::integer (sync_viewddl.go:432-437); we implement it properly
    (scalar=1, empty array/object=1, nesting adds 1)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(IntegerType())
    def depth(s: pd.Series) -> pd.Series:
        def d(v):
            if isinstance(v, dict):
                return 1 + (max((d(x) for x in v.values()), default=0))
            if isinstance(v, list):
                return 1 + (max((d(x) for x in v), default=0))
            return 1

        def one(v):
            if v is None:
                return None
            try:
                return d(_json.loads(v))
            except (ValueError, TypeError):
                return None

        return s.map(one).astype("Int32")

    return depth(_c(c).cast("string"))


def _overlap_py(a, b):
    """MySQL JSON_OVERLAPS comparison over parsed values: arrays share an
    element; objects share a key/value pair; scalar vs array = membership;
    scalar vs scalar = equality."""
    a_arr, b_arr = isinstance(a, list), isinstance(b, list)
    if a_arr and b_arr:
        return any(x in b for x in a)
    if isinstance(a, dict) and isinstance(b, dict):
        return any(k in b and b[k] == v for k, v in a.items())
    if a_arr != b_arr:
        scalar, arr = (b, a) if a_arr else (a, b)
        return not isinstance(scalar, (dict, list)) and scalar in arr
    return not isinstance(a, (dict, list)) and a == b


def json_overlaps(a, b) -> Column:
    """C71 JSON_OVERLAPS(a, b) — any shared element / key-value pair /
    equal scalar (the reference passes it through; PG 16 has
    jsonb_path-based equivalents)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BooleanType())
    def overlaps(sa: pd.Series, sb: pd.Series) -> pd.Series:
        def one(va, vb):
            if va is None or vb is None:
                return None
            try:
                return _overlap_py(_json.loads(va), _json.loads(vb))
            except (ValueError, TypeError):
                return None

        return pd.Series(
            [one(x, y) for x, y in zip(sa, sb)], dtype="object"
        )

    return overlaps(_c(a).cast("string"), _c(b).cast("string"))


def register_compat_udfs(spark) -> None:
    """Register the non-builtin-expressible JSON functions under
    ``mysql_*`` names so TRANSPILED view text can call them from Spark
    SQL (the engine-side Column API uses the functions above directly).
    Idempotent; every registration is an Arrow-batched ``pandas_udf`` —
    no row-at-a-time Python UDF anywhere in the package."""
    import json as js

    def _pretty(v):
        if v is None:
            return None
        try:
            return js.dumps(js.loads(v), indent=2)
        except (ValueError, TypeError):
            return None

    def _depth_of(v):
        if isinstance(v, dict):
            return 1 + max((_depth_of(x) for x in v.values()), default=0)
        if isinstance(v, list):
            return 1 + max((_depth_of(x) for x in v), default=0)
        return 1

    def _depth(v):
        if v is None:
            return None
        try:
            return _depth_of(js.loads(v))
        except (ValueError, TypeError):
            return None

    def _overlaps(a, b):
        if a is None or b is None:
            return None
        try:
            return _overlap_py(js.loads(a), js.loads(b))
        except (ValueError, TypeError):
            return None

    from pyspark.sql.functions import pandas_udf

    # Arrow-batched registrations (round 11, VERDICT r9 ask #4): every
    # SQL-registered name is a pandas_udf — batch transfer instead of
    # per-row pickling, so a transpiled view calling mysql_json_* stays
    # on the same 10-100× faster path as the Column API above.
    def _vec1(py, dtype="object"):
        def f(s: pd.Series) -> pd.Series:
            return pd.Series([py(v) for v in s], dtype=dtype)

        return f

    def _vec2(py):
        def f(a: pd.Series, b: pd.Series) -> pd.Series:
            return pd.Series(
                [py(x, y) for x, y in zip(a, b)], dtype="object"
            )

        return f

    def _vec3(py):
        def f(a: pd.Series, b: pd.Series, c: pd.Series) -> pd.Series:
            return pd.Series(
                [py(x, y, z) for x, y, z in zip(a, b, c)], dtype="object"
            )

        return f

    spark.udf.register(
        "mysql_json_pretty", pandas_udf(_vec1(_pretty), "string")
    )
    spark.udf.register(
        "mysql_json_depth", pandas_udf(_vec1(_depth, "Int32"), "int")
    )
    spark.udf.register(
        "mysql_json_overlaps", pandas_udf(_vec2(_overlaps), "boolean")
    )

    for op in ("set", "insert", "replace", "array_append", "array_insert"):
        spark.udf.register(
            f"mysql_json_{op}",
            pandas_udf(
                _vec3(
                    (lambda o: lambda d, p, v: _json_mutate_one(o, d, p, v))(
                        op
                    )
                ),
                "string",
            ),
        )
    spark.udf.register(
        "mysql_json_remove",
        pandas_udf(
            _vec2(lambda d, p: _json_mutate_one("remove", d, p, None)),
            "string",
        ),
    )

    def _merge_scalar(merger):
        def f(a, b):
            if a is None or b is None:
                return None
            try:
                out = merger(_json.loads(a), _json.loads(b))
            except (ValueError, TypeError):
                return None
            return _json.dumps(out, separators=(",", ":"))

        return f

    def _patch_py(base, delta):
        if not isinstance(delta, dict):
            return delta
        if not isinstance(base, dict):
            base = {}
        out = dict(base)
        for k, v in delta.items():
            if v is None:
                out.pop(k, None)
            else:
                out[k] = _patch_py(out.get(k), v)
        return out

    spark.udf.register(
        "mysql_json_merge_patch",
        pandas_udf(_vec2(_merge_scalar(_patch_py)), "string"),
    )
    spark.udf.register(
        "mysql_json_merge_preserve",
        pandas_udf(_vec2(_merge_scalar(_merge_preserve_py)), "string"),
    )


# ===========================================================================
# C.7 — system / crypto / network
# ===========================================================================


def md5(c) -> Column:
    """C76 MD5 — same-name passthrough (sync_viewddl.go:509-523)."""
    return F.md5(_c(c).cast("string").cast("binary"))


def sha1(c) -> Column:
    """C76 SHA1."""
    return F.sha1(_c(c).cast("string").cast("binary"))


def sha2(c, bits: int = 256) -> Column:
    """C76 SHA2(x, bits)."""
    return F.sha2(_c(c).cast("string").cast("binary"), bits)


def uuid() -> Column:
    """C77 UUID() → uuid_generate_v4 equivalent."""
    return F.expr("uuid()")


def uuid_short() -> Column:
    """C78 UUID_SHORT() → monotonically increasing 64-bit id — the Spark
    analog of the reference's epoch-derived bigint (:532-534)."""
    return F.monotonically_increasing_id()


def inet_aton(c) -> Column:
    """C79 INET_ATON('a.b.c.d') → 32-bit int — pure column math, no UDF
    (the reference uses PG inet casts, sync_viewddl.go:540-565)."""
    parts = F.split(_c(c).cast("string"), r"\.")
    return (
        parts.getItem(0).cast("bigint") * 16777216
        + parts.getItem(1).cast("bigint") * 65536
        + parts.getItem(2).cast("bigint") * 256
        + parts.getItem(3).cast("bigint")
    )


def inet_ntoa(c) -> Column:
    """C79 INET_NTOA(n) → dotted quad."""
    n = _c(c).cast("bigint")
    return F.concat_ws(
        ".",
        ((n / 16777216) % 256).cast("bigint").cast("string"),
        ((n / 65536) % 256).cast("bigint").cast("string"),
        ((n / 256) % 256).cast("bigint").cast("string"),
        (n % 256).cast("string"),
    )


def database(spark=None) -> Column:
    """C80 DATABASE() → current_database (driver-side constant)."""
    return F.current_database() if hasattr(F, "current_database") else F.lit("default")


def current_user() -> Column:
    """C81 USER()/CURRENT_USER → current_user."""
    return F.current_user() if hasattr(F, "current_user") else F.lit("spark")


def version() -> Column:
    """C82 VERSION() → engine version string."""
    return F.version()


def connection_id() -> Column:
    """C84 CONNECTION_ID() → nearest Spark analog: the task's partition id
    (reference maps to pg_backend_pid, sync_viewddl.go:812-814)."""
    return F.spark_partition_id().cast("bigint")
