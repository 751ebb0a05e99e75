"""MySQL table partitioning → PostgreSQL declarative partitioning (C92
closure, round 12).

The reference STRIPS the partition clause entirely
(sync_tableddl.go:268-302 deletes the ``/*!50100 PARTITION BY …*/``
block), silently unpartitioning every migrated table. Round 11 stopped
the silent drop (named skip); this module finishes the job for the
schemes PostgreSQL can express natively:

- ``RANGE [COLUMNS]``  → parent ``PARTITION BY RANGE`` + per-partition
  ``FOR VALUES FROM (…) TO (…)`` — MySQL's ``VALUES LESS THAN`` bounds
  chain (each partition's upper bound is the next one's lower), first
  partition from ``MINVALUE``, ``MAXVALUE`` passes through.
- ``LIST [COLUMNS]``   → ``PARTITION BY LIST`` + ``FOR VALUES IN (…)``
  (single-column only: PG list partitioning takes one key column).
- ``HASH``             → ``PARTITION BY HASH`` + ``FOR VALUES WITH
  (MODULUS m, REMAINDER i)``. Row→partition PLACEMENT differs (MySQL
  hashes with ``MOD(expr, n)``, PG with its own hash function) but the
  table-level row set is identical; the planner surfaces the
  divergence as a note instead of hiding it.
- ``KEY``              → ``PARTITION BY HASH`` over the named columns
  (the PRIMARY KEY when the list is empty) under the same
  placement-divergence note — MySQL's KEY placement (internal hash)
  already has no PG analog, exactly like migrated HASH's MOD placement.
- ``SUBPARTITION BY HASH|KEY … SUBPARTITIONS n`` → each child is itself
  ``PARTITION BY HASH`` with MODULUS/REMAINDER grandchildren (MySQL
  restricts sub-schemes to HASH/KEY — exactly the pair PG nests
  natively); same placement note at the sub level.

Named ``SUBPARTITION (s0, s1, …)`` lists migrate too (round 13): MySQL
requires every partition to carry the SAME number of uniquely-named
subpartitions, so the count is implicit per partition and the names
become the PG grandchild table names (``<table>_<subname>``).

``LINEAR HASH/KEY`` (either level) rides the same HASH translation
(round 13): MySQL's LINEAR variant still creates exactly the declared
``n`` partitions — only the placement algorithm (powers-of-two
masking) and its distribution evenness differ, which is the same class
of divergence the non-linear HASH/KEY note already surfaces.

Deliberately NOT migrated (named skips, never silent):
- subpartitioning with NEITHER a ``SUBPARTITIONS`` count NOR named
  lists, or named lists of unequal length (MySQL itself rejects those).
- a PRIMARY KEY that does not contain every partition-key column at
  EVERY level (PG hard requirement), or any PK combined with an
  *expression* key at either level (PG forbids unique constraints on
  expression keys).

Corpus coverage: reference fixtures
``scripts/mysql/create_table.sql:216-222`` (RANGE over YEAR(expr)),
``523-537`` (LIST, HASH PARTITIONS n), ``588-598`` (RANGE +
SUBPARTITION BY HASH × 12 → nested declarative partitioning).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from mysql2pg_spark.schema.identifiers import quote_pg


@dataclass
class PartitionPart:
    """One ``PARTITION pN [VALUES …] [(SUBPARTITION s0, …)]`` entry."""

    name: str
    op: str | None = None  # 'less_than' | 'in' | None (HASH/KEY lists)
    values: str = ""       # raw text inside the VALUES parens, or MAXVALUE
    subparts: list[str] = field(default_factory=list)  # named SUBPARTITIONs


@dataclass
class PartitionDef:
    method: str                 # range | list | hash | key
    columns_form: bool          # RANGE/LIST COLUMNS (…) — plain columns
    linear: bool
    expr: str                   # raw MySQL key expression / column list
    parts: list[PartitionPart] = field(default_factory=list)
    num_partitions: int | None = None   # HASH/KEY … PARTITIONS n
    subpartition: str | None = None     # raw SUBPARTITION BY … text


_HEADER_RE = re.compile(
    r"(?is)\bPARTITION\s+BY\s+(LINEAR\s+)?(RANGE|LIST|HASH|KEY)\s*"
    r"(COLUMNS)?\s*\("
)
#: the sub-scheme grammar — MySQL restricts subpartitioning to HASH/KEY
_SUBHEADER_RE = re.compile(
    r"(?is)\bSUBPARTITION\s+BY\s+(LINEAR\s+)?(HASH|KEY)\s*\("
)
_SUBPARTITIONS_N_RE = re.compile(r"(?i)\bSUBPARTITIONS\s+(\d+)")
_PARTITIONS_N_RE = re.compile(r"(?i)\bPARTITIONS\s+(\d+)")
_SUBPART_RE = re.compile(r"(?is)\bSUBPARTITION\s+BY\s+.*?(?=\(\s*PARTITION|$)")
_PART_ENTRY_RE = re.compile(
    r"(?is)\bPARTITION\s+`?(\w+)`?\s*"
    r"(?:VALUES\s+(LESS\s+THAN|IN)\s*"
    r"(MAXVALUE|\()\s*)?"
)


def _mask(text: str):
    from mysql2pg_spark.dialect.transpile import mask_literals

    return mask_literals(text)


def _unmask(text: str, lits):
    from mysql2pg_spark.dialect.transpile import unmask_literals

    return unmask_literals(text, lits)


def _balanced_span(s: str, open_idx: int) -> int:
    """Index just past the paren that closes s[open_idx] == '('."""
    depth = 0
    for i in range(open_idx, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    return len(s)


def parse_partition_def(text: str) -> PartitionDef | None:
    """Parse a full MySQL partition clause (everything from
    ``PARTITION BY`` to the end of the statement — mysqldump
    ``/*!50100 …*/`` wrappers and trailing ``;`` tolerated) into a
    PartitionDef. Returns None when the text has no parseable header;
    callers then fall back to the round-11 named skip."""
    masked, lits = _mask(text)
    masked = masked.replace("/*!50100", " ").replace("*/", " ")
    hm = _HEADER_RE.search(masked)
    if hm is None:
        return None
    open_idx = masked.index("(", hm.end() - 1)
    key_end = _balanced_span(masked, open_idx)
    expr = _unmask(masked[open_idx + 1 : key_end - 1], lits).strip()
    pd = PartitionDef(
        method=hm.group(2).lower(),
        columns_form=bool(hm.group(3)),
        linear=bool(hm.group(1)),
        expr=expr,
    )
    tail = masked[key_end:]
    nm = _PARTITIONS_N_RE.search(tail)
    if nm:
        pd.num_partitions = int(nm.group(1))
    sm = _SUBPART_RE.search(tail)
    if sm and sm.group(0).strip():
        pd.subpartition = _unmask(sm.group(0), lits).strip()
    for em in _PART_ENTRY_RE.finditer(tail):
        # skip the SUBPARTITION BY region's own tokens
        if sm and sm.start() <= em.start() < sm.end():
            continue
        name, op_kw, bracket = em.group(1), em.group(2), em.group(3)
        if op_kw is None:
            pd.parts.append(
                PartitionPart(
                    name=name, subparts=_named_subparts(tail, em.end())
                )
            )
            continue
        op = "less_than" if op_kw.upper().startswith("LESS") else "in"
        if bracket == "(":
            vend = _balanced_span(tail, em.end() - 1)
            values = _unmask(tail[em.end() : vend - 1], lits).strip()
        else:  # MAXVALUE, no parens
            vend = em.end()
            values = "MAXVALUE"
        pd.parts.append(
            PartitionPart(
                name=name,
                op=op,
                values=values,
                subparts=_named_subparts(tail, vend),
            )
        )
    return pd


_SUBNAME_RE = re.compile(r"(?is)\bSUBPARTITION\s+`?(\w+)`?")


def _named_subparts(tail: str, pos: int) -> list[str]:
    """Named ``(SUBPARTITION s0 [opts], SUBPARTITION s1, …)`` list
    attached to one partition entry at ``pos`` (round 13). Returns []
    when the next token is not such a block — per-partition option
    clauses (ENGINE=…) before the block are not consumed, matching the
    mysqldump layout where the list directly follows the bound."""
    mo = re.compile(r"\s*\(").match(tail, pos)
    if not mo:
        return []
    end = _balanced_span(tail, mo.end() - 1)
    block = tail[mo.end() : end - 1]
    if not re.match(r"(?is)\s*SUBPARTITION\b", block):
        return []
    return [m.group(1) for m in _SUBNAME_RE.finditer(block)]


@dataclass
class SubpartitionScheme:
    """Parsed ``SUBPARTITION BY [LINEAR] HASH|KEY (expr) [SUBPARTITIONS
    n]`` — MySQL restricts sub-schemes to HASH/KEY, which is exactly
    the pair PostgreSQL can nest under any parent scheme (each child is
    itself ``PARTITION BY HASH`` with MODULUS/REMAINDER grandchildren)."""

    method: str                 # hash | key
    linear: bool
    expr: str                   # raw MySQL key expression / column list
    count: int | None           # SUBPARTITIONS n


def parse_subpartition_scheme(text: str) -> SubpartitionScheme | None:
    """Parse the raw SUBPARTITION BY region captured on a
    :class:`PartitionDef`. Returns None when the text doesn't carry a
    recognizable sub-scheme header (callers keep the named skip)."""
    masked, lits = _mask(text)
    hm = _SUBHEADER_RE.search(masked)
    if hm is None:
        return None
    open_idx = masked.index("(", hm.end() - 1)
    key_end = _balanced_span(masked, open_idx)
    expr = _unmask(masked[open_idx + 1 : key_end - 1], lits).strip()
    nm = _SUBPARTITIONS_N_RE.search(masked, key_end)
    return SubpartitionScheme(
        method=hm.group(2).lower(),
        linear=bool(hm.group(1)),
        expr=expr,
        count=int(nm.group(1)) if nm else None,
    )


_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _split_depth0(s: str) -> list[str]:
    """Split on commas at paren depth 0, QUOTE-AWARE (review r13): a
    comma or paren inside a single-quoted literal — LIST values like
    ``'a,b'`` are legal MySQL — must neither split the token nor change
    depth, or routing/bound emission silently corrupts the member
    (``'a,b'`` became ``'a, b'``). Both ``''`` doubling and MySQL
    ``\\'`` escapes are tolerated since partition clauses reach this
    splitter in source spelling."""
    out, depth, start = [], 0, 0
    in_q = False
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if in_q:
            if ch == "\\" and i + 1 < n:
                i += 2
                continue
            if ch == "'":
                if i + 1 < n and s[i + 1] == "'":
                    i += 2
                    continue
                in_q = False
        elif ch == "'":
            in_q = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(s[start:i])
            start = i + 1
        i += 1
    out.append(s[start:])
    return [p.strip() for p in out if p.strip()]


def _cols_of(expr: str) -> list[str] | None:
    """A key expression as a plain column list, or None when it is a
    computed expression (YEAR(col) etc.)."""
    cols = []
    for tok in _split_depth0(expr):
        tok = tok.strip().strip("`")
        if not _IDENT_RE.match(tok):
            return None
        cols.append(tok)
    return cols or None


def key_columns(pd: PartitionDef) -> list[str] | None:
    """The partition key as a plain column list, or None when the key
    is a computed expression (RANGE (YEAR(col)) etc.)."""
    return _cols_of(pd.expr)


@dataclass
class PartitionPlan:
    """What the DDL planner should do for one partitioned table."""

    parent_clause: str | None = None   # "PARTITION BY RANGE (…)" or None
    children: list[str] = field(default_factory=list)  # CREATE … PARTITION OF
    notes: list[str] = field(default_factory=list)     # surfaced divergences
    skip: str | None = None            # reason the table stays unpartitioned


def _pg_key(pd: PartitionDef, norm, rewrite_expr) -> tuple[str, list[str] | None]:
    """(PG key text, plain column list or None). Bare columns quote
    directly; expressions run through the MySQL→PG rewriter and get the
    extra parens PG's grammar requires around non-column key elements."""
    cols = key_columns(pd)
    if cols is not None:
        return ", ".join(quote_pg(norm(c)) for c in cols), [norm(c) for c in cols]
    return "(" + rewrite_expr(pd.expr) + ")", None


def plan_partitioned_table(
    table: str,
    pd: PartitionDef,
    primary_key: list[str],
    norm,
    rewrite_expr,
    cap_identifier,
) -> PartitionPlan:
    """Decide parent PARTITION BY + child DDL for one table, or a named
    skip. ``norm`` is the pipeline's identifier normalizer, ``rewrite_expr``
    the MySQL→PG expression rewriter, ``cap_identifier`` the 63-byte
    name cap (all injected so this module stays side-effect-free)."""
    plan = PartitionPlan()
    # round 13: LINEAR HASH/KEY migrates — MySQL's LINEAR variant still
    # creates exactly the declared n partitions (the powers-of-two
    # algorithm only changes PLACEMENT and distribution evenness),
    # which is the divergence class the HASH note already surfaces.
    linear = pd.linear
    via_key = False
    if pd.method == "key":
        # Round 12: KEY is MySQL's internal hash over the named columns
        # (the PRIMARY KEY when the list is empty). Row→partition
        # placement already diverges for migrated HASH tables (PG hashes
        # with its own function), so KEY rides the same translation —
        # PARTITION BY HASH with the declared partition count — under
        # the same divergence note, instead of the round-11 named skip.
        from dataclasses import replace as _dc_replace

        if not pd.expr.strip():
            if not primary_key:
                plan.skip = (
                    f"table {table} uses KEY () partitioning with no "
                    "PRIMARY KEY to default to — created UNPARTITIONED, "
                    "data migrates fully"
                )
                return plan
            pd = _dc_replace(
                pd, expr=", ".join(primary_key), method="hash"
            )
        elif key_columns(pd) is None:
            plan.skip = (
                f"table {table}: KEY partitioning over a non-column "
                "key list — created UNPARTITIONED, data migrates fully"
            )
            return plan
        else:
            pd = _dc_replace(pd, method="hash")
        via_key = True
    sub_key_sql: str | None = None
    sub_cols: list[str] | None = None
    sub_count = 0
    if pd.subpartition:
        # Round 12: MySQL restricts sub-schemes to HASH/KEY — exactly
        # what PG nests natively (each child is itself PARTITION BY
        # HASH with MODULUS/REMAINDER grandchildren). LINEAR and
        # count-less named-subpartition forms stay named skips.
        scheme = parse_subpartition_scheme(pd.subpartition)
        if scheme is None:
            plan.skip = (
                f"table {table} is subpartitioned "
                f"({pd.subpartition.split('(')[0].strip()}) but the "
                "sub-scheme did not parse — created UNPARTITIONED"
            )
            return plan
        if not scheme.count or scheme.count < 1:
            # round 13: named SUBPARTITION lists define the count
            # implicitly — MySQL requires every partition to carry the
            # SAME number of (table-globally unique) subpartition
            # names, so equal non-empty lists give both the count and
            # the PG grandchild names
            lens = {len(p.subparts) for p in pd.parts} or {0}
            if len(lens) == 1 and 0 not in lens:
                scheme = SubpartitionScheme(
                    method=scheme.method,
                    linear=scheme.linear,
                    expr=scheme.expr,
                    count=lens.pop(),
                )
            else:
                plan.skip = (
                    f"table {table}: subpartitioned without a "
                    "SUBPARTITIONS count and without equal-length named "
                    "SUBPARTITION lists (MySQL itself requires every "
                    "partition to carry the same number) — not "
                    "auto-migrated, created UNPARTITIONED"
                )
                return plan
        sub_expr = scheme.expr
        if scheme.method == "key" and not sub_expr.strip():
            if not primary_key:
                plan.skip = (
                    f"table {table}: SUBPARTITION BY KEY () with no "
                    "PRIMARY KEY to default to — created UNPARTITIONED"
                )
                return plan
            sub_expr = ", ".join(primary_key)
        sub_cols = _cols_of(sub_expr)
        if sub_cols is not None:
            sub_cols = [norm(c) for c in sub_cols]
            sub_key_sql = ", ".join(quote_pg(c) for c in sub_cols)
        elif scheme.method == "key":
            plan.skip = (
                f"table {table}: SUBPARTITION BY KEY over a non-column "
                "key list — created UNPARTITIONED"
            )
            return plan
        else:
            sub_key_sql = "(" + rewrite_expr(sub_expr) + ")"
        sub_count = scheme.count
        # note appended AFTER the PK validations below pass (review
        # r12): a table the PK check then skips must not also carry a
        # note claiming it migrated partitioned
        sub_src = ("LINEAR " if scheme.linear else "") + scheme.method.upper()
        sub_note = (
            f"table {table}: {sub_src} subpartitioning "
            f"migrated as nested PARTITION BY HASH × {sub_count}, but "
            "row→sub-partition placement differs (MySQL's "
            + ("LINEAR powers-of-two placement"
               if scheme.linear else "internal hash")
            + " vs PostgreSQL's hash) — each partition's row set is "
            "identical"
        )

    key_sql, key_cols = _pg_key(pd, norm, rewrite_expr)
    pk = [norm(c) for c in primary_key or []]
    if pk:
        if key_cols is None or (pd.subpartition and sub_cols is None):
            plan.skip = (
                f"table {table} partitions on an expression "
                f"({pd.expr if key_cols is None else sub_key_sql}) AND "
                "has a PRIMARY KEY — PostgreSQL forbids unique "
                "constraints on expression partition keys; created "
                "UNPARTITIONED with the PK intact"
            )
            return plan
        missing = [
            c for c in key_cols + (sub_cols or []) if c not in pk
        ]
        if missing:
            plan.skip = (
                f"table {table}: PRIMARY KEY ({', '.join(pk)}) does not "
                f"include partition key column(s) {', '.join(missing)} — "
                "PostgreSQL requires it; created UNPARTITIONED with the "
                "PK intact"
            )
            return plan
    if sub_count:
        plan.notes.append(sub_note)

    qt = quote_pg(table)

    def child(
        pname: str, bound: str, subnames: list[str] | None = None
    ) -> None:
        """Append one child CREATE to ``plan.children``; a
        subpartitioned child is itself PARTITION BY HASH, with its
        MODULUS/REMAINDER grandchildren appended right after it
        (execution order: parent before child). Grandchildren take the
        source's SUBPARTITION names when a full named list rode the
        partition entry (round 13 — MySQL subpartition names are
        table-globally unique), else synthesized ``_s{i}`` suffixes."""
        cbase = cap_identifier(f"{table}_{norm(pname)}")
        cname = quote_pg(cbase)
        ddl = (
            f"CREATE TABLE IF NOT EXISTS {cname} "
            f"PARTITION OF {qt} FOR VALUES {bound}"
        )
        if sub_count:
            ddl += f" PARTITION BY HASH ({sub_key_sql})"
        plan.children.append(ddl)
        named = subnames if subnames and len(subnames) == sub_count else None
        for i in range(sub_count):
            gbase = (
                f"{table}_{norm(named[i])}" if named else f"{cbase}_s{i}"
            )
            gname = quote_pg(cap_identifier(gbase))
            plan.children.append(
                f"CREATE TABLE IF NOT EXISTS {gname} "
                f"PARTITION OF {cname} FOR VALUES "
                f"WITH (MODULUS {sub_count}, REMAINDER {i})"
            )

    def skipped(msg: str) -> PartitionPlan:
        # a refused table carries ONLY its skip — no leftover
        # migrated-notes from the sub-scheme parse (review r12)
        plan.skip = msg
        plan.notes.clear()
        plan.children.clear()
        plan.parent_clause = None
        return plan

    if pd.method == "range":
        parts = [p for p in pd.parts if p.op == "less_than"]
        if not parts:
            return skipped(
                f"table {table}: RANGE partition list missing or "
                "unparseable — created UNPARTITIONED"
            )
        ncols = len(_split_depth0(pd.expr))
        lower = ", ".join(["MINVALUE"] * ncols)
        for p in parts:
            upper = _bound_values(p.values, rewrite_expr)
            child(p.name, f"FROM ({lower}) TO ({upper})", p.subparts)
            lower = upper
        plan.parent_clause = f"PARTITION BY RANGE ({key_sql})"
        return plan

    if pd.method == "list":
        if len(_split_depth0(pd.expr)) > 1:
            return skipped(
                f"table {table}: LIST COLUMNS over multiple columns — "
                "PostgreSQL list partitioning takes one key column; "
                "created UNPARTITIONED"
            )
        parts = [p for p in pd.parts if p.op == "in"]
        if not parts:
            return skipped(
                f"table {table}: LIST partition list missing or "
                "unparseable — created UNPARTITIONED"
            )
        for p in parts:
            child(
                p.name,
                f"IN ({_bound_values(p.values, rewrite_expr)})",
                p.subparts,
            )
        plan.parent_clause = f"PARTITION BY LIST ({key_sql})"
        return plan

    # hash
    hparts = list(pd.parts)
    modulus = pd.num_partitions or len(hparts)
    if modulus < 1:
        return skipped(
            f"table {table}: HASH partitioning with no PARTITIONS count "
            "or partition list — created UNPARTITIONED"
        )
    if not hparts:
        hparts = [PartitionPart(name=f"p{i}") for i in range(modulus)]
    for i, p in enumerate(hparts[:modulus]):
        child(p.name, f"WITH (MODULUS {modulus}, REMAINDER {i})", p.subparts)
    plan.parent_clause = f"PARTITION BY HASH ({key_sql})"
    src = (
        "KEY partitioning (InnoDB's internal hash)" if via_key
        else "HASH partitioning"
    )
    if linear:
        src = f"LINEAR {src}"
    how = (
        "MySQL hashes with its internal KEY function" if via_key
        else "MySQL hashes with MOD(expr, n)"
    )
    if linear:
        how = (
            "MySQL places with the LINEAR powers-of-two masking "
            "algorithm (uneven when n is not a power of two)"
        )
    plan.notes.append(
        f"table {table}: {src} migrated with modulus "
        f"{modulus}, but row→partition placement differs ({how}, "
        "PostgreSQL with its own hash function) — "
        "the table-level row set is identical"
    )
    return plan


def _tuple_lt(keys: list[str], bounds: list[str], rewrite_expr) -> str:
    """The row comparison ``(k1, k2, …) < (b1, b2, …)`` expanded to its
    engine-neutral lexicographic form (round 13 — Spark, DuckDB and PG
    all parse plain comparisons identically, while row-constructor
    comparison spellings and their NULL semantics differ by engine):

    ``(k1 IS NULL OR k1 < b1) OR (k1 = b1 AND <rest>)``

    Per MySQL's documented RANGE COLUMNS semantics a NULL column sorts
    below every non-NULL value (bounds themselves can never be NULL),
    and MAXVALUE at position i makes the comparison TRUE regardless of
    trailing columns (everything sorts below MAXVALUE)."""
    k, b = keys[0], bounds[0]
    if b.upper() == "MAXVALUE":
        return "TRUE"
    lit = b if re.fullmatch(r"[-+]?\d+(\.\d+)?", b) else rewrite_expr(b)
    lt = f"({k} IS NULL OR {k} < {lit})"
    if len(keys) == 1:
        return lt
    rest = _tuple_lt(keys[1:], bounds[1:], rewrite_expr)
    return f"({lt} OR ({k} = {lit} AND {rest}))"


def _bound_values(values: str, rewrite_expr) -> str:
    """Partition bound values → PG spelling. MAXVALUE and plain
    literals pass through; backticks / MySQL function calls
    (TO_DAYS('…'), UNIX_TIMESTAMP('…')) go through the expression
    rewriter — PG accepts any DDL-time-evaluable expression as a
    bound (v12+)."""
    out = []
    for tok in _split_depth0(values):
        if tok.upper() == "MAXVALUE" or re.fullmatch(
            r"[-+]?\d+(\.\d+)?", tok
        ):
            out.append(tok)
        else:
            out.append(rewrite_expr(tok))
    return ", ".join(out)


def routing_sql(
    table: str,
    pd: PartitionDef,
    norm,
    rewrite_expr,
    cap_identifier,
) -> tuple[str | None, str | None]:
    """Per-row partition ASSIGNMENT as one SQL CASE expression returning
    the PG child-table name each row lands in (round 13 — converts the
    partition plan from text-equality to row-level correctness: the
    same expression runs in Spark SQL and in the DuckDB oracle, and the
    capstone asserts per-child row counts over seeded data).

    Exactly one of (sql, skip_reason) is non-None:

    - RANGE [COLUMNS] (single key) → strict ``key < bound`` chain in
      partition order — identical to both MySQL's VALUES LESS THAN scan
      and PG's range placement. NULL keys route to the FIRST partition
      (MySQL semantics; PG would reject the row — the plan's divergence
      note covers it). Rows above a non-MAXVALUE top bound get SQL NULL
      (both engines would reject the row).
    - RANGE COLUMNS over MULTIPLE columns (round 13) → the row
      comparison ``(c1, c2, …) < (x1, x2, …)`` expanded to its
      engine-neutral lexicographic form ``c1 < x1 OR (c1 = x1 AND
      (c2 < x2 OR …))`` with per-column NULL-sorts-lowest handling
      (MySQL's documented semantics; PG's range placement is the same
      row comparison) and MAXVALUE at position i short-circuiting to
      TRUE (everything sorts below it, trailing columns irrelevant).
    - LIST (single column) → ``key IN (…)`` arms, ``IS NULL`` when the
      source listed NULL.
    - HASH/KEY → no engine-neutral expression EXISTS (MySQL places by
      MOD/internal hash, PG by its own hash function) — named refusal,
      matching the plan's placement-divergence note.

    The expression is engine-neutral only while identifiers need no
    quoting (the rewriter's ``"col"`` spelling parses in DuckDB/PG but
    not Spark) — callers pass lower-case snake columns, which is what
    the pipeline's normalizer produces anyway."""
    if pd.linear:
        return None, (
            f"table {table}: LINEAR {pd.method.upper()} placement is "
            "powers-of-two bucketing — not reproducible"
        )
    if pd.method in ("hash", "key"):
        return None, (
            f"table {table}: {pd.method.upper()} row→partition placement "
            "is engine-internal (MySQL MOD/internal hash vs PostgreSQL's "
            "hash function) — no engine-neutral routing expression; the "
            "table-level row set is identical"
        )
    cols = key_columns(pd)
    multi = len(_split_depth0(pd.expr)) > 1
    if multi and (cols is None or pd.method != "range"):
        return None, (
            f"table {table}: multi-column tuple bounds are derived "
            "only for RANGE COLUMNS over bare columns — routing not "
            "derived"
        )
    key = (
        norm(cols[0]) if cols is not None and not multi
        else rewrite_expr(pd.expr) if cols is None
        else None
    )

    def child(pname: str) -> str:
        return cap_identifier(f"{table}_{norm(pname)}")

    if pd.method == "range":
        parts = [p for p in pd.parts if p.op == "less_than"]
        if not parts:
            return None, (
                f"table {table}: RANGE partition list missing or "
                "unparseable"
            )
        if multi:
            keys = [norm(c) for c in cols]
            whens = []
            for p in parts:
                bounds = _split_depth0(p.values)
                if len(bounds) != len(keys):
                    return None, (
                        f"table {table}: partition {p.name} bound arity "
                        f"{len(bounds)} != key arity {len(keys)}"
                    )
                cond = _tuple_lt(keys, bounds, rewrite_expr)
                whens.append(f"WHEN {cond} THEN '{child(p.name)}'")
            return "CASE " + " ".join(whens) + " ELSE NULL END", None
        whens = [f"WHEN {key} IS NULL THEN '{child(parts[0].name)}'"]
        else_arm = "NULL"
        for p in parts:
            bound = _bound_values(p.values, rewrite_expr)
            if bound.upper() == "MAXVALUE":
                else_arm = f"'{child(p.name)}'"
            else:
                whens.append(f"WHEN {key} < {bound} THEN '{child(p.name)}'")
        return (
            "CASE " + " ".join(whens) + f" ELSE {else_arm} END"
        ), None

    # list
    parts = [p for p in pd.parts if p.op == "in"]
    if not parts:
        return None, (
            f"table {table}: LIST partition list missing or unparseable"
        )
    whens = []
    for p in parts:
        vals = _split_depth0(p.values)
        non_null = [v for v in vals if v.upper() != "NULL"]
        conds = []
        if len(non_null) < len(vals):
            conds.append(f"{key} IS NULL")
        if non_null:
            conds.append(
                f"{key} IN ("
                + ", ".join(rewrite_expr(v) if not re.fullmatch(
                    r"[-+]?\d+(\.\d+)?", v
                ) else v for v in non_null)
                + ")"
            )
        whens.append(
            f"WHEN {' OR '.join(conds)} THEN '{child(p.name)}'"
        )
    return "CASE " + " ".join(whens) + " ELSE NULL END", None
