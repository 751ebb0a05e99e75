"""Emit the FULL PostgreSQL DDL plan for the reference's fixture corpus
to a golden file (round-6 ask #6).

No PG grammar is installable in this sandbox (pglast/libpg_query
absent, installs forbidden), so the PG-only spellings — SERIAL /
IDENTITY, COMMENT ON, GRANT/ROLE, CREATE OR REPLACE FUNCTION … $$
plpgsql — are pinned as a reviewed golden corpus instead:
``tests/golden/corpus_pg_ddl.sql`` holds every statement ``plan()``
emits for the corpus in PG dialect, and
``tests/test_golden_corpus_ddl.py`` regenerates + byte-diffs it and
structurally lints every statement (statement-head whitelist, balanced
parens outside literals, zero MySQL-isms). Any change to the emitted
PG DDL shows up as a reviewable golden diff.

Regenerate with: python tools/dump_corpus_ddl.py
"""

from __future__ import annotations

import os
import re  # noqa: F401 (kept for future filters)
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

REF = "/root/reference/scripts/mysql"
TABLES = f"{REF}/create_table.sql"
INDEXES = f"{REF}/create_index.sql"
VIEWS = f"{REF}/create_view.sql"
USERS = f"{REF}/create_user.sql"
FUNCTIONS = f"{REF}/create_function.sql"

GOLDEN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "corpus_pg_ddl.sql",
)


def corpus_pg_ddl_text(spark) -> str:
    """The corpus' complete PG-dialect DDL plan as one reviewable text."""
    import yaml

    from mysql2pg_spark.config import load_config
    from mysql2pg_spark.orchestrator import MigrationPipeline
    from mysql2pg_spark.sources.dumpfile import (
        functions_from_sql,
        snapshot_from_dump,
        users_from_sql,
        views_from_sql,
    )

    snap = snapshot_from_dump(spark, [TABLES, INDEXES])
    snap.views = views_from_sql(VIEWS)
    snap.users, snap.table_privileges = users_from_sql(USERS)
    snap.functions = functions_from_sql(FUNCTIONS)

    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".yml", delete=False) as fh:
        yaml.safe_dump(
            {
                "mysql": {"host": "h", "database": "d"},
                "postgresql": {"host": "p", "database": "d"},
                "conversion": {
                    "options": {"data": False, "validate_data": False,
                                "view": True, "functions": True,
                                "users": True, "table_privileges": True},
                    "limits": {"concurrency": 2,
                               "max_rows_per_batch": 100},
                },
            },
            fh,
        )
        cfgp = fh.name
    try:
        actions = MigrationPipeline(load_config(cfgp), snap).plan()
    finally:
        os.unlink(cfgp)

    lines = [
        "-- GOLDEN: complete PostgreSQL DDL plan for the reference",
        "-- fixture corpus (scripts/mysql/*.sql), emitted by plan() in",
        "-- PG dialect. Regenerate: python tools/dump_corpus_ddl.py",
        "",
    ]
    stage = None
    for a in actions:
        if a.kind not in ("ddl", "skip", "note"):
            continue
        if a.stage != stage:
            stage = a.stage
            lines += [f"-- ==== stage: {stage} ====", ""]
        if a.kind in ("skip", "note"):
            first = str(a.payload).splitlines()[0][:100]
            lines.append(f"-- {a.kind.upper()} [{a.target}]: {first}")
        else:
            lines.append(a.payload.rstrip(";") + ";")
        lines.append("")
    return "\n".join(lines)


if __name__ == "__main__":
    from mysql2pg_spark.session import get_spark

    spark = get_spark(app_name="dump-corpus-ddl")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    text = corpus_pg_ddl_text(spark)
    with open(GOLDEN, "w") as fh:
        fh.write(text)
    print(GOLDEN, len(text.splitlines()), "lines")
