#!/usr/bin/env python
"""Regenerate tests/golden/corpus_functions_pg.sql — the C95
translator's plpgsql output for the reference corpus routines
(scripts/mysql/create_function.sql). Any intended change to function
emission must regenerate this golden in the same commit
(tests/test_realistic_dump_capstone.py byte-diffs it)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysql2pg_spark.sinks.plpgsql import emit_plpgsql  # noqa: E402
from mysql2pg_spark.sinks.plpgsql_builder import (  # noqa: E402
    build_spec_from_mysql,
)
from mysql2pg_spark.sources.dumpfile import functions_from_sql  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "corpus_functions_pg.sql",
)

if __name__ == "__main__":
    parts = [
        "-- Golden plpgsql for the reference corpus routines\n"
        "-- (scripts/mysql/create_function.sql), as emitted by the C95\n"
        "-- translator. Regenerate: python tools/dump_corpus_functions.py\n"
    ]
    for f in functions_from_sql(
        "/root/reference/scripts/mysql/create_function.sql"
    ):
        parts.append(emit_plpgsql(build_spec_from_mysql(f)) + "\n")
    with open(OUT, "w") as fh:
        fh.write("\n".join(parts))
    print(OUT)
