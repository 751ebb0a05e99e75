"""Every registered query with an oracle must match DuckDB at sf0.01 —
the same check the driver's t2 gate runs."""

from __future__ import annotations

import pytest

from mysql2pg_spark.plans import ORACLES, QUERIES
from tests.compare import compare_spark_duckdb
from tests.conftest import SF_CORRECT

RELATIONAL = [n for n in QUERIES if n.startswith("q0") or n.startswith("q1")]


@pytest.mark.parametrize("name", RELATIONAL)
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_CORRECT)
    if name in ORACLES:
        compare_spark_duckdb(df, duck, ORACLES[name])
    else:
        assert df.count() >= 0


def test_all_oracle_keys_have_queries():
    assert set(ORACLES) <= set(QUERIES)
