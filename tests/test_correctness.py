"""The t2 gate, locally: EVERY registered query runs at sf0.01 and
hash-matches its DuckDB oracle (or at minimum executes, when no oracle
is declared). New plan modules are covered automatically on import."""

from __future__ import annotations

import pytest

from mysql2pg_spark.plans import ORACLES, QUERIES
from tests.compare import compare_spark_duckdb
from tests.conftest import SF_CORRECT


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_CORRECT)
    if name in ORACLES:
        compare_spark_duckdb(df, duck, ORACLES[name])
    else:
        assert df.count() >= 0


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)
