"""Dedup / similarity / text-analysis queries vs DuckDB oracles, plus
structural sanity checks (non-emptiness where the data guarantees it)."""

from __future__ import annotations

import pytest

from mysql2pg_spark.plans import QUERIES
from tests.conftest import SF_CORRECT

def test_neardup_pairs_nonempty(spark):
    """The corpus contains near-duplicates; the LSH+Jaccard pipeline must
    surface at least one pair (guards against a silently-empty join)."""
    df = QUERIES["d04_neardup_pairs"](spark, SF_CORRECT)
    assert df.count() > 0


def test_knn_returns_k_per_query(spark):
    import pyspark.sql.functions as F

    df = QUERIES["s01_knn_bruteforce"](spark, SF_CORRECT)
    per_q = df.groupBy("query_id").count().collect()
    assert len(per_q) == 10
    assert all(r["count"] == 5 for r in per_q)
