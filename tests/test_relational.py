"""Relational-core structural checks (oracle comparison for all queries
lives in test_correctness.py)."""

from __future__ import annotations

from mysql2pg_spark.plans import QUERIES
from tests.conftest import SF_CORRECT


def test_limit_offset_window(spark):
    """MySQL LIMIT 10,20 semantics: rows 11-30 of the price-ordered list."""
    df = QUERIES["q04_limit_offset"](spark, SF_CORRECT)
    rows = df.collect()
    assert len(rows) == 20
    prices = [r["o_totalprice"] for r in rows]
    assert prices == sorted(prices, reverse=True)


def test_left_join_keeps_unmatched(spark):
    import pyspark.sql.functions as F

    df = QUERIES["q03_left_join_counts"](spark, SF_CORRECT)
    total = df.agg(F.sum("n_pairs")).collect()[0][0]
    assert total > 0
