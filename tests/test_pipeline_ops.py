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


def test_grouped_map_fast_matches_applyinpandas(spark):
    """sessionize_events (canonical applyInPandas, one Python call per
    group) and sessionize_events_fast (partition-aware mapInPandas with
    cross-batch carry) implement one contract — results must be
    row-identical, including across Arrow batch boundaries (forced tiny
    maxRecordsPerBatch so groups straddle batches)."""
    from mysql2pg_spark.operators.grouped import (
        sessionize_events,
        sessionize_events_fast,
    )
    from mysql2pg_spark.tables import load_table

    e = load_table(spark, SF_CORRECT, "events")
    slow = sessionize_events(e).orderBy("user_id", "seq").collect()
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        fast = sessionize_events_fast(e).orderBy("user_id", "seq").collect()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert fast == slow
    assert len(fast) > 0
