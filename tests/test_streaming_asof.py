"""Streaming/as-of specifics beyond the oracle compare."""

from __future__ import annotations

from mysql2pg_spark.operators.asof import asof_join
from mysql2pg_spark.plans import QUERIES
from tests.conftest import SF_CORRECT


def test_asof_semantics_handmade(spark):
    """Inclusive backward match + NULL when no prior right row."""
    left = spark.createDataFrame(
        [(1, "k", "2024-01-01 10:00:00"), (2, "k", "2024-01-01 09:00:00")],
        "id int, k string, ts_s string",
    ).selectExpr("id", "k", "CAST(ts_s AS TIMESTAMP) AS ts")
    right = spark.createDataFrame(
        [("k", "2024-01-01 10:00:00", 100), ("k", "2024-01-01 09:30:00", 50)],
        "k string, ts_s string, v int",
    ).selectExpr("k", "CAST(ts_s AS TIMESTAMP) AS ts", "v")
    out = {
        r["id"]: r["asof_v"]
        for r in asof_join(left, right, "k", "ts", "ts", ["v"]).collect()
    }
    assert out[1] == 100  # equal-ts right row matches (inclusive)
    assert out[2] is None  # no right row at or before 09:00


def test_streaming_equals_batch(spark):
    """Kappa check: the Structured Streaming backfill produces exactly the
    batch aggregation."""
    batch = {
        tuple(r)
        for r in QUERIES["w01_tumbling_agg"](spark, SF_CORRECT).collect()
    }
    stream = {
        tuple(r)
        for r in QUERIES["w02_streaming_windowed"](spark, SF_CORRECT).collect()
    }
    assert batch == stream


def test_multimodal_stub_raises():
    from mysql2pg_spark.operators.multimodal import decode_image

    import pytest

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
