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


def test_multimodal_codec_seam_skips_cleanly():
    """Without codecs the seam reports an explicit skip marker (never an
    exception a driver could mistake for a stub)."""
    from mysql2pg_spark.operators.multimodal import CODEC_SKIPPED, decode_image

    out = decode_image(b"\x89PNG")
    assert out["status"] in (CODEC_SKIPPED, "decoded")
    assert out["byte_len"] == 4


def test_stateful_counts_across_real_microbatches(spark, tmp_path):
    """Split events into several files + maxFilesPerTrigger=1 → the
    availableNow run processes MULTIPLE micro-batches, so GroupState
    genuinely carries counts across batches; final state must equal the
    batch GROUP BY."""
    import pyspark.sql.functions as F
    from pyspark.sql import functions as SF
    from mysql2pg_spark.tables import load_table

    from mysql2pg_spark.tables import normalize_events_ts

    src = str(tmp_path / "events_split")
    e = load_table(spark, "/root/testdata/sf0.001", "events")
    # re-write the RAW fixture (whatever physical ts layout the driver
    # generated); the stream re-applies the same adaptive normalizer.
    raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    raw.repartition(4).write.mode("overwrite").parquet(src)

    batch_schema = raw.schema
    stream = (
        spark.readStream.schema(batch_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    events = normalize_events_ts(stream)
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update_counts(key, pdf_iter, state: GroupState):
        (user_id,) = key
        n = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [user_id], "n_events": [n]})

    counted = events.groupBy("user_id").applyInPandasWithState(
        update_counts,
        outputStructType="user_id bigint, n_events bigint",
        stateStructType="n bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        counted.writeStream.format("memory")
        .queryName("t_state_multi")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sink = spark.table("t_state_multi")
    n_users = e.select("user_id").distinct().count()
    # multiple micro-batches → more update emissions than users
    assert sink.count() > n_users
    final = {
        r["user_id"]: r["n_events"]
        for r in sink.groupBy("user_id").agg(F.max("n_events").alias("n_events")).collect()
    }
    batch = {
        r["user_id"]: r["n"]
        for r in e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert final == batch


def test_streaming_checkpoint_resume(spark, tmp_path):
    """Exactly-once across restarts: a checkpointed file-sink query
    stopped and restarted processes ONLY the files that arrived while it
    was down — no reprocessing, no duplicates (the property that makes a
    daily incremental ingest idempotent)."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    spark.range(0, 100).selectExpr("id", "id * 2 AS v").write.mode(
        "overwrite"
    ).parquet(src)

    def run_once():
        q = (
            spark.readStream.schema("id bigint, v bigint")
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    first = spark.read.parquet(sink)
    assert first.count() == 100

    # new file lands while the query is down; restart from the checkpoint
    spark.range(100, 130).selectExpr("id", "id * 2 AS v").write.mode(
        "append"
    ).parquet(src)
    run_once()
    out = spark.read.parquet(sink)
    assert out.count() == 130                      # no duplicates
    assert out.select("id").distinct().count() == 130
