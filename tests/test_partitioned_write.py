"""Partitioned parquet write + partition pruning — the lakehouse layout
lever: a predicate on the partition column must prune directories at
planning time (PartitionFilters), not scan-and-filter."""

from __future__ import annotations

import shutil


def test_partition_pruning(spark, tmp_path):
    from mysql2pg_spark.tables import load_table
    from tests.conftest import SF_CORRECT

    out = str(tmp_path / "events_by_type")
    load_table(spark, SF_CORRECT, "events").write.partitionBy(
        "event_type"
    ).mode("overwrite").parquet(out)

    df = spark.read.parquet(out).filter("event_type = 'purchase'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan
    # the non-partition predicate list must NOT contain the pruned column
    assert "PushedFilters: []" in plan or "event_type" not in plan.split(
        "PushedFilters"
    )[1].split("]")[0]

    n_purchase = df.count()
    total = load_table(spark, SF_CORRECT, "events").count()
    assert 0 < n_purchase < total
    shutil.rmtree(out, ignore_errors=True)


def test_training_shard_writer(spark, tmp_path):
    """Shard writer contract: bounded file sizes, deterministic hash
    membership across re-writes, within-shard ordering, nothing lost."""
    from mysql2pg_spark.sinks.shards import shard_manifest, write_training_shards
    from mysql2pg_spark.tables import load_table
    from tests.conftest import SF_CORRECT

    docs = load_table(spark, SF_CORRECT, "documents")
    total = docs.count()
    out_a = str(tmp_path / "shards_a")
    out_b = str(tmp_path / "shards_b")
    for out in (out_a, out_b):
        write_training_shards(
            docs, out, "doc_id", num_shards=4,
            records_per_file=50, order_by=["doc_id"],
        )

    man = {r.file: r.n_rows for r in shard_manifest(spark, out_a).collect()}
    assert sum(man.values()) == total
    assert max(man.values()) <= 50          # maxRecordsPerFile respected
    assert len(man) >= total // 50          # actually split into pieces

    # deterministic membership: identical per-file row-count multiset
    man_b = [r.n_rows for r in shard_manifest(spark, out_b).collect()]
    assert sorted(man.values()) == sorted(man_b)

    # within-file ordering held
    import pyarrow.parquet as pq
    import glob
    f = sorted(glob.glob(out_a + "/part-*.parquet"))[0]
    ids = pq.read_table(f, columns=["doc_id"]).column("doc_id").to_pylist()
    assert ids == sorted(ids)


def test_schema_evolution_merge(spark, tmp_path):
    """Lakehouse schema evolution: old files missing a column read as
    NULL under mergeSchema, new columns are visible, and pruning a
    pre-evolution column still works across both file generations."""
    out = str(tmp_path / "evolving")
    spark.range(0, 10).selectExpr("id", "id * 2 AS a").write.mode(
        "overwrite"
    ).parquet(out)
    spark.range(10, 20).selectExpr(
        "id", "id * 2 AS a", "id * 3 AS b"
    ).write.mode("append").parquet(out)

    df = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(df.columns) == {"id", "a", "b"}
    rows = {r.id: r for r in df.collect()}
    assert rows[5].b is None          # pre-evolution file → NULL
    assert rows[15].b == 45           # post-evolution value present
    # a filter on the old column spans both generations
    assert df.filter("a >= 10").count() == 15
