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
