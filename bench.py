#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully executed (collected) so the number covers scan +
shuffle + aggregation, not just plan construction.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mysql2pg_spark.session import get_spark  # noqa: E402
from mysql2pg_spark.plans import QUERIES  # noqa: E402

# Headline set: one per operator family (kept in sync as families land).
HEADLINE = [
    "q01_pricing_summary",
    "q02_region_revenue",
    "q03_left_join_counts",
    "q05_case_when",
    "q07_window_topn",
    "q09_semi_anti",
    "q11_rollup",
    "f01_string_basics",
    "f05_date",
    "f07_json",
    "v01_view_basics",
    "t01_text_stats",
    "t07_winnowing_fingerprints",
    "d02_minhash_signatures",
    "d04_neardup_pairs",
    "d06_embedding_neardup",
    "s01_knn_bruteforce",
    "w01_tumbling_agg",
    "w03_session_windows",
    "a01_asof_join",
    "r01_range_join",
    "w05_sliding_windows",
    "p01_grouped_map_sessionize",
    "mm01_binary_decode",
    "sk01_salted_agg",
    "u01_upsert_latest",
    "cc01_dedup_clusters",
    "val01_table_checksum",
]


# Extras: newer operator families timed alongside the headline WITHOUT
# unfreezing its 28-query trend series (round-to-round comparability).
EXTRA = [
    "ts01_gap_fill",
    "ts02_retention",
    "ts03_funnel",
    "ts04_trailing_window",
    "q15_recursive_cte",
    "q16_lateral_topn",
    "d11_semantic_dedup",
    "d12_incremental_dedup",
    "t17_cdc_chunks",
    "t19_url_canonicalize",
    "s04_knn_ivf_refined",
    "s06_knn_pq",
    "s07_embedding_postproc",
    "s08_kcenter_coreset",
    "t20_dup_spans",
    "t21_novelty",
    "t22_bpe_merge_pairs",
    "qa03_drift_profile",
    "mm05_phash_neardup",
    "mm06_frame_dedup",
    "d13_editdistance_verify",
    "s09_dim_stats",
    "u02_scd2_history",
    "val03_table_stats",
    "t23_gopher_ngram_fractions",
    "cc03_pagerank_canonical",
    "qa05_correlation_profile",
    "s10_cosine_histogram",
    "ts05_seasonality",
]


def _bench_dump_parse(spark, sf_dir: str, reps: int, tmpdir: str) -> float:
    """Time the mysqldump DataSource over a dump synthesized from the
    sf's orders table (extended-insert, 1000 tuples/line). Generation is
    untimed; the timed span is the distributed parse + full
    materialization."""
    import pyarrow.parquet as pq

    tb = pq.read_table(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    path = os.path.join(tmpdir, "orders_dump.sql")
    with open(path, "w") as fh:
        rows = tb.to_pylist()
        for i in range(0, len(rows), 1000):
            chunk = rows[i : i + 1000]
            vals = ",".join(
                f"({r['o_orderkey']},{r['o_custkey']},{r['o_totalprice']})"
                for r in chunk
            )
            fh.write(f"INSERT INTO `orders` VALUES {vals};\n")

    from mysql2pg_spark.sources.dumpfile import MysqlDumpDataSource

    spark.dataSource.register(MysqlDumpDataSource)
    best = float("inf")
    for _ in range(reps):
        t = time.perf_counter()
        (
            spark.read.format("mysqldump")
            .schema("o_orderkey bigint, o_custkey bigint, o_totalprice double")
            .option("table", "orders")
            .option("split_bytes", 4 * 1024 * 1024)
            .load(path)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        best = min(best, time.perf_counter() - t)
    return round(best, 3)


def _bench_curation(spark, sf_dir: str, tmpdir: str) -> dict:
    """Time the FULL text-curation pipeline at the sf: quality gate
    (t15: length + quality + dedup-survival) → survivor selection →
    shard-bounded sequence packing → hash-bucketed training-shard write
    → manifest read-back. The training-data analog of the migration
    benchmark: one end-to-end number for "curate this corpus"."""
    from mysql2pg_spark.operators.grouped import pack_sequences_sharded
    from mysql2pg_spark.sinks.shards import (
        shard_manifest,
        write_training_shards,
    )
    from mysql2pg_spark.tables import load_table

    t0 = time.perf_counter()
    gate = QUERIES["t15_quality_gate"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    kept = docs.join(gate.filter("keep").select("doc_id"), "doc_id")
    packed = pack_sequences_sharded(kept, capacity=1024, shard_size=500)
    out = os.path.join(tmpdir, "curated_shards")
    write_training_shards(
        packed, out, "bin_id", 8, order_by=["bin_id", "seq_offset"]
    )
    n = sum(r.n_rows for r in shard_manifest(spark, out).collect())
    sec = time.perf_counter() - t0
    return {
        "curation_pipeline_sec": round(sec, 3),
        "curation_docs": n,
        "curation_docs_per_sec": round(n / max(sec, 1e-9), 1),
    }


def _bench_migration(spark, sf_dir: str, reps: int, tmpdir: str) -> dict:
    """Time the FULL sf migration pipeline (extract → value-fix plan →
    load → count+checksum validation) over the fixture tables via
    execute_local — the number BASELINE.md's perf gate is written
    against (reference claim: 10k rows/s ⇒ ≈60 s at sf0.1; gate
    ≤120 s). Emits total seconds and aggregate rows/second."""
    import os
    import shutil

    import yaml

    from mysql2pg_spark.config import load_config
    from mysql2pg_spark.orchestrator import (
        CatalogSnapshot,
        ColumnMeta,
        MigrationPipeline,
        TableMeta,
    )
    from mysql2pg_spark.tables import load_table

    spark_to_mysql = {
        "bigint": "bigint", "int": "int", "smallint": "smallint",
        "double": "double", "float": "float", "string": "text",
        "timestamp": "datetime", "timestamp_ntz": "datetime",
        "date": "date", "boolean": "tinyint(1)", "binary": "blob",
    }
    tables = []
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents"):
        df = load_table(spark, sf_dir, t)
        cols = []
        for f in df.schema.fields:
            mt = spark_to_mysql.get(f.dataType.simpleString())
            if mt is None:  # array/map columns have no MySQL analog
                break
            cols.append(ColumnMeta(f.name, mt))
        else:
            tables.append(TableMeta(name=t, columns=cols))
    snap = CatalogSnapshot(tables=tables)

    cfgp = os.path.join(tmpdir, "bench_migration.yml")
    with open(cfgp, "w") as fh:
        yaml.safe_dump(
            {
                "mysql": {"host": "h", "database": "d"},
                "postgresql": {"host": "p", "database": "d"},
                "conversion": {
                    "options": {},
                    "limits": {"concurrency": 4,
                               "max_rows_per_batch": 10000},
                },
            },
            fh,
        )
    pipe = MigrationPipeline(load_config(cfgp), snap)

    best, rows = float("inf"), 0
    for i in range(reps):
        sink = os.path.join(tmpdir, f"sink{i}")
        t = time.perf_counter()
        result = pipe.execute_local(
            spark,
            source_loader=lambda name: load_table(spark, sf_dir, name),
            sink_dir=sink,
        )
        best = min(best, time.perf_counter() - t)
        rows = sum(result["synced"].values())
        assert all(
            v.get("consistent") for v in result["validation"].values()
        ), result["validation"]
        shutil.rmtree(sink, ignore_errors=True)
    return {
        "migration_pipeline_sec": round(best, 3),
        "migration_rows": rows,
        "migration_rows_per_sec": round(rows / best, 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="mysql2pg_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the JVM + parquet footer cache so the first timed query isn't
    # charged session-startup cost: exercise codegen'd aggregation, the
    # shuffle machinery, and the Arrow/Python-worker path once each.
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F

    region = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    region.groupBy("r_name").count().write.format("noop").mode("overwrite").save()
    spark.range(1000).repartition(8).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    names = [n for n in HEADLINE if n in QUERIES]
    # One full throwaway headline query: the synthetic warmups above miss
    # the decimal-agg codegen and big-table parquet footer reads, which
    # otherwise land on the first timed query's number.
    if names:
        QUERIES[names[0]](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    # Min-of-N per query (default 3): the sandbox is shared, and r1→r2
    # showed ±30-76% swings on UNTOUCHED queries — the minimum is the
    # noise-robust estimate of the query's real cost. Override with
    # SPARK_GRAFT_BENCH_REPS=1 for a quick single-pass run.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(reps):
            t = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            # Full materialization of every column JVM-side via the noop
            # sink — measures the query, not Python row serialization
            # (collect() on a 100k-row result costs ~10s of pure pickling).
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t)
        timings[name] = round(best, 3)
    total = round(sum(timings.values()), 3)

    # extras are evidence, not the frozen trend series: single-pass so
    # the official min-of-3 run's wall-clock stays bounded
    extras: dict[str, float] = {}
    for name in (n for n in EXTRA if n in QUERIES):
        t = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        extras[name] = round(time.perf_counter() - t, 3)
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        try:
            extras["dump_parse_orders"] = _bench_dump_parse(
                spark, sf_dir, 1, td
            )
        except Exception as e:  # extras never break the headline emit
            extras["dump_parse_orders_error"] = str(e)[:120]
        try:
            extras.update(_bench_migration(spark, sf_dir, 1, td))
        except Exception as e:
            extras["migration_pipeline_error"] = str(e)[:120]
        try:
            extras.update(_bench_curation(spark, sf_dir, td))
        except Exception as e:
            extras["curation_pipeline_error"] = str(e)[:120]

    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "reps": reps,
                "queries": timings,
                "extra_queries": extras,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
