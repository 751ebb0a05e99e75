"""Partition-independence: the determinism rules (decimal accumulation,
left-fold dots, md5 hashing) must make results IDENTICAL under a
completely different parallelism/partitioning regime. Runs a handful of
the most float-sensitive queries in a subprocess with local[3] and
7 shuffle partitions and compares against the DuckDB oracle — the same
bits the local[4]/32-partition session produced."""

from __future__ import annotations

import subprocess
import sys

SCRIPT = """
import duckdb, sys
sys.path.insert(0, ".")
sys.path.insert(0, "tests")
from mysql2pg_spark.session import get_spark
from mysql2pg_spark.tables import TABLE_NAMES
from mysql2pg_spark.plans import ORACLES, QUERIES
from compare import compare_spark_duckdb
spark = get_spark(master="local[3]", shuffle_partitions=7)
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
for t in TABLE_NAMES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM "
        f"read_parquet('/root/testdata/sf0.01/{t}.parquet')"
    )
for name in ["q01_pricing_summary", "d06_embedding_neardup",
             "s01_knn_bruteforce", "sk01_salted_agg", "w01_tumbling_agg",
             "s07_embedding_postproc", "s08_kcenter_coreset"]:
    compare_spark_duckdb(QUERIES[name](spark, "/root/testdata/sf0.01"),
                         con, ORACLES[name])
    print("DETERMINISTIC", name)
spark.stop()
"""


def test_results_partition_independent():
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=420,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert out.stdout.count("DETERMINISTIC") == 7
