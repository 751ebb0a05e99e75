"""Test-corpus table loader.

The driver provides a TPC-H-ish star schema plus ``events`` (stream-shaped),
``documents`` and ``embeddings`` (training-data-pipeline shaped) as parquet
under ``/root/testdata/sf*/``.  At 100 TB these would be partitioned parquet/
iceberg tables; the loader is the single place that knows physical layout, so
swapping in a real lakehouse means changing only this module.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor.
# (region/nation are fixed-size; supplier/part/customer grow with SF but
# remain << fact tables — Catalyst's size-based broadcast threshold handles
# those; region/nation we hint explicitly.)
SMALL_DIMS = ("region", "nation")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # events.parquet stores ts as TIMESTAMP(NANOS), which Spark rejects
    # unless this (runtime-settable) conf is on.  The builder in session.py
    # sets it too, but load_table must not assume it built the session —
    # an externally constructed SparkSession (e.g. the correctness driver's)
    # would otherwise crash with PARQUET_TYPE_ILLEGAL before reading a row.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # ts is TIMESTAMP(NANOS) in parquet; with nanosAsLong (session.py)
        # it arrives as bigint nanos. Truncate to micros exactly like
        # DuckDB does — integer division, NOT float (nanos > 2^53).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view for ``spark.sql`` use."""
    tables = load_tables(spark, sf_dir, names)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
