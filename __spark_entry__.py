"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of the engine's query registry
(``mysql2pg_spark.plans``). The driver's verify runs ``entry(spark)`` as a
smoke check, runs each ``queries()[name]`` at sf=0.01 and compares it
against the matching ``oracle_sql()[name]`` via DuckDB (row-count + schema
+ order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mysql2pg_spark.plans import DRIVER_ORACLES, DRIVER_QUERIES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2.

    This is the consolidated driver-facing view (≤50 entries so the
    driver's bounded check covers every family); the full registry —
    including the per-feature demos folded into merged entries here —
    remains in ``mysql2pg_spark.plans.QUERIES`` and stays pytest- and
    bench-covered.
    """
    return dict(DRIVER_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each (SQL-expressible) query."""
    return dict(DRIVER_ORACLES)
