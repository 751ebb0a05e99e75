"""Training-shard writer: emit a corpus as evenly-sized parquet shards.

Training jobs read shards, not tables — they want (a) bounded file
sizes so data-loader workers stripe evenly, (b) deterministic shard
membership so a resumed run reads identical data, and (c) an optional
within-shard order. All three are native Spark write knobs composed
here; nothing shuffles beyond the one repartition:

- shard membership: hash-of-id modulo ``num_shards`` via
  ``repartition(num_shards, shard_key)`` — content-deterministic,
  independent of input partitioning (a plain ``repartition(n)`` is
  round-robin and run-dependent).
- file size: ``maxRecordsPerFile`` caps records per physical file, so
  one hot shard still splits into loader-friendly pieces.
- within-shard order: ``sortWithinPartitions`` (no global sort — that
  would be an all-data exchange a loader doesn't need).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_training_shards(
    df: DataFrame,
    path: str,
    shard_key: str,
    num_shards: int,
    records_per_file: int | None = None,
    order_by: list[str] | None = None,
) -> None:
    """Write ``df`` as ``num_shards`` hash-bucketed parquet shards."""
    out = df.repartition(num_shards, F.col(shard_key))
    if order_by:
        out = out.sortWithinPartitions(*order_by)
    writer = out.write.mode("overwrite")
    if records_per_file:
        writer = writer.option("maxRecordsPerFile", records_per_file)
    writer.parquet(path)


def shard_manifest(spark, path: str) -> DataFrame:
    """Per-file row counts of a written shard directory — the manifest a
    data loader (or a resumed writer) checks before reading. One narrow
    scan (file name column only; parquet reads no value pages for it)."""
    return (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("file"))
        .groupBy("file")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
