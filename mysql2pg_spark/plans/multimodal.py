"""Multimodal-column query: binary payload plumbing through Arrow
mapInPandas with a deterministic byte-stats "decoder" (real codecs are
stubbed — operators/multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mysql2pg_spark.operators.multimodal import (
    attach_binary_payload,
    decode_payload_stats,
)
from mysql2pg_spark.plans.registry import query
from mysql2pg_spark.tables import load_table


@query(
    "mm01_binary_decode",
    oracle="""
SELECT doc_id,
       CAST(strlen(text) AS BIGINT)               AS byte_len,
       CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS head_byte,
       md5(text)                                  AS payload_md5
FROM documents
ORDER BY doc_id
""",
)
def mm01_binary_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    with_payload = attach_binary_payload(d, "text")
    return decode_payload_stats(with_payload, "doc_id")
