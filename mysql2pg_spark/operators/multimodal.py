"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed via Arrow-batched mapInPandas.

The container has no image/audio codecs, so the real decoders are
STUBBED (try-import, NotImplementedError fallback) — but everything
Spark-side is real and tested: the binary column representation, the
mapInPandas batch shape, the output schema contract, and a deterministic
fallback "decoder" (byte-level stats) that exercises the full path with
oracle-checkable results.

At 100 TB: binary payloads ride in parquet alongside metadata; decode
parallelism is per-file-split; `spark.sql.files.maxPartitionBytes`
bounds batch memory; nothing here shuffles.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, byte_len bigint, head_byte int, payload_md5 string"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: synthesize the binary payload column (UTF-8 bytes
    of the text) + media-type metadata struct. With real data this column
    comes straight from parquet."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.col(text_col)).alias("n_bytes"),
        ),
    )


def decode_image(payload: bytes) -> dict:
    """Real decoder — unavailable in this container (no PIL/ffmpeg)."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires pillow; container ships without codecs "
            "— use decode_payload_stats (deterministic fallback) instead"
        ) from exc
    raise NotImplementedError("wire PIL decode here when codecs exist")


def decode_payload_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas over the binary payload: per-row byte stats computed in
    Python (the stand-in for decode/resize/feature-extract). Arrow moves
    the binary batches; no row-at-a-time serialization."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": payloads.map(len).astype("int64"),
                    "head_byte": payloads.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                    "payload_md5": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                }
            )

    return df.select(id_col, "payload").mapInPandas(batches, DECODED_SCHEMA)
