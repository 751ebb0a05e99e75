"""Multimodal-column query: binary payload plumbing through Arrow
mapInPandas with a deterministic byte-stats "decoder" (real codecs are
stubbed — operators/multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mysql2pg_spark.operators.multimodal import (
    attach_binary_payload,
    decode_payload_stats,
    resize_nearest,
    sample_frames,
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


# --------------------------------------------------------------------------
# mm02 — frame sampling (the video path's 1→N shape): 64-byte frames,
# every 4th kept. Oracle reconstructs the sampled slices with a lateral
# unnest over the per-document frame-index range.
# --------------------------------------------------------------------------
@query(
    "mm02_frame_sample",
    oracle="""
SELECT d.doc_id,
       u.i                                                       AS frame_idx,
       md5(substr(d.text, CAST(u.i * 64 + 1 AS INT), 64))        AS frame_md5,
       CAST(strlen(substr(d.text, CAST(u.i * 64 + 1 AS INT), 64)) AS INT)
                                                                 AS frame_len
FROM documents d,
     unnest(range(0, CAST(ceil(strlen(d.text) / 64.0) AS BIGINT), 4)) AS u(i)
""",
)
def mm02_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    with_payload = attach_binary_payload(d, "text")
    return sample_frames(with_payload, "doc_id", frame_bytes=64, stride=4)


# --------------------------------------------------------------------------
# mm03 — nearest-neighbor "resize" to an 8-point thumbnail (the image
# path's fixed-width-array output contract). Oracle builds the same
# samples with a list comprehension over byte positions.
# --------------------------------------------------------------------------
@query(
    "mm03_resize_thumbnail",
    oracle="""
SELECT doc_id,
       [CAST(ascii(substr(text,
              CAST(least(i * CAST(ceil(strlen(text) / 8.0) AS BIGINT),
                         strlen(text) - 1) + 1 AS INT), 1)) AS INT)
        for i in range(0, 8)]                               AS thumb,
       CAST(ceil(strlen(text) / 8.0) AS INT)                AS scale_num
FROM documents
""",
)
def mm03_resize_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    with_payload = attach_binary_payload(d, "text")
    return resize_nearest(with_payload, "doc_id", out_px=8)


# --------------------------------------------------------------------------
# mm04 — audio-path windowed energy: the payload as an 8-bit sample
# stream, per-32-byte-window sum/peak of |sample − 96| (the RMS/VAD
# preprocessing shape). All-integer arithmetic; the oracle folds the
# same windows with list_reduce over char codes (the fixture text is
# ASCII, so char codes ≡ payload bytes, as mm01/mm02 already rely on).
# Not in the driver window; pytest-oracle-checked.
# --------------------------------------------------------------------------
@query(
    "mm04_audio_energy",
    oracle="""
SELECT d.doc_id, u.w AS win_idx,
       list_reduce(list_prepend(CAST(0 AS BIGINT),
         list_transform(range(1, 33),
           i -> CAST(abs(ascii(substr(d.text, CAST(u.w * 32 + i AS INT), 1)) - 96) AS BIGINT))),
         (x, y) -> x + y)                                    AS energy,
       CAST(list_max(
         list_transform(range(1, 33),
           i -> abs(ascii(substr(d.text, CAST(u.w * 32 + i AS INT), 1)) - 96))) AS INT)
                                                             AS peak
FROM documents d, unnest(range(0, strlen(d.text) // 32)) AS u(w)
ORDER BY d.doc_id, win_idx
""",
    driver=False,
)
def mm04_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql2pg_spark.operators.multimodal import windowed_energy

    d = load_table(spark, sf_dir, "documents")
    return windowed_energy(attach_binary_payload(d, "text"), "doc_id")


# --------------------------------------------------------------------------
# mm05 — perceptual-hash (aHash) near-dup pairs over binary payloads:
# 48-point downsample → 48-bit average hash → banded Hamming join
# (3 bands × 16 bits; Hamming <= 2 < 3 bands guarantees a band
# collision) → bit_count(xor) verify. The media-dedup flow on the
# codec-free deterministic decode stand-in; same LSH-band scale shape
# as d03. 16-bit bands keep bucket occupancy ~n/65536 — the 4-bit first
# cut degenerated toward all-pairs (see the operator docstring).
# --------------------------------------------------------------------------
_TH48 = (
    "[CAST(ascii(substr(text, CAST(least(i * CAST(ceil(strlen(text) / 48.0)"
    " AS BIGINT), strlen(text) - 1) + 1 AS INT), 1)) AS INT)"
    " for i in range(0, 48)]"
)


@query(
    "mm05_phash_neardup",
    oracle=f"""
WITH th AS (
  SELECT doc_id, {_TH48} AS thumb FROM documents
), h AS (
  SELECT doc_id,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(thumb,
             x -> CAST(CASE WHEN x >
                    (list_reduce(list_prepend(0, thumb), (a, b) -> a + b)
                     // 48)
                  THEN 1 ELSE 0 END AS BIGINT))),
           (a, b) -> a * 2 + b) AS phash
  FROM th
), bands AS (
  SELECT doc_id, phash, u.b AS band,
         (phash >> (16 * u.b)) & 65535 AS val
  FROM h, range(0, 3) u(b)
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.phash AS ph_a, b.phash AS ph_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(ph_a, ph_b)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(ph_a, ph_b)) <= 2
ORDER BY id_a, id_b
""",
    driver=False,
)
def mm05_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql2pg_spark.operators.multimodal import phash_neardup

    d = load_table(spark, sf_dir, "documents")
    return phash_neardup(attach_binary_payload(d, "text"), "doc_id")


# --------------------------------------------------------------------------
# mm06 — cross-document frame dedup: fingerprint every sampled frame
# (mm02's 1→N fan-out) and report fingerprints shared by >= 2 documents
# — the content-addressed storage-dedup pass of a video pipeline (shared
# intros/watermarks dedup to one stored copy). One groupBy on the frame
# hash, map-side combinable; no pair joins.
# --------------------------------------------------------------------------
@query(
    "mm06_frame_dedup",
    oracle="""
WITH f AS (
  SELECT d.doc_id,
         md5(substr(d.text, CAST(u.i * 64 + 1 AS INT), 64)) AS frame_md5
  FROM documents d,
       unnest(range(0, CAST(ceil(strlen(d.text) / 64.0) AS BIGINT), 4)) u(i)
)
SELECT frame_md5,
       CAST(count(*) AS BIGINT)              AS n_occurrences,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT)           AS canonical_doc
FROM f GROUP BY frame_md5
HAVING count(DISTINCT doc_id) >= 2
ORDER BY frame_md5
""",
    driver=False,
)
def mm06_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from mysql2pg_spark.operators.multimodal import sample_frames

    d = load_table(spark, sf_dir, "documents")
    frames = sample_frames(
        attach_binary_payload(d, "text"), "doc_id", frame_bytes=64, stride=4
    )
    return (
        frames.groupBy("frame_md5")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy("frame_md5")
    )
