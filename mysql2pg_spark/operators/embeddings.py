"""Embedding post-processing operators: L2 normalization, Matryoshka
truncation (Kusupati et al. arXiv:2205.13147 — MRL-trained vectors keep
their semantics under prefix truncation + renorm), sign-bit binarization
(the 1-bit Hamming index unit), and per-vector symmetric int8
quantization (the faiss-style SQ8 storage path: 4× smaller than float32,
8× smaller than the double the JVM would otherwise carry).

All pure Column expressions over ``array<float>`` — zip_with/aggregate
HOFs, zero UDFs, zero shuffles: at 100 TB these run at scan speed and
the outputs (packed bigint, int8 codes) are exactly what a vector store
or ANN index ingests. Every float fold is the LEFT-FOLD double pattern
from operators/dedup.dot_fold, so a SQL oracle replays it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from mysql2pg_spark.operators.dedup import dot_fold


def _c(c):
    return F.col(c) if isinstance(c, str) else c


def l2_norm(v) -> Column:
    """||v|| as sqrt of the left-fold self-dot (cross-engine exact)."""
    v = _c(v)
    return F.sqrt(dot_fold(v, v))


def unit_vector(v, norm: Column) -> Column:
    """v / ||v|| with the norm passed in (fold it ONCE per vector).
    Zero norm → NULL elements, not a crash: under Spark 4's default
    ANSI mode x/0.0 raises DIVIDE_BY_ZERO, while SQL engines return
    NULL — the guard keeps both engines on the NULL behavior."""
    return F.transform(
        _c(v),
        lambda x: F.when(norm != 0, x.cast("double") / norm),
    )


def matryoshka_norm(v, dims: int) -> Column:
    """Norm of the dims-prefix — the renormalization denominator for
    Matryoshka truncation. Truncate-then-renorm ≡ slice + unit_vector
    with THIS norm."""
    head = F.slice(_c(v), 1, dims)
    return F.sqrt(dot_fold(head, head))


def sign_bits(v, nbits: int = 32) -> Column:
    """Pack the sign pattern of the first nbits dims into ONE bigint
    (bit i = dim i+1 > 0). Fold over the REVERSED prefix with
    acc*2 + bit so no shift-by-column is needed and any SQL engine
    replays it exactly. 64 vectors/KB: the Hamming-distance prefilter
    for binary ANN."""
    head = F.reverse(F.slice(_c(v), 1, nbits))
    return F.aggregate(
        head,
        F.lit(0).cast("long"),
        lambda acc, x: acc * 2
        + F.when(x.cast("double") > 0, F.lit(1)).otherwise(F.lit(0)),
    )


def abs_max(v) -> Column:
    """max |v_i| as double — the symmetric-quantization range."""
    return F.array_max(F.transform(_c(v), lambda x: F.abs(x.cast("double"))))


def int8_codes(v, amax: Column) -> Column:
    """Symmetric int8 quantization: q_i = floor(v_i * 127/amax + 0.5).
    floor(x + 0.5) instead of round(): round's midpoint rule is the one
    op observed to diverge across engines (HALF_UP vs HALF_EVEN);
    floor is bit-deterministic on identical doubles. Zero vector → all
    zeros (scale 0), not NaN."""
    scale = F.when(amax > 0, F.lit(127.0) / amax).otherwise(F.lit(0.0))
    return F.transform(
        _c(v), lambda x: F.floor(x.cast("double") * scale + F.lit(0.5))
    )


def _sq_dist(v: Column, center: list[float]) -> Column:
    """Squared L2 distance to a FIXED center (broadcast as literals) —
    the same left-fold double pattern as dot_fold, so an oracle that
    derives the identical center replays it bit-for-bit."""
    c = F.array(*[F.lit(float(x)) for x in center])
    prods = F.zip_with(
        v, c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def kcenter_select(df, id_col: str, vec_col: str, k: int):
    """Greedy k-center coreset selection (Gonzalez 1985, the classic
    2-approximation; the diversity-sampling step of coreset-based data
    selection). Deterministic: seeded at the smallest id, each round
    picks the point FARTHEST from the selected set (tie-break smaller
    id) and folds its distance into the running min.

    Returns the k selected rows: (rank, id, radius_sq) where radius_sq
    is the point's SQUARED L2 distance-to-set at selection time —
    sqrt(rank r's radius_sq) is the (r-1)-center covering radius of the
    corpus, the quantity the 2-approximation bounds. Kept squared so the
    column replays bit-for-bit cross-engine (sqrt would add one more
    libm boundary); take sqrt at the consumer if a metric radius is
    needed.

    Scale: k driver rounds, each ONE map over the corpus (distance to a
    single literal-broadcast center + running min) and ONE top-1 reduce
    — no pairwise matrix, no k×n shuffle. State is (id, vec, mind);
    lineage grows by one projection per round (k is small by
    construction — for k beyond ~50 switch to localCheckpoint every few
    rounds exactly like components.connected_components_star)."""
    first = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        .orderBy("id")
        .first()
    )
    if first is None:
        raise ValueError(
            f"kcenter_select: k={k} exceeds the number of points (empty input)"
        )
    centers = [(1, first["id"], 0.0)]
    state = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        _sq_dist(F.col(vec_col), first["vec"]).alias("mind"),
    ).filter(F.col("id") != first["id"])
    for r in range(2, k + 1):
        # selected ids leave the pool: without this, a corpus whose
        # remaining max distance is 0 (duplicate vectors) re-selects an
        # existing center instead of a remaining point
        best = (
            state.orderBy(F.desc("mind"), F.asc("id"))
            .select("id", "vec", "mind")
            .first()
        )
        if best is None:
            raise ValueError(
                f"kcenter_select: k={k} exceeds the number of points"
            )
        centers.append((r, best["id"], best["mind"]))
        state = state.filter(F.col("id") != best["id"]).withColumn(
            "mind", F.least(F.col("mind"), _sq_dist(F.col("vec"), best["vec"]))
        )
    spark = df.sparkSession
    return spark.createDataFrame(
        centers, "rank long, vec_id long, radius_sq double"
    ).orderBy("rank")
