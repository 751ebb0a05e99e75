"""Similarity-search queries over the embeddings table: exact brute-force
top-k (baseline) and hyperplane-LSH bucketed ANN (scale path). Both have
full DuckDB oracles thanks to md5-derived deterministic hyperplanes and
left-fold double dot products (see operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql2pg_spark.operators import similarity as S
from mysql2pg_spark.plans.dedup import _cos_sql
from mysql2pg_spark.plans.registry import query
from mysql2pg_spark.tables import load_table

K = 5
QUERY_MOD = 50  # vec_id % 50 == 0 → the deterministic query subset
NUM_PLANES = 4
DIMS = 64


# --------------------------------------------------------------------------
# s01 — exact brute-force cosine top-k.
# --------------------------------------------------------------------------
@query(
    "s01_knn_bruteforce",
    oracle=f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
           WHERE vec_id % {QUERY_MOD} = 0),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         {_cos_sql('q.qvec', 'c.embedding')} AS cos_sim
  FROM q JOIN embeddings c ON c.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, cos_sim FROM ranked
WHERE rank <= {K}
ORDER BY query_id, rank
""",
)
def s01_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql2pg_spark.tables import fan_out

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % QUERY_MOD == 0)
    # round 16: fan_out the corpus side — the broadcast-NLJ scoring ran
    # in the one fixture-scan task (no-op at scale). 0.86 s → 0.70 s,
    # and s11's exact ground truth inherits the gain.
    return S.knn_bruteforce(fan_out(e), q, "vec_id", "embedding", K)


# --------------------------------------------------------------------------
# s02 — LSH-bucketed ANN: NUM_TABLES independent hyperplane tables, each
# probed multi-probe style (own bucket + Hamming-1 neighbors), candidate
# pairs distinct-ed across tables, exact cosine re-rank. Recall on the
# fixture: 0.86 (vs 0.26 for the round-1 single table, no probes).
# --------------------------------------------------------------------------
PROBE_RADIUS = 1
NUM_TABLES = 3


def _probe_list_sql(bucket: str) -> str:
    """DuckDB list of multi-probe buckets — mirrors similarity.probe_buckets
    (radius 1: the bucket plus every single-bit flip)."""
    probes = [bucket] + [
        f"xor({bucket}, {1 << p})" for p in range(NUM_PLANES)
    ]
    return "[" + ", ".join(probes) + "]"


def _bucket_sql(vec: str, table: int = 0) -> str:
    terms = []
    for p in range(NUM_PLANES):
        seed = f"{p}:" if table == 0 else f"t{table}:{p}:"
        prods = (
            f"list_transform(range(1, {DIMS} + 1), "
            f"i -> CAST({vec}[i] AS DOUBLE) * "
            f"(CAST(instr('0123456789abcdef', substr(md5('{seed}' || CAST(i AS VARCHAR)), 1, 1)) - 1 AS DOUBLE) - 7.5))"
        )
        dot = (
            f"list_reduce(list_prepend(CAST(0 AS DOUBLE), {prods}), (x, y) -> x + y)"
        )
        terms.append(
            f"CASE WHEN {dot} > 0 THEN CAST({2 ** p} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        )
    return " + ".join(terms)


def _table_cand_sql(t: int) -> str:
    """Candidate (query, neighbor) pairs from hash table ``t``. The
    lateral UNNEST is isolated in a subquery — DuckDB's binder rejects a
    comma-join UNNEST followed by an explicit JOIN in one FROM clause."""
    return f"""
    SELECT pr.query_id, c.vec_id AS neighbor_id
    FROM (SELECT q.vec_id AS query_id, p.bucket
          FROM b q, UNNEST({_probe_list_sql(f'q.bucket{t}')}) AS p(bucket)
          WHERE q.vec_id % {QUERY_MOD} = 0) pr
    JOIN b c ON c.bucket{t} = pr.bucket AND c.vec_id <> pr.query_id"""


@query(
    "s02_knn_lsh",
    oracle=f"""
WITH b AS (
  SELECT vec_id, embedding,
         {", ".join(f"{_bucket_sql('embedding', t)} AS bucket{t}" for t in range(NUM_TABLES))}
  FROM embeddings
),
cand AS (
  SELECT DISTINCT query_id, neighbor_id FROM (
    {" UNION ALL ".join(_table_cand_sql(t) for t in range(NUM_TABLES))}
  )
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         {_cos_sql('qe.embedding', 'ce.embedding')} AS cos_sim
  FROM cand
  JOIN embeddings qe ON qe.vec_id = cand.query_id
  JOIN embeddings ce ON ce.vec_id = cand.neighbor_id
), ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, cos_sim FROM ranked
WHERE rank <= {K}
ORDER BY query_id, rank
""",
)
def s02_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % QUERY_MOD == 0)
    return S.knn_lsh(
        e, q, "vec_id", "embedding", K, NUM_PLANES, DIMS, PROBE_RADIUS, NUM_TABLES
    )


# --------------------------------------------------------------------------
# s03 — IVF ANN: deterministic coarse quantizer (sampled centroids),
# single-list corpus assignment, nprobe=3 query probing, exact re-rank.
# --------------------------------------------------------------------------
CENTROID_MOD = 50  # vec_id % 50 == 1 → 10 deterministic centroids
N_PROBE = 4  # lists probed per query
CORPUS_ASSIGN = 2  # soft assignment: each corpus vector in its 2 nearest lists
# (recall on the fixture: 0.94, vs 0.56 for round-1 assign=1/nprobe=3)

from mysql2pg_spark.plans.dedup import _DOT  # raw left-fold dot fragment


def _raw_cos(a: str, b: str) -> str:
    return (
        f"({_DOT.format(a=a, b=b)}) / "
        f"(sqrt({_DOT.format(a=a, b=a)}) * sqrt({_DOT.format(a=b, b=b)}))"
    )


@query(
    "s03_knn_ivf",
    oracle=f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS c FROM embeddings
  WHERE vec_id % {CENTROID_MOD} = 1
),
assign AS (
  SELECT vec_id AS neighbor_id, embedding AS nv, centroid_id FROM (
    SELECT v.vec_id, v.embedding, c.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
             ORDER BY {_raw_cos('v.embedding', 'c.c')} DESC, c.centroid_id) AS rn
    FROM embeddings v CROSS JOIN cent c
  ) WHERE rn <= {CORPUS_ASSIGN}
),
probes AS (
  SELECT vec_id AS query_id, embedding AS qv, centroid_id FROM (
    SELECT v.vec_id, v.embedding, c.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
             ORDER BY {_raw_cos('v.embedding', 'c.c')} DESC, c.centroid_id) AS rn
    FROM embeddings v CROSS JOIN cent c
    WHERE v.vec_id % {QUERY_MOD} = 0
  ) WHERE rn <= {N_PROBE}
),
scored AS (
  SELECT DISTINCT p.query_id, a.neighbor_id,
         {_raw_cos('p.qv', 'a.nv')} AS cos_sim
  FROM probes p JOIN assign a ON a.centroid_id = p.centroid_id
  WHERE a.neighbor_id <> p.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, cos_sim FROM ranked
WHERE rank <= {K}
ORDER BY query_id, rank
""",
)
def s03_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    centroids = e.filter(F.col("vec_id") % CENTROID_MOD == 1)
    q = e.filter(F.col("vec_id") % QUERY_MOD == 0)
    return S.knn_ivf(
        e, q, centroids, "vec_id", "embedding", K, N_PROBE, CORPUS_ASSIGN
    )


# --------------------------------------------------------------------------
# d06 — embedding near-duplicate pairs, blocked on the hyperplane LSH
# bucket (NOT a semantic label: labels are skew magnets — one hot label
# makes the within-block join quadratic, while LSH buckets stay balanced
# by construction at any corpus size). Candidate pairs only form inside
# a bucket; reference point: the label-blocked variant remains available
# via operators.dedup.embedding_neardup_pairs(block_col="label").
# --------------------------------------------------------------------------
from mysql2pg_spark.operators.dedup import embedding_neardup_pairs  # noqa: E402
from mysql2pg_spark.plans.dedup import COS_T  # noqa: E402


@query(
    "d06_embedding_neardup",
    oracle=f"""
WITH b AS (
  SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket FROM embeddings
)
SELECT a.bucket AS blk, a.vec_id AS id_a, c.vec_id AS id_b,
       {_cos_sql('a.embedding', 'c.embedding')} AS cos_sim
FROM b a JOIN b c
  ON a.bucket = c.bucket AND a.vec_id < c.vec_id
WHERE {_cos_sql('a.embedding', 'c.embedding')} >= {COS_T}
ORDER BY id_a, id_b
""",
)
def d06_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql2pg_spark.tables import fan_out

    # Round 16: fan_out spreads the single-split fixture scan so the
    # hyperplane bucketing + within-block cosine joins use every core
    # (no-op at real scale). Measured 1.32 s → 0.76 s at sf0.1.
    e = fan_out(load_table(spark, sf_dir, "embeddings"))
    bucketed = e.withColumn(
        "bucket", S.hyperplane_bucket(F.col("embedding"), NUM_PLANES, DIMS)
    )
    return embedding_neardup_pairs(
        bucketed, "vec_id", "embedding", "bucket", COS_T
    )


# --------------------------------------------------------------------------
# d08 — multi-table near-dup: candidates unioned from NUM_TABLES LSH
# bucketings then exact-verified. Raises pair recall vs d06's single
# bucketing (measured 0.11 → ~0.3 of all θ≥threshold pairs on the
# fixture) at L bucket-local joins — the honest recall dial for blocked
# near-dup at scale. Not in the driver window; pytest-oracle-checked.
# --------------------------------------------------------------------------
def _mt_cand_sql(t: int) -> str:
    return f"""
    SELECT a.vec_id AS id_a, c.vec_id AS id_b
    FROM b a JOIN b c ON a.bucket{t} = c.bucket{t} AND a.vec_id < c.vec_id"""


@query(
    "d08_neardup_multitable",
    oracle=f"""
WITH b AS (
  SELECT vec_id, embedding,
         {", ".join(f"{_bucket_sql('embedding', t)} AS bucket{t}" for t in range(NUM_TABLES))}
  FROM embeddings
),
cand AS (
  SELECT DISTINCT id_a, id_b FROM (
    {" UNION ALL ".join(_mt_cand_sql(t) for t in range(NUM_TABLES))}
  )
)
SELECT cand.id_a, cand.id_b,
       {_cos_sql('qa.embedding', 'qb.embedding')} AS cos_sim
FROM cand
JOIN embeddings qa ON qa.vec_id = cand.id_a
JOIN embeddings qb ON qb.vec_id = cand.id_b
WHERE {_cos_sql('qa.embedding', 'qb.embedding')} >= {COS_T}
ORDER BY id_a, id_b
""",
    driver=False,
)
def d08_neardup_multitable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql2pg_spark.operators.dedup import embedding_neardup_multitable

    e = load_table(spark, sf_dir, "embeddings")
    return embedding_neardup_multitable(
        e, "vec_id", "embedding", COS_T, NUM_TABLES, NUM_PLANES, DIMS
    )


# --------------------------------------------------------------------------
# d11 — SemDeDup-style semantic dedup (arXiv:2303.09540): IVF-cluster the
# corpus, then within each cluster prune every vector with a τ-similar
# smaller-id clustermate (greedy min-id survivor). The quadratic step is
# bounded by cluster size — never corpus size. No floats in the output,
# so the hash compare is airtight. Not in the driver window (cap 50);
# pytest-oracle-checked.
# --------------------------------------------------------------------------
SEM_T = 0.18  # τ: same cosine threshold family as d06


@query(
    "d11_semantic_dedup",
    oracle=f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS c FROM embeddings
  WHERE vec_id % {CENTROID_MOD} = 1
),
assign AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT v.vec_id, v.embedding, c.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
             ORDER BY {_raw_cos('v.embedding', 'c.c')} DESC, c.centroid_id) AS rn
    FROM embeddings v CROSS JOIN cent c
  ) WHERE rn = 1
),
shadowed AS (
  SELECT b.vec_id AS id_b, MIN(a.vec_id) AS kept_by
  FROM assign a JOIN assign b
    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
  WHERE {_raw_cos('a.embedding', 'b.embedding')} >= {SEM_T}
  GROUP BY b.vec_id
)
SELECT v.vec_id, v.centroid_id,
       (s.kept_by IS NOT NULL) AS is_semdup, s.kept_by
FROM assign v LEFT JOIN shadowed s ON s.id_b = v.vec_id
ORDER BY v.vec_id
""")
def d11_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    centroids = e.filter(F.col("vec_id") % CENTROID_MOD == 1)
    return S.semantic_dedup(e, centroids, "vec_id", "embedding", SEM_T)


# --------------------------------------------------------------------------
# s04 — IVF with one Lloyd round: sampled-point centroids are a weak
# quantizer; refine them once as per-cluster means (integer-quantized for
# cross-engine exactness — see similarity.refine_centroids) and run the
# same probe/re-rank pipeline. Not in the driver window;
# pytest-oracle-checked.
#
# Unlike s03's fixed CENTROID_MOD demo, s04 derives the sampling modulus
# from the corpus count so nlist ∝ √n — the standard IVF sizing that
# balances assignment cost (n·nlist) against probe cost (nq·n/nlist);
# with a fixed modulus nlist ∝ n and corpus×centroid assignment is
# quadratic (the round-6 scale step measured 42× at 10× data). One cheap
# count() keeps it deterministic and the same floor(sqrt(n)) formula is
# oracle-expressible as a DuckDB scalar subquery.
# --------------------------------------------------------------------------
QUANT = "1000000.0"

#: sqrt-of-count modulus, shared verbatim by code and oracle: both sides
#: compute GREATEST(2, floor(sqrt(n))) over the same corpus, so the
#: centroid set is identical on any engine at any scale.
_SQRT_MOD_SQL = (
    "SELECT GREATEST(2, CAST(floor(sqrt(CAST(count(*) AS DOUBLE)))"
    " AS BIGINT)) AS cmod FROM embeddings"
)


def _sqrt_mod(n: int) -> int:
    import math

    return max(2, int(math.floor(math.sqrt(float(n)))))


def _mean_sql() -> str:
    return (
        f"CAST(SUM(CAST(round(CAST(a.embedding[p.pos] AS DOUBLE) * {QUANT}, 0)"
        f" AS HUGEINT)) AS DOUBLE) / ({QUANT} * CAST(COUNT(*) AS DOUBLE))"
    )


@query(
    "s04_knn_ivf_refined",
    oracle=f"""
WITH m AS ({_SQRT_MOD_SQL}),
cent0 AS (
  SELECT vec_id AS centroid_id, embedding AS c FROM embeddings, m
  WHERE vec_id % m.cmod = 1
),
assign0 AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT v.vec_id, v.embedding, c.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
             ORDER BY {_raw_cos('v.embedding', 'c.c')} DESC, c.centroid_id) AS rn
    FROM embeddings v CROSS JOIN cent0 c
  ) WHERE rn = 1
),
refined AS (
  SELECT centroid_id, list(m ORDER BY pos) AS c FROM (
    SELECT a.centroid_id, p.pos, {_mean_sql()} AS m
    FROM assign0 a, UNNEST(range(1, {DIMS} + 1)) AS p(pos)
    GROUP BY a.centroid_id, p.pos
  ) GROUP BY centroid_id
),
assign AS (
  SELECT vec_id AS neighbor_id, embedding AS nv, centroid_id FROM (
    SELECT v.vec_id, v.embedding, c.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
             ORDER BY {_raw_cos('v.embedding', 'c.c')} DESC, c.centroid_id) AS rn
    FROM embeddings v CROSS JOIN refined c
  ) WHERE rn <= {CORPUS_ASSIGN}
),
probes AS (
  SELECT vec_id AS query_id, embedding AS qv, centroid_id FROM (
    SELECT v.vec_id, v.embedding, c.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
             ORDER BY {_raw_cos('v.embedding', 'c.c')} DESC, c.centroid_id) AS rn
    FROM embeddings v CROSS JOIN refined c
    WHERE v.vec_id % {QUERY_MOD} = 0
  ) WHERE rn <= {N_PROBE}
),
scored AS (
  SELECT DISTINCT p.query_id, a.neighbor_id,
         {_raw_cos('p.qv', 'a.nv')} AS cos_sim
  FROM probes p JOIN assign a ON a.centroid_id = p.centroid_id
  WHERE a.neighbor_id <> p.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, cos_sim FROM ranked
WHERE rank <= {K}
ORDER BY query_id, rank
""",
    driver=False,
)
def s04_knn_ivf_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    cmod = _sqrt_mod(e.count())  # nlist ∝ √n — see block comment above
    cent0 = e.filter(F.col("vec_id") % cmod == 1)
    refined = S.refine_centroids(e, cent0, "vec_id", "embedding", iters=1)
    q = e.filter(F.col("vec_id") % QUERY_MOD == 0)
    return S.knn_ivf(
        e, q, refined, "vec_id", "embedding", K, N_PROBE, CORPUS_ASSIGN
    )


# --------------------------------------------------------------------------
# s05 — hard-negative mining: for each query vector, the top-k most
# similar CORPUS vectors with a DIFFERENT label — the data-prep pass for
# contrastive training (the negatives that are hard because they look
# like the anchor). Same broadcast-queries / bucket-local shape as s01;
# the label inequality just joins into the pair filter. Not in the
# driver window; pytest-oracle-checked.
# --------------------------------------------------------------------------
@query(
    "s05_hard_negatives",
    oracle=f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qvec, label AS qlab
           FROM embeddings WHERE vec_id % {QUERY_MOD} = 0),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, c.label AS neg_label,
         {_cos_sql('q.qvec', 'c.embedding')} AS cos_sim
  FROM q JOIN embeddings c
    ON c.vec_id <> q.query_id AND c.label <> q.qlab
), ranked AS (
  SELECT query_id, neighbor_id, neg_label, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, neg_label, cos_sim FROM ranked
WHERE rank <= {K}
ORDER BY query_id, rank
""",
    driver=False,
)
def s05_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from mysql2pg_spark.operators.dedup import dot_fold, with_norm

    e = load_table(spark, sf_dir, "embeddings")
    q = with_norm(
        e.filter(F.col("vec_id") % QUERY_MOD == 0), "embedding", "qnorm"
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        F.col("label").alias("qlab"),
        "qnorm",
    )
    c = with_norm(e, "embedding", "nnorm").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("nvec"),
        F.col("label").alias("neg_label"),
        "nnorm",
    )
    scored = c.join(
        F.broadcast(q),
        (F.col("query_id") != F.col("neighbor_id"))
        & (F.col("neg_label") != F.col("qlab")),
    ).select(
        "query_id",
        "neighbor_id",
        "neg_label",
        (
            dot_fold(F.col("qvec"), F.col("nvec"))
            / (F.col("qnorm") * F.col("nnorm"))
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K)
        .select("query_id", "rank", "neighbor_id", "neg_label", "cos_sim")
    )


# --------------------------------------------------------------------------
# s06 — product-quantization ANN (Jégou et al., TPAMI 2011): the
# memory-compression scale path (m small codes per vector instead of
# dims floats). Codebooks + query LUTs broadcast; corpus encode and
# scoring map-only. Subspace distances are left-fold l2² QUANTIZED to
# integers before the cross-subspace sum, so scores are exact BIGINTs —
# order-free and oracle-identical. Not in the driver window;
# pytest-oracle-checked.
# --------------------------------------------------------------------------
CODEBOOK_MOD = 11  # vec_id % 11 == 1 → the deterministic codeword sample
PQ_RERANK = 50  # ADC shortlist size fed to the exact re-rank
PQ_M = 8
PQ_SUB = DIMS // PQ_M


def _norm_vec_sql(v: str) -> str:
    """L2-normalized vector — mirrors knn_pq's normalized() (element /
    left-fold norm; identical IEEE op sequence)."""
    norm = f"sqrt({_DOT.format(a=v, b=v)})"
    return f"list_transform({v}, x -> CAST(x AS DOUBLE) / {norm})"


def _l2q_sql(a: str, b: str, s: int) -> str:
    """Quantized subspace-s squared L2 — mirrors similarity.l2sq_fold +
    the ×10⁶ integer quantization."""
    term = (
        f"({a}[{s * PQ_SUB} + i] - {b}[{s * PQ_SUB} + i])"
        f" * ({a}[{s * PQ_SUB} + i] - {b}[{s * PQ_SUB} + i])"
    )
    fold = (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, {PQ_SUB} + 1), i -> {term})), (x, y) -> x + y)"
    )
    return f"CAST(round({fold} * 1000000.0, 0) AS BIGINT)"


def _pq_side_sql(src_filter: str, idn: str, dn: str) -> str:
    """(id, s, code/cw_id, d) rows: distance of every (normalized)
    vector in the filtered side to every codeword, per subspace."""
    per_s = " UNION ALL ".join(
        f"SELECT n.{idn}, {s} AS s, cb.cw_id AS code, "
        f"{_l2q_sql('n.nv', 'cb.cw', s)} AS {dn} "
        f"FROM (SELECT v.vec_id AS {idn}, {_norm_vec_sql('v.embedding')} AS nv"
        f"      FROM embeddings v WHERE {src_filter}) n CROSS JOIN cb"
        for s in range(PQ_M)
    )
    return per_s


@query(
    "s06_knn_pq",
    oracle=f"""
WITH cb AS (
  -- vec_id < 500 caps the codebook at a FIXED ~45 codewords at any
  -- scale factor: codebook size is a model constant, not a function of
  -- corpus size (encode cost is O(N x K x m))
  SELECT vec_id AS cw_id, {_norm_vec_sql('embedding')} AS cw FROM embeddings
  WHERE vec_id % {CODEBOOK_MOD} = 1 AND vec_id < 500
),
corpus_d AS ({_pq_side_sql("TRUE", "neighbor_id", "d")}),
codes AS (
  SELECT neighbor_id, s, code FROM (
    SELECT neighbor_id, s, code, d,
           row_number() OVER (PARTITION BY neighbor_id, s
                              ORDER BY d, code) AS rn
    FROM corpus_d
  ) WHERE rn = 1
),
lut AS ({_pq_side_sql(f"v.vec_id % {QUERY_MOD} = 0", "query_id", "qd")}),
scored AS (
  SELECT l.query_id, c.neighbor_id, SUM(l.qd) AS adc_dist
  FROM codes c JOIN lut l ON l.s = c.s AND l.code = c.code
  WHERE l.query_id <> c.neighbor_id
  GROUP BY 1, 2
),
shortlist AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adc_dist, neighbor_id) AS arank
    FROM scored
  ) WHERE arank <= {PQ_RERANK}
),
reranked AS (
  SELECT s.query_id, s.neighbor_id,
         {_cos_sql('qe.embedding', 'ce.embedding')} AS cos_sim
  FROM shortlist s
  JOIN embeddings qe ON qe.vec_id = s.query_id
  JOIN embeddings ce ON ce.vec_id = s.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM reranked
)
SELECT query_id, rank, neighbor_id, cos_sim
FROM ranked WHERE rank <= {K}
ORDER BY query_id, rank
""",
    driver=False,
)
def s06_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql2pg_spark.tables import fan_out

    e = load_table(spark, sf_dir, "embeddings")
    codebook = e.filter(
        (F.col("vec_id") % CODEBOOK_MOD == 1) & (F.col("vec_id") < 500)
    )
    q = e.filter(F.col("vec_id") % QUERY_MOD == 0)
    # Round 16: fan_out the corpus side so PQ encoding (corpus ×
    # broadcast codebook subspace distances) runs on every core instead
    # of the single fixture-scan task (no-op at real scale). Measured
    # 4.50 s → 2.33 s at sf0.1; identical rows.
    return S.knn_pq(
        fan_out(e), q, codebook, "vec_id", "embedding", K, PQ_M, DIMS,
        PQ_RERANK,
    )


# --------------------------------------------------------------------------
# s07 — embedding post-processing battery: L2 norm, Matryoshka 16-dim
# truncate+renorm (arXiv:2205.13147), 32-bit sign packing, symmetric
# int8 quantization (faiss SQ8 shape). All folds are the left-fold
# double pattern; quantization uses floor(x+0.5), never round() — the
# cross-engine midpoint trap (see operators/embeddings.py).
# --------------------------------------------------------------------------
MAT_DIMS = 16
BIT_DIMS = 32

_SELF_DOT = _DOT.format(a="{v}", b="{v}")


def _norm_sql(v: str) -> str:
    return f"sqrt({_SELF_DOT.format(v=v)})"


@query(
    "s07_embedding_postproc",
    oracle=f"""
WITH base AS (
  SELECT vec_id, embedding,
         {_norm_sql('embedding')} AS norm,
         {_norm_sql(f'embedding[1:{MAT_DIMS}]')} AS norm16,
         list_max(list_transform(embedding,
                                 x -> abs(CAST(x AS DOUBLE)))) AS amax
  FROM embeddings
), q AS (
  SELECT vec_id, norm, norm16, amax,
         -- zero-norm guard mirrored from unit_vector: DuckDB <= 1.0
         -- returns NULL for 0/0 but >= 1.1 defaults to IEEE NaN/inf,
         -- so the CASE pins the NULL contract on every version
         list_transform(embedding[1:{MAT_DIMS}],
                        x -> CASE WHEN norm16 <> 0
                             THEN CAST(x AS DOUBLE) / norm16 END) AS unit16,
         -- map to BIGINT bits BEFORE the fold: list_prepend(BIGINT,
         -- FLOAT[]) unifies the list to float32 and corrupts the
         -- accumulator above 2^24 (observed: ...198 became ...192.0)
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
                        list_transform(
                          list_reverse(embedding[1:{BIT_DIMS}]),
                          x -> CAST(CASE WHEN CAST(x AS DOUBLE) > 0
                                    THEN 1 ELSE 0 END AS BIGINT))),
           (a, b) -> a * 2 + b) AS bits32,
         list_transform(embedding,
           x -> floor(CAST(x AS DOUBLE) *
                      (CASE WHEN amax > 0 THEN 127.0 / amax ELSE 0.0 END)
                      + 0.5)) AS q
  FROM base
)
SELECT vec_id, norm, norm16, unit16, bits32,
       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), q),
                        (a, b) -> a + b) AS BIGINT)           AS q_sum,
       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(q, x -> abs(x))),
                        (a, b) -> a + b) AS BIGINT)           AS q_l1,
       amax
FROM q ORDER BY vec_id
""",
    driver=False,
)
def s07_embedding_postproc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql2pg_spark.operators import embeddings as E

    e = load_table(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id",
        "embedding",
        E.l2_norm("embedding").alias("norm"),
        E.matryoshka_norm("embedding", MAT_DIMS).alias("norm16"),
        E.abs_max("embedding").alias("amax"),
    )
    q = base.select(
        "vec_id",
        "norm",
        "norm16",
        "amax",
        E.unit_vector(
            F.slice("embedding", 1, MAT_DIMS), F.col("norm16")
        ).alias("unit16"),
        E.sign_bits("embedding", BIT_DIMS).alias("bits32"),
        E.int8_codes("embedding", F.col("amax")).alias("q"),
    )
    zero = F.lit(0).cast("long")
    return q.select(
        "vec_id",
        "norm",
        "norm16",
        "unit16",
        "bits32",
        F.aggregate("q", zero, lambda a, x: a + x).alias("q_sum"),
        F.aggregate("q", zero, lambda a, x: a + F.abs(x)).alias("q_l1"),
        "amax",
    ).orderBy("vec_id")


# --------------------------------------------------------------------------
# s08 — greedy k-center coreset selection (Gonzalez 2-approximation),
# the diversity-sampling primitive of coreset data selection. The oracle
# unrolls the identical greedy chain: seed = min id, then k-1 rounds of
# (argmax running-min-distance, fold new center in) as paired CTEs.
# --------------------------------------------------------------------------
KC_K = 6


def _d2_sql(a: str, b: str) -> str:
    return (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, {DIMS} + 1), "
        f"i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) * "
        f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)))), "
        "(x, y) -> x + y)"
    )


def _kcenter_oracle(k: int) -> str:
    # selected points leave the pool at every step (m_r excludes c_r's
    # id), mirroring the operator: without this, an all-duplicates pool
    # would re-select an existing center
    ctes = [
        "c1 AS (SELECT vec_id, embedding FROM embeddings "
        "ORDER BY vec_id LIMIT 1)",
        "m1 AS (SELECT e.vec_id, e.embedding, "
        f"{_d2_sql('e.embedding', 'c.embedding')} AS mind "
        "FROM embeddings e, c1 c WHERE e.vec_id <> c.vec_id)",
    ]
    for r in range(2, k + 1):
        ctes.append(
            f"c{r} AS (SELECT vec_id, embedding, mind FROM m{r - 1} "
            "ORDER BY mind DESC, vec_id LIMIT 1)"
        )
        if r < k:
            ctes.append(
                f"m{r} AS (SELECT m.vec_id, m.embedding, least(m.mind, "
                f"{_d2_sql('m.embedding', 'c.embedding')}) AS mind "
                f"FROM m{r - 1} m, c{r} c WHERE m.vec_id <> c.vec_id)"
            )
    selects = [
        "SELECT CAST(1 AS BIGINT) AS rank, vec_id, "
        "CAST(0.0 AS DOUBLE) AS radius_sq FROM c1"
    ] + [
        f"SELECT CAST({r} AS BIGINT), vec_id, mind FROM c{r}"
        for r in range(2, k + 1)
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        + "\nUNION ALL ".join(selects)
        + "\nORDER BY rank"
    )


@query("s08_kcenter_coreset", oracle=_kcenter_oracle(KC_K), driver=False)
def s08_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql2pg_spark.operators.embeddings import kcenter_select

    e = load_table(spark, sf_dir, "embeddings")
    return kcenter_select(e, "vec_id", "embedding", KC_K)


# --------------------------------------------------------------------------
# s09 — per-dimension embedding health stats: mean / variance / range of
# every embedding dimension across the corpus — the standard embedding
# QA sweep (collapsed or exploded dims break downstream ANN). Values are
# quantized to 1e-6 integers first (floor(x·1e6 + 0.5), never round()),
# so the sums are order-independent integers and the final mean/variance
# are per-row doubles over those integers — engine-exact, the qa02
# moment trick. posexplode + groupBy(dim): one shuffle, 64 groups,
# map-side combinable. (At ~1e12 rows the s2 int64 headroom runs out —
# the scale path switches s2 to per-partition partial DOUBLEs or 128-bit
# decimal; the fixture stays exact.)
# --------------------------------------------------------------------------
@query(
    "s09_dim_stats",
    oracle="""
WITH q AS (
  SELECT u.i - 1 AS dim,
         CAST(floor(CAST(embedding[u.i] AS DOUBLE) * 1000000 + 0.5)
              AS BIGINT) AS qx
  FROM embeddings, range(1, 65) u(i)
), m AS (
  SELECT dim, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(qx) AS BIGINT) AS s1,
         CAST(sum(qx * qx) AS BIGINT) AS s2,
         CAST(min(qx) AS BIGINT) AS min_q,
         CAST(max(qx) AS BIGINT) AS max_q
  FROM q GROUP BY dim
)
SELECT dim, n,
       CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_q,
       (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS var_q,
       min_q, max_q
FROM m ORDER BY dim
""",
    driver=False,
)
def s09_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    qx = F.floor(
        F.col("x").cast("double") * F.lit(1000000.0) + F.lit(0.5)
    ).cast("long")
    q = e.select(
        F.posexplode("embedding").alias("dim", "x")
    ).select(F.col("dim").cast("bigint"), qx.alias("qx"))
    m = q.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("qx").alias("s1"),
        F.sum(F.col("qx") * F.col("qx")).alias("s2"),
        F.min("qx").alias("min_q"),
        F.max("qx").alias("max_q"),
    )
    nd = F.col("n").cast("double")
    return m.select(
        "dim",
        "n",
        (F.col("s1").cast("double") / nd).alias("mean_q"),
        (
            (nd * F.col("s2").cast("double")
             - F.col("s1").cast("double") * F.col("s1").cast("double"))
            / (nd * nd)
        ).alias("var_q"),
        "min_q",
        "max_q",
    ).orderBy("dim")


# --------------------------------------------------------------------------
# s10 — embedding-space cosine histogram over DETERMINISTIC sampled
# pairs: each vector pairs with its id+stride neighbor for three fixed
# strides — an unbiased-enough similarity-distribution probe (the
# embedding-health companion to s09: a collapsed space shows mass near
# 1.0, a healthy one a bell around 0). No all-pairs: one equi-join per
# stride on the computed key, histogram = integer counts of
# floor((cos+1)·10) buckets (left-fold cosine, floor on identical
# doubles — engine-exact).
# --------------------------------------------------------------------------
S10_STRIDES = (1, 17, 113)


# degenerate-input contract: zero-norm vectors are EXCLUDED (their
# cosine is 0/0 — engine-version-dependent NULL/NaN, and a clamp would
# park broken vectors in the top bucket, the exact collapse signal this
# probe detects); the bucket is clamped on BOTH ends because a left-fold
# float cosine can land fractionally outside [-1, 1].
_S10_SELF = _DOT.format(a="{v}", b="{v}")


def _s10_bucket(cos: str) -> str:
    return f"greatest(0, least(19, CAST(floor(({cos} + 1.0) * 10) AS BIGINT)))"


@query(
    "s10_cosine_histogram",
    oracle=f"""
WITH pr AS (
  SELECT u.s AS stride, a.embedding AS va, b.embedding AS vb
  FROM embeddings a, (VALUES {", ".join(f"({s})" for s in S10_STRIDES)}) u(s)
  JOIN embeddings b ON b.vec_id = a.vec_id + u.s
  WHERE {_S10_SELF.format(v='a.embedding')} > 0
    AND {_S10_SELF.format(v='b.embedding')} > 0
)
SELECT stride, {_s10_bucket(_raw_cos('va', 'vb'))} AS bucket, count(*) AS n
FROM pr
GROUP BY stride, bucket
ORDER BY stride, bucket
""",
    driver=False,
)
def s10_cosine_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql2pg_spark.operators.dedup import cosine, dot_fold

    e = load_table(spark, sf_dir, "embeddings")
    nonzero = e.filter(dot_fold(F.col("embedding"), F.col("embedding")) > 0)
    a = nonzero.select(
        F.col("vec_id").alias("ida"),
        F.col("embedding").alias("va"),
        F.explode(F.array(*[F.lit(s) for s in S10_STRIDES])).alias("stride"),
    )
    b = nonzero.select(
        F.col("vec_id").alias("idb"), F.col("embedding").alias("vb")
    )
    bucket = F.greatest(
        F.lit(0),
        F.least(
            F.lit(19),
            F.floor((cosine(F.col("va"), F.col("vb")) + 1.0) * 10).cast(
                "bigint"
            ),
        ),
    )
    return (
        a.join(b, F.col("idb") == F.col("ida") + F.col("stride"))
        .select("stride", bucket.alias("bucket"))
        .groupBy("stride", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("stride", "bucket")
    )


# --------------------------------------------------------------------------
# s11 — ANN quality audit: recall@K of the approximate methods (LSH
# s02, IVF s03) against the exact brute-force baseline (s01). The QA
# gate every production ANN deployment runs before trusting an index —
# approximate retrieval without a measured recall number is a silent
# data-quality bug. Pure composition of the existing queries: the
# tagged union of approximate results left-joins the exact pairs on
# (query_id, neighbor_id); hits and totals are exact integer counts,
# recall their per-row double ratio (engine-exact). Scale: exact
# results are queries×K rows (tiny — broadcast side); one groupBy on
# 2 method keys.
# --------------------------------------------------------------------------
from mysql2pg_spark.plans.registry import ORACLES as _ORACLES  # noqa: E402
from mysql2pg_spark.plans.registry import QUERIES as _QUERIES  # noqa: E402


def _sub11(name: str) -> str:
    return "(" + _ORACLES[name] + ")"


@query(
    "s11_ann_recall",
    oracle=f"""
WITH exact AS (
  SELECT query_id, neighbor_id FROM {_sub11("s01_knn_bruteforce")}
),
approx AS (
  SELECT 'lsh' AS method, query_id, neighbor_id
  FROM {_sub11("s02_knn_lsh")}
  UNION ALL
  SELECT 'ivf' AS method, query_id, neighbor_id
  FROM {_sub11("s03_knn_ivf")}
)
SELECT a.method,
       CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
       CAST(count(e.neighbor_id) AS BIGINT) AS n_hits,
       CAST(count(e.neighbor_id) AS DOUBLE)
         / (SELECT count(*) FROM exact) AS recall_at_k
FROM approx a
LEFT JOIN exact e
  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY a.method
ORDER BY a.method
""",
    driver=False,
)
def s11_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round 16: the exact ground truth feeds BOTH the broadcast hit
    # join and the n_exact scalar — as two independent subtrees
    # Catalyst executed the whole brute-force pipeline twice (~0.8 s
    # each at sf0.1). localCheckpoint (lazy) materializes it once on
    # first use; the k·|queries|-row result is tiny at any scale.
    exact = _QUERIES["s01_knn_bruteforce"](spark, sf_dir).select(
        "query_id", "neighbor_id"
    ).localCheckpoint(eager=False)
    approx = (
        _QUERIES["s02_knn_lsh"](spark, sf_dir)
        .select(F.lit("lsh").alias("method"), "query_id", "neighbor_id")
        .unionByName(
            _QUERIES["s03_knn_ivf"](spark, sf_dir).select(
                F.lit("ivf").alias("method"), "query_id", "neighbor_id"
            )
        )
    )
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    hit = exact.withColumn("hit", F.lit(1))
    return (
        approx.join(
            F.broadcast(hit), ["query_id", "neighbor_id"], "left"
        )
        .groupBy("method")
        .agg(F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("n_hits"))
        .crossJoin(F.broadcast(n_exact))
        .select(
            "method",
            "n_exact",
            "n_hits",
            (
                F.col("n_hits").cast("double")
                / F.col("n_exact").cast("double")
            ).alias("recall_at_k"),
        )
        .orderBy("method")
    )
