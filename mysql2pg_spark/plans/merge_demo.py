"""Incremental-sync + clustering queries: latest-wins upsert and
connected-components dedup clusters (iterative, with a recursive-CTE
oracle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql2pg_spark.operators.components import connected_components
from mysql2pg_spark.operators.upsert import upsert_latest
from mysql2pg_spark.plans.dedup import (
    JACCARD_T,
    _BANDS_CTE,
    _CAND_CTE,
    _MINHASH_CTE,
)
from mysql2pg_spark.plans.registry import ORACLES, query
from mysql2pg_spark.tables import load_table


# --------------------------------------------------------------------------
# u01 — latest-wins upsert: a deterministic update stream (every 10th
# order gets a price bump at version 2) merged over the base table.
# --------------------------------------------------------------------------
@query(
    "u01_upsert_latest",
    oracle="""
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 1 AS version
  FROM orders
), updates AS (
  SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
         o_totalprice + 1000.0 AS o_totalprice, 2 AS version
  FROM orders WHERE o_orderkey % 10 = 0
), merged AS (
  SELECT * FROM base UNION ALL SELECT * FROM updates
)
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, version
FROM merged
QUALIFY row_number() OVER (PARTITION BY o_orderkey ORDER BY version DESC) = 1
ORDER BY o_orderkey
""",
)
def u01_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    base = orders.withColumn("version", F.lit(1))
    updates = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_orderstatus", F.lit("X"))
        .withColumn("o_totalprice", F.col("o_totalprice") + 1000.0)
        .withColumn("version", F.lit(2))
    )
    return upsert_latest(base, updates, ["o_orderkey"], "version")


# --------------------------------------------------------------------------
# cc01 — dedup clusters: connected components over the verified near-dup
# pairs. The production algorithm is iterative MIN-LABEL PROPAGATION
# (promoted round 15 after the isolated A/B on the materialized sf1
# pair set: 1.57 s vs the star contraction's 6.96 s median, 4.4×, with
# a tighter rep spread — see PLANS.md "cc01 isolated clock"). Near-dup
# graphs are SHALLOW (a dup cluster's diameter is bounded by its
# template fan-out, not corpus size), so label propagation's
# O(diameter) rounds beat the star's fixed two-groupBy-join rounds on
# constant factors; the alternating large/small-star contraction
# (O(log² n) rounds at ANY diameter — the unbounded-diameter fallback
# for linkage chains / social graphs) stays oracle-checked as cc04.
# The oracle reconstructs components with a recursive CTE (min
# reachable id).
# --------------------------------------------------------------------------
@query(
    "cc01_dedup_clusters",
    oracle=f"""
WITH RECURSIVE {_MINHASH_CTE.strip().rstrip()}, {_BANDS_CTE}, {_CAND_CTE},
pairs AS (
  SELECT id_a, id_b
  FROM cand
  JOIN sh sa ON sa.doc_id = cand.id_a
  JOIN sh sb ON sb.doc_id = cand.id_b
  WHERE (CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
        / CAST(len(list_distinct(sa.shingles || sb.shingles)) AS DOUBLE)) >= {JACCARD_T}
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(n, m) AS (
  SELECT a, a FROM edges
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m
)
SELECT n AS node, min(m) AS component
FROM reach GROUP BY n ORDER BY node
""",
)
def cc01_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql2pg_spark.plans.dedup import neardup_pairs

    return connected_components(neardup_pairs(spark, sf_dir))


# cc02 — the same clusters via the same label-propagation operator,
# kept as a registered name for continuity (it held the family's
# driver row in r14); cc04 below is the star-contraction variant, the
# cross-implementation check since round 15's promotion swap. Same
# recursive-CTE oracle for all three.
_CC_ORACLE = ORACLES["cc01_dedup_clusters"]


@query("cc02_labelprop_clusters", oracle=_CC_ORACLE, driver=False)
def cc02_labelprop_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql2pg_spark.plans.dedup import neardup_pairs

    return connected_components(neardup_pairs(spark, sf_dir))


@query("cc04_star_clusters", oracle=_CC_ORACLE, driver=False)
def cc04_star_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alternating large/small-star contraction over the same verified
    pairs — the unbounded-diameter fallback (Kiveris et al., SoCC'14),
    demoted from the cc01 slot by the round-15 isolated A/B (PLANS.md);
    cross-checks min-label on every pytest run via the shared oracle."""
    from mysql2pg_spark.operators.components import connected_components_star
    from mysql2pg_spark.plans.dedup import neardup_pairs

    return connected_components_star(neardup_pairs(spark, sf_dir))


# --------------------------------------------------------------------------
# d09 — dedup APPLIED: the end of the near-dup pipeline. Every document
# survives unless it sits in a near-dup cluster and is not the cluster's
# canonical (minimum-id) member — the corpus a training run would
# actually consume. Shape at scale: the cluster map is tiny relative to
# the corpus (only docs with a near-dup), so the anti-join broadcasts.
# --------------------------------------------------------------------------
_CC_BODY = _CC_ORACLE[_CC_ORACLE.index("WITH RECURSIVE") + len("WITH RECURSIVE"):
                      _CC_ORACLE.index("SELECT n AS node")]


@query(
    "d09_dedup_apply",
    oracle=f"""
WITH RECURSIVE {_CC_BODY.strip()},
comp AS (SELECT n AS node, min(m) AS component FROM reach GROUP BY n)
SELECT d.doc_id, d.source, d.lang
FROM documents d
LEFT JOIN comp ON comp.node = d.doc_id
WHERE comp.node IS NULL OR comp.component = d.doc_id
ORDER BY d.doc_id
""",
    driver=False,
)
def d09_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql2pg_spark.plans.dedup import neardup_pairs

    docs = load_table(spark, sf_dir, "documents")
    comp = connected_components(neardup_pairs(spark, sf_dir))
    drop = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    return (
        docs.join(F.broadcast(drop), "doc_id", "left_anti")
        .select("doc_id", "source", "lang")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# u02 — SCD Type 2 history: each user's event_type change feed collapsed
# into validity intervals (valid_from, valid_to, version, is_current).
# Single shuffle on user_id (all windows share it). The oracle replays
# the identical double-row_number islands + lead() close.
# --------------------------------------------------------------------------
@query(
    "u02_scd2_history",
    oracle="""
WITH runs AS (
  SELECT user_id, event_type, _run, min(ts) AS valid_from
  FROM (
    SELECT user_id, event_type, ts,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id)
         - row_number() OVER (PARTITION BY user_id, event_type
                              ORDER BY ts, event_id) AS _run
    FROM events
  ) GROUP BY user_id, event_type, _run
)
SELECT user_id, event_type, valid_from,
       lead(valid_from) OVER w AS valid_to,
       CAST(row_number() OVER w AS BIGINT) AS version,
       (lead(valid_from) OVER w IS NULL) AS is_current
FROM runs
WINDOW w AS (PARTITION BY user_id ORDER BY valid_from, event_type)
ORDER BY user_id, version
""",
    driver=False,
)
def u02_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql2pg_spark.operators.upsert import scd2_intervals

    e = load_table(spark, sf_dir, "events")
    return scd2_intervals(
        e, ["user_id"], "event_type", "ts", "event_id"
    ).orderBy("user_id", "version")


# --------------------------------------------------------------------------
# cc03 — PageRank canonical selection over the near-dup graph: 5 rounds
# of FIXED-POINT integer PageRank (bit-exact on any engine — see
# operators/components.pagerank_fixed_point), joined with the connected
# components; the highest-rank member of each cluster is its canonical
# exemplar (best-connected, vs cc01's min-id convention). Oracle unrolls
# the identical 5 integer rounds over the recursive-CC pair CTEs.
# --------------------------------------------------------------------------
def _pagerank_oracle() -> str:
    from mysql2pg_spark.operators.components import PR_ROUNDS, PR_SCALE

    rounds = []
    for k in range(1, PR_ROUNDS + 1):
        # 85·s decomposed exactly like the operator (overflow-safe):
        # 85·(s div 100) + (85·(s mod 100)) div 100
        rounds.append(f"""
r{k} AS (
  SELECT n.node,
         CAST({15 * PR_SCALE // 100}
              + 85 * (coalesce(s.s, 0) // 100)
              + (85 * (coalesce(s.s, 0) % 100)) // 100
              AS BIGINT) AS r
  FROM nds n LEFT JOIN (
    SELECT e.b AS dst, sum(r.r // d.deg) AS s
    FROM edges e
    JOIN r{k - 1} r ON r.node = e.a
    JOIN deg d ON d.src = e.a
    GROUP BY e.b) s ON s.dst = n.node)""")
    return f"""
WITH RECURSIVE {_CC_BODY.strip()},
comp AS (SELECT n AS node, min(m) AS component FROM reach GROUP BY n),
deg AS (SELECT a AS src, count(*) AS deg FROM edges GROUP BY a),
nds AS (SELECT DISTINCT a AS node FROM edges),
r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS r FROM nds),
{",".join(rounds)}
SELECT c.component, r.node, r.r AS rank_fp,
       (row_number() OVER (PARTITION BY c.component
                           ORDER BY r.r DESC, r.node) = 1) AS is_canonical
FROM r{PR_ROUNDS} r JOIN comp c ON c.node = r.node
ORDER BY c.component, r.node
"""


def _pagerank_canonical(pairs: DataFrame) -> DataFrame:
    """cc03's post-pairs body over an ALREADY-MATERIALIZED pair set:
    fixed-point PageRank + component labels, canonical pick per
    cluster. Factored out (round 16) so cc01_cluster_battery can feed
    pagerank AND both component labelings from ONE pair-pipeline
    execution."""
    from pyspark.sql.window import Window

    from mysql2pg_spark.operators.components import pagerank_fixed_point

    ranks = pagerank_fixed_point(pairs)
    comp = connected_components(pairs)
    w = Window.partitionBy("component").orderBy(
        F.desc("rank_fp"), F.asc("node")
    )
    return (
        ranks.withColumnRenamed("r", "rank_fp")
        .join(comp, "node")
        .withColumn("is_canonical", F.row_number().over(w) == 1)
        .select("component", "node", "rank_fp", "is_canonical")
        .orderBy("component", "node")
    )


@query("cc03_pagerank_canonical", oracle=_pagerank_oracle(), driver=False)
def cc03_pagerank_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mysql2pg_spark.plans.dedup import neardup_pairs

    # one LSH pipeline execution feeds BOTH consumers (pagerank and the
    # component labeling are each iterative — without this the pair
    # pipeline re-executes once per internal round)
    pairs = neardup_pairs(spark, sf_dir).localCheckpoint(eager=False)
    return _pagerank_canonical(pairs)
