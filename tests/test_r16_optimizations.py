"""Round-16 optimization guards.

- The PROD_MAX_BUCKET fixture invariant (ADVICE r15): the uncapped
  oracles of d04/cc01/cc02/cc04/d09 stay exact only while no fixture
  band-bucket exceeds the production cap — pin it so a fixture
  regeneration that breaks it fails HERE with the cap named, instead
  of as N unexplained oracle mismatches.
- fan_out semantics: no-op when the input already has enough
  partitions, core-count repartition when it does not, size-capped
  when ``bytes_per_partition`` is given.
- The Arrow/NumPy kernels (winnow, cdc) must stay map-only plans.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT

SF_BENCH = "/root/testdata/sf0.1"


def test_fixture_buckets_stay_under_prod_cap(spark):
    """ADVICE r15: every fixture corpus' max LSH band-bucket size must
    stay below plans.dedup.PROD_MAX_BUCKET — at or past the cap the
    capped production candidate stage diverges from the uncapped
    d03/d04/cc oracles BY DESIGN, and those oracle checks would fail
    with no pointer to the cap as the cause."""
    from mysql2pg_spark.operators.dedup import _band_keys
    from mysql2pg_spark.plans.dedup import (
        NUM_HASHES,
        PROD_MAX_BUCKET,
        cached_signatures,
    )

    for sf_dir in (SF_CORRECT, SF_BENCH):
        keys = _band_keys(
            cached_signatures(spark, sf_dir), "doc_id", "id", NUM_HASHES
        )
        max_bucket = (
            keys.groupBy("band", "key")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        assert max_bucket < PROD_MAX_BUCKET, (
            f"{sf_dir}: max band-bucket {max_bucket} >= PROD_MAX_BUCKET "
            f"{PROD_MAX_BUCKET} — the capped candidate stage now truncates "
            "on this fixture and the uncapped d03/d04/cc oracles will "
            "hash-mismatch; regenerate the fixture or engage the cap "
            "deliberately (plans/dedup.py round-15 note)"
        )


def test_fan_out_is_noop_when_parallel_enough(spark):
    from mysql2pg_spark.tables import fan_out

    df = spark.range(0, 1000, 1, 64)
    assert fan_out(df) is df


def test_fan_out_spreads_single_partition(spark):
    from mysql2pg_spark.tables import fan_out

    df = spark.range(0, 1000, 1, 1)
    out = fan_out(df)
    assert (
        out.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    assert out.count() == 1000


def test_fan_out_respects_bytes_floor(spark):
    from mysql2pg_spark.tables import fan_out

    df = spark.range(0, 10, 1, 1)  # ~80 bytes — far under the floor
    assert fan_out(df, bytes_per_partition=1024 * 1024) is df


def test_winnow_and_cdc_stay_map_only(spark):
    """The NumPy kernels replaced HOF chains — the zero-exchange
    scan-speed contract must survive the rewrite."""
    from mysql2pg_spark.operators.textops import cdc_chunks
    from mysql2pg_spark.tables import load_table

    d = load_table(spark, SF_CORRECT, "documents")
    plan = cdc_chunks(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bounded_levenshtein_matches_unbounded(spark):
    """d13's thresholded levenshtein must emit exactly the rows and
    distances the unbounded form emitted (the threshold is implied by
    the final edit_sim filter)."""
    from mysql2pg_spark.plans.dedup import EDIT_SIM_T
    from mysql2pg_spark.plans.registry import QUERIES

    got = QUERIES["d13_editdistance_verify"](spark, SF_CORRECT).collect()
    assert got, "fixture should produce at least one verified pair"
    for r in got:
        assert r.edit_dist >= 0
        assert r.edit_sim >= EDIT_SIM_T
