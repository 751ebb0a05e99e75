"""Bucketed (co-located) join — the shuffle-elimination lever for
repeated large-table joins at 100 TB: bucket both sides on the join key
at write time and the join plans with NO Exchange on either side.

Auto-broadcast is disabled inside the test: at sf0.01 Catalyst correctly
prefers broadcasting the small side (and disables bucketed reading), but
the scenario this test locks in is the 100 TB one where NEITHER side
broadcasts and bucketing is what saves the shuffle.
"""

from __future__ import annotations

import shutil


def test_bucketed_join_has_no_shuffle(spark):
    from mysql2pg_spark.tables import load_table
    from tests.conftest import SF_CORRECT

    shutil.rmtree("spark-warehouse", ignore_errors=True)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    load_table(spark, SF_CORRECT, "orders").write.bucketBy(
        8, "o_orderkey"
    ).sortBy("o_orderkey").mode("overwrite").saveAsTable("b_orders")
    load_table(spark, SF_CORRECT, "lineitem").write.bucketBy(
        8, "l_orderkey"
    ).sortBy("l_orderkey").mode("overwrite").saveAsTable("b_lineitem")

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            spark.table("b_lineitem").l_orderkey
            == spark.table("b_orders").o_orderkey,
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan      # no shuffle, no broadcast
        assert plan.count("Bucketed: true") == 2, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        shutil.rmtree("spark-warehouse", ignore_errors=True)
