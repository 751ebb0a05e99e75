"""Scale-technique specifics: salting invariance, sketch accuracy,
quarantine routing."""

from __future__ import annotations

from mysql2pg_spark.plans import QUERIES
from tests.conftest import SF_CORRECT


def test_salted_equals_plain(spark):
    """Salting must not change results — compare against the direct plan."""
    import pyspark.sql.functions as F
    from mysql2pg_spark.operators.skew import salted_sum
    from mysql2pg_spark.tables import load_table

    li = load_table(spark, SF_CORRECT, "lineitem")
    plain = {
        (r["l_returnflag"], r["l_linestatus"]): (r["s"], r["n"])
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(38,4)"))
            .cast("double")
            .alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    salted = {
        (r["l_returnflag"], r["l_linestatus"]): (r["revenue"], r["revenue_n"])
        for r in salted_sum(
            li, ["l_returnflag", "l_linestatus"], "l_extendedprice", "revenue",
            num_salts=32,
        ).collect()
    }
    assert plain == salted


def test_approx_distinct_within_tolerance(spark):
    rows = QUERIES["sk02_approx_distinct"](spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        rel_err = abs(r["approx_orders"] - r["exact_orders"]) / r["exact_orders"]
        assert rel_err < 0.05, (r, rel_err)


def test_quarantine_routes(spark):
    rows = {
        r["route"]: r["n"]
        for r in QUERIES["qa01_quarantine"](spark, SF_CORRECT).collect()
    }
    from mysql2pg_spark.tables import load_table

    assert rows.get("bad_json", 0) > 0        # synthesized corruption caught
    assert rows.get("clean", 0) > 0
    total = load_table(spark, SF_CORRECT, "events").count()
    assert sum(rows.values()) == total        # every event routed exactly once
