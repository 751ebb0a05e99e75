"""Python UDTF (table function) — the remaining UDF modality: one input
row → many output rows, registered for spark.sql use."""

from __future__ import annotations


def test_udtf_explode_tokens(spark):
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="tok string, pos int")
    class Tokenize:
        def eval(self, text: str):
            for i, t in enumerate((text or "").split()):
                yield t, i

    spark.udtf.register("tokenize_udtf", Tokenize)
    rows = spark.sql(
        "SELECT * FROM tokenize_udtf('a b c')"
    ).collect()
    assert [(r["tok"], r["pos"]) for r in rows] == [("a", 0), ("b", 1), ("c", 2)]
