"""Stored-function re-implementation (SURVEY C95).

The reference translates MySQL stored functions to plpgsql with a
10-step text pipeline that needs per-function hardcoded patches
(sync_functions.go:430-465) — evidence text surgery doesn't generalize.
Here a stored function is a first-class Python object with TWO
evaluation paths:

1. **inline** (the scale path): the body re-expressed as Column
   expressions / joins — set-based, JVM-side, no per-row calls. A MySQL
   `SELECT … INTO v FROM t WHERE id = arg` point-lookup becomes a join
   against the (pre-aggregated) table.
2. **udf** (the compatibility path): registered via spark.udf.register
   so `spark.sql("SELECT f(x) …")` keeps working for callers that expect
   a scalar function — row-at-a-time, documented slow.

The three fixture functions (scripts/mysql/create_function.sql:
calculate_order_total, get_customer_level, get_user_email-style lookup)
are modeled on the TPC-H corpus below.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class StoredFunction:
    name: str
    inline: Callable[..., Column]          # Column(s) → Column (scale path)
    scalar: Callable | None = None         # python impl for UDF registration
    return_type: str = "string"

    def register_udf(self, spark: SparkSession) -> None:
        """Compatibility path: spark.sql can call the function by name.
        Registered as an Arrow-batched ``pandas_udf`` (round 11): the
        scalar impl is mapped over each batch, so even the compat path
        avoids per-row pickling. The per-ELEMENT Python call inside the
        batch remains by design — the scalar impl is arbitrary Python,
        so it cannot be vectorized generically; this compat path exists
        for parity testing, and the scale path is the inline Column
        expression (``CUSTOMER_LEVEL``/``CUSTOMER_LABEL``), which stays
        entirely JVM-side."""
        if self.scalar is None:
            raise ValueError(f"{self.name} has no scalar implementation")
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        import inspect

        py = self.scalar
        n_args = len(inspect.signature(py).parameters)
        if n_args == 1:
            def batched(s):
                return pd.Series([py(v) for v in s], dtype="object")

            # real class objects, not strings: this module's
            # `from __future__ import annotations` would otherwise feed
            # pyspark's hint inference 'pd.Series' literals it rejects
            batched.__annotations__ = {"s": pd.Series, "return": pd.Series}
            udf = pandas_udf(batched, self.return_type)
        else:
            # multi-arg scalars use the explicit-functionType form (the
            # hint-based API needs a fixed arity in the annotations)
            import warnings

            from pyspark.sql.functions import PandasUDFType

            def batched(*cols):
                return pd.Series(
                    [py(*vals) for vals in zip(*cols)], dtype="object"
                )

            with warnings.catch_warnings():
                warnings.simplefilter("ignore", UserWarning)
                udf = pandas_udf(
                    batched, self.return_type, PandasUDFType.SCALAR
                )
        spark.udf.register(self.name, udf)


# ---- fixture-function analogs on the TPC-H corpus -------------------------

LEVEL_GOLD = 1_000_000.0
LEVEL_SILVER = 200_000.0


def _customer_level_col(total: Column) -> Column:
    """get_customer_level: CASE on cumulative spend (create_function.sql
    pattern: thresholds → level string)."""
    return (
        F.when(total.isNull() | (total == 0), "none")
        .when(total >= LEVEL_GOLD, "gold")
        .when(total >= LEVEL_SILVER, "silver")
        .otherwise("bronze")
    )


def _customer_level_scalar(total) -> str:
    if total is None or total == 0:
        return "none"
    if total >= LEVEL_GOLD:
        return "gold"
    if total >= LEVEL_SILVER:
        return "silver"
    return "bronze"


def _customer_label_col(name: Column, level: Column) -> Column:
    """CONCAT-style label function (READS SQL DATA → pure expression)."""
    return F.concat(name, F.lit(" ["), level, F.lit("]"))


CUSTOMER_LEVEL = StoredFunction(
    "customer_level", _customer_level_col, _customer_level_scalar, "string"
)
CUSTOMER_LABEL = StoredFunction("customer_label", _customer_label_col)


def order_totals(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """calculate_order_total: per-order net revenue. The stored function
    runs one agg subquery PER CALL; inlined it's ONE distributed agg +
    join for all rows — the set-based rewrite."""
    from mysql2pg_spark.plans.relational import dsum

    per_order = lineitem.groupBy("l_orderkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "order_total"
        )
    )
    return orders.join(
        per_order, orders.o_orderkey == per_order.l_orderkey, "left"
    ).drop("l_orderkey")
