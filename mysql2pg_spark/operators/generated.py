"""Generated-column evaluation (SURVEY C90).

The reference extracts generated-column expressions from DDL text,
inlines references to other generated columns, and converts VIRTUAL →
STORED (sync_tableddl.go:624-673, 824-888). Engine-side the whole
feature is sequential ``withColumn``: each spec may reference columns
produced by earlier specs (the chained case the reference handles with
text substitution), and the sink receives plain materialized columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_generated_columns(
    df: DataFrame, specs: list[tuple[str, str]]
) -> DataFrame:
    """specs: ordered (column_name, SQL expression) pairs; expressions may
    reference previously generated columns (chained generation)."""
    for name, expr in specs:
        df = df.withColumn(name, F.expr(expr))
    return df
