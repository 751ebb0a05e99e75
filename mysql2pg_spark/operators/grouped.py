"""Grouped-map operators via applyInPandas (the per-group imperative
escape hatch — SURVEY §2 UDF surface; pattern per SNIPPETS.md [1]).

Used when per-group logic genuinely needs a dataframe view of the whole
group (sequence numbering with gap features here; model scoring,
per-group curve fitting, resampling in general). Outputs are integers /
carried-through values so results stay exactly reproducible — float
reductions inside pandas would be numpy-order-dependent and break
cross-engine checks.

Scale: one shuffle on the group key; each group must fit in one
executor's memory (the applyInPandas contract) — group by high-
cardinality keys (user, session), never by low-cardinality ones.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

SESSIONIZE_SCHEMA = (
    "user_id bigint, event_id bigint, ts timestamp, seq int, "
    "gap_us bigint, is_session_start boolean"
)


def sessionize_events(
    events: DataFrame, gap_minutes: int = 10
) -> DataFrame:
    """Per-user event sequencing: order by (ts, event_id), emit sequence
    number, microsecond gap to the previous event, and session-start flag
    (gap ≥ threshold). The pandas body sees one user's full history —
    the grouped-map shape streaming can't express row-wise."""
    gap_us_threshold = gap_minutes * 60 * 1_000_000

    def one_user(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        ts_us = pdf["ts"].astype("int64") // 1000  # ns → us
        gap = ts_us.diff()
        out = pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "ts": pdf["ts"],
                "seq": (pdf.index + 1).astype("int32"),
                "gap_us": gap.fillna(-1).astype("int64"),
                "is_session_start": gap.isna() | (gap >= gap_us_threshold),
            }
        )
        return out

    return (
        events.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandas(one_user, SESSIONIZE_SCHEMA)
    )
