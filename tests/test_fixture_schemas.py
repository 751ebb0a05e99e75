"""Fixture-drift guard: the driver has regenerated /root/testdata once
already (events.ts went timestamp[ns] → timestamp[us] between rounds and
silently crashed 14 driver queries). Load every table from every sf dir and
pin the post-load dtypes, so the next layout change fails HERE with one
named assertion instead of N opaque plan-time errors."""

from __future__ import annotations

import os

import pytest

from mysql2pg_spark.tables import TABLE_NAMES, load_table

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]

# Post-normalization dtypes load_table guarantees, per table. Only columns
# whose physical encoding could plausibly drift (or already has) are pinned;
# '*' pins the full dtype dict.
EXPECTED = {
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",  # canonical LTZ; normalize_events_ts contract
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>", "label": "int"},
    "lineitem": {
        "l_orderkey": "bigint",
        "l_quantity": "double",
        "l_shipdate": "timestamp_ntz",
    },
    "orders": {"o_orderkey": "bigint", "o_orderdate": "timestamp_ntz"},
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("name", TABLE_NAMES)
def test_fixture_loads_with_expected_dtypes(spark, sf_dir, name):
    df = load_table(spark, sf_dir, name)
    dtypes = dict(df.dtypes)
    for col, want in EXPECTED.get(name, {}).items():
        assert col in dtypes, (
            f"{sf_dir}/{name}: column {col!r} missing — fixture layout drifted; "
            f"got columns {sorted(dtypes)}"
        )
        assert dtypes[col] == want, (
            f"{sf_dir}/{name}.{col}: dtype {dtypes[col]!r} != pinned {want!r} — "
            "fixture layout drifted; update tables.load_table normalization"
        )
    # every table must actually produce rows at every sf
    assert df.limit(1).count() == 1, f"{sf_dir}/{name}: empty table"


def test_embedding_column_is_float_array(spark):
    df = load_table(spark, SF_DIRS[0], "embeddings")
    dtypes = dict(df.dtypes)
    emb_cols = [c for c, t in dtypes.items() if t.startswith("array<")]
    assert emb_cols, f"embeddings has no array column: {dtypes}"
