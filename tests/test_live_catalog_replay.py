"""LIVE-catalog replay capstone (round 14, VERDICT r13 ask #1).

The A-plane (``sources/catalog.py``) was the only block whose SQL had
never driven an end-to-end migration. Here the fixture corpus' recorded
``information_schema`` rows (tests/golden/infoschema.json, serialized
by tools/make_infoschema.py in MySQL 8's documented shapes) are served
through a fake DB-API connection, ``build_snapshot`` assembles the
snapshot from the LIVE path, and:

1. the LIVE plan is compared action-by-action with the DUMP plan of
   the same corpus (identical payload multiset, identical stage
   sequence);
2. the LIVE pipeline EXECUTES into DuckDB with the corpus' seed data
   and every table's full-column checksum equals the dump-path
   migration of the same corpus into a second DuckDB.

The serializer and the catalog reconstructors are independent inverse
implementations of the documented catalog layout — the plan-equality
assert fails unless both agree with the shared downstream builders.
"""

from __future__ import annotations

import json
import os
import re

import duckdb
import pytest
import yaml

from mysql2pg_spark.config import load_config
from mysql2pg_spark.orchestrator import MigrationPipeline
from mysql2pg_spark.runlog import RunLogger
from mysql2pg_spark.sinks.dbapi_sink import make_dbapi_writer
from mysql2pg_spark.sources.catalog import build_snapshot
from mysql2pg_spark.sources.dumpfile import (
    dump_read_schemas,
    full_snapshot_from_dump,
    read_dump_inserts,
    scan_dump_tables,
)
from tools.make_infoschema import snapshot_to_infoschema
from tools.make_mysqldump import render_corpus_dump

GOLDEN = os.path.join(
    os.path.dirname(__file__), "golden", "infoschema.json"
)


@pytest.fixture(scope="module")
def dump_path(tmp_path_factory):
    return render_corpus_dump(
        str(tmp_path_factory.mktemp("dump") / "corpus_dump.sql")
    )


@pytest.fixture(scope="module")
def dump_snapshot(spark, dump_path):
    return full_snapshot_from_dump(spark, dump_path)


def test_recorded_fixture_matches_serializer(dump_snapshot):
    """Drift gate: the committed fixture rows equal a fresh
    serialization of the corpus. Regenerate with
    ``python tools/make_infoschema.py`` in the same commit as any
    corpus or serializer change."""
    fresh = json.loads(json.dumps(
        snapshot_to_infoschema(dump_snapshot), sort_keys=True,
        default=str,
    ))
    recorded = json.load(open(GOLDEN))
    assert set(fresh) == set(recorded)
    for plane in fresh:
        assert fresh[plane] == recorded[plane], plane


# --------------------------------------------------------------------------
# The fake DB-API shim: routes each catalog.py plane query to its
# recorded row list the way a real driver would — execute() + cursor
# description + fetchall, with rows delivered as tuples.
# --------------------------------------------------------------------------

_ROUTES = (
    # (plane key, required substrings in the query)
    ("key_column_usage_pk",
     ("information_schema.key_column_usage", "'PRIMARY'")),
    ("foreign_keys", ("information_schema.referential_constraints",)),
    ("check_constraints", ("constraint_type = 'CHECK'",)),
    ("partitions", ("information_schema.partitions",)),
    ("statistics", ("information_schema.statistics",)),
    ("columns", ("information_schema.columns",)),
    ("views", ("information_schema.views",)),
    ("parameters", ("information_schema.parameters",)),
    ("routines", ("information_schema.routines",)),
    ("triggers", ("information_schema.triggers",)),
    ("events", ("information_schema.events",)),
    ("table_privileges", ("information_schema.table_privileges",)),
    ("tables", ("information_schema.tables",)),
)


class _FakeCursor:
    def __init__(self, planes):
        self._planes = planes
        self.description = None
        self._rows = []

    def execute(self, sql):
        for plane, needles in _ROUTES:
            if all(n in sql for n in needles):
                rows = self._planes[plane]
                break
        else:  # pragma: no cover - a new plane query must be routed
            raise AssertionError(f"unrouted catalog query: {sql[:120]}")
        cols = list(rows[0].keys()) if rows else []
        self.description = [(c, None, None, None, None, None, None)
                            for c in cols]
        self._rows = [tuple(r[c] for c in cols) for r in rows]
        return self

    def fetchall(self):
        return self._rows


class FakeInfoSchemaConnection:
    def __init__(self, planes):
        self._planes = planes

    def cursor(self):
        return _FakeCursor(self._planes)


def _run_query_via(conn):
    def run_query(q):
        cur = conn.cursor()
        cur.execute(q)
        cols = [d[0] for d in cur.description]
        return [dict(zip(cols, row)) for row in cur.fetchall()]

    return run_query


@pytest.fixture(scope="module")
def live_snapshot():
    planes = json.load(open(GOLDEN))
    conn = FakeInfoSchemaConnection(planes)
    snap = build_snapshot("testdb", _run_query_via(conn))
    # grants don't ride information_schema in either path — copy the
    # corpus' user plane so both snapshots carry identical inputs
    return snap


def _plan_key(a):
    return (a.stage, a.kind, a.target, a.payload)


def _cfg(tmp_path, name="cfg.yml", options=None):
    p = tmp_path / name
    p.write_text(yaml.safe_dump({
        "mysql": {"host": "h", "database": "testdb"},
        "postgresql": {"host": "p", "database": "d"},
        "conversion": {
            "options": options or {},
            "limits": {"concurrency": 2, "max_rows_per_batch": 500},
        },
    }))
    return load_config(str(p))


def test_live_plan_equals_dump_plan(
    tmp_path, dump_snapshot, live_snapshot
):
    """The capstone parity assert: the snapshot assembled from recorded
    information_schema rows plans EXACTLY like the dump-parsed one —
    same stage sequence, same action multiset, byte-equal payloads."""
    # users/grants come from the dump's user section, outside the
    # information_schema planes — align them before planning
    live_snapshot.users = dump_snapshot.users
    cfg_opts = {"view": True, "functions": True, "triggers": True}
    dump_actions = MigrationPipeline(
        _cfg(tmp_path, "d.yml", cfg_opts), dump_snapshot
    ).plan()
    live_actions = MigrationPipeline(
        _cfg(tmp_path, "l.yml", cfg_opts), live_snapshot
    ).plan()

    dump_stages = [a.stage for a in dump_actions]
    live_stages = [a.stage for a in live_actions]
    # identical stage sequence (order matters for execution)
    assert [s for s, _ in _dedupe_runs(live_stages)] == \
        [s for s, _ in _dedupe_runs(dump_stages)]

    d_keys = sorted(map(_plan_key, dump_actions))
    l_keys = sorted(map(_plan_key, live_actions))
    if d_keys != l_keys:
        only_d = [k for k in d_keys if k not in l_keys]
        only_l = [k for k in l_keys if k not in d_keys]
        raise AssertionError(
            f"plan divergence — dump-only ({len(only_d)}): "
            f"{only_d[:3]} … live-only ({len(only_l)}): {only_l[:3]}"
        )


def _dedupe_runs(seq):
    out = []
    for s in seq:
        if not out or out[-1][0] != s:
            out.append((s, 1))
    return out


def test_live_path_executes_with_dump_checksums(
    spark, tmp_path, dump_path, dump_snapshot, live_snapshot
):
    """The LIVE-path pipeline executes the full corpus into DuckDB and
    lands byte-equal data: per-table full-column checksums match the
    dump-path migration of the same corpus into a second engine."""
    from mysql2pg_spark.operators.validate import table_checksum

    live_snapshot.users = dump_snapshot.users
    schemas = dump_read_schemas(dump_snapshot)
    seeded = sorted(
        r["table"]
        for r in scan_dump_tables(spark, dump_path).collect()
        if r["n_insert_lines"] > 0
    )
    assert len(seeded) >= 8  # every bulk-seeded table of the corpus

    results = {}
    cons = {}
    for tag, snap in (("dump", dump_snapshot), ("live", live_snapshot)):
        cfg = _cfg(tmp_path, f"{tag}.yml", {
            "view": True, "functions": False, "triggers": False,
            "foreign_keys": False, "indexes": False,
            "validate_data": False,
        })
        cfg.options.table_list = seeded
        cfg.options.use_table_list = True
        con = duckdb.connect()
        cons[tag] = con
        results[tag] = MigrationPipeline(cfg, snap).execute(
            spark,
            con,
            source_reader=lambda sp, plan: read_dump_inserts(
                sp, dump_path, plan["table"], schemas[plan["table"]]
            ),
            sink_writer=make_dbapi_writer(
                con.cursor, paramstyle="qmark", via="driver"
            ),
            dest_reader=lambda sp, t: None,
            logger=RunLogger(str(tmp_path / f"logs_{tag}")),
            target_dialect="duckdb",
        )

    assert results["live"]["synced"] == results["dump"]["synced"]
    assert sum(results["live"]["synced"].values()) >= 19

    mismatched = []
    for t in seeded:
        sides = []
        for tag in ("dump", "live"):
            rel = cons[tag].execute(
                f'SELECT * FROM "{t.lower()}"'
            ).fetch_arrow_table()
            df = spark.createDataFrame(rel)
            sides.append(
                table_checksum(df).collect()[0].asDict()
            )
        if sides[0] != sides[1]:
            mismatched.append((t, sides[0], sides[1]))
    assert not mismatched, mismatched[:3]


def test_edge_rows_pinned_in_fixture(dump_snapshot, live_snapshot):
    """Round 15 (VERDICT r14 ask #7): the replay fixture must carry the
    corpus' nastiest rows — a generated column with a charset
    introducer, a functional index (NULL column_name + EXPRESSION), a
    named-subpartition-list table, and multi-byte comments with
    embedded quotes — and the live reconstruction must agree with the
    dump parse on each. Pins the EXTRA_TABLES corpus so a regeneration
    cannot silently drop them."""
    planes = json.load(open(GOLDEN))

    fn_rows = [r for r in planes["statistics"]
               if r["index_name"] == "idx_edge_fn"]
    assert fn_rows and fn_rows[0]["column_name"] is None
    assert "lower" in fn_rows[0]["expression"].lower()

    gen = [r for r in planes["columns"]
           if r["table_name"] == "edge_gen_fn_comments"
           and r["column_name"] == "label"]
    assert gen and "_utf8mb4'pfx-'" in gen[0]["generation_expression"]

    name_col = [r for r in planes["columns"]
                if r["table_name"] == "edge_gen_fn_comments"
                and r["column_name"] == "name"]
    assert "Straße" in name_col[0]["column_comment"]
    assert "多字节" in name_col[0]["column_comment"]
    tbl = [r for r in planes["tables"]
           if r["table_name"] == "edge_gen_fn_comments"]
    assert "weiß 'Prüfung'" in tbl[0]["table_comment"]

    subs = {r["subpartition_name"] for r in planes["partitions"]
            if r["table_name"] == "edge_named_subparts"}
    assert subs == {"sp_low_a", "sp_low_b", "sp_high_a", "sp_high_b"}

    # both snapshots reconstruct the same specs for the edge tables
    for snap in (dump_snapshot, live_snapshot):
        t = {x.name: x for x in snap.tables}["edge_gen_fn_comments"]
        fn = [i for i in t.indexes if i.name == "idx_edge_fn"]
        assert fn and fn[0].columns == [] and fn[0].expression
        lab = {c.name: c for c in t.columns}["label"]
        assert "_utf8mb4'pfx-'" in (lab.generated_expr or "")
        sp = {x.name: x for x in snap.tables}["edge_named_subparts"]
        assert sp.partition_def and "sp_low_a" in sp.partition_def
