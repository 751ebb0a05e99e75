"""bench.py self-attribution plumbing (round 9): the prev-round
baseline resolution + dual-registry import that powers the interleaved
HEAD-vs-prev A/B, without a Spark session."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_resolve_prev_ref_finds_round_snapshot(monkeypatch):
    import bench

    monkeypatch.delenv("SPARK_GRAFT_PREV_REF", raising=False)
    ref = bench._resolve_prev_ref()
    assert ref is not None
    subject = subprocess.run(
        ["git", "-C", REPO, "log", "-1", "--format=%s", ref],
        capture_output=True, text=True,
    ).stdout.strip()
    assert subject.startswith("round ") and "end-of-round snapshot" in subject
    # env override wins
    monkeypatch.setenv("SPARK_GRAFT_PREV_REF", "HEAD~1")
    assert bench._resolve_prev_ref() == "HEAD~1"


def test_load_queries_from_prev_worktree_and_restore(tmp_path):
    """A detached worktree of the prev snapshot imports its OWN
    registry; afterwards HEAD's modules are restored untouched and both
    registries stay independently callable."""
    import bench

    prev_q, wt = bench._setup_prev_queries(str(tmp_path))
    try:
        assert prev_q is not None and wt is not None
        assert "q01_pricing_summary" in prev_q
        # HEAD modules restored: the registry importable again and is
        # NOT the prev dict's function objects
        import mysql2pg_spark.plans as head_plans

        assert sys.modules["mysql2pg_spark.plans"] is head_plans
        head_fn = head_plans.QUERIES["q01_pricing_summary"]
        prev_fn = prev_q["q01_pricing_summary"]
        assert head_fn is not prev_fn
        assert os.path.commonpath(
            [prev_fn.__code__.co_filename, wt]
        ) == wt
        assert os.path.commonpath(
            [head_fn.__code__.co_filename, REPO]
        ) == REPO
    finally:
        bench._teardown_prev_worktree(wt)
    assert not os.path.exists(wt)


def test_vs_prev_disabled_by_env(tmp_path, monkeypatch):
    import bench

    monkeypatch.setenv("SPARK_GRAFT_VS_PREV", "0")
    q, wt = bench._setup_prev_queries(str(tmp_path))
    assert q is None and wt is None
