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

    prev_q, wt, err = bench._setup_prev_queries(str(tmp_path))
    try:
        assert err is None
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
    q, wt, err = bench._setup_prev_queries(str(tmp_path))
    assert q is None and wt is None and err is None


def test_setup_prev_surfaces_failure_as_error(tmp_path, monkeypatch):
    """A setup FAILURE (e.g. the baseline ref cannot be checked out)
    must come back as an error string — main() emits it as
    vs_prev_error; the A/B never silently disappears (ADVICE r9)."""
    import bench

    monkeypatch.setenv(
        "SPARK_GRAFT_PREV_REF", "no-such-ref-anywhere-xyz"
    )
    q, wt, err = bench._setup_prev_queries(str(tmp_path))
    assert q is None
    assert err is not None and "Error" in err


def test_resolve_prev_ref_skips_self_snapshot(tmp_path, monkeypatch):
    """The driver commits the CURRENT round's `end-of-round snapshot`
    right before running bench — the resolver must skip any snapshot
    commit whose tree equals HEAD's (an A/B against identical code is
    a useless self-comparison) and land on the PREVIOUS round's."""
    import bench

    clone = tmp_path / "clone"
    subprocess.run(
        ["git", "clone", "-q", "--no-hardlinks", REPO, str(clone)],
        check=True,
    )
    subprocess.run(
        ["git", "-C", str(clone), "-c", "user.email=t@t",
         "-c", "user.name=t", "commit", "-q", "--allow-empty",
         "-m", "round 99: end-of-round snapshot (simulated)"],
        check=True,
    )
    monkeypatch.delenv("SPARK_GRAFT_PREV_REF", raising=False)
    monkeypatch.setattr(bench, "REPO_DIR", str(clone))
    ref = bench._resolve_prev_ref()
    assert ref is not None
    subject = subprocess.run(
        ["git", "-C", str(clone), "log", "-1", "--format=%s", ref],
        capture_output=True, text=True,
    ).stdout.strip()
    # NOT the simulated same-tree snapshot: the previous round's marker
    assert "round 99" not in subject
    assert "end-of-round snapshot" in subject
