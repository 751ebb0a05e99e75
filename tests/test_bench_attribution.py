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
    ref, rnd = bench._resolve_prev_ref()
    assert ref is not None and isinstance(rnd, int)
    subject = subprocess.run(
        ["git", "-C", REPO, "log", "-1", "--format=%s", ref],
        capture_output=True, text=True,
    ).stdout.strip()
    assert subject.startswith(f"round {rnd}: ")
    assert (
        "end-of-round snapshot" in subject
        or "verdict/advice/correctness/bench" in subject
    )
    # env override wins (round unknown for an arbitrary ref)
    monkeypatch.setenv("SPARK_GRAFT_PREV_REF", "HEAD~1")
    assert bench._resolve_prev_ref() == ("HEAD~1", None)


def test_load_queries_from_prev_worktree_and_restore(tmp_path):
    """A detached worktree of the prev snapshot imports its OWN
    registry; afterwards HEAD's modules are restored untouched and both
    registries stay independently callable."""
    import bench

    prev_q, wt, err, prev_caches = bench._setup_prev_queries(str(tmp_path))
    try:
        assert err is None
        assert prev_q is not None and wt is not None
        assert "q01_pricing_summary" in prev_q
        # round 17: the prev checkout's stage-memo dicts ride along so
        # the A/B can clear BOTH sides before every timed rep
        assert isinstance(prev_caches, list) and len(prev_caches) >= 1
        assert all(isinstance(c, dict) for c in prev_caches)
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
    q, wt, err, caches = bench._setup_prev_queries(str(tmp_path))
    assert q is None and wt is None and err is None and caches == []


def test_setup_prev_surfaces_failure_as_error(tmp_path, monkeypatch):
    """A setup FAILURE (e.g. the baseline ref cannot be checked out)
    must come back as an error string — main() emits it as
    vs_prev_error; the A/B never silently disappears (ADVICE r9)."""
    import bench

    monkeypatch.setenv(
        "SPARK_GRAFT_PREV_REF", "no-such-ref-anywhere-xyz"
    )
    q, wt, err, caches = bench._setup_prev_queries(str(tmp_path))
    assert q is None
    assert caches == []
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
    ref, rnd = bench._resolve_prev_ref()
    assert ref is not None
    subject = subprocess.run(
        ["git", "-C", str(clone), "log", "-1", "--format=%s", ref],
        capture_output=True, text=True,
    ).stdout.strip()
    # NOT the simulated same-tree snapshot: the previous round's marker
    assert "round 99" not in subject and rnd != 99
    assert subject.startswith(f"round {rnd}: ")


def test_resolve_prev_ref_matches_both_boundary_formats(tmp_path):
    """Round 10's A/B silently measured against round EIGHT because a
    round that ends with no uncommitted work gets only a `round N:
    verdict/advice/correctness/bench` boundary (no `end-of-round
    snapshot`) and the resolver matched only the snapshot format. A
    synthetic history carrying BOTH formats must resolve to the newest
    differing-tree boundary of EITHER format, with its round number."""
    import bench

    repo = tmp_path / "hist"
    repo.mkdir()
    env_git = ["git", "-C", str(repo), "-c", "user.email=t@t",
               "-c", "user.name=t"]
    subprocess.run(["git", "-C", str(repo), "init", "-q"], check=True)

    def commit(subject: str, content: str) -> None:
        (repo / "f.txt").write_text(content)
        subprocess.run(env_git + ["add", "f.txt"], check=True)
        subprocess.run(
            env_git + ["commit", "-q", "-m", subject], check=True
        )

    commit("round 7: end-of-round snapshot (90 turns)", "seven")
    commit("round 8: verdict/advice/correctness/bench", "eight")
    commit("work commit", "nine-work")
    commit("round 9: verdict/advice/correctness/bench", "nine")
    # the driver's current-round snapshot: same tree as HEAD
    commit("head work", "head")
    subprocess.run(
        env_git + ["commit", "-q", "--allow-empty",
                   "-m", "round 10: end-of-round snapshot (1 turn)"],
        check=True,
    )
    old = bench.REPO_DIR
    bench.REPO_DIR = str(repo)
    try:
        os.environ.pop("SPARK_GRAFT_PREV_REF", None)
        ref, rnd = bench._resolve_prev_ref()
    finally:
        bench.REPO_DIR = old
    assert rnd == 9  # the verdict-format boundary, not round 7's
    subject = subprocess.run(
        ["git", "-C", str(repo), "log", "-1", "--format=%s", ref],
        capture_output=True, text=True,
    ).stdout.strip()
    assert subject == "round 9: verdict/advice/correctness/bench"


def test_vs_prev_verdicts_noise_vs_regression():
    """r11 ask #5: a flagged ratio (outside ±10%) is adjudicated by
    machine — noise when the median shift sits inside the wider of the
    canary quartile band and the per-side rep spreads, regression/
    improvement only when it exceeds BOTH."""
    import bench

    canary = [1.0, 1.0, 1.02, 1.25, 1.01, 1.0, 1.03, 1.0]  # p75/p25≈1.02
    out = bench.compute_vs_prev_verdicts(
        vs_prev={
            "q_flat": 1.05,        # inside ±10% — never flagged
            "q_noise": 1.19,       # flagged, but rep spread covers it
            "q_regress": 1.30,     # flagged, tight spreads: real
            "q_improve": 0.70,     # flagged on the fast side: real
        },
        spread={
            "q_noise": [1.0, 1.1, 1.25],     # max/min = 1.25 ≥ 1.19
            "q_regress": [1.29, 1.30, 1.31],
            "q_improve": [0.70, 0.70, 0.71],
        },
        prev_spread={
            "q_noise": [1.0, 1.0, 1.05],
            "q_regress": [1.0, 1.0, 1.01],
            "q_improve": [1.0, 1.0, 1.01],
        },
        canary_times=canary,
    )
    assert "q_flat" not in out
    assert out["q_noise"]["verdict"] == "noise"
    assert out["q_noise"]["noise_band"] >= 1.19
    assert out["q_regress"]["verdict"] == "regression"
    assert out["q_improve"]["verdict"] == "improvement"
    # the bands that backed each verdict ride the artifact
    assert set(out["q_regress"]["bands"]) == {"canary", "head", "prev"}


def test_vs_prev_verdicts_canary_band_is_quartile_based():
    """One slow canary rep must not inflate the band to where every
    flagged ratio reads as noise (r11's canary max/min hit 3.54 on a
    machine blip while p75/p25 stayed tight)."""
    import bench

    canary = [1.0] * 7 + [3.5]  # max/min = 3.5, p75/p25 = 1.0
    out = bench.compute_vs_prev_verdicts(
        vs_prev={"q": 1.30},
        spread={"q": [1.30, 1.30, 1.31]},
        prev_spread={"q": [1.0, 1.0, 1.01]},
        canary_times=canary,
    )
    assert out["q"]["verdict"] == "regression"
    assert out["q"]["bands"]["canary"] < 1.1
