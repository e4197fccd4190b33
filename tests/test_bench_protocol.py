"""bench.py paired-arm plumbing that can be verified WITHOUT starting
JVMs: the pinned-baseline worktree lifecycle and the drift math.  The
full two-arm protocol is exercised by actually running bench.py (the
driver does every round); these tests keep its scaffolding honest."""

import os
import subprocess

import bench


def test_baseline_commit_is_a_real_ancestor():
    # the paired arm only works if the pinned commit exists in history
    out = subprocess.run(
        ["git", "-C", bench.REPO, "cat-file", "-t", bench.BASELINE_COMMIT],
        capture_output=True, text=True,
    )
    assert out.returncode == 0 and out.stdout.strip() == "commit"


def test_ensure_baseline_worktree_creates_and_reuses():
    dst = bench.ensure_baseline_worktree()
    assert dst is not None and os.path.isdir(dst)
    head = subprocess.run(
        ["git", "-C", dst, "rev-parse", "HEAD"],
        capture_output=True, text=True,
    ).stdout.strip()
    assert head == bench.BASELINE_COMMIT
    # the snapshot carries the arm's import surface
    assert os.path.isfile(os.path.join(dst, "__spark_entry__.py"))
    assert os.path.isdir(os.path.join(dst, "zeek_duckdb_spark"))
    # second call reuses (no error, same path)
    assert bench.ensure_baseline_worktree() == dst
    # and it lives OUTSIDE the repo so repo-walking tools never see it
    assert not os.path.abspath(dst).startswith(
        os.path.abspath(bench.REPO) + os.sep
    )


def test_drift_ratio_definition_stable():
    # geomean of the two probes at sf0.1; CPU probe alone elsewhere —
    # the historical definition value_normalized comparisons rest on
    r = bench.drift_ratio(
        2 * bench.CALIBRATION_IDLE_SEC,
        0.5 * bench.CALIBRATION_SCAN_IDLE_SEC,
        0.1,
    )
    assert abs(r - 1.0) < 1e-9
    assert abs(bench.drift_ratio(0.56, 99.0, 0.01) - 2.0) < 1e-9
