"""bench.py driver contract: ONE parseable JSON line on stdout with
the fields the round driver records — guarded so bench edits can't
silently break the per-round BENCH_r{N}.json artifact."""

import json
import os
import subprocess

import pytest


@pytest.mark.slow
def test_bench_emits_one_json_line_with_required_fields():
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_ITERS="1",
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
    )
    r = subprocess.run(
        ["python", "bench.py"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        env=env,
        timeout=420,
    )
    assert r.returncode == 0, r.stderr[-800:]
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, r.stdout[-500:]
    d = json.loads(lines[0])
    assert d["metric"] == "headline_queries_total_wall"
    assert d["unit"] == "sec" and d["value"] > 0
    assert len(d["queries"]) == 10
    assert set(d["spread"]) == set(d["queries"])
    for q, t in d["queries"].items():
        lo, hi = d["spread"][q]
        assert lo <= t <= hi
    assert d["calibration_sec"] > 0 and d["calibration_scan_sec"] > 0
    # normalized headline: at the sf0.1 tier the drift is the geomean
    # of both probes vs their recorded idle values; at any other tier
    # (this test runs sf0.001) the scan probe measures data size, not
    # machine state, so bench.py falls back to the CPU probe alone
    import bench

    drift = bench.drift_ratio(
        d["calibration_sec"], d["calibration_scan_sec"], d["sf"]
    )
    assert d["machine_drift_ratio"] > 0
    assert abs(d["machine_drift_ratio"] - drift) < 0.01
    assert d["value_normalized"] > 0
    assert abs(d["value_normalized"] - d["value"] / drift) < 0.05
    assert d["sf"] == 0.001
    # r17 scaling-legibility contract: the JSON names the effective
    # parallelism (proof SPARK_GRAFT_CPUS reached the engine) and a
    # per-query job/stage/task census (so a flat low-core/high-core
    # ratio is distinguishable from an ignored env var)
    par = d["parallelism"]
    assert par["default_parallelism"] == par["cpus_env"]
    assert f"local[{par['cpus_env']}]" == par["master"]
    assert par["shuffle_partitions"] > 0
    for q in d["queries"]:
        st = par["per_query"][q]
        assert st["jobs"] >= 1 and st["stages"] >= 1
        assert st["tasks"] >= st["max_stage_tasks"] >= 1


def test_scaling_md_regeneration_preserves_manual_sections(tmp_path):
    """bench_scaling regenerates SCALING.md's tables but must never
    truncate the hand-recorded sections below the MANUAL-SECTIONS
    marker (they hold one-off A/Bs the script can't reproduce)."""
    import bench_scaling as bs

    p = tmp_path / "SCALING.md"
    p.write_text(
        "# old tables\nstale row\n"
        f"{bs.MANUAL_MARKER} ... -->\n\n## Hand-recorded A/B\nkept row\n"
    )
    bs.write_scaling_md(["# new tables", "fresh row"], str(p))
    out = p.read_text()
    assert "fresh row" in out and "stale row" not in out
    assert "## Hand-recorded A/B" in out and "kept row" in out
    # idempotent: a second regeneration keeps exactly one manual tail
    bs.write_scaling_md(["# newer"], str(p))
    assert p.read_text().count(bs.MANUAL_MARKER) == 1
    # no marker -> plain overwrite, no crash
    q = tmp_path / "fresh.md"
    bs.write_scaling_md(["# only tables"], str(q))
    assert q.read_text() == "# only tables"
    # and the real SCALING.md actually carries the marker
    import os
    with open(os.path.join(os.path.dirname(bs.__file__), "SCALING.md")) as f:
        assert bs.MANUAL_MARKER in f.read()


def test_paired_cycles_interleaves_and_alternates():
    """Round-12 protocol pin: the Spark-vs-DuckDB scaling bench runs
    PAIRED cycles (both arms back-to-back per cycle, order alternated)
    — the property that makes the graded ratio load-immune.  Stub
    runners record global call order; the schedule must be
    s...d...|d...s...|s...d... with full query sets per arm, and the
    per-cycle ratios/median/spread must be computed per cycle, not
    from pooled totals."""
    import bench_scaling as bs

    calls = []

    # spark arm: 2.0 s/query on even cycles, 4.0 on odd (a load swing
    # that hits BOTH arms of a cycle -> ratios must stay constant)
    def run_s(name):
        calls.append(("s", name))
        return 2.0 if (len([c for c in calls if c[0] == "s"]) - 1) // 2 % 2 == 0 else 4.0

    def run_d(name):
        calls.append(("d", name))
        return 1.0 if (len([c for c in calls if c[0] == "d"]) - 1) // 2 % 2 == 0 else 2.0

    out = bs._paired_cycles(3, ["q1", "q2"], run_s, run_d)
    tags = [t for t, _ in calls]
    # cycle 0: s s d d ; cycle 1: d d s s ; cycle 2: s s d d
    assert tags == ["s", "s", "d", "d", "d", "d", "s", "s", "s", "s", "d", "d"]
    names = [n for _, n in calls]
    assert names == ["q1", "q2"] * 6
    # the load swing doubled both arms together -> every cycle ratio 2.0
    assert out["cycle_ratios"] == [2.0, 2.0, 2.0]
    assert out["ratio_median"] == 2.0
    assert out["ratio_spread"] == [2.0, 2.0]
    assert set(out["spark"]) == {"q1", "q2"}
    assert out["spark"]["q1"] in (2.0, 4.0)  # median of [2,4,2] -> 2
    assert out["spark"]["q1"] == 2.0 and out["duckdb"]["q1"] == 1.0


def test_drift_ratio_both_branches():
    """Unit-pin BOTH normalization branches: the sf0.1 geomean of the
    two probe ratios, and the CPU-only fallback everywhere else."""
    import bench

    geo = bench.drift_ratio(0.56, 0.50, 0.1)
    assert geo == ((0.56 / bench.CALIBRATION_IDLE_SEC)
                   * (0.50 / bench.CALIBRATION_SCAN_IDLE_SEC)) ** 0.5
    assert geo == ((2.0) * (2.0)) ** 0.5  # 2x both probes -> 2x drift
    cpu_only = bench.drift_ratio(0.56, 99.0, 0.001)
    assert cpu_only == 0.56 / bench.CALIBRATION_IDLE_SEC == 2.0
    # idle machine at the recorded constants -> ratio exactly 1
    assert bench.drift_ratio(
        bench.CALIBRATION_IDLE_SEC, bench.CALIBRATION_SCAN_IDLE_SEC, 0.1
    ) == 1.0
