"""bench.py driver contract: ONE parseable JSON line on stdout with
the fields the round driver records — guarded so bench edits can't
silently break the per-round BENCH_r{N}.json artifact."""

import json
import os
import subprocess


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
    # normalized headline: raw total divided by the geomean of the two
    # probes' drift ratios vs their recorded idle values
    import bench

    drift = (
        (d["calibration_sec"] / bench.CALIBRATION_IDLE_SEC)
        * (d["calibration_scan_sec"] / bench.CALIBRATION_SCAN_IDLE_SEC)
    ) ** 0.5
    assert d["machine_drift_ratio"] > 0
    assert abs(d["machine_drift_ratio"] - drift) < 0.01
    assert d["value_normalized"] > 0
    assert abs(d["value_normalized"] - d["value"] / drift) < 0.05
    assert d["sf"] == 0.001
