"""Pins scripts/bench_compare.py's comparison rules (round-9): raw
per-query gating under identical tries, tries-mismatch refusal, and the
calibration-as-classifier-only host-drift rule. Pure-python — no Spark."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

SCRIPT = str(Path(__file__).resolve().parents[1] / "scripts" / "bench_compare.py")


def _run(tmp_path, prev: dict, curr: dict):
    p, c = tmp_path / "p.json", tmp_path / "c.json"
    p.write_text(json.dumps(prev))
    c.write_text(json.dumps(curr))
    return subprocess.run(
        [sys.executable, SCRIPT, str(p), str(c)], capture_output=True, text=True
    )


def _art(times: dict, tries=3, cal=0.1):
    return {
        "queries_min": times,
        "tries": tries,
        "calibration_sec": cal,
        "total_min_wall": sum(times.values()),
    }


BASE = {f"q{i}": 1.0 for i in range(10)}


def test_clean_diff_exits_zero(tmp_path):
    r = _run(tmp_path, _art(BASE), _art(dict(BASE)))
    assert r.returncode == 0 and "OK:" in r.stdout


def test_tries_mismatch_refuses_to_gate(tmp_path):
    """min-of-1 vs min-of-3 reads ~2x slow from cold first evaluations —
    the compare must refuse (exit 2), not report fake regressions."""
    r = _run(tmp_path, _art(BASE, tries=3), _art({k: 2.0 for k in BASE}, tries=1))
    assert r.returncode == 2 and "TRIES MISMATCH" in r.stdout


def test_single_query_regression_gates(tmp_path):
    r = _run(tmp_path, _art(BASE), _art(dict(BASE, q3=2.0)))
    assert r.returncode == 1 and "REGRESSED q3" in r.stdout


def test_uniform_calibration_tracked_swing_is_drift(tmp_path):
    """Every query x1.5 AND the calibration probe x1.5 -> host drift:
    report and exit 0 with a re-measure advisory, no regression list."""
    r = _run(
        tmp_path,
        _art(BASE, cal=0.10),
        _art({k: 1.5 for k in BASE}, cal=0.15),
    )
    assert r.returncode == 0 and "HOST DRIFT" in r.stdout


def test_uniform_swing_without_calibration_motion_still_gates(tmp_path):
    """Every query x1.5 but the probe flat -> NOT drift (a real uniform
    slowdown, e.g. a session-conf regression): gate normally."""
    r = _run(
        tmp_path,
        _art(BASE, cal=0.10),
        _art({k: 1.5 for k in BASE}, cal=0.10),
    )
    assert r.returncode == 1


def test_timings_never_scaled_by_calibration(tmp_path):
    """Rule 2: a flat raw profile must stay clean even when the probe
    moved a lot (the probe tracks CPU, not scan/shuffle) — under the old
    scale-by-ratio behavior this case reported 10 fake regressions."""
    r = _run(
        tmp_path,
        _art(BASE, cal=0.10),
        _art(dict(BASE), cal=0.20),
    )
    assert r.returncode == 0 and "OK:" in r.stdout


def test_drift_does_not_excuse_missing_queries(tmp_path):
    """Host drift excuses timing swings, never coverage loss: a current
    run that silently dropped queries must exit 1 even when a uniform
    calibration-tracked swing co-occurs (round-10 ADVICE)."""
    curr = {f"q{i}": 1.5 for i in range(9)}  # q9 dropped
    r = _run(tmp_path, _art(BASE, cal=0.10), _art(curr, cal=0.15))
    assert r.returncode == 1
    assert "DRIFT" in r.stdout and "missing" in r.stdout
