"""Convert a bench_clickbench.py / bench_tsbs.py raw JSON line into the
committed artifact shape (the reference's benchmark.sh per-query
[min, mean] recording: date/machine/tries/result/queries_min/queries_mean).

Usage:
    python bench_clickbench.py > raw.json
    python scripts/bench_artifact.py raw.json clickbench 2026-08-15 > BENCH_CLICKBENCH.json
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    raw_path, kind, date = sys.argv[1], sys.argv[2], sys.argv[3]
    with open(raw_path) as f:
        line = [ln for ln in f if ln.strip().startswith("{")][-1]
    raw = json.loads(line)
    names = list(raw["queries"])
    result = raw["result"]
    art = {
        "date": date,
        "machine": "local[32] single-JVM, 128 GiB",
        "cluster_size": 1,
        "tags": ["PySpark", "time-series"],
        "dataset": (
            f"hits-synthetic-{raw.get('rows', 0) // 1_000_000}M"
            if kind == "clickbench"
            else f"events-sf{raw.get('sf', '?')}-iot{len(names)}"
        ),
        "load_time": raw.get("load_time", 0.0),
        "tries": len(result[0]) if result else 0,
        "result": result,
        "queries_min": {n: round(min(r), 4) for n, r in zip(names, result)},
        "queries_mean": {
            n: round(sum(r) / len(r), 4) for n, r in zip(names, result)
        },
        "total_min_wall": round(sum(min(r) for r in result), 4),
        "rc": 0,
    }
    # host-speed calibration (cnosdb_spark/calibration.py): totals as a
    # ratio to a fixed CPU-bound query compare across measurement windows
    if raw.get("calibration_sec"):
        art["calibration_sec"] = raw["calibration_sec"]
        art["total_over_calibration"] = round(
            art["total_min_wall"] / raw["calibration_sec"], 3
        )
    if kind == "clickbench":
        art["rows"] = raw.get("rows")
    else:
        art["sf"] = raw.get("sf")
    art["n_queries"] = len(names)
    print(json.dumps(art))
    return 0


if __name__ == "__main__":
    sys.exit(main())
