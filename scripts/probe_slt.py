"""Probe uncovered reference slt files and report per-file pass rates.

Usage: python scripts/probe_slt.py [file.slt ...]   (relative to CASES)
With no args, probes every file not yet in tests/test_slt_parity.py.
"""
from __future__ import annotations

import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CASES = "/root/reference/query_server/sqllogicaltests/cases"


def main() -> None:
    from cnosdb_spark.engine import Engine
    from cnosdb_spark.session import get_spark
    from cnosdb_spark.sql.slt import run_slt

    if len(sys.argv) > 1:
        targets = sys.argv[1:]
    else:
        src = open("tests/test_slt_parity.py").read()
        covered = set(re.findall(r'"([^"]+\.slt)"', src))
        targets = []
        for root, _, files in os.walk(CASES):
            for f in sorted(files):
                if f.endswith(".slt"):
                    rel = os.path.relpath(os.path.join(root, f), CASES)
                    if rel not in covered:
                        targets.append(rel)
        targets.sort()

    spark = get_spark()
    results = []
    for rel in targets:
        eng = Engine(spark, tempfile.mkdtemp(prefix="sltprobe_"))
        try:
            res = run_slt(eng, os.path.join(CASES, rel))
            results.append((rel, res.passed, res.total, res.failures))
        except Exception as exc:  # noqa: BLE001
            results.append((rel, -1, -1, [f"RUNNER CRASH: {exc}"]))
    print("\n==== PROBE RESULTS ====")
    for rel, p, t, fails in sorted(results, key=lambda r: (r[1] / r[2]) if r[2] > 0 else -1):
        rate = f"{p}/{t} = {p/t:.2f}" if t > 0 else "CRASH"
        print(f"{rel}: {rate}")
        for f in fails[:4]:
            print(f"    {f}")


if __name__ == "__main__":
    main()
