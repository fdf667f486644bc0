"""Round-over-round compare for the ClickBench / TSBS artifacts.

Usage: python scripts/bench_compare.py PREV.json CURR.json [--threshold 0.25]

Diffs the per-query ``queries_min`` maps and the ``total_min_wall``,
prints a summary, and exits non-zero when any query regressed by more
than the threshold (so the per-round refresh can't silently absorb a
slowdown the way a plain overwrite would).  Sub-second timings on a
shared VM are noisy — the min-of-N methodology absorbs most of it, but
treat a single flagged query as "re-measure", not "bisect immediately".

Comparison rules (round-8 lesson, baked in as code):

1. RAW timings are compared under IDENTICAL tries — the artifacts were
   taken min-of-3 while the harnesses default to 1 try, and a
   default-run comparison reads ~2x slow (cold first evaluations); a
   tries mismatch is flagged and the diff refuses to gate on it.
2. The CPU-bound calibration probe (cnosdb_spark/calibration.py) is
   NEVER multiplied into per-query timings: it tracks JVM/CPU
   throughput only, and scan/shuffle-bound suite queries do not follow
   it 1:1 (round-8: TSBS raw +48.6% was host drift the probe tracked;
   ClickBench's scan-bound tail was flat while the probe moved).
3. Calibration is used only to CLASSIFY a large uniform swing: when
   most queries move together by a large factor AND the calibration
   moved the same direction by a comparable factor, the diff is
   host drift — reported as such (exit 0 with a re-measure advisory),
   not as a per-query regression list.
"""

from __future__ import annotations

import argparse
import json
import sys


def classify_drift(
    p: dict, c: dict, cal_p: float | None, cal_c: float | None, threshold: float
) -> str | None:
    """Return a drift diagnosis string when the per-query swing profile is
    a large, UNIFORM, calibration-tracked move; else None.

    Uniform = at least 75% of shared queries moved in the median's
    direction; calibration-tracked = the probe moved the same direction
    and explains at least half the median swing (in log space)."""
    import math

    shared = [q for q in set(p) & set(c) if p[q] > 0 and c[q] > 0]
    if len(shared) < 4 or not (cal_p and cal_c):
        return None
    logs = sorted(math.log(c[q] / p[q]) for q in shared)
    med = logs[len(logs) // 2]
    if abs(med) <= math.log(1 + threshold):
        return None  # total swing is small: raw per-query gating stands
    same_dir = sum(1 for x in logs if x * med > 0)
    if same_dir / len(logs) < 0.75:
        return None  # non-uniform: real per-query changes are in there
    cal_log = math.log(cal_c / cal_p)
    if cal_log * med <= 0 or abs(cal_log) < abs(med) / 2:
        return None  # probe didn't move with it: not (only) host speed
    return (
        f"uniform swing: median x{math.exp(med):.2f} across "
        f"{same_dir}/{len(logs)} queries, calibration x{cal_c / cal_p:.2f} "
        "moved with it -> HOST DRIFT, re-measure in one window "
        "(raw per-query gating suppressed)"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("prev")
    ap.add_argument("curr")
    ap.add_argument("--threshold", type=float, default=0.25)
    ap.add_argument(
        "--min-abs", type=float, default=0.1,
        help="ignore regressions smaller than this many seconds (noise floor)",
    )
    args = ap.parse_args()

    prev = json.load(open(args.prev))
    curr = json.load(open(args.curr))
    p, c = prev.get("queries_min", {}), curr.get("queries_min", {})

    # rule 1: identical tries or the raw comparison is invalid
    tries_p, tries_c = prev.get("tries"), curr.get("tries")
    if tries_p is not None and tries_c is not None and tries_p != tries_c:
        print(
            f"TRIES MISMATCH: prev min-of-{tries_p} vs curr min-of-{tries_c} "
            "— raw timings are not comparable (a 1-try run reads ~2x slow "
            "from cold first evaluations). Re-run with BENCH_TRIES="
            f"{tries_p}."
        )
        return 2

    cal_p, cal_c = prev.get("calibration_sec"), curr.get("calibration_sec")
    if cal_p and cal_c:
        print(f"calibration: {cal_p}s -> {cal_c}s (classifier only — raw "
              "timings are never scaled by it; rule 2)")

    # rule 3: a large uniform calibration-tracked swing is host drift
    drift = classify_drift(p, c, cal_p, cal_c, args.threshold)

    regressed, improved = [], []
    for q in sorted(set(p) & set(c)):
        if p[q] <= 0:
            continue
        delta = c[q] - p[q]
        ratio = delta / p[q]
        if ratio > args.threshold and delta > args.min_abs:
            regressed.append((q, p[q], c[q], ratio))
        elif ratio < -args.threshold and -delta > args.min_abs:
            improved.append((q, p[q], c[q], ratio))

    tp, tc = prev.get("total_min_wall"), curr.get("total_min_wall")
    print(f"total_min_wall: {tp} -> {tc}"
          + (f" ({(tc - tp) / tp:+.1%})" if tp and tc else ""))
    rp, rc = prev.get("total_over_calibration"), curr.get("total_over_calibration")
    if rp and rc:
        print(f"total_over_calibration: {rp} -> {rc} ({(rc - rp) / rp:+.1%})"
              " [CPU-bound normalization — directional only for "
              "scan/shuffle-bound suites; rule 2]")
    for q, a, b, r in improved:
        print(f"  improved  {q}: {a:.3f} -> {b:.3f} ({r:+.1%})")
    for q, a, b, r in regressed:
        print(f"  REGRESSED {q}: {a:.3f} -> {b:.3f} ({r:+.1%})")
    missing = sorted(set(p) - set(c))
    added = sorted(set(c) - set(p))
    if missing:
        print(f"  queries missing from current: {missing}")
    if added:
        print(f"  queries new in current: {added}")
    if drift:
        print(f"DRIFT: {drift}")
        # drift excuses timing swings, never coverage loss: a run that
        # silently dropped queries is a regression regardless of the host.
        return 1 if missing else 0
    if not regressed and not missing:
        print(f"OK: no per-query regression > {args.threshold:.0%} "
              f"(+{args.min_abs}s abs floor)")
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
