"""Round-over-round compare for the ClickBench / TSBS artifacts.

Usage: python scripts/bench_compare.py PREV.json CURR.json [--threshold 0.25]

Diffs the per-query ``queries_min`` maps and the ``total_min_wall``,
prints a summary, and exits non-zero when any query regressed by more
than the threshold (so the per-round refresh can't silently absorb a
slowdown the way a plain overwrite would).  Sub-second timings on a
shared VM are noisy — the min-of-N methodology absorbs most of it, but
treat a single flagged query as "re-measure", not "bisect immediately".
"""

from __future__ import annotations

import argparse
import json
import sys


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

    # host-speed drift normalization: when BOTH artifacts carry a
    # calibration time (cnosdb_spark/calibration.py — a fixed CPU-bound
    # query measured in the same window), scale current timings by the
    # calibration ratio so a uniformly slower/faster host doesn't read as
    # a code regression/improvement (the round-6 ClickBench +24% episode)
    cal_p, cal_c = prev.get("calibration_sec"), curr.get("calibration_sec")
    scale = cal_p / cal_c if cal_p and cal_c else 1.0
    if scale != 1.0:
        print(
            f"calibration: {cal_p}s -> {cal_c}s "
            f"(host-drift scale applied to current: x{scale:.3f})"
        )

    regressed, improved = [], []
    for q in sorted(set(p) & set(c)):
        if p[q] <= 0:
            continue
        delta = c[q] * scale - p[q]
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
              " [drift-normalized — trust this one across windows]")
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
    if not regressed and not missing:
        print(f"OK: no per-query regression > {args.threshold:.0%} "
              f"(+{args.min_abs}s abs floor)")
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
