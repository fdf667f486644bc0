"""Host-speed calibration for benchmark artifacts.

Benchmark artifacts committed in one measurement window get compared
against re-measurements taken days later on a shared VM whose effective
CPU speed drifts (round 6: ClickBench re-measured +24% with ZERO
code change, uniform per-query profile — pure host drift).  A tiny
FIXED, data-independent, CPU-bound query run alongside each suite gives
every artifact a common denominator: suite totals expressed as a ratio
to the calibration time compare across windows, because host drift moves
numerator and denominator together.

The query is pure whole-stage-codegen arithmetic over ``spark.range`` —
no I/O, no shuffle, no data dependence — so its wall time tracks only
JVM/CPU throughput.
"""

from __future__ import annotations

import time

CALIBRATION_ROWS = 50_000_000
CALIBRATION_PARTITIONS = 32


def run_calibration(spark, tries: int = 3) -> float:
    """Min-of-``tries`` wall seconds of the fixed calibration query.

    Each hash is bounded with pmod BEFORE the sum: a raw
    ``sum(xxhash64(id))`` over 50M full-range longs overflows and ABORTS
    under Spark 4's default ANSI mode (max sum here is ~5e16, safely
    inside int64)."""
    best = float("inf")
    for _ in range(tries):
        t0 = time.perf_counter()
        spark.range(CALIBRATION_ROWS, numPartitions=CALIBRATION_PARTITIONS).selectExpr(
            "sum(pmod(xxhash64(id), 1000000007))", "sum(id % 1001)"
        ).collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)
