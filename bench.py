#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Results are materialized through the noop sink so the full plan executes
(a bare .count() would let Catalyst prune projections).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from cnosdb_spark.session import get_spark

HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "window_rank_ntile_dist",
    "agg_statistical",
    "time_window_tumbling",
    "time_window_sliding",
    "gapfill_locf_interpolate",
    "series_selector_aggs",
    "topk_bottom_values",
    "lww_dedup_merge",
    "dedup_exact",
    "minhash_lsh_pairs",
    "simhash_fingerprints",
    "embedding_cosine_topk",
    "text_quality_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    spark = get_spark(app_name="cnosdb_spark_bench")

    # JVM warm-up: codegen, the vectorized parquet reader, and the hash-
    # aggregate path — against the 5-row region table so no benchmark
    # data is cached (each measured query still reads its table cold)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from cnosdb_spark.session import read_table

    read_table(spark, sf_dir, "region").groupBy("r_regionkey").count().collect()

    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    # min-of-3 (the ClickBench/TSBS artifacts' methodology): this VM's
    # wall-clock drifts ±20-50% across a day (BENCH_SUITE_DIFF.md), and a
    # third try materially tightens the minimum for ~7s extra runtime
    tries = int(os.environ.get("SPARK_GRAFT_BENCH_TRIES", "3"))
    for name in HEADLINE:
        fn = qs[name]
        # min of N tries, the reference's own methodology
        # (benchmark/benchmark.sh records per-query [min, mean] over
        # tries) — local[32] wall times vary ±30% run-to-run from JIT/GC
        best = float("inf")
        for _ in range(tries):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    # host-speed calibration (cnosdb_spark/calibration.py): this VM's
    # effective CPU speed drifts 2-3x across (and within) measurement
    # windows, so cross-round comparisons of raw totals conflate code and
    # host — total_over_calibration is the drift-normalized number
    from cnosdb_spark.calibration import run_calibration

    cal = run_calibration(spark)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "tries": tries,
                "calibration_sec": cal,
                "total_over_calibration": round(total / cal, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
