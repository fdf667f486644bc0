#!/usr/bin/env python
"""ClickBench-shaped benchmark (BASELINE.md §3: reproduce the reference's
benchmark/hits/sql/queries.sql shapes on a synthetic hits-like table).

Generates a deterministic ~1M-row ``hits_mini`` table (zipfian UserID /
SearchPhrase per FIXTURES.md §9) entirely distributed (spark.range +
hash-derived columns — no driver-side data generation), then times 12
representative query shapes: counts, filtered counts, distincts, top-N
group-bys, LIKE scans, multi-key aggregations.

Prints ONE JSON line like bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from cnosdb_spark.session import get_spark

N_ROWS = int(os.environ.get("HITS_ROWS", "1000000"))
HITS_PATH = os.environ.get("HITS_PATH", f"/tmp/hits_mini_{N_ROWS}")

PHRASES = [
    "", "", "", "", "", "", "",  # most hits have no search phrase
    "spark sql engine", "time series database", "parquet pushdown",
    "google maps", "weather tomorrow", "python pandas", "news today",
    "distributed join", "window functions", "how to cook rice",
]


def generate(spark) -> None:
    if os.path.exists(os.path.join(HITS_PATH, "_SUCCESS")):
        return
    h = lambda seed: F.abs(F.xxhash64(F.col("id"), F.lit(seed)))  # noqa: E731
    df = (
        spark.range(N_ROWS)
        # zipf-ish skew: square a uniform to concentrate mass at small ids
        .withColumn("UserID", (F.pow(h(1) % 1000 / 1000.0, 3) * 100000).cast("long"))
        .withColumn("AdvEngineID", F.when(h(2) % 100 < 5, (h(2) % 18) + 1).otherwise(0).cast("int"))
        .withColumn("RegionID", (h(3) % 5000).cast("int"))
        .withColumn("ResolutionWidth", (F.lit(800) + (h(4) % 16) * 80).cast("int"))
        .withColumn(
            "SearchPhrase",
            F.element_at(
                F.array(*[F.lit(p) for p in PHRASES]), (h(5) % len(PHRASES) + 1).cast("int")
            ),
        )
        .withColumn("MobilePhoneModel", F.when(h(6) % 10 < 3, F.concat(F.lit("model-"), (h(6) % 50).cast("string"))).otherwise(F.lit("")))
        .withColumn("SearchEngineID", (h(7) % 4).cast("int"))
        .withColumn("EventTime", F.timestamp_seconds(F.lit(1700000000) + (h(8) % 2592000)))
        .withColumn("URL", F.concat(F.lit("http://example.com/"), (h(9) % 100000).cast("string")))
        .withColumn("CounterID", (h(10) % 2000).cast("int"))
        .drop("id")
    )
    df.write.mode("overwrite").parquet(HITS_PATH)


def queries(spark):
    hits = spark.read.parquet(HITS_PATH)
    hits.createOrReplaceTempView("hits")
    s = spark.sql
    return {
        # numbering follows benchmark/hits/sql/queries.sql shapes
        "q0_count": lambda: s("SELECT count(*) FROM hits"),
        "q1_filtered_count": lambda: s("SELECT count(*) FROM hits WHERE AdvEngineID <> 0"),
        "q2_sum_avg": lambda: s(
            "SELECT sum(AdvEngineID), count(*), avg(ResolutionWidth) FROM hits"
        ),
        "q4_distinct_users": lambda: s("SELECT count(DISTINCT UserID) FROM hits"),
        "q5_distinct_phrases": lambda: s("SELECT count(DISTINCT SearchPhrase) FROM hits"),
        "q7_adv_top": lambda: s(
            "SELECT AdvEngineID, count(*) c FROM hits WHERE AdvEngineID <> 0 "
            "GROUP BY AdvEngineID ORDER BY c DESC"
        ),
        "q8_region_users": lambda: s(
            "SELECT RegionID, count(DISTINCT UserID) u FROM hits "
            "GROUP BY RegionID ORDER BY u DESC LIMIT 10"
        ),
        "q12_phrase_top": lambda: s(
            "SELECT SearchPhrase, count(*) c FROM hits WHERE SearchPhrase <> '' "
            "GROUP BY SearchPhrase ORDER BY c DESC LIMIT 10"
        ),
        "q14_engine_phrase": lambda: s(
            "SELECT SearchEngineID, SearchPhrase, count(*) c FROM hits "
            "WHERE SearchPhrase <> '' GROUP BY 1, 2 ORDER BY c DESC LIMIT 10"
        ),
        "q19_like_scan": lambda: s(
            "SELECT count(*) FROM hits WHERE URL LIKE '%123%'"
        ),
        "q26_user_phrase_time": lambda: s(
            "SELECT UserID, SearchPhrase, min(EventTime) FROM hits "
            "WHERE SearchPhrase <> '' GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 10"
        ),
        "q32_wide_group": lambda: s(
            "SELECT CounterID, RegionID, count(*) c, avg(ResolutionWidth), "
            "count(DISTINCT UserID) FROM hits GROUP BY 1, 2 ORDER BY c DESC LIMIT 10"
        ),
    }


def main() -> None:
    spark = get_spark(app_name="cnosdb_spark_clickbench")
    t0 = time.perf_counter()
    generate(spark)
    load_time = round(time.perf_counter() - t0, 2)
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up

    timings = {}
    for name, fn in queries(spark).items():
        t = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t, 4)
    print(
        json.dumps(
            {
                "metric": "clickbench_mini_total_wall",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "rows": N_ROWS,
                "load_time": load_time,
            }
        )
    )


if __name__ == "__main__":
    main()
