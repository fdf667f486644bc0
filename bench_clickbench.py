#!/usr/bin/env python
"""ClickBench benchmark — the full 43-query set from the reference's
``benchmark/hits/sql/queries.sql`` (BASELINE.md §3 item 1), run verbatim
(modulo Spark-SQL dialect: ``to_timestamp_seconds`` → ``timestamp_seconds``,
``"EventDate"::INT::DATE`` → ``date_add('1970-01-01', EventDate)``) over a
synthetic hits-like parquet table.

The table is generated entirely distributed (``spark.range`` + hash-derived
columns — no driver-side data generation, so the same generator would work
at 100 TB) with zipfian UserID/SearchPhrase skew per FIXTURES.md §9 and the
exact column set the 43 queries touch. Point-filter constants
(CounterID=62, the 2013-07 EventDate window, URLHash/RefererHash literals,
UserID=435090932899640449) are seeded into the data so the selective
queries return non-empty results like the real ClickBench.

Prints ONE JSON line like bench.py:
{"metric": "clickbench_total_wall", "value": N, "unit": "sec",
 "queries": {"q00": sec, ...}, "rows": N_ROWS, "load_time": sec}
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
HITS_PATH = os.environ.get("HITS_PATH", f"/tmp/hits_cb_{N_ROWS}")

PHRASES = [
    "", "", "", "", "", "", "",  # most hits carry no search phrase
    "spark sql engine", "time series database", "parquet pushdown",
    "google maps", "weather tomorrow", "python pandas", "news today",
    "distributed join", "window functions", "how to cook rice",
]

TITLES = [
    "", "Welcome", "Google Search Results", "Home - Example", "News",
    "Dashboard", "Sign in", "Google Maps", "Checkout", "Profile",
]

# 2013-07-01 .. 2013-08-10 as epoch days: ClickBench's selective date window
DAY0 = 15887  # 2013-07-01
N_DAYS = 41


def generate(spark) -> None:
    if os.path.exists(os.path.join(HITS_PATH, "_SUCCESS")):
        return
    h = lambda seed: F.abs(F.xxhash64(F.col("id"), F.lit(seed)))  # noqa: E731
    df = (
        spark.range(N_ROWS)
        .withColumn("WatchID", F.xxhash64(F.col("id"), F.lit(99)))
        # zipf-ish skew: cube a uniform to concentrate mass at small ids
        .withColumn("UserID", (F.pow(h(1) % 1000 / 1000.0, 3) * 100000).cast("long"))
        # seed the exact point-lookup constant (~1 row per 500k)
        .withColumn(
            "UserID",
            F.when(h(21) % 500000 == 0, F.lit(435090932899640449)).otherwise(F.col("UserID")),
        )
        .withColumn("AdvEngineID", F.when(h(2) % 100 < 5, (h(2) % 18) + 1).otherwise(0).cast("int"))
        .withColumn("RegionID", (h(3) % 5000).cast("int"))
        .withColumn("ResolutionWidth", (F.lit(800) + (h(4) % 16) * 80).cast("int"))
        .withColumn(
            "SearchPhrase",
            F.element_at(F.array(*[F.lit(p) for p in PHRASES]), (h(5) % len(PHRASES) + 1).cast("int")),
        )
        .withColumn(
            "Title",
            F.element_at(F.array(*[F.lit(t) for t in TITLES]), (h(15) % len(TITLES) + 1).cast("int")),
        )
        .withColumn(
            "MobilePhoneModel",
            F.when(h(6) % 10 < 3, F.concat(F.lit("model-"), (h(6) % 50).cast("string"))).otherwise(F.lit("")),
        )
        .withColumn("MobilePhone", (h(16) % 8).cast("int"))
        .withColumn("SearchEngineID", (h(7) % 4).cast("int"))
        # EventTime: bigint epoch seconds inside the EventDate day (reference
        # stores seconds and queries via to_timestamp_seconds)
        .withColumn("EventDate", (F.lit(DAY0) + (h(8) % N_DAYS)).cast("int"))
        .withColumn(
            "EventTime",
            (F.col("EventDate").cast("long") * 86400 + (h(18) % 86400)).cast("long"),
        )
        .withColumn("URL", F.concat(F.lit("http://example.com/page/"), (F.pow(h(9) % 1000 / 1000.0, 2) * 100000).cast("long").cast("string")))
        .withColumn(
            "URL",
            F.when(h(22) % 50 == 0, F.concat(F.lit("http://google.com/search?q="), (h(9) % 1000).cast("string"))).otherwise(F.col("URL")),
        )
        .withColumn(
            "Referer",
            F.when(h(10) % 3 == 0, F.lit(""))
            .when(h(10) % 3 == 1, F.concat(F.lit("http://www.referrersite.com/path/"), (h(10) % 1000).cast("string")))
            .otherwise(F.concat(F.lit("https://other.org/"), (h(10) % 100).cast("string"))),
        )
        .withColumn("CounterID", F.when(h(11) % 20 == 0, 62).otherwise((h(11) % 2000).cast("int")).cast("int"))
        .withColumn("ClientIP", (h(12) % (1 << 31)).cast("long"))
        .withColumn("IsRefresh", (h(13) % 10 == 0).cast("int"))
        .withColumn("DontCountHits", (h(14) % 20 == 0).cast("int"))
        .withColumn("IsLink", (h(17) % 4 == 0).cast("int"))
        .withColumn("IsDownload", (h(19) % 50 == 0).cast("int"))
        .withColumn("TraficSourceID", ((h(20) % 10).cast("int") - 1).cast("int"))
        .withColumn("URLHash", F.when(h(23) % 5000 == 0, F.lit(2868770270353813622)).otherwise(F.xxhash64(F.col("URL"))))
        .withColumn("RefererHash", F.when(h(24) % 1000 == 0, F.lit(3594120000172545465)).otherwise(F.xxhash64(F.col("Referer"))))
        .withColumn("WindowClientWidth", (F.lit(320) + (h(25) % 32) * 50).cast("int"))
        .withColumn("WindowClientHeight", (F.lit(240) + (h(26) % 32) * 40).cast("int"))
        .drop("id")
    )
    df.write.mode("overwrite").parquet(HITS_PATH)


# The 43 queries of benchmark/hits/sql/queries.sql, in file order (q33 is the
# commented-out WatchID/ClientIP full-table group-by — included, as in
# upstream ClickBench). Dialect changes only:
#   to_timestamp_seconds(x)      -> timestamp_seconds(x)
#   "EventDate"::INT::DATE       -> date_add('1970-01-01', EventDate)
#   REGEXP_REPLACE(.., '\1')     -> regexp_replace(.., '$1')
EVD = "date_add('1970-01-01', EventDate)"
SQLS = [
    "SELECT COUNT(*) FROM hits",
    "SELECT COUNT(*) FROM hits WHERE AdvEngineID <> 0",
    "SELECT SUM(AdvEngineID), COUNT(*), AVG(ResolutionWidth) FROM hits",
    "SELECT AVG(UserID) FROM hits",
    "SELECT COUNT(DISTINCT UserID) FROM hits",
    "SELECT COUNT(DISTINCT SearchPhrase) FROM hits",
    f"SELECT MIN({EVD}), MAX({EVD}) FROM hits",
    "SELECT AdvEngineID, COUNT(*) FROM hits WHERE AdvEngineID <> 0 GROUP BY AdvEngineID ORDER BY COUNT(*) DESC",
    "SELECT RegionID, COUNT(DISTINCT UserID) AS u FROM hits GROUP BY RegionID ORDER BY u DESC LIMIT 10",
    "SELECT RegionID, SUM(AdvEngineID), COUNT(*) AS c, AVG(ResolutionWidth), COUNT(DISTINCT UserID) FROM hits GROUP BY RegionID ORDER BY c DESC LIMIT 10",
    "SELECT MobilePhoneModel, COUNT(DISTINCT UserID) AS u FROM hits WHERE MobilePhoneModel <> '' GROUP BY MobilePhoneModel ORDER BY u DESC LIMIT 10",
    "SELECT MobilePhone, MobilePhoneModel, COUNT(DISTINCT UserID) AS u FROM hits WHERE MobilePhoneModel <> '' GROUP BY MobilePhone, MobilePhoneModel ORDER BY u DESC LIMIT 10",
    "SELECT SearchPhrase, COUNT(*) AS c FROM hits WHERE SearchPhrase <> '' GROUP BY SearchPhrase ORDER BY c DESC LIMIT 10",
    "SELECT SearchPhrase, COUNT(DISTINCT UserID) AS u FROM hits WHERE SearchPhrase <> '' GROUP BY SearchPhrase ORDER BY u DESC LIMIT 10",
    "SELECT SearchEngineID, SearchPhrase, COUNT(*) AS c FROM hits WHERE SearchPhrase <> '' GROUP BY SearchEngineID, SearchPhrase ORDER BY c DESC LIMIT 10",
    "SELECT UserID, COUNT(*) FROM hits GROUP BY UserID ORDER BY COUNT(*) DESC LIMIT 10",
    "SELECT UserID, SearchPhrase, COUNT(*) FROM hits GROUP BY UserID, SearchPhrase ORDER BY COUNT(*) DESC LIMIT 10",
    "SELECT UserID, SearchPhrase, COUNT(*) FROM hits GROUP BY UserID, SearchPhrase LIMIT 10",
    "SELECT UserID, extract(minute FROM timestamp_seconds(EventTime)) AS m, SearchPhrase, COUNT(*) FROM hits GROUP BY UserID, m, SearchPhrase ORDER BY COUNT(*) DESC LIMIT 10",
    "SELECT UserID FROM hits WHERE UserID = 435090932899640449",
    "SELECT COUNT(*) FROM hits WHERE URL LIKE '%google%'",
    "SELECT SearchPhrase, MIN(URL), COUNT(*) AS c FROM hits WHERE URL LIKE '%google%' AND SearchPhrase <> '' GROUP BY SearchPhrase ORDER BY c DESC LIMIT 10",
    "SELECT SearchPhrase, MIN(URL), MIN(Title), COUNT(*) AS c, COUNT(DISTINCT UserID) FROM hits WHERE Title LIKE '%Google%' AND URL NOT LIKE '%.google.%' AND SearchPhrase <> '' GROUP BY SearchPhrase ORDER BY c DESC LIMIT 10",
    "SELECT * FROM hits WHERE URL LIKE '%google%' ORDER BY timestamp_seconds(EventTime) LIMIT 10",
    "SELECT SearchPhrase FROM hits WHERE SearchPhrase <> '' ORDER BY timestamp_seconds(EventTime) LIMIT 10",
    "SELECT SearchPhrase FROM hits WHERE SearchPhrase <> '' ORDER BY SearchPhrase LIMIT 10",
    "SELECT SearchPhrase FROM hits WHERE SearchPhrase <> '' ORDER BY timestamp_seconds(EventTime), SearchPhrase LIMIT 10",
    "SELECT CounterID, AVG(length(URL)) AS l, COUNT(*) AS c FROM hits WHERE URL <> '' GROUP BY CounterID HAVING COUNT(*) > 500 ORDER BY l DESC LIMIT 25",
    r"SELECT regexp_replace(Referer, '^https?://(?:www\.)?([^/]+)/.*$', '$1') AS k, AVG(length(Referer)) AS l, COUNT(*) AS c, MIN(Referer) FROM hits WHERE Referer <> '' GROUP BY k HAVING COUNT(*) > 500 ORDER BY l DESC LIMIT 25",
    "SELECT " + ", ".join(f"SUM(ResolutionWidth + {i})" for i in range(90)).replace("SUM(ResolutionWidth + 0)", "SUM(ResolutionWidth)") + " FROM hits",
    "SELECT SearchEngineID, ClientIP, COUNT(*) AS c, SUM(IsRefresh), AVG(ResolutionWidth) FROM hits WHERE SearchPhrase <> '' GROUP BY SearchEngineID, ClientIP ORDER BY c DESC LIMIT 10",
    "SELECT WatchID, ClientIP, COUNT(*) AS c, SUM(IsRefresh), AVG(ResolutionWidth) FROM hits WHERE SearchPhrase <> '' GROUP BY WatchID, ClientIP ORDER BY c DESC LIMIT 10",
    "SELECT WatchID, ClientIP, COUNT(*) AS c, SUM(IsRefresh), AVG(ResolutionWidth) FROM hits GROUP BY WatchID, ClientIP ORDER BY c DESC LIMIT 10",
    "SELECT URL, COUNT(*) AS c FROM hits GROUP BY URL ORDER BY c DESC LIMIT 10",
    "SELECT 1, URL, COUNT(*) AS c FROM hits GROUP BY 1, URL ORDER BY c DESC LIMIT 10",
    "SELECT ClientIP, ClientIP - 1, ClientIP - 2, ClientIP - 3, COUNT(*) AS c FROM hits GROUP BY ClientIP, ClientIP - 1, ClientIP - 2, ClientIP - 3 ORDER BY c DESC LIMIT 10",
    f"SELECT URL, COUNT(*) AS PageViews FROM hits WHERE CounterID = 62 AND {EVD} >= '2013-07-01' AND {EVD} <= '2013-07-31' AND DontCountHits = 0 AND IsRefresh = 0 AND URL <> '' GROUP BY URL ORDER BY PageViews DESC LIMIT 10",
    f"SELECT Title, COUNT(*) AS PageViews FROM hits WHERE CounterID = 62 AND {EVD} >= '2013-07-01' AND {EVD} <= '2013-07-31' AND DontCountHits = 0 AND IsRefresh = 0 AND Title <> '' GROUP BY Title ORDER BY PageViews DESC LIMIT 10",
    f"SELECT URL, COUNT(*) AS PageViews FROM hits WHERE CounterID = 62 AND {EVD} >= '2013-07-01' AND {EVD} <= '2013-07-31' AND IsRefresh = 0 AND IsLink <> 0 AND IsDownload = 0 GROUP BY URL ORDER BY PageViews DESC LIMIT 10 OFFSET 1000",
    f"SELECT TraficSourceID, SearchEngineID, AdvEngineID, CASE WHEN (SearchEngineID = 0 AND AdvEngineID = 0) THEN Referer ELSE '' END AS Src, URL AS Dst, COUNT(*) AS PageViews FROM hits WHERE CounterID = 62 AND {EVD} >= '2013-07-01' AND {EVD} <= '2013-07-31' AND IsRefresh = 0 GROUP BY TraficSourceID, SearchEngineID, AdvEngineID, Src, Dst ORDER BY PageViews DESC LIMIT 10 OFFSET 1000",
    f"SELECT URLHash, {EVD}, COUNT(*) AS PageViews FROM hits WHERE CounterID = 62 AND {EVD} >= '2013-07-01' AND {EVD} <= '2013-07-31' AND IsRefresh = 0 AND TraficSourceID IN (-1, 6) AND RefererHash = 3594120000172545465 GROUP BY URLHash, {EVD} ORDER BY PageViews DESC LIMIT 10 OFFSET 100",
    f"SELECT WindowClientWidth, WindowClientHeight, COUNT(*) AS PageViews FROM hits WHERE CounterID = 62 AND {EVD} >= '2013-07-01' AND {EVD} <= '2013-07-31' AND IsRefresh = 0 AND DontCountHits = 0 AND URLHash = 2868770270353813622 GROUP BY WindowClientWidth, WindowClientHeight ORDER BY PageViews DESC LIMIT 10 OFFSET 10000",
    f"SELECT DATE_TRUNC('minute', timestamp_seconds(EventTime)) AS M, COUNT(*) AS PageViews FROM hits WHERE CounterID = 62 AND {EVD} >= '2013-07-14' AND {EVD} <= '2013-07-15' AND IsRefresh = 0 AND DontCountHits = 0 GROUP BY DATE_TRUNC('minute', timestamp_seconds(EventTime)) ORDER BY M LIMIT 10 OFFSET 1000",
]
# HAVING COUNT(*) > 100000 in the reference assumes 100M rows; scaled to the
# synthetic row count (> 500 at 1M rows keeps the same ~1/2000 selectivity).

assert len(SQLS) == 43, len(SQLS)


def main() -> None:
    spark = get_spark(app_name="cnosdb_spark_clickbench")
    t0 = time.perf_counter()
    generate(spark)
    load_time = round(time.perf_counter() - t0, 2)
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up

    spark.read.parquet(HITS_PATH).createOrReplaceTempView("hits")
    # BENCH_TRIES>1 reproduces the reference's multi-try recording
    # (benchmark/hits/run_queries.sh TRIES loop; result = [[t1..tN], ...])
    tries = int(os.environ.get("BENCH_TRIES", "1"))
    result: list[list[float]] = [[] for _ in SQLS]
    for _ in range(tries):
        for i, sql in enumerate(SQLS):
            t = time.perf_counter()
            spark.sql(sql).write.format("noop").mode("overwrite").save()
            result[i].append(round(time.perf_counter() - t, 4))
    timings = {f"q{i:02d}": min(r) for i, r in enumerate(result)}
    from cnosdb_spark.calibration import run_calibration

    cal = run_calibration(spark)
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "clickbench_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "result": result,
                "rows": N_ROWS,
                "load_time": load_time,
                "calibration_sec": cal,
                "total_over_calibration": round(total / cal, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
