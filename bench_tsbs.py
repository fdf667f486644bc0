#!/usr/bin/env python
"""TSBS-IoT benchmark — the 13 query *shapes* of the reference's TSBS suite
(BASELINE.md §3 item 2; `benchmark/tsbs/shell_env.sh:3-17` lists the 13
query types, `benchmark/tsbs/run_queries.sh` times them), expressed over the
driver's `events` stream table at $SPARK_GRAFT_SF_DIR.

The driver testdata has no trucks/diagnostics fixture, so the mapping is:
``user_id`` = vehicle, ``event_type`` = metric channel
(click→velocity, view→current_load, purchase→fuel_state, signup→activity,
error→breakdown), ``value`` = reading. Every query keeps the *plan shape*
of its TSBS counterpart (last-point-per-series via max_by, threshold filter
on latest reading, 10-minute `F.window` bucketing, per-day sessionization
via lag-gap cumulative sums) — that shape, not the fixture, is what the
benchmark measures.

Prints ONE JSON line like bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Window, functions as F

from cnosdb_spark.session import get_spark, read_table

VELOCITY, LOAD, FUEL, ACTIVITY, BREAKDOWN = (
    "click", "view", "purchase", "signup", "error",
)


def _events(spark, sf_dir):
    return read_table(spark, sf_dir, "events")


def q_last_loc(spark, sf_dir):
    """last-loc: latest reading per vehicle (max_by keeps one shuffle)."""
    return (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.max("ts").alias("ts"), F.max_by("value", "ts").alias("value"))
    )


def q_single_last_loc(spark, sf_dir):
    """single-last-loc: latest reading for one vehicle (pushdown point filter)."""
    return (
        _events(spark, sf_dir)
        .filter(F.col("user_id") == 42)
        .orderBy(F.desc("ts"))
        .limit(1)
        .select("user_id", "ts", "value")
    )


def q_low_fuel(spark, sf_dir):
    """low-fuel: vehicles whose latest fuel reading is under threshold."""
    return (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == FUEL)
        .groupBy("user_id")
        .agg(F.max_by("value", "ts").alias("fuel"), F.max("ts").alias("ts"))
        .filter(F.col("fuel") < 5.0)
    )


def q_high_load(spark, sf_dir):
    """high-load: vehicles whose latest load exceeds threshold."""
    return (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == LOAD)
        .groupBy("user_id")
        .agg(F.max_by("value", "ts").alias("load"))
        .filter(F.col("load") > 45.0)
    )


def q_stationary(spark, sf_dir):
    """stationary-trucks: avg velocity < 1 over 10-minute windows."""
    return (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == VELOCITY)
        .groupBy(F.window("ts", "10 minutes").alias("w"), F.col("user_id"))
        .agg(F.avg("value").alias("avg_v"))
        .filter(F.col("avg_v") < 1.0)
        .select(F.col("w.start").alias("w_start"), "user_id", "avg_v")
    )


def q_long_driving_sessions(spark, sf_dir):
    """long-driving-sessions: vehicles with ≥4 driving 10-min windows in any 4h span."""
    driving = (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == VELOCITY)
        .groupBy(F.window("ts", "10 minutes").alias("w"), F.col("user_id"))
        .agg(F.avg("value").alias("avg_v"))
        .filter(F.col("avg_v") > 1.0)
    )
    return (
        driving.groupBy(F.window(F.col("w.start"), "4 hours").alias("span"), F.col("user_id"))
        .agg(F.count("*").alias("n_driving"))
        .filter(F.col("n_driving") >= 4)
        .select(F.col("span.start").alias("span_start"), "user_id", "n_driving")
    )


def q_long_daily_sessions(spark, sf_dir):
    """long-daily-sessions: vehicles driving ≥10 windows in a day."""
    return (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == VELOCITY)
        .groupBy(F.window("ts", "10 minutes").alias("w"), F.col("user_id"))
        .agg(F.avg("value").alias("avg_v"))
        .filter(F.col("avg_v") > 1.0)
        .groupBy(F.to_date("w.start").alias("day"), F.col("user_id"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 10)
    )


def q_avg_vs_projected_fuel(spark, sf_dir):
    """avg-vs-projected-fuel-consumption: per-vehicle avg fuel vs fleet nominal."""
    ev = _events(spark, sf_dir).filter(F.col("event_type") == FUEL)
    per_vehicle = ev.groupBy("user_id").agg(F.avg("value").alias("avg_fuel"))
    nominal = per_vehicle.agg(F.avg("avg_fuel").alias("nominal"))
    return per_vehicle.crossJoin(F.broadcast(nominal)).select(
        "user_id",
        "avg_fuel",
        (F.col("avg_fuel") / F.col("nominal")).alias("vs_projected"),
    )


def q_avg_daily_driving_duration(spark, sf_dir):
    """avg-daily-driving-duration: driving hours/day per vehicle (10-min buckets / 6)."""
    return (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == VELOCITY)
        .groupBy(F.window("ts", "10 minutes").alias("w"), F.col("user_id"))
        .agg(F.avg("value").alias("avg_v"))
        .filter(F.col("avg_v") > 1.0)
        .groupBy(F.col("user_id"), F.to_date("w.start").alias("day"))
        .agg((F.count("*") / 6.0).alias("hours_driven"))
        .groupBy("user_id")
        .agg(F.avg("hours_driven").alias("avg_daily_hours"))
    )


def q_avg_daily_driving_session(spark, sf_dir):
    """avg-daily-driving-session: mean session length per vehicle-day
    (sessionize consecutive 10-min driving windows via lag-gap cumsum)."""
    win = (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == VELOCITY)
        .groupBy(F.window("ts", "10 minutes").alias("w"), F.col("user_id"))
        .agg(F.avg("value").alias("avg_v"))
        .filter(F.col("avg_v") > 1.0)
        .select("user_id", F.col("w.start").alias("ws"))
    )
    by_ts = Window.partitionBy("user_id").orderBy("ws")
    sess = (
        win.withColumn("prev", F.lag("ws").over(by_ts))
        .withColumn(
            "new_sess",
            (F.col("prev").isNull() | (F.col("ws").cast("long") - F.col("prev").cast("long") > 600)).cast("int"),
        )
        .withColumn("sess_id", F.sum("new_sess").over(by_ts))
    )
    return (
        sess.groupBy("user_id", F.to_date("ws").alias("day"), "sess_id")
        .agg(F.count("*").alias("windows"))
        .groupBy("user_id", "day")
        .agg((F.avg("windows") * 10.0).alias("avg_session_minutes"))
    )


def q_avg_load(spark, sf_dir):
    """avg-load: fleet-wide average load per vehicle class (user_id % 8)."""
    return (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == LOAD)
        .groupBy((F.col("user_id") % 8).alias("model"))
        .agg(F.avg("value").alias("avg_load"), F.count("*").alias("n"))
    )


def q_daily_activity(spark, sf_dir):
    """daily-activity: active hours per vehicle-day."""
    return (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == ACTIVITY)
        .groupBy(F.col("user_id"), F.to_date("ts").alias("day"))
        .agg(F.countDistinct(F.hour("ts")).alias("active_hours"))
    )


def q_breakdown_frequency(spark, sf_dir):
    """breakdown-frequency: error events per vehicle class per day."""
    return (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == BREAKDOWN)
        .groupBy((F.col("user_id") % 8).alias("model"), F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("breakdowns"))
    )


def q_avg_daily_driving_duration_sql(spark, sf_dir):
    """avg-daily-driving-duration via SQL (tsbench/avg_daily_driving_duration.slt
    shape: nested time_bucket aggregation in one statement)."""
    _events(spark, sf_dir).createOrReplaceTempView("readings")
    return spark.sql(
        """
        SELECT user_id, day, count(*) / 6.0 AS hours_driven
        FROM (
            SELECT user_id, to_date(window.start) AS day, avg(value) AS avg_v
            FROM readings
            WHERE event_type = 'click'
            GROUP BY user_id, window(ts, '10 minutes')
        ) buckets
        WHERE avg_v > 1.0
        GROUP BY user_id, day
        """
    )


QUERIES = {
    "last_loc": q_last_loc,
    "single_last_loc": q_single_last_loc,
    "low_fuel": q_low_fuel,
    "high_load": q_high_load,
    "stationary_trucks": q_stationary,
    "long_driving_sessions": q_long_driving_sessions,
    "long_daily_sessions": q_long_daily_sessions,
    "avg_vs_projected_fuel_consumption": q_avg_vs_projected_fuel,
    "avg_daily_driving_duration": q_avg_daily_driving_duration,
    "avg_daily_driving_session": q_avg_daily_driving_session,
    "avg_load": q_avg_load,
    "daily_activity": q_daily_activity,
    "breakdown_frequency": q_breakdown_frequency,
}
assert len(QUERIES) == 13


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="cnosdb_spark_tsbs")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up

    # BENCH_TRIES>1 mirrors the reference's multi-try recording
    # (benchmark/tsbs/run_queries.sh; result = [[t1..tN], ...])
    tries = int(os.environ.get("BENCH_TRIES", "1"))
    names = list(QUERIES)
    result: list[list[float]] = [[] for _ in names]
    for _ in range(tries):
        for i, name in enumerate(names):
            t = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            result[i].append(round(time.perf_counter() - t, 4))
    timings = {n: min(r) for n, r in zip(names, result)}
    from cnosdb_spark.calibration import run_calibration

    cal = run_calibration(spark)
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "tsbs_iot13_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "result": result,
                "sf": sf_dir,
                "calibration_sec": cal,
                "total_over_calibration": round(total / cal, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
