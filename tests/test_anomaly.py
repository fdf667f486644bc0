"""Anomaly detectors (operators/anomaly.py), DuckDB-differential on the
events table plus planted-outlier semantics."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cnosdb_spark.operators import anomaly
from cnosdb_spark.session import read_table

from .conftest import SF_DIR
from .oracle import compare


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    yield con
    con.close()


def test_zscore_matches_duckdb(spark, duck):
    ev = read_table(spark, SF_DIR, "events")
    got = anomaly.zscore_anomalies(
        ev, "ts", "value", ["user_id"], lookback=20, threshold=3.0
    ).select("event_id", "zscore", "is_anomaly")
    want = duck.execute(
        """
        WITH w AS (
          SELECT event_id,
                 avg(value) OVER tw AS m,
                 stddev_samp(value) OVER tw AS s,
                 count(value) OVER tw AS n,
                 value
          FROM events
          WINDOW tw AS (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
        SELECT event_id,
               round(CASE WHEN n >= 5 AND s IS NOT NULL AND s > 0
                          THEN (value - m) / s END, 6) AS zscore,
               coalesce(abs(CASE WHEN n >= 5 AND s IS NOT NULL AND s > 0
                                 THEN (value - m) / s END) >= 3.0,
                        false) AS is_anomaly
        FROM w
        """
    ).df()
    errs = compare(got, want, "zscore_anomalies")
    assert not errs, "\n".join(errs)


def test_mad_matches_duckdb(spark, duck):
    ev = read_table(spark, SF_DIR, "events")
    got = anomaly.mad_anomalies(ev, "value", ["user_id"], threshold=3.5).select(
        "event_id", "mad_score", "is_anomaly"
    )
    want = duck.execute(
        """
        WITH med AS (
          SELECT user_id, quantile_cont(value, 0.5) AS m FROM events GROUP BY user_id),
        mad AS (
          SELECT e.user_id, quantile_cont(abs(e.value - med.m), 0.5) AS d
          FROM events e JOIN med USING (user_id) GROUP BY e.user_id)
        SELECT e.event_id,
               round(CASE WHEN mad.d > 0
                          THEN abs(e.value - med.m) / (1.4826 * mad.d) END, 6) AS mad_score,
               coalesce(CASE WHEN mad.d > 0
                          THEN abs(e.value - med.m) / (1.4826 * mad.d) END >= 3.5,
                        false) AS is_anomaly
        FROM events e JOIN med USING (user_id) JOIN mad USING (user_id)
        """
    ).df()
    errs = compare(got, want, "mad_anomalies")
    assert not errs, "\n".join(errs)


def test_planted_outlier_detected(spark):
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    rows = [(base + timedelta(minutes=i), "s0", 10.0 + (i % 3) * 0.1) for i in range(30)]
    rows[25] = (rows[25][0], "s0", 500.0)  # the spike
    df = spark.createDataFrame(rows, ["time", "tag", "value"])
    z = anomaly.zscore_anomalies(df, "time", "value", ["tag"]).filter("is_anomaly")
    got_z = [r["value"] for r in z.collect()]
    assert got_z == [500.0]
    m = anomaly.mad_anomalies(df, "value", ["tag"]).filter("is_anomaly")
    got_m = [r["value"] for r in m.collect()]
    assert got_m == [500.0]
    # the spike must not poison its successors (trailing-window exclusion
    # keeps later ordinary points below threshold — MAD is robust anyway)
    assert z.count() == 1 and m.count() == 1


def test_constant_series_no_flags(spark):
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(base + timedelta(minutes=i), "c", 7.0) for i in range(20)],
        ["time", "tag", "value"],
    )
    assert anomaly.zscore_anomalies(df, "time", "value", ["tag"]).filter("is_anomaly").count() == 0
    assert anomaly.mad_anomalies(df, "value", ["tag"]).filter("is_anomaly").count() == 0


def test_flag_uses_unrounded_score(spark):
    """A true score a hair below threshold must NOT flag even though it
    ROUNDS to the threshold (is_anomaly comes from the unrounded score)."""
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    # 10 trailing points alternating ±1 around 0: mean 0, stddev_samp ~1.054
    vals = [1.0, -1.0] * 5
    rows = [(base + timedelta(minutes=i), "s", v) for i, v in enumerate(vals)]
    # craft the 11th value so |z| is just below 3.0 but rounds to 3.0:
    # z = x / s with s = stddev_samp of the 10 trailing points
    import statistics

    s = statistics.stdev(vals)
    rows.append((base + timedelta(minutes=10), "s", (3.0 - 2e-7) * s))
    df = spark.createDataFrame(rows, ["time", "tag", "value"])
    out = anomaly.zscore_anomalies(
        df, "time", "value", ["tag"], lookback=10, threshold=3.0, min_points=5
    )
    last = out.orderBy("time").collect()[-1]
    assert last["zscore"] == 3.0  # rounds up to the threshold
    assert last["is_anomaly"] is False  # but the true score is below it


def test_zscore_single_shuffle_plan(spark):
    ev = read_table(spark, SF_DIR, "events")
    p = (
        anomaly.zscore_anomalies(ev, "ts", "value", ["user_id"])
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
    )
    assert p.count("Exchange hashpartitioning") == 1  # one series shuffle
