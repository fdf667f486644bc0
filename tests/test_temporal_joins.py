"""As-of join and interval range join, oracle-checked against DuckDB's
native ASOF JOIN / inequality join on the same data."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from cnosdb_spark.operators.temporal import asof_join, interval_range_join

B = datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        (B + timedelta(seconds=s), k, float(i))
        for i, (s, k) in enumerate(
            [(3, "a"), (7, "a"), (12, "a"), (1, "b"), (9, "b"), (2, "c")]
        )
    ]
    return spark.createDataFrame(rows, ["time", "sym", "qty"])


@pytest.fixture(scope="module")
def quotes(spark):
    rows = [
        (B + timedelta(seconds=s), k, p)
        for s, k, p in [
            (0, "a", 10.0), (5, "a", 11.0), (7, "a", 12.0), (20, "a", 13.0),
            (4, "b", 20.0), (9, "b", 21.0),
            # no quotes at all for sym 'c'
        ]
    ]
    return spark.createDataFrame(rows, ["time", "sym", "price"])


def test_asof_join_matches_duckdb(spark, trades, quotes):
    import duckdb

    got = {
        (r["time"], r["sym"]): (r["price_right"], r["time_right"])
        for r in asof_join(trades, quotes, key="sym", value_cols=["price"]).collect()
    }
    con = duckdb.connect()
    con.register("trades", trades.toPandas())
    con.register("quotes", quotes.toPandas())
    want = {
        (t, s): (p, qt)
        for t, s, p, qt in con.execute(
            """
            SELECT t.time, t.sym, q.price, q.time
            FROM trades t ASOF LEFT JOIN quotes q
              ON t.sym = q.sym AND t.time >= q.time
            """
        ).fetchall()
    }
    assert len(got) == trades.count()
    assert got == want
    # spot semantics: trade (a, 7s) ties with quote (a, 7s) -> 12.0;
    # sym 'c' has no quotes -> NULLs
    assert got[(B + timedelta(seconds=7), "a")] == (12.0, B + timedelta(seconds=7))
    assert got[(B + timedelta(seconds=2), "c")] == (None, None)


def test_asof_join_tolerance(spark, trades, quotes):
    out = {
        (r["time"], r["sym"]): r["price_right"]
        for r in asof_join(
            trades, quotes, key="sym", value_cols=["price"], tolerance="2 seconds"
        ).collect()
    }
    # trade (a, 12s): last quote is (a, 7s) — 5s stale, outside 2s tolerance
    assert out[(B + timedelta(seconds=12), "a")] is None
    # trade (a, 7s): exact-time quote within tolerance
    assert out[(B + timedelta(seconds=7), "a")] == 12.0


def test_asof_join_plan_single_shuffle(spark, trades, quotes):
    plan = asof_join(trades, quotes, key="sym", value_cols=["price"])._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # union + one window: exactly one hash exchange on the key
    assert plan.count("hashpartitioning") <= 2  # exchange (+ AQE reuse)


def test_interval_range_join_matches_duckdb(spark):
    import duckdb

    points = spark.createDataFrame(
        [(B + timedelta(minutes=m), f"p{m}") for m in range(0, 600, 7)],
        ["time", "pid"],
    )
    intervals = spark.createDataFrame(
        [
            (B + timedelta(minutes=10), B + timedelta(minutes=95), "w1"),
            (B + timedelta(minutes=90), B + timedelta(minutes=91), "w2"),
            (B + timedelta(minutes=200), B + timedelta(minutes=420), "w3"),
            (B + timedelta(minutes=580), B + timedelta(minutes=581), "w4_empty"),
        ],
        ["start", "end", "wid"],
    )
    got = sorted(
        (r["pid"], r["wid"])
        for r in interval_range_join(points, intervals, bucket="1 hour").collect()
    )
    con = duckdb.connect()
    con.register("points", points.toPandas())
    con.register("intervals", intervals.toPandas())
    want = sorted(
        con.execute(
            """
            SELECT p.pid, i.wid FROM points p JOIN intervals i
              ON p.time >= i.start AND p.time < i.end
            """
        ).fetchall()
    )
    assert got == want and len(got) > 30


def test_interval_range_join_keyed_and_plan(spark):
    points = spark.createDataFrame(
        [(B + timedelta(minutes=m), "k1" if m % 2 else "k2", m) for m in range(60)],
        ["time", "k", "v"],
    )
    intervals = spark.createDataFrame(
        [(B, B + timedelta(minutes=30), "k1", "s1"),
         (B, B + timedelta(minutes=30), "k2", "s2")],
        ["start", "end", "k", "sid"],
    )
    df = interval_range_join(points, intervals, key="k", bucket="15 minutes")
    rows = df.collect()
    # 30 points in [0,30) split between k1 (odd minutes) and k2 (even)
    assert len(rows) == 30
    assert all(
        (r["sid"] == "s1") == (r["k"] == "k1") for r in rows
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_interval_range_join_bucket_guard(spark):
    points = spark.createDataFrame([(B, "p")], ["time", "pid"])
    intervals = spark.createDataFrame(
        [(B, B + timedelta(days=400), "huge")], ["start", "end", "wid"]
    )
    with pytest.raises(Exception, match="buckets"):
        interval_range_join(points, intervals, bucket="1 minute", max_buckets=1000).collect()


def test_asof_join_null_value_not_backfilled(spark):
    """A NULL field on the matched (newest) right row must stay NULL —
    not be back-filled from an older right row (no row tearing)."""
    left = spark.createDataFrame([(B + timedelta(seconds=3), "a", 1.0)], ["time", "sym", "qty"])
    right = spark.createDataFrame(
        [(B + timedelta(seconds=1), "a", 10.0, 11.0),
         (B + timedelta(seconds=2), "a", 12.0, None)],
        "time timestamp, sym string, bid double, ask double",
    )
    r = asof_join(left, right, key="sym", value_cols=["bid", "ask"]).collect()[0]
    assert r["bid_right"] == 12.0
    assert r["ask_right"] is None  # from the matched row, not the older one
    assert r["time_right"] == B + timedelta(seconds=2)


def test_asof_join_null_keys_never_match(spark):
    left = spark.createDataFrame(
        [(B + timedelta(seconds=5), None, 1.0)], "time timestamp, sym string, qty double"
    )
    right = spark.createDataFrame(
        [(B + timedelta(seconds=4), None, 9.0)], "time timestamp, sym string, price double"
    )
    r = asof_join(left, right, key="sym", value_cols=["price"]).collect()[0]
    assert r["price_right"] is None and r["time_right"] is None
