"""LTTB downsampling + EWMA smoothing (operators/downsample.py):
shape-preservation semantics, pandas-reference parity, pass-through and
multi-series behavior."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cnosdb_spark.operators import downsample


BASE = datetime(2024, 1, 1)


def _series(spark, n=200, tag="s0", spike_at=137):
    rows = []
    for i in range(n):
        v = 10.0 + (i % 7) * 0.5
        if i == spike_at:
            v = 99.0
        rows.append((BASE + timedelta(minutes=i), tag, v))
    return spark.createDataFrame(rows, ["time", "tag", "value"])


def test_lttb_keeps_endpoints_spike_and_count(spark):
    df = _series(spark)
    out = downsample.lttb(df, "time", "value", ["tag"], n_out=40).collect()
    assert len(out) == 40
    times = [r["time"] for r in out]
    assert times[0] == BASE and times[-1] == BASE + timedelta(minutes=199)
    assert times == sorted(times)
    # the spike is the visually dominant point of its bucket — LTTB keeps
    # it (a bucket AVERAGE would flatten it to ~12)
    assert any(r["value"] == 99.0 for r in out)


def test_lttb_passthrough_short_series(spark):
    df = _series(spark, n=30)
    out = downsample.lttb(df, "time", "value", ["tag"], n_out=100)
    assert out.count() == 30


def test_lttb_multi_series_independent(spark):
    df = _series(spark, tag="a").unionAll(_series(spark, tag="b", spike_at=11))
    out = downsample.lttb(df, "time", "value", ["tag"], n_out=25)
    by_tag = {
        r["tag"]: r["n"] for r in out.groupBy("tag").agg(F.count("*").alias("n")).collect()
    }
    assert by_tag == {"a": 25, "b": 25}


def test_ewma_matches_pandas(spark):
    df = _series(spark, n=50)
    got = {
        r["time"]: r["ewma"]
        for r in downsample.ewma(df, "time", "value", ["tag"], alpha=0.3).collect()
    }
    pdf = df.toPandas().sort_values("time").reset_index(drop=True)
    want = pdf["value"].ewm(alpha=0.3, adjust=False).mean().round(6)
    for t, w in zip(pdf["time"], want):
        assert got[t] == pytest.approx(w, abs=1e-9)


def test_ewma_seeded_with_first_value(spark):
    df = spark.createDataFrame(
        [(BASE, "s", 100.0), (BASE + timedelta(minutes=1), "s", 0.0)],
        ["time", "tag", "value"],
    )
    out = sorted(
        downsample.ewma(df, "time", "value", ["tag"], alpha=0.5).collect(),
        key=lambda r: r["time"],
    )
    assert out[0]["ewma"] == 100.0
    assert out[1]["ewma"] == 50.0
