"""Time-series anomaly detection operators.

Not in the reference surface (CnosDB exposes gauge/state/data-quality
aggregates but no outlier flagging) — added as the monitoring-pipeline
counterpart of the repair family (``functions/repair.py`` fixes values;
these FIND the values that need fixing).

Both detectors are pure column expressions (window frames / one keyed
aggregate) — no UDF, no driver collection, reproducible in ANSI SQL for
DuckDB-differential tests.

Scale shapes:

- ``zscore_anomalies`` is one window pass per series (the same single
  hash exchange every per-series window op in the engine pays); the
  trailing frame is row- or time-bounded so state per row is O(frame).
- ``mad_anomalies`` is one keyed aggregate (two exact percentiles) +
  a broadcast-size join back — series stats are one row per series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def zscore_anomalies(
    df: DataFrame,
    time_col: str = "time",
    value_col: str = "value",
    tags: list[str] | None = None,
    lookback: int = 20,
    threshold: float = 3.0,
    min_points: int = 5,
) -> DataFrame:
    """Rolling z-score outliers: for each point, mean/std over the
    TRAILING ``lookback`` rows of the same series EXCLUDING the current
    row (including it would let a large spike mask itself); flag
    |x - mean| / std >= ``threshold``.

    Points with fewer than ``min_points`` trailing rows, or a degenerate
    (zero/NULL) trailing std, get ``zscore`` NULL and ``is_anomaly``
    false — a warm-up window, not an error.

    Output: input columns + (zscore DOUBLE, is_anomaly BOOLEAN).
    """
    w = (
        Window.partitionBy(*(tags or []))
        .orderBy(time_col)
        .rowsBetween(-lookback, -1)
    )
    mean = F.avg(value_col).over(w)
    std = F.stddev_samp(value_col).over(w)
    n = F.count(value_col).over(w)
    z = F.when(
        (n >= min_points) & std.isNotNull() & (std > 0),
        (F.col(value_col) - mean) / std,
    )
    # flag from the UNROUNDED score (rounding first would flip the flag
    # for true scores within 5e-7 of the threshold); round only the
    # emitted column
    return df.withColumn("zscore", F.round(z, 6)).withColumn(
        "is_anomaly", F.coalesce(F.abs(z) >= threshold, F.lit(False))
    )


def mad_anomalies(
    df: DataFrame,
    value_col: str = "value",
    tags: list[str] | None = None,
    threshold: float = 3.5,
) -> DataFrame:
    """Robust per-series outliers via the median absolute deviation:
    score = |x - median| / (1.4826 * MAD) (the normal-consistency
    constant), flag score >= ``threshold`` (3.5 is the classic
    Iglewicz-Hoaglin cut).  Unlike the z-score, median/MAD don't move
    when the outliers themselves are extreme.

    Exact medians via ``percentile`` — two keyed aggregates over the
    series (one for the median, one for the deviation median), then a
    join back keyed on the series tags (one row per series — broadcast
    at any corpus size).  A constant series (MAD = 0) yields NULL scores
    and no flags.

    Output: input columns + (mad_score DOUBLE, is_anomaly BOOLEAN).
    """
    keys = list(tags or [])
    med = df.groupBy(*keys).agg(
        F.percentile(value_col, F.lit(0.5)).alias("_med")
    )
    # keyed joins carry NO broadcast hint (round 10): the med/mad tables
    # hold one row PER SERIES, which grows with the corpus — a pinned
    # broadcast is the irreversible estimate-class misplan at high series
    # cardinality (8 GB cap). AQE broadcasts them from exact sizes when
    # they are actually small. The keyless (whole-table) variants stay
    # hinted: those are true one-row scalars.
    j1 = df.join(med, keys) if keys else df.crossJoin(F.broadcast(med))
    mad = (
        j1.withColumn("_dev", F.abs(F.col(value_col) - F.col("_med")))
        .groupBy(*keys)
        .agg(F.percentile("_dev", F.lit(0.5)).alias("_mad"))
    )
    j2 = j1.join(mad, keys) if keys else j1.crossJoin(F.broadcast(mad))
    score = F.when(
        F.col("_mad") > 0,
        F.abs(F.col(value_col) - F.col("_med")) / (F.lit(1.4826) * F.col("_mad")),
    )
    return (
        j2.withColumn("mad_score", F.round(score, 6))
        # flag from the UNROUNDED score, not the rounded emitted column
        .withColumn("is_anomaly", F.coalesce(score >= threshold, F.lit(False)))
        .drop("_med", "_mad", "_dev")
    )
