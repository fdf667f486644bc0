"""ts_gen_func data-repair table functions: timestamp_repair, value_fill,
value_repair.

Reference: /root/reference query_server/query/src/extension/expr/ts_gen_func/
{mod.rs:12-57, data_repair/{timestamp_repair,value_fill,value_repair}.rs} —
table-generating functions that regularize timestamps, fill missing values,
and repair outliers, computed per series.

Spark-first: grouped-map ``applyInPandas`` per series (the reference's
analyzer likewise gathers each series into one partition —
extension/analyse/transform_ts_gen_func.rs). Pure numpy inside; Arrow
batches across. The per-series-fits-in-memory assumption matches the
reference's accumulator design.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


def _out_schema(df: DataFrame, group_cols: list[str], time_col: str, value_col: str) -> T.StructType:
    return T.StructType(
        [T.StructField(c, df.schema[c].dataType, True) for c in group_cols]
        + [
            T.StructField(time_col, T.TimestampType(), True),
            T.StructField(value_col, T.DoubleType(), True),
        ]
    )


def _apply_per_series(df, group_cols, time_col, value_col, fn):
    schema = _out_schema(df, group_cols, time_col, value_col)

    def wrapper(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col)
        ts = pdf[time_col].to_numpy("datetime64[us]").astype("int64")
        vals = pd.to_numeric(pdf[value_col], errors="coerce").to_numpy("float64")
        new_ts, new_vals = fn(ts, vals)
        out = pd.DataFrame(
            {
                time_col: new_ts.astype("datetime64[us]"),
                value_col: new_vals,
            }
        )
        for c, v in zip(group_cols, key):
            out[c] = v
        return out[[*group_cols, time_col, value_col]]

    return df.select(*group_cols, time_col, value_col).groupBy(*group_cols).applyInPandas(
        wrapper, schema
    )


def timestamp_repair(
    df: DataFrame, time_col: str, value_col: str, group_cols: list[str]
) -> DataFrame:
    """Regularize timestamps to the modal interval: snap each point to
    start + k·interval, dropping duplicates (keep first). Mirrors
    data_repair/timestamp_repair.rs (mode-interval heuristic)."""

    def fix(ts: np.ndarray, vals: np.ndarray):
        if len(ts) < 3:
            return ts, vals
        dt = np.diff(ts)
        pos = dt[dt > 0]
        if not len(pos):
            return ts[:1], vals[:1]
        interval = int(np.median(pos))
        if interval <= 0:
            return ts, vals
        start = int(ts[0])
        # floor(x+0.5) (half-up), not np.round (half-even): reproducible in
        # ANSI SQL for the differential oracle
        k = np.floor((ts - start) / interval + 0.5).astype("int64")
        new_ts = start + k * interval
        _, first_idx = np.unique(new_ts, return_index=True)
        return new_ts[first_idx], vals[first_idx]

    return _apply_per_series(df, group_cols, time_col, value_col, fix)


def value_fill(
    df: DataFrame,
    time_col: str,
    value_col: str,
    group_cols: list[str],
    method: str = "linear",
) -> DataFrame:
    """Fill NaN values: method ∈ {previous, next, linear, mean, median, mode}
    (data_repair/value_fill.rs method strings)."""

    def fix(ts: np.ndarray, vals: np.ndarray):
        s = pd.Series(vals)
        if method == "previous":
            s = s.ffill()
        elif method == "next":
            s = s.bfill()
        elif method == "linear":
            s = pd.Series(
                np.interp(
                    ts.astype("float64"),
                    ts[~np.isnan(vals)].astype("float64"),
                    vals[~np.isnan(vals)],
                )
                if (~np.isnan(vals)).any()
                else vals
            )
        elif method == "mean":
            s = s.fillna(s.mean())
        elif method == "median":
            s = s.fillna(s.median())
        elif method == "mode":
            nn = s.dropna()
            s = s.fillna(nn.mode().min() if len(nn) else np.nan)
        else:
            raise ValueError(f"unknown fill method {method!r}")
        return ts, s.to_numpy("float64")

    return _apply_per_series(df, group_cols, time_col, value_col, fix)


def value_repair(
    df: DataFrame, time_col: str, value_col: str, group_cols: list[str]
) -> DataFrame:
    """Repair value outliers (screen method à la data_repair/value_repair.rs):
    clamp each point's rate-of-change to the series' MAD-based speed bounds —
    points whose implied speed exceeds the bound are moved to the bound."""

    def fix(ts: np.ndarray, vals: np.ndarray):
        n = len(ts)
        if n < 3:
            return ts, vals
        tsec = ts.astype("float64") / 1e6
        dt = np.diff(tsec)
        dv = np.diff(vals)
        with np.errstate(divide="ignore", invalid="ignore"):
            speed = np.where(dt > 0, dv / dt, 0.0)
        finite = speed[np.isfinite(speed)]
        if not len(finite):
            return ts, vals
        med = float(np.median(finite))
        mad = float(np.median(np.abs(finite - med)))
        sigma = 1.4826 * mad
        smin, smax = med - 3 * sigma, med + 3 * sigma
        out = vals.copy()
        for i in range(1, n):
            d = tsec[i] - tsec[i - 1]
            if d <= 0 or np.isnan(out[i - 1]) or np.isnan(out[i]):
                continue
            lo, hi = out[i - 1] + smin * d, out[i - 1] + smax * d
            if out[i] < lo:
                out[i] = lo
            elif out[i] > hi:
                out[i] = hi
        return ts, out

    return _apply_per_series(df, group_cols, time_col, value_col, fix)
