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


def fix_timestamp_repair(ts: np.ndarray, vals: np.ndarray):
    """Per-series numpy kernel of :func:`timestamp_repair` — module-level
    so fused multi-arm kernels (ts_value_fill_repair) call the IDENTICAL
    float/int math as the standalone operator."""
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


def timestamp_repair(
    df: DataFrame, time_col: str, value_col: str, group_cols: list[str]
) -> DataFrame:
    """Regularize timestamps to the modal interval: snap each point to
    start + k·interval, dropping duplicates (keep first). Mirrors
    data_repair/timestamp_repair.rs (mode-interval heuristic)."""
    return _apply_per_series(
        df, group_cols, time_col, value_col, fix_timestamp_repair
    )


def value_fill(
    df: DataFrame,
    time_col: str,
    value_col: str,
    group_cols: list[str],
    method: str = "linear",
) -> DataFrame:
    """Fill NaN values: method ∈ {previous, next, linear, mean, median, mode}
    (data_repair/value_fill.rs method strings)."""
    return _apply_per_series(
        df,
        group_cols,
        time_col,
        value_col,
        lambda ts, vals: fix_value_fill(ts, vals, method),
    )


def fix_value_fill(ts: np.ndarray, vals: np.ndarray, method: str = "linear"):
    """Per-series numpy kernel of :func:`value_fill` (module-level for the
    fused ts_value_fill_repair kernel — identical math, one definition)."""
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


def value_repair(
    df: DataFrame, time_col: str, value_col: str, group_cols: list[str]
) -> DataFrame:
    """Repair value outliers (screen method à la data_repair/value_repair.rs):
    clamp each point's rate-of-change to the series' MAD-based speed bounds —
    points whose implied speed exceeds the bound are moved to the bound."""
    return _apply_per_series(df, group_cols, time_col, value_col, fix_value_repair)


def fix_value_repair(ts: np.ndarray, vals: np.ndarray):
    """Per-series numpy kernel of :func:`value_repair` (module-level for
    the fused ts_value_fill_repair kernel — identical math)."""
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


# ------------------------------------------------------------------
# Reference-exact ts_gen_func SQL surface (function/data_repair.slt).
# The kernels above are the distributed defaults used by the driver
# oracles; the kernels below mirror the reference's algorithms bit-for-bit
# where row layout depends on them (timestamp_repair's DP insert/remove
# changes the output row COUNT, so SQL parity needs the exact algorithm).
# ------------------------------------------------------------------

def parse_ts_gen_params(arg: str | None, allowed: tuple[str, ...]) -> dict:
    """serde_urlencoded-style ``k=v&k2=v2`` parse with deny_unknown_fields
    (ts_gen_func/utils.rs get_arg)."""
    out: dict[str, str] = {}
    if not arg:
        return out
    for part in arg.split("&"):
        if not part:
            continue
        k, _eq, v = part.partition("=")
        if k not in allowed:
            raise ValueError(
                f"Fail to parse argument: unknown field `{k}`, expected one "
                "of " + ", ".join(f"`{a}`" for a in allowed)
            )
        if k in out:
            # serde_urlencoded rejects duplicate fields
            raise ValueError(
                f"Fail to parse argument: duplicate field `{k}`"
            )
        out[k] = v
    return out


def _interval_median_ref(ts: np.ndarray) -> int:
    # timestamp_repair.rs get_interval_median — note it indexes the
    # intervals array by len(timestamps)//2 (an off-by-one quirk kept as-is)
    n = len(ts)
    iv = np.sort(np.diff(ts))
    if n % 2 == 0:
        return int((int(iv[n // 2 - 1]) + int(iv[n // 2])) // 2)
    return int(iv[n // 2])


def _interval_mode_ref(ts: np.ndarray) -> int:
    vals, counts = np.unique(np.diff(ts), return_counts=True)
    return int(vals[np.argmax(counts)])


def _interval_cluster_ref(ts: np.ndarray) -> int:
    # k_means_clustering(intervals, 3): integer-mean k-means, returns the
    # mean of the most populated cluster
    data = np.diff(ts).astype("int64")
    k = 3
    mn, mx = int(data.min()), int(data.max())
    means = [mn + (i + 1) * (mx - mn) // (k + 1) for i in range(k)]
    assign = np.zeros(len(data), dtype="int64")
    changed = True
    while changed:
        changed = False
        d = np.abs(data[:, None] - np.array(means)[None, :])
        new_assign = d.argmin(axis=1)
        if (new_assign != assign).any():
            changed = True
        assign = new_assign
        for i in range(k):
            sel = data[assign == i]
            if len(sel):
                means[i] = int(sel.sum()) // len(sel)
    counts = np.bincount(assign, minlength=k)
    best = int(counts.argmax())
    sel = data[assign == best]
    return int(sel.sum()) // len(sel) if len(sel) else 0


def _start_linear_ref(ts: np.ndarray, delta: int) -> int:
    s = int(ts.astype(object).sum()) - delta * (len(ts) * (len(ts) - 1) // 2)
    return s // len(ts)


def _start_mode_ref(ts: np.ndarray, delta: int) -> int:
    mods = ts % delta
    vals, counts = np.unique(mods, return_counts=True)
    max_key = int(vals[np.argmax(counts)])
    result = 0
    for i in range(len(mods)):
        if mods[i] == max_key:
            result = int(ts[i])
    first = int(ts[0])
    while result > first:
        result -= delta
    return result


def _dp_repair_ref(start: int, interval: int, ts: np.ndarray, vals: np.ndarray):
    """timestamp_repair.rs dp_repair: edit-distance alignment of the
    observed timestamps onto the regular grid start + k·interval; inserted
    grid slots get NaN, surplus observations are dropped."""
    m = len(ts)
    if m <= 2:
        return ts, vals
    n = int(np.ceil((int(ts[-1]) - start) / interval + 1.0))
    ADD = 100_000_000_000
    NOTHING, INSERT, REMOVE = 0, 1, 2
    f = np.zeros((n + 1, m + 1), dtype="int64")
    steps = np.zeros((n + 1, m + 1), dtype="int8")
    f[:, 0] = ADD * np.arange(n + 1)
    steps[:, 0] = INSERT
    f[0, :] = ADD * np.arange(m + 1)
    steps[0, :] = REMOVE
    for i in range(1, n + 1):
        grid = start + interval * (i - 1)
        for j in range(1, m + 1):
            t = int(ts[j - 1])
            if t == grid:
                f[i, j] = f[i - 1, j - 1]
                steps[i, j] = NOTHING
            else:
                if f[i - 1, j] < f[i, j - 1]:
                    f[i, j] = f[i - 1, j] + ADD
                    steps[i, j] = INSERT
                else:
                    f[i, j] = f[i, j - 1] + ADD
                    steps[i, j] = REMOVE
                modify = f[i - 1, j - 1] + abs(t - grid)
                if modify < f[i, j]:
                    f[i, j] = modify
                    steps[i, j] = NOTHING
    out_ts = np.zeros(n, dtype="int64")
    out_vals = np.zeros(n, dtype="float64")
    i, j = n, m
    while i >= 1 and j >= 1:
        ps = start + interval * (i - 1)
        if steps[i, j] == NOTHING:
            out_ts[i - 1] = ps
            out_vals[i - 1] = vals[j - 1]
            i -= 1
            j -= 1
        elif steps[i, j] == INSERT:
            out_ts[i - 1] = ps
            out_vals[i - 1] = np.nan
            i -= 1
        else:
            j -= 1
    return out_ts, out_vals


def timestamp_repair_exact(
    df: DataFrame,
    time_col: str,
    value_col: str,
    group_cols: list[str],
    arg: str | None = None,
) -> DataFrame:
    """Reference-exact timestamp_repair (data_repair/timestamp_repair.rs):
    interval via method=mode|cluster|median or explicit interval=<ms>,
    start via start_mode=linear|mode, then DP alignment."""
    p = parse_ts_gen_params(arg, ("method", "interval", "start_mode"))
    start_mode = p.get("start_mode", "mode").lower()
    if start_mode not in ("linear", "mode"):
        raise ValueError(f"Invalid start_mode: {p['start_mode']}")
    interval_fixed: int | None = None
    method = None
    if "interval" in p:
        interval_fixed = int(p["interval"])
        if interval_fixed < 0:
            raise ValueError("interval must be positive")
    elif "method" in p:
        method = p["method"].lower()
        if method not in ("mode", "cluster", "median"):
            raise ValueError(f"Invalid method: {p['method']}")
    else:
        method = "median"

    def fix(ts: np.ndarray, vals: np.ndarray):
        vals = np.where(np.isfinite(vals), vals, np.nan)
        if len(ts) <= 2:
            return ts, vals
        if interval_fixed is not None:
            # reference scales the ms argument to its native ns; ours is µs
            interval = interval_fixed * 1000
        elif method == "cluster":
            interval = _interval_cluster_ref(ts)
        elif method == "mode":
            interval = _interval_mode_ref(ts)
        else:
            interval = _interval_median_ref(ts)
        if interval <= 0:
            return ts, vals
        if start_mode == "linear":
            start = _start_linear_ref(ts, interval)
        else:
            start = _start_mode_ref(ts, interval)
        return _dp_repair_ref(start, interval, ts, vals)

    return _apply_per_series(df, group_cols, time_col, value_col, fix)


def value_fill_exact(
    df: DataFrame,
    time_col: str,
    value_col: str,
    group_cols: list[str],
    arg: str | None = None,
) -> DataFrame:
    """Reference-parity value_fill surface (data_repair/value_fill.rs):
    method ∈ {mean, previous, linear, ar, ma}, default linear; errors
    mirror the reference ('Invalid fill method', 'All values are
    Invalid')."""
    p = parse_ts_gen_params(arg, ("method",))
    method = p.get("method", "linear").lower()
    if method not in ("mean", "previous", "linear", "ar", "ma"):
        raise ValueError(f"Invalid fill method: {p.get('method')}")

    def fix(ts: np.ndarray, vals: np.ndarray):
        valid = np.isfinite(vals)
        if not valid.any():
            raise ValueError("All values are Invalid")
        s = pd.Series(vals)
        s[~np.isfinite(vals)] = np.nan
        if method == "mean":
            s = s.fillna(s.mean())
        elif method == "previous":
            s = s.ffill().bfill()
        elif method == "linear":
            s = pd.Series(
                np.interp(
                    ts.astype("float64"),
                    ts[valid].astype("float64"),
                    vals[valid],
                )
            )
        elif method == "ar":
            # AR(1) fit on consecutive valid pairs (value_fill.rs fill_ar)
            v = s.to_numpy()
            prev, cur = v[:-1], v[1:]
            ok = np.isfinite(prev) & np.isfinite(cur)
            if ok.sum() < 2 or np.var(prev[ok]) == 0:
                raise ValueError(
                    "Cannot fit AR(1) model. Please try another method."
                )
            phi = float(np.cov(prev[ok], cur[ok])[0, 1] / np.var(prev[ok]))
            c = float(cur[ok].mean() - phi * prev[ok].mean())
            out = v.copy()
            for i in range(1, len(out)):
                if not np.isfinite(out[i]) and np.isfinite(out[i - 1]):
                    out[i] = c + phi * out[i - 1]
            s = pd.Series(out)
            s = s.fillna(s.mean())
        else:  # ma: centered moving average of valid neighbors
            filled = s.ffill().bfill()
            ma = filled.rolling(5, center=True, min_periods=1).mean()
            s = s.where(np.isfinite(s), ma)
        return ts, s.to_numpy("float64")

    return _apply_per_series(df, group_cols, time_col, value_col, fix)


def value_repair_exact(
    df: DataFrame,
    time_col: str,
    value_col: str,
    group_cols: list[str],
    arg: str | None = None,
) -> DataFrame:
    """Reference-parity value_repair surface (data_repair/value_repair.rs):
    method ∈ {screen, lsgreedy} (default screen) with min_speed/max_speed/
    center/sigma params. NaN runs are first linearly interpolated
    (process_nan), then the screen speed-clamp runs; lsgreedy maps onto
    the same clamp kernel (documented approximation — the row layout and
    arg surface are reference-exact, the smoothing objective differs)."""
    p = parse_ts_gen_params(
        arg, ("method", "min_speed", "max_speed", "center", "sigma")
    )
    method = p.get("method", "screen").lower()
    if method not in ("screen", "lsgreedy"):
        raise ValueError(f"Invalid method: {p.get('method')}")
    smin = float(p["min_speed"]) if "min_speed" in p else None
    smax = float(p["max_speed"]) if "max_speed" in p else None

    def fix(ts: np.ndarray, vals: np.ndarray):
        n = len(ts)
        vals = np.where(np.isfinite(vals), vals, np.nan)
        valid = np.isfinite(vals)
        if valid.sum() < 2:
            raise ValueError("At least two non-NaN values are needed")
        # process_nan: linear interpolation over NaN runs (ends extrapolate)
        vals = np.interp(
            ts.astype("float64"), ts[valid].astype("float64"), vals[valid]
        )
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
        mad = 1.4826 * float(np.median(np.abs(finite - med)))
        lo = smin if smin is not None else med - 3 * mad
        hi = smax if smax is not None else med + 3 * mad
        out = vals.copy()
        for i in range(1, n):
            d = tsec[i] - tsec[i - 1]
            if d <= 0:
                continue
            lo_v, hi_v = out[i - 1] + lo * d, out[i - 1] + hi * d
            if out[i] < lo_v:
                out[i] = lo_v
            elif out[i] > hi_v:
                out[i] = hi_v
        return ts, out

    return _apply_per_series(df, group_cols, time_col, value_col, fix)
