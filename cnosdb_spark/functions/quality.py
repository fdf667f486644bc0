"""Data-quality aggregates: completeness, consistency, timeliness, validity.

Reference: /root/reference query_server/query/src/extension/expr/
aggregate_function/data_quality/{mod,accumulator,common}.rs (metrics math at
common.rs:110-210) — IoTDB-style series-quality scores computed from the
timestamp interval distribution and value outliers.

Formulas (re-derived from the reference's math, per (series) group over
time-ordered (time, value) pairs):

  cnt        = number of points
  missing    = estimated missing points from interval analysis: for each
               gap dt_i, a point is "missing" when dt_i > mean+3σ of
               intervals; estimated count += round(dt_i/median_dt) - 1
  special    = NaN/None values
  late / early = interval outliers small/large vs median
  completeness = 1 - missing/(cnt+missing)
  consistency  = 1 - redundancy/cnt          (redundancy: dt_i == 0 dups)
  timeliness   = 1 - late/cnt
  validity     = 1 - invalid/cnt             (value outliers: |v-median| > 3·MAD-σ)

Implemented as a grouped-map ``applyInPandas`` (numpy, Arrow-batched): the
math is inherently per-series sequential, the classic justified use of the
Pandas-UDF slow path. Each series must fit in one task's memory — true for
any sane series cardinality (the reference holds the same assumption in its
accumulator).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


def _series_quality(ts: np.ndarray, vals: np.ndarray) -> dict[str, float]:
    order = np.argsort(ts, kind="stable")
    ts = ts[order].astype("float64")
    vals = vals[order].astype("float64")
    cnt = len(ts)
    special = int(np.isnan(vals).sum())
    if cnt < 2:
        return {
            "completeness": 1.0 if cnt and not special else 0.0 if special else 1.0,
            "consistency": 1.0,
            "timeliness": 1.0,
            "validity": 1.0 - (special / cnt if cnt else 0.0),
        }
    dt = np.diff(ts)
    pos = dt[dt > 0]
    med_dt = float(np.median(pos)) if len(pos) else 0.0
    mean_dt = float(dt.mean())
    std_dt = float(dt.std())
    redundancy = int((dt == 0).sum())
    big = dt > mean_dt + 3 * std_dt
    missing = int(sum(max(round(d / med_dt) - 1, 0) for d in dt[big])) if med_dt > 0 else 0
    late = int(((dt > 0) & (dt < med_dt / 2)).sum()) if med_dt > 0 else 0

    finite = vals[~np.isnan(vals)]
    if len(finite) >= 2:
        med_v = float(np.median(finite))
        mad = float(np.median(np.abs(finite - med_v)))
        sigma = 1.4826 * mad
        invalid = int((np.abs(finite - med_v) > 3 * sigma).sum()) if sigma > 0 else 0
    else:
        invalid = 0
    invalid += special

    return {
        "completeness": 1.0 - missing / (cnt + missing) if cnt + missing else 1.0,
        "consistency": 1.0 - redundancy / cnt,
        "timeliness": 1.0 - late / cnt,
        "validity": 1.0 - invalid / cnt,
    }


def data_quality(
    df: DataFrame,
    time_col: str,
    value_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Per-group data-quality scores. Output: group_cols + 4 double scores."""
    out_fields = [
        T.StructField(c, df.schema[c].dataType, True) for c in group_cols
    ] + [
        T.StructField(m, T.DoubleType(), True)
        for m in ("completeness", "consistency", "timeliness", "validity")
    ]
    schema = T.StructType(out_fields)

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ts = pdf[time_col].astype("int64").to_numpy()  # ns since epoch
        vals = pd.to_numeric(pdf[value_col], errors="coerce").to_numpy()
        m = _series_quality(ts.astype("float64") / 1e9, vals)
        row = dict(zip(group_cols, key))
        row.update(m)
        return pd.DataFrame([row])

    proj = df.select(*group_cols, time_col, value_col)
    return proj.groupBy(*group_cols).applyInPandas(fn, schema)
