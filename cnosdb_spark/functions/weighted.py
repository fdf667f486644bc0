"""Weighted percentile aggregate: approx_percentile_cont_with_weight.

Reference: query_server/query/src/extension/expr/aggregate_function/ (the
DataFusion-side approx_percentile_cont_with_weight, exercised by
cases/function/common/approx_agg/approx_percentile_cont_with_weight.slt).

The reference computes a t-digest approximation; this implementation is an
EXACT weighted interpolated percentile (the approximate contract permits an
exact answer). Documented divergence: values can differ from DataFusion's
t-digest interpolation in the low digits.

Definition (Hazen / type-7-like weighted quantile): sort by value; each
point i gets position p_i = (cumw_i - w_i/2) / W. The q-quantile linearly
interpolates between the bracketing positions, clamping outside [p_0,
p_last]. NULL values and NULL/non-positive weights are ignored, matching
the reference's accumulator skipping null inputs.

Registered as a Spark grouped-agg pandas UDAF so it works directly in SQL
(`SELECT approx_percentile_cont_with_weight(v, w, 0.5) FROM t GROUP BY g`)
— the Spark-native UDAF mechanism (SURVEY §2.10).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf


def weighted_percentile(values: np.ndarray, weights: np.ndarray, q: float) -> float:
    mask = ~(np.isnan(values) | np.isnan(weights)) & (weights > 0)
    v, w = values[mask], weights[mask]
    if not len(v):
        return float("nan")
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    cum = np.cumsum(w)
    total = cum[-1]
    pos = (cum - w / 2.0) / total
    return float(np.interp(q, pos, v))


_UDAF = None


def _udaf():
    """Build the grouped-agg pandas UDAF lazily — @pandas_udf resolves its
    return type against the active SparkSession, so decorating at import
    time would require a session before one exists."""
    global _UDAF
    if _UDAF is None:

        def _impl(v: pd.Series, w: pd.Series, q: pd.Series) -> float:
            quant = float(q.iloc[0]) if len(q) else 0.5
            return weighted_percentile(
                pd.to_numeric(v, errors="coerce").to_numpy("float64"),
                pd.to_numeric(w, errors="coerce").to_numpy("float64"),
                quant,
            )

        _UDAF = pandas_udf(_impl, "double")
    return _UDAF


def register(spark: SparkSession) -> None:
    spark.udf.register("approx_percentile_cont_with_weight", _udaf())


def approx_percentile_cont_with_weight(
    df: DataFrame,
    value_col: str | Column,
    weight_col: str | Column,
    q: float,
    group_cols: list[str] | None = None,
    out_col: str = "approx_percentile",
) -> DataFrame:
    """DataFrame-side helper: one grouped-agg invocation per group."""
    agg = _udaf()(
        F.col(value_col) if isinstance(value_col, str) else value_col,
        F.col(weight_col) if isinstance(weight_col, str) else weight_col,
        F.lit(float(q)),
    ).alias(out_col)
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)
