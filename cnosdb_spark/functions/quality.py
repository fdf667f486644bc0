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
from pyspark.sql import DataFrame, Window, functions as F, types as T


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


def data_quality_pandas(
    df: DataFrame,
    time_col: str,
    value_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Per-group data-quality scores via grouped-map applyInPandas — the
    original implementation, kept as the sequential reference that
    :func:`data_quality` is differentially pinned against
    (tests/test_functions.py). Ships every row through the Python
    boundary; prefer :func:`data_quality` on query paths."""
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


def data_quality(
    df: DataFrame,
    time_col: str,
    value_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Per-group data-quality scores. Output: group_cols + 4 double scores.

    Relational implementation (round 10): the interval/MAD math runs as
    one lag window plus three keyed aggregations that all reuse the
    window's hashpartitioning — no Python boundary, no full-row
    applyInPandas shuffle (guide §4.1: built-ins over grouped-map when
    they exist). Semantics replicate :func:`_series_quality` exactly,
    including the edges:

    - ``rint`` (IEEE half-even) for the missing-point estimate — Python's
      ``round`` on a numpy float64 rounds half to even, NOT half up;
    - NaN **and** NULL values both count as ``special`` (pandas
      ``to_numeric(errors="coerce")`` turned None into NaN);
    - value outliers need >= 2 finite points and sigma > 0, and
      ``special`` always adds into ``invalid``;
    - single-point / empty-interval groups take the same early-exit
      scores as the Python reference (cnt < 2 branch);
    - an all-duplicate-timestamp group (no positive interval) has
      ``med_dt = NULL`` here vs 0.0 there — every med_dt use is guarded
      by ``med_dt > 0``, which NULL fails exactly like 0.0;
    - **NULL group keys**: the stat join-backs are inner equi-joins on
      the group keys, so a group whose key contains NULL is dropped from
      the output, whereas :func:`data_quality_pandas` (groupBy +
      applyInPandas) emits a row for it. A deliberate, pinned divergence
      (tests/test_functions.py::test_data_quality_null_key_group_drops):
      the engine's series keys (tags) are non-null by construction, and
      null-safe join conditions would trade the plain equi-join shape
      (co-partitioned, AQE-friendly) for an edge no caller hits.

    Differentially pinned against :func:`data_quality_pandas` in tests.
    """
    keys = list(group_cols) if group_cols else ["_g"]
    # cast covers TIMESTAMP_NTZ inputs (unix_micros rejects them; the UTC
    # session timezone makes the cast a value no-op)
    t_ns = (
        F.unix_micros(F.col(time_col).cast("timestamp")) * F.lit(1000)
    ).cast("double")
    base = df.select(
        *group_cols,
        *([] if group_cols else [F.lit(1).alias("_g")]),
        (t_ns / F.lit(1e9)).alias("_t"),
        F.col(value_col).cast("double").alias("_v"),
    )
    w = Window.partitionBy(*keys).orderBy("_t")
    finite = F.col("_v").isNotNull() & ~F.isnan("_v")
    rows = base.withColumn("_dt", F.col("_t") - F.lag("_t").over(w))

    g1 = rows.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.count(F.when(~finite, 1)).alias("_special"),
        F.count(F.when(finite, 1)).alias("_nfin"),
        F.avg("_dt").alias("_mean_dt"),
        F.stddev_pop("_dt").alias("_std_dt"),
        F.count(F.when(F.col("_dt") == 0, 1)).alias("_redund"),
        F.percentile(F.when(F.col("_dt") > 0, F.col("_dt")), F.lit(0.5)).alias(
            "_med_dt"
        ),
        F.percentile(F.when(finite, F.col("_v")), F.lit(0.5)).alias("_med_v"),
    )
    # second pass: per-row comparisons against the group stats (co-
    # partitioned join — g1 derives from the same exchange)
    r2 = rows.join(g1, keys)
    big = (F.col("_med_dt") > 0) & (
        F.col("_dt") > F.col("_mean_dt") + F.lit(3) * F.col("_std_dt")
    )
    est = F.greatest(
        F.expr("CAST(rint(_dt / _med_dt) AS BIGINT)") - F.lit(1).cast("long"),
        F.lit(0).cast("long"),
    )
    g2 = r2.groupBy(*keys).agg(
        F.coalesce(F.sum(F.when(big, est)), F.lit(0).cast("long")).alias("_missing"),
        F.count(
            F.when(
                (F.col("_med_dt") > 0)
                & (F.col("_dt") > 0)
                & (F.col("_dt") < F.col("_med_dt") / 2),
                1,
            )
        ).alias("_late"),
        F.percentile(
            F.when(finite, F.abs(F.col("_v") - F.col("_med_v"))), F.lit(0.5)
        ).alias("_mad"),
    )
    # third pass: value outliers against the MAD threshold
    r3 = rows.join(g1.select(*keys, "_med_v", "_nfin"), keys).join(g2, keys)
    sigma = F.lit(1.4826) * F.col("_mad")
    g3 = r3.groupBy(*keys).agg(
        F.count(
            F.when(
                (F.col("_nfin") >= 2)
                & (sigma > 0)
                & finite
                & (F.abs(F.col("_v") - F.col("_med_v")) > F.lit(3) * sigma),
                1,
            )
        ).alias("_outliers"),
    )

    j = g1.join(g2, keys).join(g3, keys)
    cnt = F.col("_cnt").cast("double")
    invalid = F.col("_outliers") + F.col("_special")
    small = F.col("_cnt") < 2
    out = j.select(
        *group_cols,
        F.when(small, F.when(F.col("_special") > 0, 0.0).otherwise(1.0))
        .otherwise(
            F.lit(1.0) - F.col("_missing") / (F.col("_cnt") + F.col("_missing"))
        )
        .cast("double")
        .alias("completeness"),
        F.when(small, 1.0)
        .otherwise(F.lit(1.0) - F.col("_redund") / cnt)
        .cast("double")
        .alias("consistency"),
        F.when(small, 1.0)
        .otherwise(F.lit(1.0) - F.col("_late") / cnt)
        .cast("double")
        .alias("timeliness"),
        F.when(small, F.lit(1.0) - F.col("_special") / cnt)
        .otherwise(F.lit(1.0) - invalid / cnt)
        .cast("double")
        .alias("validity"),
    )
    return out
