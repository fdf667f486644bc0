"""DuckDB-differential comparison mimicking the driver's correctness gate:
row-count + column names + order-insensitive value equality."""

from __future__ import annotations

import math

import pandas as pd


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[c] = pd.to_datetime(s).astype("datetime64[us]")
        else:
            # Decimal / object numerics from DuckDB → float where possible
            try:
                out[c] = pd.to_numeric(s, errors="raise").astype("float64")
            except (ValueError, TypeError):
                out[c] = s.astype("string")
    res = pd.DataFrame(out)
    return res.sort_values(by=list(res.columns), na_position="last").reset_index(
        drop=True
    )


def compare(spark_df, duck_df: pd.DataFrame, name: str = "") -> list[str]:
    """Return list of mismatch descriptions; empty = match."""
    errs: list[str] = []
    sp = spark_df.toPandas()
    if sorted(sp.columns) != sorted(duck_df.columns):
        errs.append(f"{name}: columns differ: spark={sorted(sp.columns)} duck={sorted(duck_df.columns)}")
        return errs
    if len(sp) != len(duck_df):
        errs.append(f"{name}: row count differs: spark={len(sp)} duck={len(duck_df)}")
        return errs
    if len(sp) == 0:
        return errs
    a, b = _canon(sp), _canon(duck_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            bad = ~(
                (av.isna() & bv.isna())
                | (abs(av - bv) <= 1e-9 + 1e-9 * abs(bv))
            )
        else:
            bad = ~((av.isna() & bv.isna()) | (av == bv))
        n_bad = int(bad.sum())
        if n_bad:
            i = bad.idxmax()
            errs.append(
                f"{name}: column {c!r}: {n_bad}/{len(av)} values differ "
                f"(first: spark={av[i]!r} duck={bv[i]!r} at sorted row {i})"
            )
    return errs
