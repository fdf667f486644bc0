"""gauge_agg + accessor functions.

Reference: /root/reference query_server/query/src/extension/expr/
aggregate_function/gauge/gauge_agg.rs:22-67 (GaugeData = first, second,
penultimate, last TSPoints + num_elements) and the scalar accessors in
extension/expr/scalar_function/gauge/*.rs (delta, rate, time_delta,
first_time, first_val, last_time, last_val, idelta_left, idelta_right).

Spark-first: GaugeData is a plain struct column built from min_by/max_by
aggregates — no UDAF, no per-group collect. Every accessor is a column
expression over the struct, so the whole family stays inside whole-stage
codegen and aggregates with one shuffle on the series key.

second/penultimate need the 2nd smallest/largest time: expressed with
min_by/max_by over a null-guarded key pair — still built-in aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def gauge_agg(df: DataFrame, group_cols: list[str], time_col: str, value_col: str) -> DataFrame:
    """groupBy(series).gauge_agg(time, value) → struct gauge column.

    Output schema: gauge struct<first:struct<ts,val>, second:...,
    penultimate:..., last:..., num_elements:long>.

    Implementation: rank rows per series by time (window sort — spills, no
    per-group memory blowup) then pick ranks 1/2/n-1/n with min_by. One
    shuffle on the series key, everything JVM-side.
    """
    t, v = F.col(time_col), F.col(value_col)
    pt = F.struct(t.alias("ts"), v.alias("val"))

    w_asc = Window.partitionBy(*group_cols).orderBy(t.asc())
    w_desc = Window.partitionBy(*group_cols).orderBy(t.desc())
    ranked = (
        df.filter(v.isNotNull())
        .withColumn("_ra", F.row_number().over(w_asc))
        .withColumn("_rd", F.row_number().over(w_desc))
    )
    agg = ranked.groupBy(*group_cols).agg(
        F.min_by(pt, F.col("_ra")).alias("_first"),
        F.min_by(pt, F.when(F.col("_ra") == 2, F.col("_ra"))).alias("_second"),
        F.min_by(pt, F.when(F.col("_rd") == 2, F.col("_rd"))).alias("_penultimate"),
        F.min_by(pt, F.col("_rd")).alias("_last"),
        F.count(F.lit(1)).alias("_n"),
    )
    gauge = F.struct(
        F.col("_first").alias("first"),
        F.col("_second").alias("second"),
        F.col("_penultimate").alias("penultimate"),
        F.col("_last").alias("last"),
        F.col("_n").alias("num_elements"),
    )
    return agg.select(*group_cols, gauge.alias("gauge"))


# --------------------------------------------------------------- accessors
def gauge_delta(g: Column) -> Column:
    """delta(gauge) = last.val - first.val."""
    return g["last"]["val"] - g["first"]["val"]


def gauge_time_delta(g: Column) -> Column:
    """time_delta(gauge) in seconds between first and last points."""
    return (F.unix_micros(g["last"]["ts"]) - F.unix_micros(g["first"]["ts"])) / 1e6


def gauge_rate(g: Column) -> Column:
    """rate(gauge) = delta per NANOSECOND (scalar_function/gauge/rate.rs —
    rate.slt shows -111 over 0.010 s = -1.11e-5); null when single point."""
    td_ns = (F.unix_micros(g["last"]["ts"]) - F.unix_micros(g["first"]["ts"])) * 1000
    return F.when(td_ns > 0, gauge_delta(g) / td_ns)


def gauge_first_time(g: Column) -> Column:
    return g["first"]["ts"]


def gauge_first_val(g: Column) -> Column:
    return g["first"]["val"]


def gauge_last_time(g: Column) -> Column:
    return g["last"]["ts"]


def gauge_last_val(g: Column) -> Column:
    return g["last"]["val"]


def gauge_idelta_left(g: Column) -> Column:
    """idelta_left = second.val - first.val (instant delta at window start)."""
    return g["second"]["val"] - g["first"]["val"]


def gauge_idelta_right(g: Column) -> Column:
    """idelta_right = last.val - penultimate.val (instant delta at end)."""
    return g["last"]["val"] - g["penultimate"]["val"]
